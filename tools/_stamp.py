"""Measurement provenance stamp shared by the bench tools.

Every committed BENCH_* artifact carries the commit and build round it was
measured at, so a cached number reprinted into a later round's BENCH_rN line
can never read as a fresh per-round measurement (bench.py surfaces these
fields verbatim when it reprints an artifact).
"""

from __future__ import annotations

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def current_round() -> int | None:
    """Build round, from $SPARK_GRAFT_ROUND or the driver's PROGRESS.jsonl."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        try:
            return int(env)
        except ValueError:
            pass
    try:
        with open(os.path.join(REPO, "PROGRESS.jsonl")) as f:
            lines = [ln for ln in f if ln.strip()]
        return int(json.loads(lines[-1])["round"])
    except Exception:
        return None


def current_commit() -> str | None:
    try:
        return (
            subprocess.run(
                ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
                capture_output=True,
                text=True,
                timeout=10,
            ).stdout.strip()
            or None
        )
    except Exception:
        return None


def measurement_stamp() -> dict:
    import datetime

    return {
        "measured_round": current_round(),
        "measured_at_commit": current_commit(),
        "measured_at": datetime.datetime.now().isoformat(timespec="seconds"),
    }
