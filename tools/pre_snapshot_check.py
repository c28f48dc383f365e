#!/usr/bin/env python
"""Single pre-snapshot harness gate (VERDICT r9 #6): mechanically screen
the two classes of self-inflicted measurement bugs this project has
actually hit, before any CORRECTNESS/BENCH artifact is committed.

1. **Hasher-risky gate output types** (the r06/r07 `expectations`
   hash-fail: a boolean column + '' sentinel canonicalize differently
   across hashers). Runs tools/audit_gate_types.py's schema pass over
   every gate: any boolean output column fails the check.

2. **Timing-boundary bugs in bench tools** (the r09 dsir 0.51s row: the
   op call ran eager driver actions OUTSIDE the timed window, so the
   window measured only the cached tail). AST lint over bench.py and
   tools/bench_*.py: every `t0 = time.time()` ... `time.time() - t0`
   region must CONTAIN a call expression beyond `<var>.write...save()`
   on a variable bound outside the region — i.e. the op construction has
   to sit inside the stopwatch.

Usage: python tools/pre_snapshot_check.py [sf_dir]
Exit 0 = both screens green. Run before every snapshot commit:

    python tools/pre_snapshot_check.py && python tools/check_oracle.py ...
"""

from __future__ import annotations

import ast
import glob
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _timed_regions(fn: ast.AST):
    """Yield (start_var, stmts) for t0 = time.time() ... time.time() - t0
    stopwatch regions inside one function body (flat scan per body)."""

    def is_time_call(node):
        return (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "time"
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "time"
        )

    bodies = []
    for n in ast.walk(fn):
        for field in ("body", "orelse", "finalbody"):
            b = getattr(n, field, None)
            if isinstance(b, list) and b and isinstance(b[0], ast.stmt):
                bodies.append(b)
    for body in bodies:
        open_regions: dict[str, list] = {}
        for stmt in body:
            # close any region whose `time.time() - t0` appears in this stmt
            closed = set()
            for node in ast.walk(stmt):
                if (
                    isinstance(node, ast.BinOp)
                    and isinstance(node.op, ast.Sub)
                    and is_time_call(node.left)
                    and isinstance(node.right, ast.Name)
                    and node.right.id in open_regions
                ):
                    yield node.right.id, open_regions.pop(node.right.id), stmt
                    closed.add(node.right.id)
            # accumulate statements into open regions
            for var, stmts in open_regions.items():
                stmts.append(stmt)
            # open a region on `t0 = time.time()`
            if (
                isinstance(stmt, ast.Assign)
                and len(stmt.targets) == 1
                and isinstance(stmt.targets[0], ast.Name)
                and is_time_call(stmt.value)
            ):
                open_regions[stmt.targets[0].id] = []


def _region_has_op_call(stmts) -> bool:
    """True when the timed region contains a call that can construct the
    measured DataFrame — anything beyond `<name>.write.…save()` chains and
    stopwatch plumbing."""
    for stmt in stmts:
        for node in ast.walk(stmt):
            if not isinstance(node, ast.Call):
                continue
            # walk down method-call chains like x.write.format(...).save()
            f = node.func
            attrs = []
            while isinstance(f, (ast.Attribute, ast.Call)):
                if isinstance(f, ast.Attribute):
                    attrs.append(f.attr)
                    f = f.value
                else:
                    f = f.func
            if isinstance(f, ast.Name) and attrs and set(attrs) <= {
                "write", "format", "mode", "save", "noop", "parquet", "count",
                "collect", "time", "append",
            }:
                continue  # pure sink/stopwatch chain on a pre-built frame
            if isinstance(f, ast.Name) and not attrs and f.id in {
                "round", "print", "len", "min", "max",
            }:
                continue  # stopwatch arithmetic / logging builtins
            return True
    return False


def lint_timing_boundaries() -> list[str]:
    problems = []
    targets = [os.path.join(REPO, "bench.py")] + sorted(
        glob.glob(os.path.join(REPO, "tools", "bench_*.py"))
    )
    for path in targets:
        with open(path) as fh:
            tree = ast.parse(fh.read(), filename=path)
        for var, stmts, closer in _timed_regions(tree):
            if not stmts:
                # open/close in adjacent statements: the closer itself must
                # hold the op call (e.g. fresh[k] = round(time.time()-t0))
                stmts = [closer]
            if not _region_has_op_call(stmts):
                problems.append(
                    f"{os.path.relpath(path, REPO)}: timed region `{var}` "
                    f"(line {stmts[0].lineno}) contains only a sink on a "
                    "pre-built frame — the op call is outside the stopwatch"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    print("== screen 1/2: gate output types (audit_gate_types schema pass)")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "audit_gate_types.py"), sf_dir],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    tail = "\n".join(r.stdout.strip().splitlines()[-6:])
    print(tail)
    types_ok = r.returncode == 0
    if not types_ok:
        print("FAIL: hasher-risky gate output (see above)")

    print("== screen 2/2: bench timing-boundary lint")
    problems = lint_timing_boundaries()
    for p in problems:
        print(f"FAIL: {p}")
    if not problems:
        print("all stopwatch regions contain their op call")

    ok = types_ok and not problems
    print("PRE-SNAPSHOT CHECK:", "GREEN" if ok else "RED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
