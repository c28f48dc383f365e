"""Library logging controls (reference parity: splink/internals/
splink_logging.py — custom levels VERBOSE/PIPELINE/SQL plus enable/disable
helpers that manage only the library's own handler, never root logging).

Engine log lines go through ``logging.getLogger("splink_spark")``; call
``enable(level)`` to see them, ``disable()`` to remove the default handler
without touching any handler the application installed itself.
"""

from __future__ import annotations

import logging
import sys
from typing import Optional, TextIO, Union

VERBOSE = 15
PIPELINE = 7
SQL = 5

_LOGGER_NAME = "splink_spark"
_DEFAULT_MARK = "_splink_spark_default_handler"

logging.addLevelName(VERBOSE, "VERBOSE")
logging.addLevelName(PIPELINE, "PIPELINE")
logging.addLevelName(SQL, "SQL")


def enable(
    level: Union[int, str] = logging.INFO,
    *,
    stream: Optional[TextIO] = None,
    fmt: str = "%(message)s",
) -> None:
    """Turn on library log output at ``level``. Installs one stream handler
    on the library logger (marked, so disable() can find it) and stops
    propagation so messages are not double-printed through root."""
    if isinstance(level, bool):
        raise TypeError("level must be an int or str logging level")
    lg = logging.getLogger(_LOGGER_NAME)
    lg.setLevel(level)
    if any(getattr(h, _DEFAULT_MARK, False) for h in lg.handlers):
        return
    handler = logging.StreamHandler(stream or sys.stderr)
    handler.setFormatter(logging.Formatter(fmt))
    setattr(handler, _DEFAULT_MARK, True)
    lg.addHandler(handler)
    lg.propagate = False


def disable() -> None:
    """Remove the handler enable() installed; user handlers are untouched.
    Propagation is restored when no handlers remain."""
    lg = logging.getLogger(_LOGGER_NAME)
    for handler in list(lg.handlers):
        if getattr(handler, _DEFAULT_MARK, False):
            lg.removeHandler(handler)
            handler.close()
    if not lg.handlers:
        lg.propagate = True
