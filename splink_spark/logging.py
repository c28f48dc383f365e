"""Import-path facade (reference parity: splink/logging.py)."""

from .internals.splink_logging import (  # noqa: F401
    PIPELINE,
    SQL,
    VERBOSE,
    disable,
    enable,
)

__all__ = ["disable", "enable", "PIPELINE", "SQL", "VERBOSE"]
