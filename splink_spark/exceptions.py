"""Exception hierarchy mirroring the reference's
``splink/internals/exceptions.py:10-44`` so user code that catches splink's
exception types keeps working.

The classes multiply-inherit ``ValueError`` where this engine historically
raised ``ValueError`` for the same condition — ``except ValueError`` and
``except SplinkException`` both keep catching.
"""

from __future__ import annotations

__all__ = [
    "SplinkException",
    "EMTrainingException",
    "ComparisonSettingsException",
    "MissingDependencyException",
    "InvalidDialect",
    "SplinkDeprecated",
]


class SplinkException(Exception):
    """Base class for all splink errors (reference exceptions.py:11)."""


class EMTrainingException(SplinkException, ValueError):
    """EM session cannot proceed — e.g. every comparison was deactivated by
    the training blocking rule (reference exceptions.py:19)."""


class ComparisonSettingsException(SplinkException, ValueError):
    """Invalid comparison/settings composition (reference exceptions.py:27)."""


class MissingDependencyException(SplinkException, ImportError):
    """An optional dependency needed by the requested feature is absent
    (reference exceptions.py:23)."""


class InvalidDialect(SplinkException, ValueError):
    """A settings dict names a SQL dialect this engine cannot execute
    (reference exceptions.py:41)."""


class SplinkDeprecated(DeprecationWarning):
    """Deprecation category for staged API removals (reference
    exceptions.py:37)."""
