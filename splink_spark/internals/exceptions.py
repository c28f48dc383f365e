"""Reference import-path parity: ``splink.internals.exceptions`` is where
the reference defines these (exceptions.py:10-44)."""

from ..exceptions import (  # noqa: F401
    ComparisonSettingsException,
    EMTrainingException,
    InvalidDialect,
    MissingDependencyException,
    SplinkDeprecated,
    SplinkException,
)
