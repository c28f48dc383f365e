"""Top-level blocking-rule library (mirrors ``splink.blocking_rule_library``:
reference splink/blocking_rule_library.py exports block_on / CustomRule /
And / Not; Or, cross_rule and exploding_rule are the internals extras)."""

from .internals.blocking import (  # noqa: F401
    And,
    BlockingRule,
    CustomRule,
    Not,
    Or,
    block_on,
    cross_rule,
    exploding_rule,
)

__all__ = [
    "And",
    "BlockingRule",
    "CustomRule",
    "Not",
    "Or",
    "block_on",
    "cross_rule",
    "exploding_rule",
]
