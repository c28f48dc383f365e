"""Top-level comparison-level library (mirrors
``splink.comparison_level_library`` as a real importable submodule)."""

from .internals.comparison_level_library import *  # noqa: F401,F403
