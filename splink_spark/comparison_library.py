"""Top-level comparison library (mirrors ``splink.comparison_library`` —
reference splink/comparison_library.py re-exports the internals module so
``import splink.comparison_library as cl`` works as a real submodule)."""

from .internals.comparison_library import *  # noqa: F401,F403
