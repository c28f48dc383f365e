"""Import-path parity for ``from splink.internals.realtime import
compare_records`` (reference internals/realtime.py:44-159): the
implementation lives in :mod:`splink_spark.realtime`."""

from ..realtime import compare_records

__all__ = ["compare_records"]
