"""Lazy column-transform chains applied before comparison.

Reference semantics: splink/internals/column_expression.py:23-367 — a
``ColumnExpression`` is a column name plus an ordered chain of transforms
(lower, substr, regex_extract, nullif, try-parse date/timestamp, cast,
first/last array element) that is applied to the ``_l``/``_r`` suffixed
variants of the column at comparison time.

Native rewrite: each transform is a ``Column -> Column`` function composed in
Python; no SQL strings, no dialects.
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

Transform = Callable[[Column], Column]


class ColumnExpression:
    """A column reference plus a chain of pre-comparison transforms.

    ``spec`` records the transform chain as (method_name, args) tuples so the
    expression is JSON-serializable (model save/load round trip).
    """

    def __init__(
        self,
        name: str,
        transforms: tuple[Transform, ...] = (),
        spec: tuple[tuple, ...] = (),
    ):
        self.name = name
        self.transforms = transforms
        self.spec = spec

    # -- construction helpers -------------------------------------------------
    @staticmethod
    def instantiate(spec: Union[str, "ColumnExpression"]) -> "ColumnExpression":
        if isinstance(spec, ColumnExpression):
            return spec
        return ColumnExpression(spec)

    def as_dict(self) -> dict:
        return {"name": self.name, "transforms": [list(t) for t in self.spec]}

    @staticmethod
    def from_dict(d: Union[str, dict]) -> "ColumnExpression":
        if isinstance(d, str):
            return ColumnExpression(d)
        ce = ColumnExpression(d["name"])
        for method, *args in d.get("transforms", []):
            args = args[0] if len(args) == 1 and isinstance(args[0], list) else args
            ce = getattr(ce, method)(*args)
        return ce

    def _with(self, fn: Transform, method: str, *args) -> "ColumnExpression":
        return ColumnExpression(
            self.name, self.transforms + (fn,), self.spec + ((method, list(args)),)
        )

    # -- transform library (reference column_expression.py:115-310) -----------
    def lower(self) -> "ColumnExpression":
        return self._with(F.lower, "lower")

    def upper(self) -> "ColumnExpression":
        return self._with(F.upper, "upper")

    def substr(self, start: int, length: int) -> "ColumnExpression":
        return self._with(lambda c: F.substring(c, start, length), "substr", start, length)

    def cast_to_string(self) -> "ColumnExpression":
        return self._with(lambda c: c.cast("string"), "cast_to_string")

    def regex_extract(self, pattern: str, capture_group: int = 0) -> "ColumnExpression":
        # empty capture -> NULL, mirroring reference dialects.py:208-249
        return self._with(
            lambda c: F.nullif(F.regexp_extract(c, pattern, capture_group), F.lit("")),
            "regex_extract", pattern, capture_group,
        )

    def nullif(self, value) -> "ColumnExpression":
        return self._with(lambda c: F.nullif(c, F.lit(value)), "nullif", value)

    def try_parse_date(self, fmt: str = "yyyy-MM-dd") -> "ColumnExpression":
        # Spark impl in reference dialects.py:481-491: date(try_to_timestamp(c, fmt))
        return self._with(
            lambda c: F.try_to_timestamp(c, F.lit(fmt)).cast("date"),
            "try_parse_date", fmt,
        )

    def try_parse_timestamp(self, fmt: str = "yyyy-MM-dd HH:mm:ss") -> "ColumnExpression":
        return self._with(
            lambda c: F.try_to_timestamp(c, F.lit(fmt)), "try_parse_timestamp", fmt
        )

    def access_extreme_array_element(self, first_or_last: str) -> "ColumnExpression":
        if first_or_last not in ("first", "last"):
            raise ValueError("first_or_last must be 'first' or 'last'")
        idx = 1 if first_or_last == "first" else -1
        return self._with(
            lambda c: F.element_at(c, idx), "access_extreme_array_element", first_or_last
        )

    def struct_field(self, field: str) -> "ColumnExpression":
        return self._with(lambda c: c.getField(field), "struct_field", field)

    # -- application -----------------------------------------------------------
    def apply(self, col: Column) -> Column:
        for t in self.transforms:
            col = t(col)
        return col

    def on(self, column_name: str) -> Column:
        return self.apply(F.col(column_name))

    def l(self) -> Column:
        return self.on(f"{self.name}_l")

    def r(self) -> Column:
        return self.on(f"{self.name}_r")

    @property
    def is_pure_column_reference(self) -> bool:
        return not self.transforms

    def __repr__(self) -> str:  # pragma: no cover
        return f"ColumnExpression({self.name!r}, {len(self.transforms)} transforms)"
