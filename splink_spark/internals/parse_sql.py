"""Column extraction from SQL expression strings, without a SQL parser.

Reference: splink/internals/parse_sql.py — ``get_columns_used_from_sql(sql,
retain_table_prefix=False)`` walks a sqlglot AST, skipping every column that
sits inside a lambda body and every function name, keeping the base
identifier of bracket access (``col['key']`` -> ``col``).  sqlglot is not in
this environment, so this module reproduces those semantics with a
tokenizer:

1. blank out string literals (single-quoted, with ``''`` escapes),
2. blank out lambda parameter lists and bodies (``x -> ...`` and
   ``(x, y) -> ...``; a body runs until the first comma at the arrow's
   paren depth or until the enclosing call closes — matching sqlglot's
   "any ancestor is a Lambda" skip),
3. scan the rest for identifiers, dropping function names (identifier
   followed by ``(``), SQL keywords, type names (anything after ``AS`` or
   ``::``), and numeric literals.

Dotted identifiers (``mytable.surname_l``) return just the column name by
default, or ``table.column`` with ``retain_table_prefix=True`` — exactly the
reference's behaviour on its own test matrix (tests/test_columns_used.py).
"""

from __future__ import annotations

import re

_KEYWORDS = {
    "and", "or", "not", "as", "case", "when", "then", "else", "end", "null",
    "true", "false", "like", "ilike", "rlike", "in", "is", "between",
    "distinct", "cast", "try_cast", "interval", "exists", "all", "any",
    "some", "escape", "on", "using", "from", "where", "select", "group",
    "by", "order", "having", "limit", "asc", "desc", "over", "partition",
    "rows", "range", "preceding", "following", "current", "row", "unbounded",
    # type names (also excluded structurally after AS / ::)
    "int", "integer", "bigint", "smallint", "tinyint", "float", "real",
    "double", "decimal", "numeric", "varchar", "char", "string", "text",
    "date", "timestamp", "time", "boolean", "bool", "binary", "array",
    "map", "struct", "precision",
}

_IDENT = r"[A-Za-z_][A-Za-z_0-9]*"


def _blank_string_literals(sql: str) -> str:
    """Replace the contents of single-quoted literals with spaces (keep
    length so offsets stay stable)."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":  # '' escape
                        j += 2
                        continue
                    break
                j += 1
            out.append(" " * (min(j, n - 1) - i + 1))
            i = min(j, n - 1) + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _blank_lambdas(sql: str) -> str:
    """Blank every lambda parameter list and body.

    The body of ``args -> expr`` extends until the first ``,`` at the
    arrow's paren depth, or until depth drops below it (the enclosing
    call's ``)``).  Iterate because blanking can expose nothing new —
    lambdas nested inside lambda bodies are blanked along with the body.
    """
    chars = list(sql)
    n = len(chars)
    # paren depth at each position
    depth = [0] * n
    d = 0
    for i, ch in enumerate(chars):
        if ch == "(":
            d += 1
        elif ch == ")":
            d -= 1
        depth[i] = d

    s = "".join(chars)
    for m in re.finditer(r"->", s):
        a = m.start()
        if a > 0 and s[a - 1] == "-":  # part of '-->' (not SQL, but be safe)
            continue
        # find the parameter span ending just before the arrow
        k = a - 1
        while k >= 0 and s[k].isspace():
            k -= 1
        if k < 0:
            continue
        if s[k] == ")":
            # parenthesised param list: walk back to its matching '('
            bal = 0
            p = k
            while p >= 0:
                if s[p] == ")":
                    bal += 1
                elif s[p] == "(":
                    bal -= 1
                    if bal == 0:
                        break
                p -= 1
            param_start = max(p, 0)
        else:
            p = k
            while p >= 0 and (s[p].isalnum() or s[p] == "_"):
                p -= 1
            param_start = p + 1
        # body: from after the arrow to the first ',' at the arrow's depth
        # or where depth drops below it
        d_arrow = depth[a]
        j = m.end()
        while j < n:
            if chars[j] == "," and depth[j] == d_arrow:
                break
            if depth[j] < d_arrow:
                break
            j += 1
        for idx in range(param_start, j):
            if chars[idx] not in "(),":
                chars[idx] = " "
    return "".join(chars)


def get_columns_used_from_sql(
    sql: str, sqlglot_dialect: str | None = None, retain_table_prefix: bool = False
) -> list[str]:
    """Every base column an SQL expression reads.

    Matches the reference's sqlglot walk on its test matrix: function
    names, lambda parameters/bodies, string-literal map keys, numeric
    literals and cast targets are excluded; ``table.column`` keeps the
    prefix only when ``retain_table_prefix=True``.  ``sqlglot_dialect`` is
    accepted for signature parity and ignored (the tokenizer is
    dialect-agnostic).
    """
    s = _blank_string_literals(sql)
    s = _blank_lambdas(s)
    # blank cast targets: `:: type` and `AS type` inside CAST(...)
    s = re.sub(r"::\s*" + _IDENT, " ", s)

    cols: list[str] = []
    seen = set()
    prev_word_as = False
    for m in re.finditer(r"(%s)(\s*\.\s*(%s))?" % (_IDENT, _IDENT), s):
        whole = m.group(0)
        first, dotted = m.group(1), m.group(3)
        lowered_first = first.lower()
        # token directly after AS is an alias or cast type, never a column
        if prev_word_as:
            prev_word_as = lowered_first == "as"
            continue
        prev_word_as = (dotted or first).lower() == "as" or (
            not dotted and lowered_first == "as"
        )
        if lowered_first == "as":
            continue
        # function call?  (identifier, or table.func, followed by '(')
        tail = s[m.end():]
        if re.match(r"\s*\(", tail):
            continue
        if dotted:
            if dotted.lower() in _KEYWORDS and not retain_table_prefix:
                continue
            name = f"{first}.{dotted}" if retain_table_prefix else dotted
        else:
            if lowered_first in _KEYWORDS:
                continue
            name = first
        if name not in seen:
            seen.add(name)
            cols.append(name)
    return cols
