"""Phonetic encodings: double metaphone (+ soundex via native Spark).

Replaces the reference jar's ``Dmetaphone`` / ``DmetaphoneAlt`` UDFs
(spark/jar_location.py:52-54). This is a compact from-scratch double
metaphone covering the principal English rules (Philips 2000); it is not a
rule-for-rule port of any existing implementation, so codes can differ from
other libraries on exotic words — pinned by literal tests on common names.
Soundex needs no UDF at all: ``F.soundex`` is native JVM.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

VOWELS = set("AEIOUY")


def double_metaphone(word: str, max_len: int = 4) -> tuple[str, str]:
    """Return (primary, alternate) codes."""
    if not word:
        return "", ""
    w = "".join(ch for ch in word.upper() if ch.isalpha())
    if not w:
        return "", ""
    n = len(w)
    primary: list[str] = []
    alternate: list[str] = []

    def add(p: str, a: str | None = None) -> None:
        primary.append(p)
        alternate.append(p if a is None else a)

    i = 0
    # initial-letter exceptions
    if w[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    elif w[0] == "X":
        add("S")
        i = 1
    elif w[0] in VOWELS:
        add("A")
        i = 1

    while i < n and (len(primary) < max_len or len(alternate) < max_len):
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        prev = w[i - 1] if i > 0 else ""

        if c in VOWELS:
            i += 1
            continue
        if c == "B":
            add("P")
            i += 2 if nxt == "B" else 1
        elif c == "C":
            if w[i:i + 2] == "CH":
                # CHR-, initial CH mostly K; otherwise X (church) / K (chorus)
                if i == 0 and w[i:i + 4] in ("CHIA",) or w[i:i + 3] == "CHR":
                    add("K")
                elif i == 0:
                    add("X", "K")
                elif w[max(0, i - 1):i] in VOWELS and w[i + 2:i + 3]:
                    add("X", "K")
                else:
                    add("X", "K")
                i += 2
            elif w[i:i + 2] in ("CI", "CE", "CY"):
                add("S")
                i += 2 if w[i:i + 2] == "CC" else 1
            elif w[i:i + 2] == "CK":
                add("K")
                i += 2
            elif w[i:i + 2] == "CC":
                add("K")
                i += 2
            else:
                add("K")
                i += 1
        elif c == "D":
            if w[i:i + 2] == "DG":
                if w[i + 2:i + 3] in ("I", "E", "Y"):
                    add("J")  # edge
                    i += 3
                else:
                    add("TK")
                    i += 2
            else:
                add("T")
                i += 2 if nxt in ("D", "T") else 1
        elif c == "F":
            add("F")
            i += 2 if nxt == "F" else 1
        elif c == "G":
            if nxt == "H":
                if i > 0 and w[i - 1] not in VOWELS:
                    add("K")
                elif i == 0:
                    add("K")
                else:
                    pass  # silent gh (night, weigh)
                i += 2
            elif nxt == "N":
                if i == 0:
                    add("KN", "N")
                else:
                    add("KN", "N")
                i += 2
            elif nxt in ("I", "E", "Y"):
                add("J", "K")
                i += 2
            else:
                add("K")
                i += 2 if nxt == "G" else 1
        elif c == "H":
            # keep h between vowels or at start before vowel
            if (i == 0 or prev in VOWELS) and nxt in VOWELS:
                add("H")
            i += 1
        elif c == "J":
            if i == 0:
                add("J", "A")  # jose-ish alternate
            else:
                add("J", "H")
            i += 2 if nxt == "J" else 1
        elif c == "K":
            add("K")
            i += 2 if nxt == "K" else 1
        elif c == "L":
            add("L")
            i += 2 if nxt == "L" else 1
        elif c == "M":
            add("M")
            i += 2 if nxt == "M" or (w[i - 1:i + 2] == "UMB") else 1
        elif c == "N":
            add("N")
            i += 2 if nxt == "N" else 1
        elif c == "P":
            if nxt == "H":
                add("F")
                i += 2
            else:
                add("P")
                i += 2 if nxt in ("P", "B") else 1
        elif c == "Q":
            add("K")
            i += 2 if nxt == "Q" else 1
        elif c == "R":
            add("R")
            i += 2 if nxt == "R" else 1
        elif c == "S":
            if w[i:i + 2] == "SH":
                add("X")
                i += 2
            elif w[i:i + 3] in ("SIO", "SIA"):
                add("S", "X")
                i += 1
            elif w[i:i + 2] == "SC":
                if w[i + 2:i + 3] == "H":
                    add("X", "SK")
                    i += 3
                elif w[i + 2:i + 3] in ("I", "E", "Y"):
                    add("S")
                    i += 3
                else:
                    add("SK")
                    i += 3
            else:
                add("S")
                i += 2 if nxt in ("S", "Z") else 1
        elif c == "T":
            if w[i:i + 2] == "TH":
                add("0")  # theta
                i += 2
            elif w[i:i + 3] in ("TIO", "TIA"):
                add("X")
                i += 1
            else:
                add("T")
                i += 2 if nxt in ("T", "D") else 1
        elif c == "V":
            add("F")
            i += 2 if nxt == "V" else 1
        elif c == "W":
            if nxt in VOWELS:
                add("W", "F" if i == 0 else "W")
                i += 1
            else:
                i += 1  # silent
        elif c == "X":
            add("KS")
            i += 2 if nxt in ("C", "X") else 1
        elif c == "Y":
            if nxt in VOWELS:
                add("A")
            i += 1
        elif c == "Z":
            add("S", "TS" if prev else "S")
            i += 2 if nxt == "Z" else 1
        else:
            i += 1

    return "".join(primary)[:max_len], "".join(alternate)[:max_len]


@pandas_udf(ArrayType(StringType()))
def dmetaphone_udf(s: pd.Series) -> pd.Series:
    out = []
    for v in s:
        if v is None:
            out.append(None)
        else:
            p, a = double_metaphone(str(v))
            out.append([p, a] if a != p else [p])
    return pd.Series(out)


def soundex(col: Column) -> Column:
    """Native JVM soundex — no UDF needed."""
    return F.soundex(col)


def qgram_tokenise(col: Column, q: int = 2) -> Column:
    """Replaces the jar's ``QgramTokeniser`` (jar_location.py:58): distinct
    q-grams via native higher-order functions."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - (q - 1), F.lit(1))),
            lambda i: F.substring(col, i, q),
        )
    )
