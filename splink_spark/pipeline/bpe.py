"""Byte-pair encoding: train a merge table from a corpus and tokenize with
it — the real-tokenizer arm of the text stack (``text.bpe_ish_token_count``
is the regex estimate; this is the exact thing).

Scale design mirrors how production BPE trainers (SentencePiece, HF
tokenizers) actually work: the corpus-sized stage is ONE word-count
aggregation (map-side combined shuffle, output bounded by the distinct
vocabulary), and the merge loop runs over that weighted word list — here
driver-side on the collected (word, count) pairs, the same bounded-collect
precedent as the k-means centroids. The corpus is never rescanned per
merge. Tokenization is an Arrow-batched ``mapInPandas`` (BPE's iterative
merge application has no Column-expression form) with a per-batch word
cache, so each DISTINCT word in a batch is encoded once.

No external tokenizer libraries: the merge rules live in a plain
DataFrame-serializable list, and the pure-Python encoder is ~20 lines.
"""

from __future__ import annotations

import heapq
from collections import Counter, defaultdict
from typing import Iterable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_apply", "bpe_encode_word"]

_EOW = "</w>"  # end-of-word marker, standard BPE word boundary


def word_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """The one corpus-sized stage: whitespace word counts (map-side combined;
    output rows = |vocabulary|)."""
    c = F.trim(F.col(text_col))
    if lowercase:
        c = F.lower(c)
    toks = F.split(c, r"\s+")
    return (
        df.where(F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0))
        .select(F.explode(toks).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(symbols):
        if i < len(symbols) - 1 and (symbols[i], symbols[i + 1]) == pair:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def bpe_train(
    df: DataFrame,
    num_merges: int = 1000,
    text_col: str = "text",
    lowercase: bool = True,
    max_words: int = 1_000_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from the corpus.

    The driver holds only the top-``max_words`` (word, count) pairs by
    count (ties broken by word for determinism) — bounded state, like the
    reference pattern of collecting only k-means centroids. Each merge
    picks the most frequent adjacent symbol pair (count desc, pair asc —
    fully deterministic) and rewrites the affected words incrementally.
    Returns the ordered merge list; rank = list index.
    """
    wc = word_counts(df, text_col, lowercase)
    rows = (
        wc.orderBy(F.desc("count"), F.asc("word")).limit(max_words).collect()
    )
    # word -> (symbols tuple, count)
    words: dict[int, tuple[tuple, int]] = {
        i: (tuple(r["word"]) + (_EOW,), r["count"]) for i, r in enumerate(rows)
    }
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple, set] = defaultdict(set)
    for wid, (syms, n) in words.items():
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += n
            pair_words[(a, b)].add(wid)

    merges: list[tuple[str, str]] = []
    # lazy-deletion heap keyed by (-count, pair) for deterministic argmax
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    while len(merges) < num_merges and heap:
        negc, pair = heapq.heappop(heap)
        c = pair_counts.get(pair, 0)
        if c != -negc:  # stale entry
            if c > 0:
                heapq.heappush(heap, (-c, pair))
            continue
        if c < min_pair_count:
            break
        merges.append(pair)
        touched = set()
        for wid in list(pair_words[pair]):
            syms, n = words[wid]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= n
                pair_words[(a, b)].discard(wid)
            new = _merge_word(syms, pair)
            words[wid] = (new, n)
            for a, b in zip(new, new[1:]):
                pair_counts[(a, b)] += n
                pair_words[(a, b)].add(wid)
                touched.add((a, b))
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
        for p in touched:
            if pair_counts.get(p, 0) > 0:
                heapq.heappush(heap, (-pair_counts[p], p))
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a rank table: repeatedly apply the
    lowest-ranked applicable merge (the canonical greedy BPE encoder)."""
    syms = tuple(word) + (_EOW,)
    while len(syms) > 1:
        best = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best is None or r < best[0]):
                best = (r, p)
        if best is None:
            break
        syms = _merge_word(syms, best[1])
    return list(syms)


def bpe_apply(
    df: DataFrame,
    merges: Iterable[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    tokens_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize every document with a trained merge table. Arrow-batched
    ``mapInPandas``; the rank dict ships once per task via closure
    serialization (a merge table is a few MB at most), and a per-batch word
    cache encodes each distinct word once — on natural text that saves the
    large majority of encoder calls. Adds ``tokens_col``
    (array<string>) and ``n_bpe_tokens``."""
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # the id column keeps its INPUT type (string UUIDs etc., not just int64)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, {tokens_col} array<string>, n_bpe_tokens int"

    def encode_partition(batches: Iterator) -> Iterator:
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = bpe_encode_word(w, ranks)
                cache[w] = got
            return got

        for pdf in batches:
            texts = pdf[text_col].fillna("")
            if lowercase:
                texts = texts.str.lower()
            toks = [
                [t for w in txt.split() for t in enc_word(w)] for txt in texts
            ]
            yield pdf.assign(
                **{tokens_col: toks, "n_bpe_tokens": [len(t) for t in toks]}
            )[[id_col, tokens_col, "n_bpe_tokens"]]

    return df.select(id_col, text_col).mapInPandas(encode_partition, out_schema)
