"""BPE train/apply: parity with an independent naive reference
implementation, determinism, and round-trip properties."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from splink_spark.pipeline.bpe import (
    _EOW,
    bpe_apply,
    bpe_encode_word,
    bpe_train,
    word_counts,
)


def naive_bpe_train(word_count: dict[str, int], num_merges: int,
                    min_pair_count: int = 2):
    """Textbook O(V * merges) reference: recount every pair each step."""
    words = {w: (tuple(w) + (_EOW,), n) for w, n in word_count.items()}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms, n in words.values():
            for p in zip(syms, syms[1:]):
                pc[p] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        out = {}
        for w, (syms, n) in words.items():
            new = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
                    new.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            out[w] = (tuple(new), n)
        words = out
    return merges


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "low lower newest widest new"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_bpe_train_matches_naive_reference(docs):
    wc = {
        r["word"]: r["count"] for r in word_counts(docs).collect()
    }
    want = naive_bpe_train(wc, 12)
    got = bpe_train(docs, num_merges=12)
    assert got == want


def test_bpe_train_deterministic(docs):
    assert bpe_train(docs, num_merges=8) == bpe_train(docs, num_merges=8)


def test_bpe_encode_word_greedy_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", _EOW), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert bpe_encode_word("low", ranks) == ["low", _EOW]
    # unknown word falls back to characters + EOW
    assert bpe_encode_word("zzz", {}) == ["z", "z", "z", _EOW]


def test_bpe_apply_round_trips_text(docs):
    merges = bpe_train(docs, num_merges=20)
    out = bpe_apply(docs, merges).collect()
    assert len(out) == len(CORPUS)
    by_id = {r["doc_id"]: r for r in out}
    for doc_id, text in CORPUS:
        toks = by_id[doc_id]["bpe_tokens"]
        assert by_id[doc_id]["n_bpe_tokens"] == len(toks)
        # re-joining tokens and splitting on the EOW marker reconstructs
        # the lowercased words exactly (BPE is lossless)
        rebuilt = "".join(toks).split(_EOW)
        assert [w for w in rebuilt if w] == text.lower().split()


def test_bpe_apply_consistent_with_encoder(docs):
    merges = bpe_train(docs, num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    row = bpe_apply(docs.where("doc_id = 1"), merges).collect()[0]
    want = [
        t for w in "lower lower newest newest".split()
        for t in bpe_encode_word(w, ranks)
    ]
    assert row["bpe_tokens"] == want


def test_bpe_apply_plan_is_single_arrow_stage(docs):
    merges = bpe_train(docs, num_merges=5)
    plan = (
        bpe_apply(docs, merges)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # pure map: no shuffle


def test_compression_ratio_orders_repetitive_below_prose(spark):
    from splink_spark.pipeline.text import compression_ratio

    rows = [
        (0, "spam " * 400),                      # degenerate repetition
        (1, "the quick brown fox jumps over the lazy dog and then "
            "wanders through seventeen distinct meadows describing "
            "each flower it encounters in novel unrepeated words " * 4),
        (2, ""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert out[0]["compression_ratio"] < 0.05
    assert out[1]["compression_ratio"] > out[0]["compression_ratio"] * 3
    assert out[2]["compression_ratio"] is None and out[2]["raw_bytes"] == 0
    assert out[3]["compression_ratio"] is None
    # exact zlib parity with the local library
    import zlib
    t = rows[1][1].encode("utf-8")
    assert out[1]["compressed_bytes"] == len(zlib.compress(t, 6))
    plan = compression_ratio(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Exchange" not in plan


def test_bpe_apply_preserves_string_doc_ids(spark):
    """Non-int64 document ids (string UUIDs) must survive the Arrow
    round-trip — the output schema derives the id type from the input."""
    docs = spark.createDataFrame(
        [("u-9", "low low"), ("u-10", "newest low")], "doc_id string, text string"
    )
    merges = bpe_train(docs, num_merges=3)
    out = {r["doc_id"]: r for r in bpe_apply(docs, merges).collect()}
    assert set(out) == {"u-9", "u-10"}
    assert out["u-9"]["n_bpe_tokens"] == len(out["u-9"]["bpe_tokens"])


def test_compression_ratio_preserves_string_doc_ids(spark):
    from splink_spark.pipeline.text import compression_ratio

    df = spark.createDataFrame(
        [("u-1", "hello hello hello")], "doc_id string, text string"
    )
    row = compression_ratio(df).collect()[0]
    assert row["doc_id"] == "u-1" and row["raw_bytes"] > 0
