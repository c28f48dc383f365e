"""Tests for the LLM-data-pipeline operators (dedup, ANN, text, multimodal)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from splink_spark.pipeline import ann, dedup, multimodal, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (2, "the quick brown fox jumped over the lazy dog", "en"),  # near dup
        (3, "completely different content here about sparks", "en"),
        (4, "pack my box with five dozen liquor jugs", "en"),
        (5, "The Quick Brown Fox... jumps over the lazy dog!!", "en"),  # fp-dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_duplicates(spark, docs):
    out = {r["doc_id"]: r["canonical_id"] for r in dedup.exact_duplicates(docs).collect()}
    assert out[1] == 0 and out[0] == 0
    assert out[2] == 2 and out[3] == 3


def test_fingerprint_normalises(spark, docs):
    out = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs).collect()}
    assert out[0] == out[1]
    assert out[0] == out[5], "case/punct-insensitive fingerprint"
    assert out[0] != out[2]


def test_rolling_hash_fingerprint(spark, docs):
    out = {
        r["doc_id"]: r["fingerprint_hash"]
        for r in text.rolling_hash_fingerprint(docs).collect()
    }
    assert out[0] == out[1]  # identical text, identical fingerprint
    assert out[0] != out[3]

    # exact python cross-check of the Horner hash on one document
    t = "the quick brown fox jumps over the lazy dog"
    def h(s):
        acc = 0
        for ch in s:
            acc = acc * 31 + ord(ch)
        return acc
    expected = min(h(t[p : p + 8]) for p in range(len(t) - 7))
    assert out[0] == expected

    # short / null documents fall to the -1 sentinel (real hashes are >= 0)
    extra = spark.createDataFrame([(10, "short"), (11, None)], ["doc_id", "text"])
    sent = {r["doc_id"]: r["fingerprint_hash"]
            for r in text.rolling_hash_fingerprint(extra).collect()}
    assert sent[10] == sent[11] == -1
    assert all(v >= 0 for k, v in out.items())


def test_ngram_jaccard(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, block_cols=["lang"]).collect()
    d = {(r["doc_id_l"], r["doc_id_r"]): r["jaccard"] for r in pairs}
    assert d[(0, 1)] == pytest.approx(1.0)
    assert d[(0, 2)] > 0.8
    assert (0, 3) not in d


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, shingle_size=4, jaccard_threshold=0.5, n=3
    ).collect()
    found = {(r["doc_id_l"], r["doc_id_r"]) for r in pairs}
    assert (0, 1) in found
    assert (0, 2) in found
    assert (0, 3) not in found


def test_minhash_estimates_jaccard(spark, docs):
    """MinHash signature agreement rate ~ true shingle jaccard."""
    sigs = {r["doc_id"]: r["minhash"] for r in dedup.minhash_signatures(
        docs, num_hashes=128, shingle_size=4).collect()}
    agree = sum(a == b for a, b in zip(sigs[0], sigs[2])) / 128
    grams = lambda s: {s[i:i+4] for i in range(len(s) - 3)}  # noqa: E731
    g0, g2 = grams("the quick brown fox jumps over the lazy dog"), grams(
        "the quick brown fox jumped over the lazy dog")
    true_j = len(g0 & g2) / len(g0 | g2)
    assert agree == pytest.approx(true_j, abs=0.15)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = random.Random(0)
    rows = []
    for i in range(100):
        v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, v, i % 3))
    # vec 100 = vec 0 scaled (cosine 1.0)
    rows.append((100, [2 * x for x in rows[0][1]], 0))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_brute_force_topk(spark, vectors):
    out = ann.brute_force_topk(vectors, vectors.where(F.col("vec_id") == 0), k=3)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rows[0]["neighbour_id"] == 100
    assert rows[0]["cosine_sim"] == pytest.approx(1.0)
    assert len(rows) == 3
    # verify rank-2 against a python oracle
    import itertools

    data = {r["vec_id"]: r["embedding"] for r in vectors.collect()}
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / math.sqrt(sum(x * x for x in a)) / math.sqrt(sum(x * x for x in b))
    sims = sorted(
        ((cos(data[0], v), k) for k, v in data.items() if k != 0), reverse=True
    )
    assert rows[1]["neighbour_id"] == sims[1][1]


def test_lsh_topk_recall(spark, vectors):
    exact = ann.brute_force_topk(vectors, vectors.where(F.col("vec_id") < 5), k=5)
    # random gaussian vectors: neighbours sit at cosine ~0.4, so collision
    # P/table = (1 - theta/pi)^planes ~ 0.16 with 4 planes; 16 tables -> ~94%
    approx = ann.lsh_topk(
        vectors, vectors.where(F.col("vec_id") < 5), k=5, num_planes=4, num_tables=16
    )
    e = {(r["query_id"], r["neighbour_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbour_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # the scaled twin must be found
    assert (0, 100) in a


def test_quality_and_tokens(spark, docs):
    m = {r["doc_id"]: r for r in text.quality_metrics(docs).collect()}
    assert m[0]["n_tokens"] == 9
    assert m[0]["stopword_ratio"] == pytest.approx(2 / 9)  # the, the
    assert m[5]["punct_ratio"] > 0
    q = {r["doc_id"]: r["quality_score"] for r in text.quality_score(docs).collect()}
    assert 0 <= min(q.values()) and max(q.values()) <= 1


def test_multimodal_plumbing(spark, docs):
    media = multimodal.documents_as_media(docs)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "media_type", "content", "width", "height", "duration_ms"
    ]
    feats = multimodal.extract_features(media).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[0]["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert by_id[0]["kind"] == "bytes"  # text bytes → labeled fallback kernel
    assert len(by_id[0]["feature"]) == 8
    # deterministic: identical input → identical features
    feats2 = multimodal.extract_features(media).collect()
    assert {r["media_id"]: r["feature"] for r in feats2} == {
        r["media_id"]: r["feature"] for r in feats
    }
    # codec formats (non-PNM) fail loudly on resize
    with pytest.raises(Exception):
        multimodal.resize_images(media, 100, 100).collect()


def _make_ppm(w, h):
    import numpy as np

    arr = (np.arange(w * h * 3, dtype=np.uint64) % 251).astype(np.uint8).reshape(h, w, 3)
    return multimodal.encode_pnm(arr), arr


def _make_wav(freq=440, rate=8000, secs=0.25):
    import io as _io
    import math
    import wave

    import numpy as np

    n = int(rate * secs)
    samples = (np.sin(2 * math.pi * freq * np.arange(n) / rate) * 20000).astype("<i2")
    buf = _io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue(), samples


def test_multimodal_real_decode(spark):
    """PPM images and WAV audio decode FOR REAL (no codec libs needed)."""
    import numpy as np

    ppm, arr = _make_ppm(10, 6)
    wav, samples = _make_wav()
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(ppm), 10, 6, None),
            (2, "audio", bytearray(wav), None, None, 250),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}

    img = feats[1]
    assert img["kind"] == "pnm"
    w, h, ch, mean, std = img["feature"][:5]
    assert (w, h, ch) == (10.0, 6.0, 3.0)
    assert mean == pytest.approx(float(arr.mean()), rel=1e-9)
    assert std == pytest.approx(float(arr.std()), rel=1e-9)

    aud = feats[2]
    assert aud["kind"] == "wav"
    rate, n, dur, rms = aud["feature"][:4]
    assert rate == 8000.0 and n == 2000.0
    assert dur == pytest.approx(0.25)
    # sine RMS = amplitude / sqrt(2)
    assert rms == pytest.approx((20000 / 32768.0) / np.sqrt(2), rel=0.01)

    # real nearest-neighbour resize round-trips through encode_pnm; the
    # audio row passes through a mixed table unchanged
    mixed = {r["media_id"]: r for r in multimodal.resize_images(media, 5, 3).collect()}
    assert bytes(mixed[2]["content"]) == wav and mixed[2]["width"] is None
    resized = mixed[1]
    assert (resized["width"], resized["height"]) == (5, 3)
    back = multimodal.decode_pnm(bytes(resized["content"]))
    assert back.shape == (3, 5, 3)
    rows = (np.arange(3) * 6 // 3).clip(0, 5)
    cols = (np.arange(5) * 10 // 5).clip(0, 9)
    assert np.array_equal(back, arr[rows][:, cols])


def test_frame_sampling(spark):
    media = spark.createDataFrame(
        [(1, "video", None, None, None, 3500)], multimodal.MEDIA_SCHEMA
    )
    frames = multimodal.sample_frames(media, every_ms=1000).collect()
    assert [r["frame_offset_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_ivf_topk(spark, vectors):
    exact = ann.brute_force_topk(vectors, vectors.where(F.col("vec_id") < 5), k=5)
    approx = ann.ivf_topk(
        vectors, vectors.where(F.col("vec_id") < 5), k=5, num_cells=8, nprobe=4
    )
    e = {(r["query_id"], r["neighbour_id"]) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r["query_id"], r["neighbour_id"]) for r in a_rows}
    # probing half the cells: decent recall, and the scaled twin must be found
    assert len(e & a) / len(e) >= 0.4
    assert (0, 100) in a
    # candidates only come from probed cells (bounded work per query)
    assert all(r["rank"] <= 5 for r in a_rows)


def test_ivf_topk_portable(spark, vectors):
    """The engine-portable (exact-int64 coarse quantizer) IVF: decent recall
    vs brute force, finds the engineered twin, and is exactly repeatable —
    the property the ann_ivf DuckDB oracle gate relies on."""
    exact = ann.brute_force_topk(vectors, vectors.where(F.col("vec_id") < 5), k=5)
    approx = ann.ivf_topk_portable(
        vectors, vectors.where(F.col("vec_id") < 5), k=5, num_cells=8, nprobe=4
    )
    e = {(r["query_id"], r["neighbour_id"]) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r["query_id"], r["neighbour_id"]) for r in a_rows}
    assert len(e & a) / len(e) >= 0.4
    assert (0, 100) in a
    rerun = ann.ivf_topk_portable(
        vectors, vectors.where(F.col("vec_id") < 5), k=5, num_cells=8, nprobe=4
    )
    assert sorted(map(tuple, a_rows)) == sorted(map(tuple, rerun.collect()))


def test_semantic_dedup(spark, vectors):
    """SemDeDup invariants: exactly one kept exemplar per group; a group
    never spans k-means clusters; the exemplar is the group member with the
    LOWEST centroid similarity (id tie-break); the engineered twin (vec 100
    = 2 * vec 0, cosine 1.0) lands in vec 0's group with vec 0 exemplar
    (lower centroid_sim or tie -> lower id wins only on ties, so assert
    same group, one kept)."""
    out = dedup.semantic_dedup(vectors, k=4, iterations=2, threshold=0.95)
    rows = out.collect()
    assert len(rows) == vectors.count()
    by_group = {}
    cluster_of = {}
    for r in rows:
        by_group.setdefault(r["group_id"], []).append(r)
        cluster_of[r["vec_id"]] = r["cluster"]
    for gid, members in by_group.items():
        kept = [m for m in members if m["is_kept"]]
        assert len(kept) == 1
        assert kept[0]["vec_id"] == members[0]["exemplar_id"]
        assert len({m["cluster"] for m in members}) == 1
        best = min(members, key=lambda m: (m["centroid_sim"], m["vec_id"]))
        assert kept[0]["vec_id"] == best["vec_id"]
    twin = {r["vec_id"]: r["group_id"] for r in rows}
    assert twin[0] == twin[100]
    # determinism: a rerun is identical (the oracle gate relies on this)
    rerun = dedup.semantic_dedup(vectors, k=4, iterations=2, threshold=0.95)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rerun.collect()))


def test_semantic_dedup_pair_kernel_matches_join_plan(spark, vectors, monkeypatch):
    """The per-cluster pair kernel (exact-int64 blocked matmul) must
    reproduce the join plan's pair set exactly: same unordered pairs,
    same l/r orientation (Spark least/greatest == the join's idl < idr),
    and therefore identical groups/exemplars. The forced join path is the
    SPLINK_SPARK_SEMDEDUP_KERNEL_MAX_CLUSTER=0 fallback that also serves
    pathologically-skewed clusters."""
    kernel = dedup.semantic_dedup(vectors, k=4, iterations=2, threshold=0.9)
    krows = sorted(map(tuple, kernel.collect()))
    monkeypatch.setenv("SPLINK_SPARK_SEMDEDUP_KERNEL_MAX_CLUSTER", "0")
    join = dedup.semantic_dedup(vectors, k=4, iterations=2, threshold=0.9)
    assert krows == sorted(map(tuple, join.collect()))
    # some group actually merged (the comparison is not vacuous)
    assert len({r[2] for r in krows}) < len(krows)


def test_semantic_dedup_auto_k(spark, vectors):
    """k=None (the default) sizes k from a count probe so sum(cluster²)
    stays ~linear in n; at this fixture's size the formula floors at 8 and
    the run must match an explicit k=8 run exactly."""
    from splink_spark.pipeline.dedup import _auto_k

    assert _auto_k(500, 4096) == 8  # floor
    assert _auto_k(1_000_000, 4096) == 245  # grows with n
    assert _auto_k(100_000_000_000, 4096) == 24_414_063  # 100 TB-ish corpus
    auto = dedup.semantic_dedup(vectors, iterations=2, threshold=0.95)
    explicit = dedup.semantic_dedup(vectors, k=8, iterations=2, threshold=0.95)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )


@pytest.fixture(scope="module")
def corpus(spark):
    """60 synthetic docs: 10 engineered near-dup pairs (one-word edits of a
    long base sentence) + 40 distinct filler docs — mirrors the testdata's
    similarity gap (near-dups >> threshold, everything else << threshold)."""
    rng = random.Random(5)
    words = ["alpha","bravo","charlie","delta","echo","foxtrot","golf","hotel",
             "india","juliet","kilo","lima","mike","november","oscar","papa"]
    rows = []
    did = 0
    for p in range(10):
        base = " ".join(rng.choices(words, k=30)) + f" pairtag{p}"
        edited = base.replace(base.split()[rng.randrange(5, 25)], "zulu", 1)
        rows.append((did, base, "en")); did += 1
        rows.append((did, edited, "en")); did += 1
    for _ in range(40):
        rows.append((did, " ".join(rng.choices(words, k=8)) + f" solo{did}", "en"))
        did += 1
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def _exact_pairs(corpus, n, threshold):
    return {
        (r["doc_id_l"], r["doc_id_r"])
        for r in dedup.ngram_jaccard_pairs(corpus, n=n, threshold=threshold).collect()
    }


def test_minhash_lsh_recall_equals_exact_set(spark, corpus):
    """The driver-gate configuration: LSH candidates + exact-jaccard verify
    must emit EXACTLY the all-pairs exact-jaccard set at the threshold
    (precision is exact by construction; recall from the banding margin)."""
    exact = _exact_pairs(corpus, n=5, threshold=0.45)
    got = {
        (r["doc_id_l"], r["doc_id_r"])
        for r in dedup.minhash_lsh_pairs(
            corpus, num_hashes=60, bands=10, shingle_size=6,
            jaccard_threshold=0.45, n=5,
        ).collect()
    }
    assert len(exact) >= 10
    assert got == exact


def test_simhash_verified_recall_equals_exact_set(spark, corpus):
    exact = _exact_pairs(corpus, n=5, threshold=0.45)
    out = dedup.simhash_pairs(
        corpus, max_hamming=12, num_bands=8, jaccard_threshold=0.45, ngram_size=5
    ).collect()
    got = {(r["doc_id_l"], r["doc_id_r"]) for r in out}
    assert got == exact
    # hamming column present and within bound
    assert all(r["hamming"] <= 12 for r in out)


def test_embedding_neardup_lsh_routes_match_all_pairs(spark):
    """The LSH-routed scale path must find (nearly) the all-pairs set:
    precision exact by construction, recall from the banding margin."""
    rng = random.Random(21)
    dim = 16
    rows = []
    vid = 0
    for _ in range(15):  # 15 near-dup pairs (tiny perturbation)
        base = [rng.gauss(0, 1) for _ in range(dim)]
        near = [x + rng.gauss(0, 0.01) for x in base]
        rows.append((vid, base)); vid += 1
        rows.append((vid, near)); vid += 1
    for _ in range(70):  # fillers
        rows.append((vid, [rng.gauss(0, 1) for _ in range(dim)])); vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    exact = {
        (r["vec_id_l"], r["vec_id_r"])
        for r in dedup.embedding_near_duplicates(df, threshold=0.98).collect()
    }
    got = {
        (r["vec_id_l"], r["vec_id_r"])
        for r in dedup.embedding_near_duplicates(
            df, threshold=0.98, method="lsh", num_planes=24, bands=6
        ).collect()
    }
    assert len(exact) >= 15
    assert got <= exact, "LSH route must not invent pairs (exact verify)"
    assert len(got) >= 0.9 * len(exact), f"recall too low: {len(got)}/{len(exact)}"


def test_ivf_topk_small_corpus(spark):
    """Corpus smaller than num_cells must not crash (review r3: boolean-mask
    IndexError in the k-means empty-cell handling)."""
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = ann.ivf_topk(df, df.limit(3), k=2, num_cells=16, nprobe=4).collect()
    assert len(out) > 0


def test_deduplicate_corpus(spark, docs):
    out = {r["doc_id"]: r for r in dedup.deduplicate_corpus(
        docs, n=3, threshold=0.5, block_cols=["lang"]
    ).collect()}
    # 0, 1, 2 near-dup cluster (0-1 exact, 0-2 one word changed)
    assert out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"]
    canon = {out[i]["canonical_id"] for i in (0, 1, 2)}
    assert len(canon) == 1  # one canonical per cluster
    assert sum(out[i]["is_canonical"] for i in (0, 1, 2)) == 1
    # singletons are their own canonical
    assert out[3]["is_canonical"] and out[3]["canonical_id"] == 3

    # pre-computed pairs (the minhash scale path) slot straight in
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, shingle_size=4, jaccard_threshold=0.5
    )
    out2 = {r["doc_id"]: r for r in dedup.deduplicate_corpus(
        docs, pairs=pairs
    ).collect()}
    assert out2[0]["cluster_id"] == out2[1]["cluster_id"]


def test_embedding_neardup_auto_routes_scale_safe(spark):
    """VERDICT r3 #3: the default method must be scale-safe. 'auto' probes
    the per-block pair count: below the bound it equals all_pairs exactly;
    above it the plan must be the LSH banded equi-join — no cartesian /
    broadcast-nested-loop node anywhere."""
    import random

    rng = random.Random(7)
    dim = 12
    rows = []
    for vid in range(60):
        rows.append((vid, [rng.gauss(0, 1) for _ in range(dim)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    exact = {
        (r["vec_id_l"], r["vec_id_r"], round(r["cosine_sim"], 9))
        for r in dedup.embedding_near_duplicates(
            df, threshold=0.3, method="all_pairs"
        ).collect()
    }
    auto_small = {
        (r["vec_id_l"], r["vec_id_r"], round(r["cosine_sim"], 9))
        for r in dedup.embedding_near_duplicates(df, threshold=0.3).collect()
    }
    assert auto_small == exact  # under the bound: exact path, exact result

    routed = dedup.embedding_near_duplicates(
        df, threshold=0.9, all_pairs_max_block_pairs=10
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    routed.collect()  # and it runs


def test_image_metadata_header_parsing(spark):
    """PNG/JPEG/GIF/BMP/PNM dimensions parsed from raw container headers —
    no codec library involved."""
    from splink_spark.pipeline import multimodal as mm

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
           + (640).to_bytes(4, "big") + (480).to_bytes(4, "big") + b"\x08\x02" + b"\x00" * 20)
    # JPEG: SOI, APP0 stub, SOF0 with h=300 w=200
    jpeg = (b"\xff\xd8" + b"\xff\xe0\x00\x04\x4a\x46"
            + b"\xff\xc0\x00\x11\x08" + (300).to_bytes(2, "big") + (200).to_bytes(2, "big")
            + b"\x03" + b"\x00" * 10 + b"\xff\xd9")
    gif = b"GIF89a" + (12).to_bytes(2, "little") + (34).to_bytes(2, "little") + b"\x00" * 10
    bmp = (b"BM" + b"\x00" * 16 + (77).to_bytes(4, "little")
           + (55).to_bytes(4, "little") + b"\x00" * 10)
    ppm = b"P6\n2 3\n255\n" + b"\x00" * 18
    rows = [(1, png), (2, jpeg), (3, gif), (4, bmp), (5, ppm), (6, b"garbage!!")]
    media = spark.createDataFrame(
        [(i, "image", c, None, None, None) for i, c in rows], schema=mm.MEDIA_SCHEMA
    )
    out = {r["media_id"]: r for r in mm.image_metadata(media).collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) == ("png", 640, 480)
    assert (out[2]["format"], out[2]["width"], out[2]["height"]) == ("jpeg", 200, 300)
    assert (out[3]["format"], out[3]["width"], out[3]["height"]) == ("gif", 12, 34)
    assert (out[4]["format"], out[4]["width"], out[4]["height"]) == ("bmp", 77, 55)
    assert (out[5]["format"], out[5]["width"], out[5]["height"]) == ("ppm", 2, 3)
    assert out[6]["format"] is None and out[6]["n_bytes"] == 9


def test_kmeans_fit_assign(spark, vectors):
    out = ann.kmeans_fit_assign(vectors, k=4, iterations=2)
    rows = out.collect()
    assert len(rows) == vectors.count()
    assert set(r["cluster"] for r in rows) <= set(range(4))
    assert all(-1.0001 <= r["cosine_sim"] <= 1.0001 for r in rows)
    # deterministic under repartitioning (portable int arithmetic, no RNG)
    again = ann.kmeans_fit_assign(vectors.repartition(7), k=4, iterations=2)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    # Lloyd iterations may not increase within-cluster distance to the
    # assigned centroid on average (monotone objective, up to quantization)
    it0 = ann.kmeans_fit_assign(vectors, k=4, iterations=0)
    mean0 = sum(r["cosine_sim"] for r in it0.collect()) / len(rows)
    mean2 = sum(r["cosine_sim"] for r in rows) / len(rows)
    assert mean2 >= mean0 - 1e-6
    # assignment runs through the vectorized Arrow kernel (one int64 matmul
    # per batch), never a row-at-a-time python UDF
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_kmeans_null_and_mismatched_vectors_get_null_cluster(spark):
    """The assignment kernel must reproduce the JVM expression contract
    for degenerate rows: a NULL embedding, an embedding whose length
    differs from the centroids', or one containing NULL elements gets a
    NULL cluster (zip_with pads mismatches with NULLs and NULL propagates
    through the integer dot), and such rows are EXCLUDED from the Lloyd
    centroid means (they aggregated into a discarded NULL-cluster group
    before)."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, None),
            (4, [1.0, 0.0, 0.0, 5.0]),
            (5, [0.9, 0.1, 0.0]),
            (6, [None, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in ann.kmeans_fit_assign(df, k=2, iterations=2).collect()}
    assert out[3]["cluster"] is None and out[3]["cosine_sim"] is None
    assert out[4]["cluster"] is None
    assert out[6]["cluster"] is None
    assert out[1]["cluster"] is not None
    assert out[2]["cluster"] is not None
    assert out[5]["cluster"] == out[1]["cluster"]  # nearby vectors co-cluster


def test_char_ngrams_and_rolling_hash_vs_python_reference(spark):
    """Fuzz the linear zip_with formulations against direct python
    references (both regimes: short strings take the substring fast path,
    long ones the shifted-copies path; unicode chars included)."""
    import random

    rng = random.Random(42)
    alphabet = "ab cd\tef\ngh…é漢"
    texts = [""] + [
        "".join(rng.choice(alphabet) for _ in range(rng.choice([1, 2, 4, 9, 40, 600])))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    n = 3
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", dedup.char_ngrams(F.col("text"), n).alias("g")
        ).collect()
    }
    for i, t in enumerate(texts):
        if len(t) < n:
            expect = [t]  # short doc: one gram = whole text (reference behavior)
        else:
            seen, expect = set(), []
            for j in range(len(t) - n + 1):
                g = t[j : j + n]
                if g not in seen:
                    seen.add(g)
                    expect.append(g)
        assert sorted(got[i]) == sorted(expect), (i, t)

    sh, base = 8, 31
    fp = {
        r["doc_id"]: r["fingerprint_hash"]
        for r in text.rolling_hash_fingerprint(
            df, shingle_len=sh, base=base
        ).collect()
    }
    for i, t in enumerate(texts):
        if len(t) < sh:
            assert fp[i] == -1, (i, t)
            continue
        best = None
        for j in range(len(t) - sh + 1):
            acc = 0
            for ch in t[j : j + sh]:
                acc = acc * base + ord(ch)
            best = acc if best is None else min(best, acc)
        assert fp[i] == best, (i, t)


def test_cross_document_span_dedup(spark):
    """Lee et al. 2022 tokenized exact-substring dedup: a span shared by
    several documents survives only in the lowest-id one; unrelated and
    empty docs pass through; an exact duplicate doc is fully removed."""
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "intro words then the quick brown fox jumps over the lazy "
                "dog today and more"),
            (2, "totally unrelated text with no shared spans at all here ok"),
            (3, ""),
            (4, "the quick brown fox jumps over the lazy dog today"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.cross_document_span_dedup(docs, span_tokens=5).collect()
    }
    # canonical doc 0 keeps everything
    assert out[0]["n_removed_tokens"] == 0
    assert out[0]["cleaned_text"] == (
        "the quick brown fox jumps over the lazy dog today"
    )
    # doc 1 loses exactly the shared 10-token span, keeps its own words
    assert out[1]["cleaned_text"] == "intro words then and more"
    assert out[1]["n_removed_tokens"] == 10
    assert out[1]["n_duplicate_spans"] == 6  # 10-token run -> 6 5-grams
    # unrelated doc untouched; empty doc stays empty
    assert out[2]["n_removed_tokens"] == 0
    assert out[3]["n_tokens"] == 0 and out[3]["cleaned_text"] == ""
    # exact duplicate of the canonical: fully removed
    assert out[4]["cleaned_text"] == "" and out[4]["n_removed_tokens"] == 10
    # global property: total kept+removed == total tokens
    assert all(
        len(r["cleaned_text"].split()) + r["n_removed_tokens"] == r["n_tokens"]
        for r in out.values()
    )
    with pytest.raises(ValueError):
        dedup.cross_document_span_dedup(docs, span_tokens=0)


def test_topk_join_matches_brute_force(spark):
    import numpy as np

    from splink_spark.pipeline import ann

    rng = np.random.RandomState(3)
    vecs = rng.randn(200, 16)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    ).repartition(6)
    queries = corpus.where("vec_id % 40 = 0")  # 5 queries

    fast = ann.topk_join(queries, corpus, k=4)
    slow = ann.brute_force_topk(corpus, queries, k=4)
    f = sorted(map(tuple, fast.select("query_id", "rank", "neighbour_id").collect()))
    s = sorted(map(tuple, slow.select("query_id", "rank", "neighbour_id").collect()))
    assert f == s
    # exact sims match the window path too
    fs = {(r["query_id"], r["neighbour_id"]): r["cosine_sim"] for r in fast.collect()}
    ss = {(r["query_id"], r["neighbour_id"]): r["cosine_sim"] for r in slow.collect()}
    assert all(abs(fs[p] - ss[p]) < 1e-12 for p in fs)


def test_topk_join_candidate_reduction_bounds_shuffle(spark):
    import numpy as np

    from splink_spark.pipeline import ann

    rng = np.random.RandomState(4)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(8)]) for i in range(500)],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    queries = corpus.where("vec_id < 3")
    out = ann.topk_join(queries, corpus, k=2)
    rows = out.collect()
    assert len(rows) == 6  # 3 queries x k=2
    assert all(r["query_id"] != r["neighbour_id"] for r in rows)


def test_clustering_agreement_bcubed_and_ari(spark):
    from splink_spark.pipeline.dedup import clustering_agreement

    # perfect agreement
    pred = spark.createDataFrame(
        [(i, i // 3) for i in range(12)], "doc_id bigint, cluster_id bigint"
    )
    tru = spark.createDataFrame(
        [(i, i // 3) for i in range(12)], "doc_id bigint, entity_id bigint"
    )
    r = clustering_agreement(pred, tru).collect()[0]
    assert (r["bcubed_precision"], r["bcubed_recall"], r["bcubed_f1"],
            r["ari"]) == (1.0, 1.0, 1.0, 1.0)
    # maximal disagreement on 4 items: pred {0,1},{2,3}; truth {0,2},{1,3}
    pred2 = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "doc_id bigint, cluster_id bigint"
    )
    tru2 = spark.createDataFrame(
        [(0, 0), (2, 0), (1, 1), (3, 1)], "doc_id bigint, entity_id bigint"
    )
    r2 = clustering_agreement(pred2, tru2).collect()[0]
    # hand-computed: BCubed P = R = 0.5; ARI = (0 - 2/3) / (2 - 2/3) = -0.5
    assert (r2["bcubed_precision"], r2["bcubed_recall"]) == (0.5, 0.5)
    assert r2["ari"] == -0.5
    # all-singleton prediction: precision 1, recall 1/3 on 3-entity groups
    single = spark.createDataFrame(
        [(i, i) for i in range(12)], "doc_id bigint, cluster_id bigint"
    )
    r3 = clustering_agreement(single, tru).collect()[0]
    assert r3["bcubed_precision"] == 1.0
    assert abs(r3["bcubed_recall"] - 1.0 / 3.0) < 2e-6
    # items missing from one side are ignored (inner join)
    partial = clustering_agreement(pred2.limit(2), tru2).collect()[0]
    assert partial["n_items"] == 2


def test_clustering_agreement_large_cell_no_int64_wrap(spark):
    from pyspark.sql import functions as F

    from splink_spark.pipeline.dedup import clustering_agreement

    # one contingency cell of 150k items: n_ce^2 * 1e6 = 2.25e22 wraps
    # int64 (~9.2e18) unless the product accumulates in decimal — the
    # wrap corrupted BCubed ppm at exactly the large-cluster scale the
    # module targets
    n = 150_000
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pred = ids.withColumn("cluster_id", F.lit(0))
    tru = ids.withColumn("entity_id", F.lit(0))
    r = clustering_agreement(pred, tru).collect()[0]
    assert r["n_items"] == n
    assert (r["bcubed_precision"], r["bcubed_recall"], r["bcubed_f1"],
            r["ari"]) == (1.0, 1.0, 1.0, 1.0)
