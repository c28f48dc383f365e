#!/usr/bin/env python
"""ANN family scale proof: brute-force / LSH / IVF / SQ8 / PQ / IVF-PQ
top-k over 1M synthetic 64-dim vectors (clustered, so approximate methods
have structure to exploit — random vectors would make every ANN method
look uniformly bad), 20 queries each.

Per variant: wall clock + recall@10 against the brute-force ground truth.
Single run per variant on a noisy host; the recall numbers are exact and
noise-free, the wall clocks share one session's noise window.

Writes BENCH_ANN.json. Usage: python tools/bench_ann.py [env ANN_BENCH_VECS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
# Spark's forked Python workers must be able to import splink_spark too
# (mapInPandas/pandas_udf ops pickle module functions BY REFERENCE): export
# the repo root on PYTHONPATH before the session starts, whatever the cwd.
os.environ["PYTHONPATH"] = (
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from splink_spark.pipeline import ann

    n = int(os.environ.get("ANN_BENCH_VECS", "1000000"))
    dim, n_queries, k = 64, 20, 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ann_bench")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # clustered corpus: 256 latent centers; vector = center + per-vector
    # jitter, all from pure Column hash arithmetic (deterministic, no
    # Python loop). Jitter amplitude matters: at +-0.1 the within-cluster
    # neighbourhoods sit BELOW int8/PQ quantization resolution (1M vectors
    # = ~4k-member equidistant shells; a prior run recorded sq8 recall
    # 0.11 / PQ 0.0 on that geometry — the honest resolution limit, kept
    # in prior_geometry below), so the default uses +-0.4 jitter: clusters
    # still dominate (centers span +-1.0) but neighbours are
    # distinguishable after quantization, like real continuous embeddings
    def h(col, seed, m):
        return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m))

    center = h(F.col("id"), 1, 256)
    vecs = (
        spark.range(n)
        .repartition(4 * int(cpus))
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (
                    (
                        F.pmod(
                            F.xxhash64(center.cast("string"), i.cast("string")),
                            F.lit(2000),
                        )
                        - 1000
                    ).cast("double")
                    / 1000.0
                    + (
                        F.pmod(F.xxhash64(F.col("id"), i.cast("string")), F.lit(800))
                        - 400
                    ).cast("double")
                    / 1000.0
                ),
            ).alias("embedding"),
        )
        .persist()
    )
    vecs.count()
    queries = vecs.where(F.col("vec_id") < n_queries).persist()
    queries.count()

    results = {"cpus": int(cpus), "n_vectors": n, "dim": dim, "k": k, "ops": {}}

    def run(name, fn):
        t0 = time.time()
        rows = fn().collect()
        sec = round(time.time() - t0, 2)
        got = {(r["query_id"], r["neighbour_id"]) for r in rows}
        results["ops"][name] = {"sec": sec, "pairs": len(rows)}
        print(f"{name}: {sec}s ({len(rows)} result pairs)", flush=True)
        return got

    truth = run("brute_force", lambda: ann.brute_force_topk(vecs, queries, k=k))

    def rec(got):
        return round(len(got & truth) / max(1, len(truth)), 3)

    # ANN_BENCH_SERVING_ONLY=1: refresh ONLY the build-once/search-many
    # rows (plus brute-force truth, recomputed above — the corpus is
    # deterministic so recall stays comparable), carrying every other op's
    # row forward from the existing artifact. The full loop re-runs all
    # variants in one shared noise window — use it when the variant code
    # itself changed.
    serving_only = os.environ.get("ANN_BENCH_SERVING_ONLY") == "1"
    prior_ops = {}
    if serving_only:
        try:
            with open(os.path.join(REPO, "BENCH_ANN.json")) as f:
                prior_ops = json.load(f).get("ops", {})
        except Exception:
            prior_ops = {}
        for key, val in prior_ops.items():
            if key not in ("brute_force",):
                results["ops"][key] = dict(val, carried_forward=True)

    for name, fn in [] if serving_only else [
        (
            "lsh_topk",
            lambda: ann.lsh_topk(vecs, queries, k=k, num_planes=12),
        ),
        (
            "ivf_topk",
            lambda: ann.ivf_topk(
                vecs, queries, k=k, num_cells=64, nprobe=8
            ),
        ),
        (
            "ivf_topk_portable",
            lambda: ann.ivf_topk_portable(
                vecs, queries, k=k, num_cells=64, nprobe=8, iterations=2
            ),
        ),
        ("sq8_topk", lambda: ann.sq8_topk(vecs, queries, k=k)),
        (
            "pq_topk_adc",
            lambda: ann.pq_topk(
                vecs, queries, k=k, m=8, codebook_size=32, iterations=2
            ),
        ),
        (
            "pq_topk_rerank",
            lambda: ann.pq_topk(
                vecs, queries, k=k, m=8, codebook_size=32, iterations=2,
                rerank_candidates=20 * k,
            ),
        ),
        # IVFADC at its textbook operating point: num_cells >= the
        # corpus's latent cluster count (~sqrt(N); 256 here to match the
        # 256 latent centers — 64 cells left 4-center structure in the
        # residuals and recall collapsed to 0.165), m=16 sub-quantizers
        # (64-bit codes). raw vs residual isolates what the residual
        # encoding itself buys at the SAME config (measured at 200k:
        # 0.470 raw vs 0.925 residual).
        (
            "ivf_pq_raw_rerank",
            lambda: ann.ivf_pq_topk(
                vecs, queries, k=k, num_cells=256, nprobe=16, m=16,
                codebook_size=32, iterations=2, rerank_candidates=20 * k,
                residual=False,
            ),
        ),
        (
            "ivfadc_residual_adc",
            lambda: ann.ivf_pq_topk(
                vecs, queries, k=k, num_cells=256, nprobe=16, m=16,
                codebook_size=32, iterations=2, rerank_candidates=None,
                residual=True,
            ),
        ),
        (
            "ivfadc_residual_rerank",
            lambda: ann.ivf_pq_topk(
                vecs, queries, k=k, num_cells=256, nprobe=16, m=16,
                codebook_size=32, iterations=2, rerank_candidates=20 * k,
                residual=True,
            ),
        ),
        # the 100 TB index-build economy: both quantizers trained on a
        # deterministic 10% MINSTD sample (FAISS practice); assignment +
        # encoding still cover the full corpus
        (
            "ivfadc_sampled_train",
            lambda: ann.ivf_pq_topk(
                vecs, queries, k=k, num_cells=256, nprobe=16, m=16,
                codebook_size=32, iterations=2, rerank_candidates=20 * k,
                residual=True, train_fraction=0.1,
            ),
        ),
    ]:
        try:
            got = run(name, fn)
            results["ops"][name]["recall_at_10"] = rec(got)
            print(f"  recall@10 = {results['ops'][name]['recall_at_10']}", flush=True)
        except Exception as exc:
            results["ops"][name] = {"error": str(exc)[:300]}
            print(f"{name} FAILED: {exc}", flush=True)

    # the serving split: pay coarse-kmeans + residual-PQ train + encode
    # ONCE (ivfadc_build -> parquet), then measure a query batch against
    # the stored index — the per-batch number a serving deployment sees
    # (the in-loop ivfadc rows above rebuild the index inside every call)
    import shutil
    import tempfile

    idx_dir = tempfile.mkdtemp(prefix="ivfadc_idx_")
    try:
        t0 = time.time()
        ann.ivfadc_build(
            vecs, idx_dir, num_cells=256, m=16, codebook_size=32,
            iterations=2, train_fraction=0.1,
        )
        results["ops"]["ivfadc_build_once"] = {
            "sec": round(time.time() - t0, 2)
        }
        print(f"ivfadc_build_once: {results['ops']['ivfadc_build_once']['sec']}s",
              flush=True)
        got = run(
            "ivfadc_search_prebuilt",
            lambda: ann.ivfadc_search(
                queries, idx_dir, k=k, nprobe=16, corpus=vecs
            ),
        )
        results["ops"]["ivfadc_search_prebuilt"]["recall_at_10"] = rec(got)
        print(f"  recall@10 = {results['ops']['ivfadc_search_prebuilt']['recall_at_10']}",
              flush=True)
    except Exception as exc:
        results["ops"]["ivfadc_search_prebuilt"] = {"error": str(exc)[:300]}
        print(f"ivfadc_search_prebuilt FAILED: {exc}", flush=True)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # recall floor: the r7 verdict's regression tripwire — the residual
    # IVFADC path (the default ivf_pq_topk) must clear 0.8 recall@10 on
    # this clustered corpus. A floor violation is loud (nonzero exit),
    # not a silently-recorded number.
    floor = float(os.environ.get("ANN_RECALL_FLOOR", "0.8"))
    flagship = results["ops"].get("ivfadc_residual_rerank", {})
    flagship_recall = flagship.get("recall_at_10")
    results["recall_floor"] = floor
    results["recall_floor_met"] = (
        flagship_recall is not None and flagship_recall >= floor
    )
    if not results["recall_floor_met"]:
        print(
            f"RECALL FLOOR VIOLATION: ivfadc_residual_rerank recall@10 = "
            f"{flagship_recall} < {floor}",
            flush=True,
        )

    results["notes"] = (
        "single run per variant (shared session, shared noise window); "
        "corpus is 256-center clustered synthetic — recall reflects each "
        "method's candidate-generation selectivity, wall clock includes "
        "train+encode for the quantized variants (index build is per-call "
        "here; a serving deployment builds once). brute_force is the "
        "ground truth and the 100 TB anti-pattern (full corpus scan per "
        "query batch); every other variant generates candidates from a "
        "bucket/cell/code structure."
    )
    # keep the prior artifact's run visible when the geometry changed
    # (no silent replacement of a less-flattering measurement)
    prior_path = os.path.join(REPO, "BENCH_ANN.json")
    if os.path.exists(prior_path):
        try:
            with open(prior_path) as f:
                prior = json.load(f)
            results["prior_run"] = {
                "ops": prior.get("ops"),
                "measured_at": prior.get("measured_at"),
                "geometry_note": prior.get("geometry_note", "see notes"),
            }
        except Exception:
            pass
    results.update(__import__("_stamp").measurement_stamp())
    with open(prior_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    if not results["recall_floor_met"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
