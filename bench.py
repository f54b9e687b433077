"""Benchmark harness — one JSON line to stdout.

Headline metric: scored pairs per second through the full ER pipeline
(extract -> block -> score -> cluster) over a deterministic synthetic
web_pages corpus sized from the testdata scale factor, plus per-query
wall times for the flagship driver queries over $SPARK_GRAFT_SF_DIR.

Self-honesty rules (the artifact is the number):
- one warm-up job (pandas-UDF + shuffle) before any timed window, so
  Python-worker and codegen startup never lands inside t0;
- every timed section is the MIN OF 2 TRIALS — single-shot numbers on a
  shared box carry +/-7% noise and a README quoting a lucky run
  diverges from the recorded artifact;
- the big-corpus run (RLR_BENCH_BIG_PAGES, default 300k) is reported
  separately so the headline also tracks the data-proportional regime
  where fixed per-job cost is amortized.

    SPARK_GRAFT_SF_DIR     default /root/testdata/sf0.1
    SPARK_GRAFT_CPUS       default 32 (local[N])
    RLR_BENCH_PAGES        override pipeline corpus size
    RLR_BENCH_BIG_PAGES    override big-corpus size (0 disables)
    RLR_BENCH_TRIALS       override trials per section (default 2)

Output: {"metric": "scored_pairs_per_sec", "value": N, "unit": "pairs/sec",
         "queries": {...}, "sf": ..., "pipeline": {...}, "pipeline_big": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("RLR_BENCH_TRIALS", "2"))

# corpus size for the pipeline benchmark: ~sf * 400k pages
_SF_GUESS = {"sf0.001": 1_000, "sf0.01": 8_000, "sf0.1": 40_000}
PAGES = int(
    os.environ.get(
        "RLR_BENCH_PAGES", _SF_GUESS.get(os.path.basename(SF_DIR.rstrip("/")), 20_000)
    )
)
# the data-proportional corpus (fixed cost <5% of wall); 0 disables
BIG_PAGES = int(os.environ.get("RLR_BENCH_BIG_PAGES", "300000"))

BENCH_QUERIES = [
    "c3_fs_score",
    "cc_clusters",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_prefix_join",
    "text_stats",
    "text_bigram_lm",
    "graph_pagerank",
    "bm25_topk",
    "emb_topk_cosine",
    "j1_pair_record_join",
]


def _corpus(pages: int) -> str:
    from rlr_spark.datagen import write_web_pages

    data_dir = f"/tmp/rlr_bench_corpus_{pages}"
    pages_path = os.path.join(data_dir, "web_pages.parquet")
    if not os.path.exists(pages_path):
        write_web_pages(data_dir, n_pages=pages, seed=42)
    return pages_path


def _run_pipeline(spark, pages_df, n_pages: int, trials: int) -> dict:
    """Min-of-N full pipeline runs on a fresh warehouse each trial."""
    from rlr_spark.catalog import Catalog
    from rlr_spark.pipeline import Pipeline, PipelineConfig

    best = None
    for trial in range(trials):
        wh = f"/tmp/rlr_bench_wh_{n_pages}_{CPUS}"
        shutil.rmtree(wh, ignore_errors=True)
        # cap coarse domain blocks: a mega-domain of D pages is D^2/2
        # pairs from the domain pass alone — the LSH pass covers its
        # duplicates with bounded bucket sizes (the at-scale design)
        pipe = Pipeline(
            spark, Catalog(spark, wh), PipelineConfig(salt_k=8, max_block_size=2_000)
        )
        t0 = time.time()
        out = pipe.run(pages_df, force=True)
        n_clusters = out["cluster"].count()  # materialize everything
        wall = time.time() - t0
        scored = pipe.read_manifest("score")["rows"]
        if best is None or wall < best["wall_sec"]:
            # per-stage walls straight from the manifests the run just
            # wrote: attributes headline moves to stages without a
            # separate scaling-harness run
            stage_secs = {
                s: (pipe.read_manifest(s) or {}).get("duration_sec")
                for s in ("extract", "pairs", "score", "cluster")
            }
            best = {
                "pages": n_pages,
                "scored_pairs": scored,
                "clusters": n_clusters,
                "wall_sec": round(wall, 3),
                "pairs_per_sec": round(scored / wall, 1) if wall > 0 else 0.0,
                "stage_sec": stage_secs,
                "cpus": CPUS,
                "trials": trials,
            }
    return best


def main() -> None:
    import __spark_entry__ as entrymod
    from rlr_spark.session import get_spark

    # cores*3 partitions (the standard oversubscription sizing): the r2
    # experiment with cores*1 penalized every shuffle-heavy query
    # (c3_fs_score +35%) while leaving the pipeline flat — measured, so
    # reverted. default.parallelism also floors AQE's coalescing and
    # divides scan bytes per task.
    par = CPUS * 3
    spark = get_spark(
        app_name="rlr_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=par,
        extra_conf={"spark.default.parallelism": str(par)},
    )

    sf_name = os.path.basename(SF_DIR.rstrip("/"))

    # --- warm-up: JVM codegen + Python worker pool, outside every t0 -------
    from pyspark.sql import functions as F

    warm = spark.range(0, 1_000_000, 1, CPUS).select(
        F.bit_xor(F.xxhash64("id")).alias("s")  # bit_xor: ANSI-safe over hashes
    )
    warm.collect()
    from rlr_spark.operators.extract import extract_text

    spark.range(0, CPUS * 4, 1, CPUS * 4).selectExpr(
        "cast(concat('<body><p>w', id, '</p></body>') as binary) as html"
    ).transform(extract_text).write.format("noop").mode("overwrite").save()

    # --- pipeline benchmark on synthetic corpus (cached across runs) -------
    pages = spark.read.parquet(_corpus(PAGES))
    pipeline_best = _run_pipeline(spark, pages, PAGES, TRIALS)

    # --- per-query timings over the driver testdata -------------------------
    qs = entrymod.queries()
    query_secs: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(TRIALS):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            # noop sink forces every column to be computed; a count()
            # would let Catalyst prune the similarity expressions
            df.write.mode("overwrite").format("noop").save()
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
        query_secs[name] = round(best, 3)
    query_secs["pipeline_full"] = pipeline_best["wall_sec"]

    # --- data-proportional corpus: fixed cost amortized -------------------
    # min-of-2 here too: single 300k shots swing +/-15% with host weather
    pipeline_big = None
    if BIG_PAGES:
        big = spark.read.parquet(_corpus(BIG_PAGES))
        pipeline_big = _run_pipeline(spark, big, BIG_PAGES, TRIALS)
        query_secs["pipeline_big"] = pipeline_big["wall_sec"]

    print(
        json.dumps(
            {
                "metric": "scored_pairs_per_sec",
                "value": pipeline_best["pairs_per_sec"],
                "unit": "pairs/sec",
                "queries": query_secs,
                "sf": sf_name,
                "pipeline": pipeline_best,
                **({"pipeline_big": pipeline_big} if pipeline_big else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
