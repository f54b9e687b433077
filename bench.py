"""Benchmark harness — one JSON line to stdout.

Headline metric: scored pairs per second through the full ER pipeline
(extract -> block -> score -> cluster) over a deterministic synthetic
web_pages corpus sized from the testdata scale factor, plus per-query
wall times for the flagship driver queries over $SPARK_GRAFT_SF_DIR.

    SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
    SPARK_GRAFT_CPUS     default 32 (local[N])
    RLR_BENCH_PAGES      override pipeline corpus size

Output: {"metric": "scored_pairs_per_sec", "value": N, "unit": "sec",
         "queries": {...}, "sf": ...}
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

# corpus size for the pipeline benchmark: ~sf * 400k pages
_SF_GUESS = {"sf0.001": 1_000, "sf0.01": 8_000, "sf0.1": 40_000}
PAGES = int(
    os.environ.get(
        "RLR_BENCH_PAGES", _SF_GUESS.get(os.path.basename(SF_DIR.rstrip("/")), 20_000)
    )
)

BENCH_QUERIES = [
    "c3_fs_score",
    "cc_clusters",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_prefix_join",
    "text_stats",
    "emb_topk_cosine",
    "j1_pair_record_join",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from rlr_spark.catalog import Catalog
    from rlr_spark.datagen import write_web_pages
    from rlr_spark.pipeline import Pipeline, PipelineConfig
    from rlr_spark.session import get_spark

    # partition sizing tracks the DATA here, not just cores: the sf0.1
    # bench corpus is ~30 MB compressed, so cores*1 partitions (32) beat
    # cores*3 (96) by ~20% wall — the extra tasks are pure scheduler
    # latency at this size. The scaling bench (BENCH/run_scaling.py)
    # keeps 3x on its larger corpus where skew smoothing wins.
    spark = get_spark(
        app_name="rlr_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.default.parallelism": str(max(CPUS, 8))},
    )

    sf_name = os.path.basename(SF_DIR.rstrip("/"))

    # --- pipeline benchmark on synthetic corpus (cached across runs) -------
    data_dir = f"/tmp/rlr_bench_corpus_{PAGES}"
    pages_path = os.path.join(data_dir, "web_pages.parquet")
    if not os.path.exists(pages_path):
        write_web_pages(data_dir, n_pages=PAGES, seed=42)
    pages = spark.read.parquet(pages_path)

    wh = f"/tmp/rlr_bench_wh_{PAGES}_{CPUS}"
    shutil.rmtree(wh, ignore_errors=True)
    cat = Catalog(spark, wh)
    # cap coarse domain blocks: a mega-domain of D pages is D^2/2 pairs from
    # the domain pass alone (72M at 40k pages) — the LSH pass covers its
    # duplicates with bounded bucket sizes, which is the at-scale design
    pipe = Pipeline(spark, cat, PipelineConfig(salt_k=8, max_block_size=2_000))

    t0 = time.time()
    out = pipe.run(pages, force=True)
    n_clusters = out["cluster"].count()  # materialize everything
    pipeline_sec = time.time() - t0
    scored_pairs = pipe.read_manifest("score")["rows"]
    pairs_per_sec = scored_pairs / pipeline_sec if pipeline_sec > 0 else 0.0

    # --- per-query timings over the driver testdata -------------------------
    qs = entrymod.queries()
    query_secs: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        # noop sink forces every column to be computed; a count() would
        # let Catalyst prune the similarity expressions entirely
        df.write.mode("overwrite").format("noop").save()
        query_secs[name] = round(time.time() - t0, 3)
    query_secs["pipeline_full"] = round(pipeline_sec, 3)

    print(
        json.dumps(
            {
                "metric": "scored_pairs_per_sec",
                "value": round(pairs_per_sec, 1),
                "unit": "sec",
                "queries": query_secs,
                "sf": sf_name,
                "pipeline": {
                    "pages": PAGES,
                    "scored_pairs": scored_pairs,
                    "clusters": n_clusters,
                    "wall_sec": round(pipeline_sec, 3),
                    "cpus": CPUS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
