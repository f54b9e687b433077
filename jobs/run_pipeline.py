"""spark-submit entry point for the ER pipeline (BASELINE.md deployment shape).

    spark-submit --py-files rlr_spark.zip jobs/run_pipeline.py \
        --input /path/web_pages.parquet --warehouse /path/warehouse \
        [--format warc] [--iceberg-catalog rlr] [--force] \
        [--config pipeline.json]

``--format warc`` accepts a ``.warc.gz`` segment glob (the Common Crawl
layout) and runs the pipeline straight off the crawl archive.

Reads the input table (Iceberg identifier when --iceberg-catalog is set
and jars are present, parquet path otherwise), runs/resumes the staged
pipeline, prints stage manifests and, when a truth table is given,
pairwise F1.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python jobs/run_pipeline.py` runs resolve the package from the
# repo root; under spark-submit the --py-files zip takes precedence
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="web_pages parquet path or table ident")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "warc"],
        help="input format: parquet web_pages (default) or raw .warc.gz "
        "segment glob — crawl archives run the pipeline directly",
    )
    ap.add_argument("--iceberg-catalog", default=None)
    ap.add_argument("--config", default=None, help="JSON file of PipelineConfig fields")
    ap.add_argument("--truth", default=None, help="optional truth parquet for F1")
    ap.add_argument("--force", action="store_true", help="ignore existing manifests")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from rlr_spark.catalog import Catalog
    from rlr_spark.pipeline import Pipeline, PipelineConfig, pairwise_f1
    from rlr_spark.session import get_spark

    spark = get_spark(app_name="rlr_pipeline", master=args.master)

    cfg = PipelineConfig()
    if args.config:
        with open(args.config) as f:
            cfg = PipelineConfig(**json.load(f))

    if args.format == "warc":
        from rlr_spark.sources.warc import warc_web_pages

        if getattr(cfg, "langs", None):
            # WARC input has no language id yet (lang is NULL until a
            # lang-id pass runs); a langs filter would silently drop
            # EVERY row — refuse loudly instead
            raise SystemExit(
                "--format warc is incompatible with a config that sets "
                "'langs': raw crawl records carry no language id, so the "
                "filter would produce an empty corpus. Run language id "
                "downstream, or drop 'langs' from the config."
            )
        pages = warc_web_pages(spark, args.input)
    elif args.iceberg_catalog:
        pages = spark.read.table(args.input)
    else:
        pages = spark.read.parquet(args.input)

    cat = Catalog(spark, args.warehouse, iceberg_catalog=args.iceberg_catalog)
    pipe = Pipeline(spark, cat, cfg)
    out = pipe.run(pages, force=args.force)

    report = {s: pipe.read_manifest(s) for s in ["extract", "pairs", "score", "cluster"]}
    if args.truth:
        truth = spark.read.parquet(args.truth)
        report["f1"] = pairwise_f1(out["cluster"], truth)
    json.dump(report, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
