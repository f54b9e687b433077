"""Per-pipeline-stage shuffle volume probe (round-6 ADVICE: measure
bytes-shuffled per stage before optimizing the pairs stage).

Runs the full ER pipeline once at a fixed parallelism with the Spark UI
REST API enabled, snapshots cumulative shuffle read/write + spill at
each pipeline-stage boundary (a hook on Pipeline._write_stage), and
prints one JSON line with the per-stage deltas.

Usage: python BENCH/shuffle_probe.py [pages=100000] [cpus=8]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlr_spark.catalog import Catalog
from rlr_spark.datagen import write_web_pages
from rlr_spark.pipeline import Pipeline, PipelineConfig
from rlr_spark.session import get_spark


def _totals(ui: str, app_id: str) -> dict:
    """Cumulative shuffle/spill bytes over all completed Spark stages."""
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete", timeout=30
    ) as r:
        stages = json.load(r)
    out = {"shuffle_write": 0, "shuffle_read": 0, "spill_disk": 0,
           "input_bytes": 0, "output_bytes": 0, "n_spark_stages": len(stages)}
    for s in stages:
        out["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        out["shuffle_read"] += s.get("shuffleReadBytes", 0)
        out["spill_disk"] += s.get("diskBytesSpilled", 0)
        out["input_bytes"] += s.get("inputBytes", 0)
        out["output_bytes"] += s.get("outputBytes", 0)
    return out


def main() -> None:
    pages_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    root = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    work = f"{root}/rlr_shuffle_probe_{pages_n}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    spark = get_spark(
        app_name="shuffle_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 3,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    ui = "http://localhost:4049"
    app_id = spark.sparkContext.applicationId

    pp, _tp = write_web_pages(f"{work}/data", n_pages=pages_n, seed=42)
    pages = spark.read.parquet(pp)

    pipe = Pipeline(
        spark,
        Catalog(spark, f"{work}/wh"),
        PipelineConfig(salt_k=8, max_block_size=2000),
    )

    snaps: list[tuple[str, float, dict]] = []
    orig = Pipeline._write_stage

    def hooked(self, stage, df, t0, **kw):
        out = orig(self, stage, df, t0, **kw)
        snaps.append((stage, time.time(), _totals(ui, app_id)))
        return out

    Pipeline._write_stage = hooked
    try:
        snaps.append(("_start", time.time(), _totals(ui, app_id)))
        t0 = time.time()
        out = pipe.run(pages, force=True)
        out["cluster"].count()
        wall = time.time() - t0
        snaps.append(("_end", time.time(), _totals(ui, app_id)))
    finally:
        Pipeline._write_stage = orig

    report = {"pages": pages_n, "cpus": cpus, "wall_sec": round(wall, 2),
              "stages": {}}
    for (prev_name, prev_t, prev), (name, t, cur) in zip(snaps, snaps[1:]):
        delta = {k: cur[k] - prev[k] for k in prev if k != "n_spark_stages"}
        delta["spark_stages"] = cur["n_spark_stages"] - prev["n_spark_stages"]
        delta["wall"] = round(t - prev_t, 2)
        delta_mb = {
            k: (round(v / 1e6, 1) if k.endswith(("write", "read", "disk", "bytes")) else v)
            for k, v in delta.items()
        }
        report["stages"][name] = delta_mb
    print("PROBE " + json.dumps(report))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
