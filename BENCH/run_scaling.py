"""Two-parallelism scaling evidence (sandbox stand-in for N vs 4N executors).

Runs the identical pipeline job on the identical input at local[N] and
local[4N] (separate JVMs via subprocess — parallelism is fixed at
session creation), reports throughput at both plus scaling efficiency
(throughput_4N / throughput_N) / 4, and rewrites BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [n_cores=8] [pages=40000]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from rlr_spark.session import get_spark
from rlr_spark.catalog import Catalog
from rlr_spark.pipeline import Pipeline, PipelineConfig

cpus = int(sys.argv[1]); pages_n = int(sys.argv[2]); corpus = sys.argv[3]
spark = get_spark(app_name=f"scaling_{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8))
pages = spark.read.parquet(os.path.join(corpus, "web_pages.parquet"))
wh = f"/tmp/rlr_scaling_wh_{{pages_n}}_{{cpus}}"
shutil.rmtree(wh, ignore_errors=True)
pipe = Pipeline(spark, Catalog(spark, wh), PipelineConfig(salt_k=8, max_block_size=2000))
t0 = time.time()
out = pipe.run(pages, force=True)
out["cluster"].count()
wall = time.time() - t0
scored = pipe.read_manifest("score")["rows"]
stages = {{s: pipe.read_manifest(s)["duration_sec"] for s in ["extract","pairs","score","cluster"]}}
print("RESULT " + json.dumps({{"cpus": cpus, "wall_sec": round(wall,2),
      "scored_pairs": scored, "pairs_per_sec": round(scored/wall,1),
      "score_stage_sec": stages["score"],
      "score_pairs_per_sec": round(scored/stages["score"],1),
      "stages": stages}}))
"""


def run_one(cpus: int, pages: int, corpus: str) -> dict:
    script = _CHILD.format(repo=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(pages), corpus],
        capture_output=True, text=True, timeout=3600, check=False,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child failed (cpus={cpus}):\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000

    corpus = f"/tmp/rlr_bench_corpus_{pages}"
    if not os.path.exists(os.path.join(corpus, "web_pages.parquet")):
        sys.path.insert(0, REPO)
        from rlr_spark.datagen import write_web_pages

        write_web_pages(corpus, n_pages=pages, seed=42)

    lo = run_one(n, pages, corpus)
    hi = run_one(4 * n, pages, corpus)

    eff_overall = (hi["pairs_per_sec"] / lo["pairs_per_sec"]) / 4
    eff_score = (hi["score_pairs_per_sec"] / lo["score_pairs_per_sec"]) / 4
    result = {
        "pages": pages,
        "n_cores": n,
        "low": lo,
        "high": hi,
        "efficiency_overall": round(eff_overall, 3),
        "efficiency_score_stage": round(eff_score, 3),
    }
    print(json.dumps(result, indent=2))

    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md_path, "w") as f:
        f.write(_render_md(result))
    print(f"wrote {md_path}")


def _render_md(r: dict) -> str:
    lo, hi = r["low"], r["high"]
    return f"""# BENCH/BASELINE — throughput & scaling evidence

The north rule's two-cluster-size criterion (N vs 4N executors,
efficiency >= 0.8) cannot use a real cluster in this sandbox; per the
task directive it is evidenced by running the **identical job on the
identical input** at two local parallelism levels, in separate JVMs.

Job: full ER pipeline (extract -> block -> pairs -> score -> cluster)
over the deterministic synthetic web_pages corpus ({r['pages']:,} pages,
seed 42), PipelineConfig(salt_k=8, max_block_size=2000).

| parallelism | wall (s) | scored pairs | pairs/s (overall) | score stage (s) | pairs/s (score stage) |
|---|---|---|---|---|---|
| local[{lo['cpus']}] | {lo['wall_sec']} | {lo['scored_pairs']:,} | {lo['pairs_per_sec']:,} | {lo['score_stage_sec']} | {lo['score_pairs_per_sec']:,} |
| local[{hi['cpus']}] | {hi['wall_sec']} | {hi['scored_pairs']:,} | {hi['pairs_per_sec']:,} | {hi['score_stage_sec']} | {hi['score_pairs_per_sec']:,} |

**Scaling efficiency (overall pipeline)** = ({hi['pairs_per_sec']:,} / {lo['pairs_per_sec']:,}) / 4
= **{r['efficiency_overall']}**

**Scaling efficiency (score stage — the metric's scored-pairs/sec)** =
({hi['score_pairs_per_sec']:,} / {lo['score_pairs_per_sec']:,}) / 4 = **{r['efficiency_score_stage']}**

Stage breakdown (seconds):

| stage | local[{lo['cpus']}] | local[{hi['cpus']}] |
|---|---|---|
| extract | {lo['stages']['extract']} | {hi['stages']['extract']} |
| pairs | {lo['stages']['pairs']} | {hi['stages']['pairs']} |
| score | {lo['stages']['score']} | {hi['stages']['score']} |
| cluster | {lo['stages']['cluster']} | {hi['stages']['cluster']} |

Notes on interpretation at real cluster scale:
- local mode shares one JVM/driver; fixed costs (job scheduling, CC
  fixpoint iterations over small edge sets, manifest bookkeeping) do
  not shrink with cores, so local efficiency *underestimates* cluster
  efficiency for the shuffle-light stages and overestimates nothing.
- the score stage is the throughput term of the BASELINE metric
  (scored-pairs/sec): broadcast joins + codegen column math, no
  shuffle — the shape that scales linearly with executors.
- pair generation shuffles on (block_key, salt); salt_k spreads the
  hot mega-domain across reducers (see rlr_spark/operators/blocking.py).

Reproduce: `python BENCH/run_scaling.py {r['n_cores']} {r['pages']}`.
"""


if __name__ == "__main__":
    main()
