"""The north rule's deployment shape, actually exercised: the package
zipped and shipped via ``spark-submit --py-files`` to a multi-executor
master (local-cluster — separate executor JVMs), with the job script
run from OUTSIDE the repo so every ``rlr_spark`` import on the driver
AND the executors' Python workers must come from the shipped zip."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark

    return os.path.join(pyspark.__path__[0], "bin", "spark-submit")


def test_spark_submit_pyfiles_pipeline(tmp_path):
    # corpus written by the dev checkout (driver-side only)
    sys.path.insert(0, REPO)
    from rlr_spark.datagen import write_web_pages

    pages_path, truth_path = write_web_pages(
        str(tmp_path / "data"), n_pages=300, seed=11
    )

    # package the library exactly as README.md documents
    zip_path = str(tmp_path / "rlr_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "rlr_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    # job script COPIED outside the repo: its repo-root sys.path fallback
    # then points at tmp, so the zip is the only source of rlr_spark
    job = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(REPO, "jobs", "run_pipeline.py"), job)
    cfg = str(tmp_path / "cfg.json")
    with open(cfg, "w") as f:
        json.dump({"salt_k": 4, "max_block_size": 5000}, f)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    env["SPARK_LOCAL_DIRS"] = str(tmp_path / "scratch")
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.executor.memory=1536m",
            "--py-files", zip_path,
            job,
            "--input", pages_path,
            "--warehouse", str(tmp_path / "wh"),
            "--truth", truth_path,
            "--config", cfg,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env=env,
        check=False,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    # the job prints stage manifests + F1; the artifact proves the run
    cluster_dir = tmp_path / "wh" / "cluster"
    assert cluster_dir.is_dir(), proc.stdout[-2000:]
    assert "f1" in proc.stdout, proc.stdout[-2000:]
