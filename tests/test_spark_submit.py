"""spark-submit --py-files deployment contract.

The north-rule ships the pipeline to a cluster as
``spark-submit --py-files tsn.zip run_pipeline.py ...``; this test is
that exact invocation, run against a zip built from the package the way
a deploy step would build it, from a working directory OUTSIDE the repo
so every ``text_similarity_node_spark`` import must resolve from the
shipped zip (driver side via sys.path injection, executor side via the
sparkContext file distribution) — a missing package __init__, a
data-file-only module, or an import-time dependency on repo-relative
paths all fail here and nowhere else in the suite."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(dest: str) -> str:
    """Zip the package exactly as the documented deploy step does."""
    zpath = os.path.join(dest, "tsn.zip")
    pkg = os.path.join(REPO, "text_similarity_node_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_pyfiles_pipeline():
    spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
    if not os.path.exists(spark_submit):
        pytest.skip("no spark-submit launcher on PATH or in the pyspark dist")
    work = tempfile.mkdtemp(prefix="tsn_submit_")
    try:
        zpath = _build_zip(work)
        wh = os.path.join(work, "wh")
        outp = os.path.join(work, "clusters.parquet")
        proc = subprocess.run(
            [
                spark_submit,
                "--master", "local[2]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zpath,
                os.path.join(REPO, "run_pipeline.py"),
                "--synthetic", "300",
                "--warehouse", wh,
                "--output", outp,
                "--run-id", "submit_smoke",
            ],
            cwd=work,  # NOT the repo: imports must come from the zip
            capture_output=True,
            text=True,
            timeout=540,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        # last stdout line is the run summary JSON
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        summary = json.loads(line)
        assert summary["clips"] == 300
        assert summary["clusters"] > 0
        assert os.path.isdir(outp)  # clusters parquet written
    finally:
        shutil.rmtree(work, ignore_errors=True)
