"""End-to-end launch-contract test: real ``spark-submit --py-files``
with the built dist zip driving ``cli.py`` against a tiny parquet token
table — the north rule's cluster launch path, exercised for real (local
master, but the same artifact + entry-point contract a cluster uses).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available")
def test_spark_submit_pyfiles_pipeline(spark, tmp_path):
    # 1. build the py-files artifact (includes native/kernels.c)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_pyfiles_zip.py")],
        capture_output=True, text=True, timeout=120, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)
    import zipfile

    names = zipfile.ZipFile(zip_path).namelist()
    assert "rust_timeseries_spark/cli.py" in names
    assert "rust_timeseries_spark/native/kernels.c" in names

    # 2. tiny input token table (the session fixture writes the parquet;
    # the submitted job runs in its OWN JVM/session)
    from rust_timeseries_spark import datagen

    input_path = str(tmp_path / "tokens")
    datagen.with_event_time(datagen.token_table(spark, 4000, num_partitions=4)).write.parquet(
        input_path
    )
    tier_path = str(tmp_path / "tiers")

    # 3. the real launch: spark-submit --py-files <zip> cli.py ...
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)  # force a fresh JVM
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(ROOT, "rust_timeseries_spark", "cli.py"),
            "--input", input_path,
            "--output", tier_path,
            "--run-id", "submit-test",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    metrics = json.loads(line)
    assert metrics["run_id"] == "submit-test"
    assert metrics["tier_1d_rows"] > 0

    # 4. the tier store the submitted job wrote is readable and folded
    t1d = spark.read.parquet(os.path.join(tier_path, "tier=1d"))
    assert t1d.count() == metrics["tier_1d_rows"]
    assert {"source", "bucket_ts", "tok_sum"}.issubset(set(t1d.columns))
