"""Deployment-shape evidence (BASELINE.json north rule: "run via
spark-submit --py-files on a multi-executor cluster"): package the engine
as a zip, ship it to a FRESH spark-submit process via --py-files (no
repo on the child's PYTHONPATH), run a full recover + snapshot export,
and cross-check the exported snapshot against the sequential oracle."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pandas as pd
import pyspark


JOB = """
import json, sys
from mysql_binlog_spark.session import get_spark
from mysql_binlog_spark.engine.pipeline import recover, table_snapshot
from mysql_binlog_spark.lake.table import LakeTable

events, table_root, out = sys.argv[1:4]
spark = get_spark("submit-smoke", master="local[2]", shuffle_partitions=4)
t = LakeTable(spark, table_root, n_buckets=4)
rep = recover(spark, events, t, epoch_size=500)
table_snapshot(t).write.mode("overwrite").parquet(out)
print("RESULT " + json.dumps({"epochs": rep.epochs_run, "events": rep.events_in}))
"""


def test_spark_submit_py_files_recover(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # package the engine exactly as a cluster deploy would
    pkg_zip = str(tmp_path / "mysql_binlog_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w") as z:
        pkg = os.path.join(repo, "mysql_binlog_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, repo))

    # deterministic input written by the (driver-side) generator
    from mysql_binlog_spark.changelog import ChangelogSpec, write_events_parquet
    from mysql_binlog_spark.changelog.generator import generate_events_pandas
    from mysql_binlog_spark.changelog.oracle import oracle_snapshot_from_pandas

    spec = ChangelogSpec(n_events=1500, seed=7, n_repos=5)
    events = str(tmp_path / "events.parquet")
    write_events_parquet(spec, events)

    job = str(tmp_path / "job.py")
    with open(job, "w") as f:
        f.write(JOB)

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source of the pkg
    env["PYSPARK_PYTHON"] = sys.executable
    out_dir = str(tmp_path / "snap")
    proc = subprocess.run(
        [
            submit, "--master", "local[2]", "--py-files", pkg_zip, job,
            events, str(tmp_path / "lake"), out_dir,
        ],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),  # not the repo: imports must come from the zip
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
    rep = json.loads(line[len("RESULT "):])
    assert rep["epochs"] == 3

    import pyarrow.parquet as pq

    got = (
        pq.read_table(out_dir).to_pandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    want = oracle_snapshot_from_pandas(generate_events_pandas(spec))
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
    shutil.rmtree(str(tmp_path / "lake"), ignore_errors=True)
