"""End-to-end launch-path test for the north rule's ``spark-submit --py-files``.

Builds ``dps.zip`` from the package (the artifact a cluster user actually
ships), then launches a REAL ``spark-submit`` subprocess from a scratch
working directory — so the driver imports the engine from the zip, not from
the repo checkout — and runs seeded-generator PageRank to parquet. On a
multi-executor cluster the identical command line (with the cluster master)
is the production launch path (README "Cluster launch").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "distributed_pagerank_spark"
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


def build_zip(zip_path: Path) -> None:
    with zipfile.ZipFile(zip_path, "w") as z:
        for f in sorted(PKG.rglob("*.py")):
            z.write(f, f.relative_to(REPO))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_pagerank(tmp_path):
    zip_path = tmp_path / "dps.zip"
    build_zip(zip_path)
    # launcher on the submit side; all engine code comes from the zip
    launcher = tmp_path / "job.py"
    launcher.write_text(
        "import sys\n"
        "from distributed_pagerank_spark.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    out_dir = tmp_path / "ranks.parquet"
    env = {
        **os.environ,
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    }
    env.pop("SPARK_GRAFT_CPUS", None)  # master must come from spark-submit
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.driver.memory=2g",
            "--py-files", str(zip_path),
            str(launcher),
            "pagerank", "--generate", "60", "--max-edges", "4", "--seed", "7",
            "--eps", "1e-6", "--max-iter", "60", "--output", str(out_dir),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, (proc.stderr or "")[-4000:]
    meta = json.loads(proc.stdout.strip().splitlines()[-1])
    assert meta["algo"] == "pagerank"
    assert meta["converged"] is True
    assert meta["output"] == str(out_dir)

    import duckdb

    n, total = duckdb.sql(
        f"SELECT count(*), sum(rank) FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchone()
    assert n > 0
    assert abs(total - 1.0) < 1e-9  # reference final normalization: sum == 1
