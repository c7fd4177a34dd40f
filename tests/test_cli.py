from __future__ import annotations

import json

from distributed_pagerank_spark.cli import main, to_dot
from distributed_pagerank_spark.sources.transcripts import synth_transcripts


def test_cli_pagerank_generate(spark, tmp_path, capsys):
    out = str(tmp_path / "ranks")
    rc = main([
        "pagerank", "--generate", "20", "--max-iter", "5",
        "--output", out,
    ])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["algo"] == "pagerank" and meta["iterations"] == 5
    ranks = spark.read.parquet(out)
    assert ranks.count() == 20


def test_cli_derive_edges_from_transcripts(spark, tmp_path, capsys):
    tpath = str(tmp_path / "transcripts")
    synth_transcripts(spark, 10, seed=1).write.parquet(tpath)
    rc = main(["derive-edges", "--transcripts", tpath])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["edges"] > 0


def test_dot_export(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    dot = to_dot(df)
    assert dot.startswith("digraph {") and "0 -> 1;" in dot and dot.endswith("}")
