"""Console entry point (__main__.py) — the runnable surface mirroring
the reference's console apps (MainStreamApp, RoutesProducer/
TripsProducer). Functional tests drive main() in-process against the
session fixture's SparkSession (get_spark returns the active one)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from kafkastreams_tp3_is_spark.__main__ import main  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q4_occupancy_per_route" in out
    assert "fuzzy_dedup_against" in out
    assert "entries" in out and "oracles" in out


def test_cli_run_query(spark, capsys):
    assert main(["run", "q9_total_passengers", "--sf-dir", SF_DIR]) == 0
    assert "totalPassengers" in capsys.readouterr().out


def test_cli_run_unknown_query_fails(capsys):
    assert main(["run", "no_such_query", "--sf-dir", SF_DIR]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_run_explain(spark, capsys):
    assert main(["run", "q1_available_seats_per_route",
                 "--sf-dir", SF_DIR, "--explain"]) == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_cli_sql_short_label(spark, capsys):
    assert main(["sql", "q7", "--sf-dir", SF_DIR]) == 0
    out = capsys.readouterr().out
    assert "totalCapacity" in out


def test_cli_run_writes_parquet(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "q5_out")
    assert main(["run", "q5_passengers_per_route", "--sf-dir", SF_DIR,
                 "--out", out_dir]) == 0
    assert spark.read.parquet(out_dir).count() > 0


def test_cli_produce_to_parquet(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "routes_out")
    assert main(["produce", "routes", "--n", "25", "--out", out_dir]) == 0
    df = spark.read.parquet(out_dir)
    assert df.count() == 25
    assert "route_id" in df.columns


def test_cli_topology(spark, tmp_path, capsys):
    assert main(["topology", "--sf-dir", SF_DIR,
                 "--workdir", str(tmp_path / "topo")]) == 0
    import json

    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["n_queries"] == 13 and stats["n_triggers"] >= 1
    assert stats["rows_per_query"]["q9"] == 1


def test_cli_sql_unknown_label_fails_friendly(capsys):
    """A q-label typo ('q99') must not fall through to spark.sql() as
    ad-hoc SQL (raw AnalysisException) — it exits 2 with the candidate
    list, like cmd_run's unknown-query path (ADVICE r11)."""
    assert main(["sql", "q99", "--sf-dir", SF_DIR]) == 2
    err = capsys.readouterr().err
    assert "unknown query label 'q99'" in err
    assert "q7_total_capacity_available" in err
