"""CLI runner (workhop2_etl_spark/__main__.py) — the only user-facing
entry point; covers `list`, `run` (rows / --explain / unknown-query),
and `pipeline` over a tmp CSV pair. main() is invoked in-process so
the pytest SparkSession is reused (get_spark goes through
getOrCreate), keeping the tests JVM-cheap.
"""

from __future__ import annotations

import pytest

from workhop2_etl_spark import suite
from workhop2_etl_spark.__main__ import main


def test_cli_list_prints_every_registered_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    suite.load_all()
    assert sorted(out) == sorted(suite.QUERIES)
    assert len(out) == len(set(out))  # no dupes


def test_cli_run_rows_explain_and_unknown(spark, capsys):
    # rows mode: a tiny query at sf0.001 prints a table
    assert main(["run", "p6_isin_filter", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert "+-" in out  # df.show table framing

    # --explain prints the formatted physical plan, not rows
    assert (
        main(
            [
                "run",
                "q1_pricing_summary",
                "--sf-dir",
                "/root/testdata/sf0.001",
                "--explain",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out

    # unknown query: exit 2 with a pointer to `list`
    assert main(["run", "no_such_query"]) == 2
    err = capsys.readouterr().err
    assert "unknown query" in err


def test_cli_pipeline_over_csv_pair(spark, tmp_path, capsys):
    from tests.fixtures_grammy import make_grammy, make_spotify

    gcsv = str(tmp_path / "grammy.csv")
    scsv = str(tmp_path / "spotify.csv")
    make_grammy(n=60).to_csv(gcsv, index=False)
    make_spotify(n_tracks=80).to_csv(scsv, index=False)

    out_dir = str(tmp_path / "out")
    assert (
        main(
            [
                "pipeline",
                "--grammy",
                gcsv,
                "--spotify",
                scsv,
                "--out",
                out_dir,
            ]
        )
        == 0
    )
    assert "wrote" in capsys.readouterr().out
    result = spark.read.parquet(out_dir)
    assert result.count() > 0

    # strict mode runs too (prints rows instead of writing)
    assert (
        main(["pipeline", "--mode", "strict", "--grammy", gcsv, "--spotify", scsv])
        == 0
    )
    assert "+-" in capsys.readouterr().out


def test_cli_pipeline_requires_csv_args():
    with pytest.raises(SystemExit):
        main(["pipeline"])  # argparse: missing required --grammy/--spotify
