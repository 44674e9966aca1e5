"""CLI surface: list / run / explain must work in-process (the module is the
engine's job entry point — the Spark-native stand-in for the reference's
declared Glue job invocation)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from data_pipeline_aws_spark.__main__ import main


def test_cli_list_names_every_registered_query(spark):
    from data_pipeline_aws_spark import all_queries

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["list"])
    assert rc == 0
    names = set(buf.getvalue().split())
    assert names == set(all_queries())


def test_cli_run_show_and_explain(spark, sf_dir):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["run", "q_agg_basic", "--sf-dir", sf_dir, "--show", "3"])
    assert rc == 0
    assert "l_returnflag" in buf.getvalue()

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["run", "q_agg_basic", "--sf-dir", sf_dir, "--explain"])
    assert rc == 0
    assert "Physical Plan" in buf.getvalue()


def test_cli_unknown_query_is_an_error(spark):
    assert main(["run", "q_definitely_not_registered"]) == 2
