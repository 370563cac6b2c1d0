"""CLI surface: list / run / check verbs (in-process; build_session
getOrCreate reuses the test session)."""

from __future__ import annotations

from pagopa_ecommerce_cdc_service_spark.__main__ import main


def test_list_names_every_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "cdc_transactions_view\toracle" in out
    assert len(out.strip().splitlines()) >= 111


def test_check_matches_oracle(spark, sf_dir, capsys):
    assert main(["check", "w_last_event_per_user", "--sf-dir", sf_dir]) == 0
    assert "OK: w_last_event_per_user matches oracle" in capsys.readouterr().out


def test_run_prints_rows(spark, sf_dir, capsys):
    assert main(["run", "w_topk_per_type", "--sf-dir", sf_dir, "--limit", "3"]) == 0
    assert "event_type" in capsys.readouterr().out


def test_unknown_query_is_an_error(spark, capsys):
    assert main(["run", "no_such_query"]) == 2
