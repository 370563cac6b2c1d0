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


def test_check_mismatch_prints_differing_rows(spark, sf_dir, capsys, monkeypatch):
    """Equal-cardinality value mismatches must print the offending rows,
    not just 'N rows vs N rows'."""
    import pagopa_ecommerce_cdc_service_spark.__main__ as cli

    def fake_suite():
        q = {"demo": lambda s, d: s.sql("SELECT 1 AS a UNION ALL SELECT 2 AS a")}
        o = {"demo": "SELECT 1 AS a UNION ALL SELECT 3 AS a"}
        return q, o

    monkeypatch.setattr(cli, "_suite", fake_suite)
    assert cli.main(["check", "demo", "--sf-dir", sf_dir]) == 1
    out = capsys.readouterr().out
    assert "MISMATCH: spark 2 rows vs oracle 2" in out
    assert "only-in-spark" in out and "{'a': 2}" in out
    assert "only-in-oracle" in out and "{'a': 3}" in out
