"""Pins the bench driver contract: the HEADLINE set must stay a
SUPERSET of every key ever recorded in a past BENCH_r{N}.json — the
judge diffs per-query times across rounds, and a dropped key reads as
a hidden regression. Also pins that every headline name resolves in
the registry."""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _recorded_keys() -> set[str]:
    keys: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "BENCH_r0*.json")):
        raw = open(path).read()
        # the driver records the bench stdout tail; per-query keys
        # appear as "name": seconds pairs inside the queries dict
        for name, _ in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', raw):
            keys.add(name)
    drop = {"metric", "value", "sf", "n", "rc", "cpus"}
    return {k for k in keys if k not in drop}


def test_headline_superset_of_recorded_keys():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    headline = set(bench.HEADLINE)
    missing = _recorded_keys() - headline
    assert missing == set(), (
        f"HEADLINE dropped previously-recorded bench keys: {missing}"
    )


def test_headline_names_resolve_in_registry():
    import importlib.util
    import sys

    sys.path.insert(0, REPO)
    from chai_data_pipeline_spark import plans

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    unknown = [n for n in bench.HEADLINE if n not in plans.QUERIES]
    assert unknown == []


def test_driver_window_names_resolve():
    """Every name in the driver-ordering lists (_FRONT, _DRIVER_GREEN,
    _NO_ORACLE_LAST) must exist in the registry — a typo'd name
    silently drops a query out of its intended gate position."""
    import sys

    sys.path.insert(0, REPO)
    import chai_data_pipeline_spark.plans as plans

    for lst in (
        plans._FRONT,
        plans._FORCE_FRONT,
        plans._DRIVER_GREEN,
        plans._NO_ORACLE_LAST,
    ):
        unknown = [n for n in lst if n not in plans.QUERIES]
        assert unknown == [], unknown
    # and the front blocks must be entirely oracle-bearing: the cap is
    # spent on hash-checkable evidence
    assert [n for n in plans._FRONT if n not in plans.ORACLES] == []
    assert [n for n in plans._FORCE_FRONT if n not in plans.ORACLES] == []


def test_load_driver_rows_parses_and_skips_corrupt(tmp_path):
    """The self-refolding front derives greens/checked from the
    driver's CORRECTNESS_r*.json artifacts; a corrupt or non-dict file
    must be skipped, not crash the import."""
    import json
    import sys

    sys.path.insert(0, REPO)
    from chai_data_pipeline_spark import plans

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "green_q": {"hash_match": True, "rows_match": True},
                "red_q": {"hash_match": False, "err": "hash mismatch"},
                "rowsonly_q": {"hash_match": False, "err": "no_oracle"},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r03.json").write_text('["a", "list"]')
    (tmp_path / "CORRECTNESS_r09.json").write_text(
        json.dumps({"green_q": {"hash_match": True}})
    )
    greens, checked, green_round = plans._load_driver_rows(str(tmp_path))
    assert greens == {"green_q"}
    assert checked == {"green_q", "red_q", "rowsonly_q"}
    # the latest green round wins (drives _FORCE_FRONT self-expiry)
    assert green_round == {"green_q": 9}
    # empty dir degrades to empty sets (static fallback covers it)
    empty = tmp_path / "sub"
    empty.mkdir()
    assert plans._load_driver_rows(str(empty)) == (set(), set(), {})


def test_driver_rank_invariants():
    """Pins the self-refolding order: never-checked oracle-bearing
    queries outrank every green; a _FRONT pin self-expires once green;
    oracle-less rows-only entries rank dead last."""
    import sys

    sys.path.insert(0, REPO)
    from chai_data_pipeline_spark import plans

    order = list(plans.QUERIES)
    pos = {n: i for i, n in enumerate(order)}
    unchecked = [
        n
        for n in order
        if n in plans.ORACLES and n not in plans._CHECKED
    ]
    greens = [
        n
        for n in order
        if n in plans._GREENS
        and n not in plans._FRONT
        and n not in plans._FORCE_FRONT  # changed-semantics re-checks
        and n not in plans._RECONFIRM  # standing re-confirm quota
    ]
    no_oracle = [n for n in order if n not in plans.ORACLES]
    if unchecked and greens:
        assert max(pos[n] for n in unchecked) < min(pos[n] for n in greens)
    if no_oracle:
        # every oracle-less query sits behind every oracle-bearing one
        assert min(pos[n] for n in no_oracle) > max(
            pos[n] for n in order if n in plans.ORACLES
        )
    # a green pin must not hold rank 0 (self-expiry) — unless it is a
    # _FORCE_FRONT re-check, which deliberately overrides expiry
    for n in plans._FRONT:
        if n in plans._GREENS and n not in plans._FORCE_FRONT:
            assert plans._rank(n)[0] != 0


def test_reconfirm_quota_invariants():
    """The standing re-confirm quota (judge advice r9 item 7): exactly
    QUOTA oracle-bearing greens with the OLDEST green evidence rank
    ahead of never-checked work each round, so a vacuous-parity kill
    cannot hide for a full ~7-round green cycle."""
    import sys

    sys.path.insert(0, REPO)
    from chai_data_pipeline_spark import plans

    q = plans._RECONFIRM
    assert len(q) <= plans._RECONFIRM_QUOTA
    # all picks are oracle-bearing greens
    assert all(n in plans.ORACLES and n in plans._GREENS for n in q)
    # picks are the stalest: no non-pick green has an older green
    # round — except greens holding an ACTIVE _FORCE_FRONT pin, which
    # already reach the window at rank 0 and are skipped by the quota
    # (round 14: spending a refresh slot on a pinned name is waste)
    if len(q) == plans._RECONFIRM_QUOTA:
        newest_pick = max(plans._GREEN_ROUND.get(n, 0) for n in q)
        others = [
            plans._GREEN_ROUND.get(n, 0)
            for n in plans._GREENS
            if n in plans.ORACLES
            and n not in q
            and not (
                n in plans._FORCE_FRONT
                and plans._GREEN_ROUND.get(n, 0) < plans._FORCE_FRONT[n]
            )
        ]
        if others:
            assert min(others) >= newest_pick
    # quota ranks after every active pin but before rank-1 unchecked
    pos = {n: i for i, n in enumerate(plans.QUERIES)}
    unchecked = [
        n
        for n in plans.QUERIES
        if n in plans.ORACLES and n not in plans._CHECKED
    ]
    if q and unchecked:
        assert max(pos[n] for n in q) < min(pos[n] for n in unchecked)
    for n in q:
        rank = plans._rank(n)
        assert rank[0] == 0 and rank[1] >= 10**6, (n, rank)


def test_force_front_self_expiry():
    """A _FORCE_FRONT pin holds rank 0 only until the query earns a
    green row in a round >= its since-round; a later green retires it
    automatically (no manual cleanup next round). Both directions are
    simulated via the _GREEN_ROUND override so the test never depends
    on which CORRECTNESS_r*.json artifacts exist on disk (the r8
    failure mode: asserting live pin state went stale the moment the
    driver landed the artifact that expired the pins)."""
    import sys

    sys.path.insert(0, REPO)
    from chai_data_pipeline_spark import plans

    old = dict(plans._GREEN_ROUND)
    try:
        for name, since in plans._FORCE_FRONT.items():
            # green only in a round BEFORE the re-pin shipped → the
            # old evidence is stale, pin active: rank 0
            plans._GREEN_ROUND[name] = since - 1
            assert plans._rank(name)[0] == 0, name
            # green in the re-pin round (or later) → pin expires
            plans._GREEN_ROUND[name] = since
            assert plans._rank(name)[0] != 0, name
    finally:
        plans._GREEN_ROUND.clear()
        plans._GREEN_ROUND.update(old)


def test_regression_reexposes_at_rank_2(tmp_path):
    """Latest-round green semantics (judge advice r8): a query green
    in round N but red in round N+1 must drop out of the green set so
    rank 2 re-exposes it — _load_driver_rows takes the LATEST checked
    round's status, not a cross-round union."""
    import json
    import sys

    sys.path.insert(0, REPO)
    from chai_data_pipeline_spark import plans

    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"q": {"hash_match": True}})
    )
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"q": {"hash_match": False, "err": "hash mismatch"}})
    )
    greens, checked, green_round = plans._load_driver_rows(str(tmp_path))
    assert "q" in checked and "q" not in greens
    assert green_round == {"q": 3}
    # and a later re-green restores it
    (tmp_path / "CORRECTNESS_r06.json").write_text(
        json.dumps({"q": {"hash_match": True}})
    )
    greens2, _, gr2 = plans._load_driver_rows(str(tmp_path))
    assert "q" in greens2 and gr2 == {"q": 6}


def test_parity_selection_changed_only(monkeypatch):
    """SPARK_GRAFT_PARITY_CHANGED=1 restricts the parametrized parity
    suite to queries whose plan module changed; any shared-package
    change falls back to the full sweep; env unset is a no-op."""
    import subprocess
    import sys

    sys.path.insert(0, REPO)
    from chai_data_pipeline_spark import plans
    from chai_data_pipeline_spark.testing import parity_selection

    names = sorted(plans.ORACLES)

    # env unset — full set
    monkeypatch.delenv("SPARK_GRAFT_PARITY_CHANGED", raising=False)
    assert parity_selection(names) == names

    def fake_run(diff_lines, untracked_lines):
        def run(cmd, **kw):
            class R:
                stdout = "\n".join(
                    diff_lines if "diff" in cmd else untracked_lines
                )
            return R()
        return run

    monkeypatch.setenv("SPARK_GRAFT_PARITY_CHANGED", "1")

    # only plans/dedup.py changed — restrict to dedup-module queries
    monkeypatch.setattr(
        subprocess, "run",
        fake_run(["chai_data_pipeline_spark/plans/dedup.py"], []),
    )
    got = parity_selection(names)
    assert got and all(
        plans.QUERIES[n].__module__.endswith(".dedup") for n in got
    )
    assert "substring_dedup_apply" in got
    assert "tpch_q1_pricing_summary" not in got

    # a shared package file changed — full sweep
    monkeypatch.setattr(
        subprocess, "run",
        fake_run(["chai_data_pipeline_spark/operators/text.py"], []),
    )
    assert parity_selection(names) == names

    # nothing changed — empty selection (nothing to re-prove)
    monkeypatch.setattr(subprocess, "run", fake_run([], []))
    assert parity_selection(names) == []

    # untracked new plan module also counts
    monkeypatch.setattr(
        subprocess, "run",
        fake_run([], ["chai_data_pipeline_spark/plans/dedup.py"]),
    )
    assert "dedup_exact_content" in parity_selection(names)
