"""Sampling-order policy for the driver's prefix-sampled correctness gate.

The registry orders queries so the driver's 50-entry prefix sample always
re-verifies (1) queries whose code changed since their last driver row and
(2) the longest-unsampled queries — no hardcoded rotation list to go stale
(round-3 ADVICE).
"""

from rag_content_spark import queries as Q


def test_registry_and_oracles_aligned():
    names = list(Q.QUERIES)
    assert len(names) == len(set(names))
    # oracles (where present) follow the same order
    oracle_names = [n for n in Q.ORACLES if n in Q.QUERIES]
    assert oracle_names == [n for n in names if n in Q.ORACLES]


def test_order_prefers_changed_then_longest_unsampled(monkeypatch):
    names = ["a", "b", "c", "d"]
    monkeypatch.setattr(Q, "_last_sampled_rounds", lambda: {"a": 3, "b": 1, "d": 2})
    monkeypatch.setattr(Q, "_changed_queries", lambda: ({"d"}, {"d"}))
    # changed first, then never-sampled (c, last=-1), then oldest round
    assert Q._sample_order(names) == ["d", "c", "b", "a"]


def test_order_prefers_directly_changed_over_transitive(monkeypatch):
    # an infra-symbol edit can transitively flag the WHOLE registry;
    # the genuinely edited query must still outrank the flag-only ones
    names = ["a", "b", "c"]
    monkeypatch.setattr(Q, "_last_sampled_rounds", lambda: {"a": 1, "b": 2, "c": 3})
    monkeypatch.setattr(
        Q, "_changed_queries", lambda: ({"c"}, {"a", "b", "c"})
    )
    assert Q._sample_order(names) == ["c", "a", "b"]


def test_error_rows_do_not_count_as_verified(tmp_path, monkeypatch):
    # a driver row with err (or a mismatch) must leave the query ranked
    # never-verified — pca_project r01-r06 kept erroring yet kept
    # sorting to the back because its failures counted as samples
    import json

    (tmp_path / "rag_content_spark").mkdir()
    rows = {
        "good": {"rows_match": True, "hash_match": True, "err": None},
        "errq": {"rows_match": None, "hash_match": None, "err": "boom"},
        "badhash": {"rows_match": True, "hash_match": False, "err": None},
    }
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(rows))
    monkeypatch.setattr(
        Q.os.path, "abspath", lambda _: str(tmp_path / "rag_content_spark" / "q.py")
    )
    last = Q._last_sampled_rounds()
    assert last == {"good": 3}
    assert Q._row_counts() == {"good": 1}


def test_order_degrades_to_recency_on_git_failure(monkeypatch):
    names = ["a", "b"]
    monkeypatch.setattr(Q, "_last_sampled_rounds", lambda: {"a": 5})

    def _boom():
        raise RuntimeError("no git")

    monkeypatch.setattr(Q, "_changed_queries", _boom)
    assert Q._sample_order(names) == ["b", "a"]


def test_overdue_survive_a_broad_editing_round(monkeypatch):
    # round-11 failure mode: a round that edits queries.py broadly flags
    # >50 queries as directly changed, and the changed-first tier then
    # evicted the rotation-overdue queries from the driver's 50-slot
    # prefix (24 queries went >5 rounds unsampled). Overdue entries must
    # keep prefix slots no matter how large the changed tier is.
    names = [f"q{i:03d}" for i in range(120)]
    period = -(-len(names) // 50)  # 3
    last = {n: (1 if i < 10 else 9) for i, n in enumerate(names)}
    overdue = {n for n in names if last[n] <= 9 - period}
    assert len(overdue) == 10
    big_direct = {n for n in names if n not in overdue and last[n] == 9}
    assert len(big_direct) > 50
    monkeypatch.setattr(Q, "_last_sampled_rounds", lambda: last)
    monkeypatch.setattr(Q, "_changed_queries", lambda: (big_direct, set(big_direct)))
    order = Q._sample_order(names)
    assert all(order.index(n) < 50 for n in overdue)
    # overdue keep their oldest-first drain order among unchanged queries
    drain = [last[n] for n in order if n not in big_direct]
    assert drain == sorted(drain)


def test_no_query_goes_long_unsampled():
    # the FEASIBLE rotation guarantee (round-5 verdict): with N
    # registered queries and a 50-slot driver prefix, a full rotation
    # takes ceil(N/50) rounds, so a sampled query may age at most
    # ceil(N/50)-1 rounds before it MUST occupy the next prefix.
    # (The old "never more than one round" form is unsatisfiable once
    # N > 100.) Oldest-first drain keeps the bound tight.
    last = Q._last_sampled_rounds()
    names = list(Q.QUERIES)
    if not last:
        return
    newest = max(last.values())
    period = -(-len(names) // 50)  # ceil(N/50)
    overdue = [n for n in names if n in last and last[n] <= newest - period]
    assert all(names.index(n) < 50 for n in overdue)
    try:
        _, changed = Q._changed_queries()
    except Exception:
        changed = set()
    # oldest-first drain: among previously-sampled, non-changed queries
    # the order must be non-decreasing in last-sampled round, so the
    # ceil(N/50)-1 bound is actually achieved
    drain_rounds = [last[n] for n in names if n in last and n not in changed]
    assert drain_rounds == sorted(drain_rounds)
    # the sample prefix is spent only on queries that NEED a driver row:
    # never-sampled ones, changed ones (must re-enter the gate), or
    # stale ones — an unchanged fresh query may not occupy a prefix slot
    # while queries that need a row wait
    never = {n for n in names if n not in last}
    stale = {n for n in names if n in last and last[n] < newest}
    needs_row = never | changed | stale
    assert set(names[: min(50, len(needs_row))]) <= needs_row


def test_not_scale_safe_tier():
    """The scale-safety tier: exactly the three deliberate exact
    quadratic eval baselines, each with a registered scale-safe IVF
    sibling (round-9 verdict: the registry must be scale-safe by
    construction — sweeps skip this tier via --scale-safe-only instead
    of per-run exclusion lists)."""
    from rag_content_spark import queries as Q

    assert Q.NOT_SCALE_SAFE == {
        "bitext_margin",
        "hard_negatives",
        "retrieval_metrics",
    }
    assert Q.NOT_SCALE_SAFE <= set(Q.QUERIES)
    for n in Q.NOT_SCALE_SAFE:
        assert f"{n}_ivf" in Q.QUERIES
