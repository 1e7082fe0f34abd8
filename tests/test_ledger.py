"""The certified-verdict ledger is a CI gate: every registered query
must have a fresh passing driver verdict OR a slot in the current
certification window that will earn one this round. Turns the
judge's manual CORRECTNESS_r*.json cross-referencing (VERDICT r4
"Next round" #7) into an automated check."""

from __future__ import annotations

import os
import sys

# Resolve tools/ relative to THIS checkout — a hardcoded path would
# import (and audit) a different repo when the tests run elsewhere.
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import ledger  # noqa: E402


def test_ledger_green_under_current_window_or_committed_drain():
    """Green ledger. r20 is the FINAL round and its window holds every
    stale name (27-name drain + 22 late touches + 1 fill — pinned by
    tests/test_registry_order), so there is no committed-next-drain
    exception left: every stale or never-certified name must sit
    INSIDE the window, and FAILED verdicts are never excused — a
    regression must not hide behind rotation."""
    problems, rows = ledger.audit()
    assert rows, "ledger saw no queries — registry import broken?"
    unexcused = []
    for row in rows:
        if row["status"] == "FAILED":
            unexcused.append(f"{row['query']}: FAILED verdict")
        elif (
            row["status"] in ("stale", "never-certified")
            and not row["windowed"]
        ):
            unexcused.append(
                f"{row['query']}: {row['status']} and outside the final "
                f"r20 window"
            )
    assert not unexcused, "\n".join(unexcused)


def test_ledger_detects_a_hole():
    """The gate must bite on synthetic fixtures: a stale verdict
    outside the window, a never-certified query outside the window,
    and a failed latest verdict are each problems; a stale-but-
    windowed query is not. Fixtures (not live repo state) so the
    test is green regardless of what the driver just wrote.
    never_q sits BEYOND the committed-next region (2*window) so it is
    a genuine hole, not a pending-next-window deferral."""
    order = ["fresh_q", "stale_windowed_q", "stale_out_q", "failed_q", "never_q"]
    verdicts = {
        "fresh_q": (5, True, ""),
        "stale_windowed_q": (1, True, ""),
        "stale_out_q": (1, True, ""),
        "failed_q": (5, False, "hash mismatch"),
    }
    problems, rows = ledger.audit(
        max_age=2, window=2, verdicts=verdicts, order=order
    )
    assert len(rows) == 5
    blamed = {p.split(":")[0] for p in problems}
    assert blamed == {"stale_out_q", "never_q", "failed_q"}, problems


def test_ledger_failed_verdict_fires_even_when_windowed():
    """A windowed slot plugs staleness, not a recorded FAILURE —
    regressions must not hide behind rotation."""
    problems, _rows = ledger.audit(
        max_age=2,
        window=1,
        verdicts={"bad_q": (5, False, "rows mismatch")},
        order=["bad_q"],
    )
    assert problems and "bad_q" in problems[0]


def test_every_verdict_name_is_a_registered_query():
    """A CORRECTNESS entry for a name the registry no longer exports
    means a query was renamed/deleted after certification — its
    verdict silently vouches for nothing."""
    known = set(ledger.registry_order())
    seen = set(ledger.load_verdicts())
    orphans = seen - known
    assert not orphans, f"verdicts for unregistered queries: {sorted(orphans)}"


def test_plan_next_lists_soon_stale_and_never_certified():
    """--plan-next must name exactly the queries whose verdict goes
    stale when one more round lands, plus never-certified ones."""
    due = ledger.plan_next(
        max_age=2,
        verdicts={
            "old_q": (3, True, ""),      # r3 at next=6 -> stale
            "ok_q": (4, True, ""),       # r4 at next=6 -> still fresh
            "fresh_q": (5, True, ""),
        },
        order=["old_q", "ok_q", "fresh_q", "new_q"],
    )
    assert due == [("old_q", 3), ("new_q", None)]


def test_plan_next_includes_fresh_failures():
    """A regressed query is an obligatory slot no matter how fresh
    its failing verdict is — the audit flags failures at any age, so
    the plan must schedule the re-certification."""
    due = ledger.plan_next(
        max_age=2,
        verdicts={"bad_q": (5, False, "hash mismatch"), "good_q": (5, True, "")},
        order=["bad_q", "good_q"],
    )
    assert due == [("bad_q", 5)]


def test_emit_order_obligatory_first_then_oldest_fills():
    """--emit-order: obligatory names lead in registry order, free
    window slots fill with the oldest-verdict survivors, the tail
    stays oldest-first — and the result is always a permutation."""
    order = ["a", "b", "c", "d", "e", "f"]
    verdicts = {
        "a": (5, True, ""),   # fresh
        "b": (3, True, ""),   # stale at next=6 -> obligatory
        "c": (4, True, ""),   # oldest survivor -> fill
        "d": (5, False, ""),  # failed -> obligatory
        "e": (5, True, ""),   # fresh
        # f never certified  -> obligatory
    }
    new_order, notes = ledger.emit_order(
        max_age=2, window=4, verdicts=verdicts, order=order
    )
    # obligatory in registry order: b, d, f; one free slot -> oldest
    # survivor c; tail = a, e (r5, by position).
    assert new_order == ["b", "d", "f", "c", "a", "e"]
    assert sorted(new_order) == sorted(order)
    assert notes and "fills" in notes[0]


def test_emit_order_overflow_becomes_committed_drain():
    """More obligatory names than window slots: the overflow leads
    the tail (pure prefix rotation next round) and a DRAIN note
    records the split — the r9 two-round-drain shape."""
    order = ["a", "b", "c", "d"]
    verdicts = {"d": (9, True, "")}  # a, b, c never certified
    new_order, notes = ledger.emit_order(
        max_age=2, window=2, verdicts=verdicts, order=order
    )
    assert new_order == ["a", "b", "c", "d"]
    assert notes and notes[0].startswith("DRAIN: 3 obligatory > 2 slots")


def test_emit_order_live_state_is_a_permutation():
    """Over the real repo state the recommendation is a permutation
    of the live registry that covers every currently-due name inside
    the window (when they fit)."""
    new_order, _notes = ledger.emit_order()
    live = ledger.registry_order()
    assert sorted(new_order) == sorted(live)
    due = [n for n, _r in ledger.plan_next()]
    window = new_order[: ledger.WINDOW]
    for name in due[: ledger.WINDOW]:
        assert name in window, name


def test_order_sensitive_subset_derivation():
    """The shuffle-sweep gate runs on a DERIVED order-sensitive
    subset (VERDICT r11 "Next round" #7). Pin the derivation's
    recall on known-sensitive queries (window ranking, LIMIT ties,
    folds, collected lists) and that it actually prunes — a subset
    that silently grew to the full registry would erode the gate
    budget, one that lost the ranking queries would erode coverage."""
    import edge_sweep

    names = set(edge_sweep.order_sensitive_names())
    must_have = {
        "topn_customers_per_nation",      # row_number + LIMIT ties
        "latest_event_per_user_type",     # row_number dedup
        "top_busiest_hours",              # ORDER BY + LIMIT
        "value_histogram_quantiles",      # fold over histogram bins
        "user_event_type_paths",          # collect_list path
        "batch_sessionize_windows",       # lag-based sessionization
    }
    assert must_have <= names, sorted(must_have - names)
    total = len(ledger.registry_order())
    assert len(names) < total * 0.5, (
        f"derived subset ({len(names)}) no longer prunes the registry ({total})"
    )


def test_never_certified_pending_next_window_is_not_a_problem():
    """A NEW query cannot earn a verdict when the current window is
    exactly full; parked in the committed next-window region
    (positions window..2*window) with a PENDING_SINCE record of the
    current round, it reports pending-next-window and passes. Outside
    that region it is still a hole, and a STALE or FAILED verdict
    parked there gets no such grace."""
    order = ["w1", "w2", "new_committed", "stale_parked", "new_far"]
    verdicts = {
        "w1": (5, True, ""),
        "w2": (5, True, ""),
        "stale_parked": (1, True, ""),
    }
    problems, rows = ledger.audit(
        max_age=2, window=2, verdicts=verdicts, order=order,
        pending_since={"new_committed": 5},
    )
    by_name = {r["query"]: r["status"] for r in rows}
    assert by_name["new_committed"] == "pending-next-window"
    assert by_name["stale_parked"] == "stale"
    assert by_name["new_far"] == "never-certified"
    blamed = {p.split(":")[0] for p in problems}
    assert blamed == {"stale_parked", "new_far"}, problems


def test_pending_next_window_grace_is_age_bounded():
    """The grace covers exactly one rotation (ADVICE r12): once a
    LATER verdict round lands while the query is still never
    certified, a committed-next parking spot no longer passes — and a
    name with no PENDING_SINCE record gets no grace at all."""
    order = ["w1", "w2", "new_committed", "unrecorded", "t1"]
    verdicts = {"w1": (6, True, ""), "w2": (6, True, "")}
    # pending since r5, latest round now r6 -> a full rotation passed
    problems, rows = ledger.audit(
        max_age=2, window=2, verdicts=verdicts, order=order,
        pending_since={"new_committed": 5},
    )
    by_name = {r["query"]: r["status"] for r in rows}
    assert by_name["new_committed"] == "never-certified"
    assert by_name["unrecorded"] == "never-certified"
    blamed = {p.split(":")[0] for p in problems}
    assert {"new_committed", "unrecorded"} <= blamed, problems
    assert any("grace EXPIRED" in p for p in problems), problems


def test_live_pending_since_covers_live_never_certified():
    """Every never-certified name in the LIVE registry must carry a
    PENDING_SINCE record (the bound is meaningless for unrecorded
    names — they are immediately red when parked)."""
    verdicts = ledger.load_verdicts()
    for name in ledger.registry_order():
        if name not in verdicts:
            assert name in ledger.PENDING_SINCE, (
                f"{name} is never-certified but has no PENDING_SINCE entry"
            )


def test_skew_sweep_mutations_are_deterministic_and_hot():
    """make_skew (tools/edge_sweep.py --skew, VERDICT r12 #5) must be
    deterministic (two calls bit-identical), concentrate the declared
    hot fractions, preserve primary keys and contracted value columns
    untouched, and keep documents.n_chars consistent with text."""
    import collections

    import pyarrow.parquet as pq

    import edge_sweep

    ev = pq.read_table("/root/testdata/sf0.001/events.parquet")
    a = edge_sweep.make_skew("events", ev)
    b = edge_sweep.make_skew("events", ev)
    assert a.equals(b), "skew generation must be deterministic"
    uid = collections.Counter(a.column("user_id").to_pylist())
    assert uid.most_common(1)[0][1] / a.num_rows > 0.35, "hot user share"
    # PKs and contracted value column untouched
    assert a.column("event_id").equals(ev.column("event_id"))
    assert a.column("value").equals(ev.column("value"))
    assert a.column("ts").equals(ev.column("ts"))

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    d = edge_sweep.make_skew("documents", docs)
    txt = d.column("text").to_pylist()
    nch = d.column("n_chars").to_pylist()
    assert all(t is None or len(t) == c for t, c in zip(txt, nch)), (
        "n_chars must track mutated text"
    )
    hot_share = sum(1 for t in txt if t and t.endswith("zz hot token")) / len(txt)
    assert hot_share > 0.2, hot_share

    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    e = edge_sweep.make_skew("embeddings", emb)
    vecs = e.column("embedding").to_pylist()
    hot = sum(1 for v in vecs if v and v[0] is not None and abs(v[0] - 1.0) < 0.02)
    assert hot / len(vecs) > 0.12, "hot LSH/IVF direction share"
    assert e.column("vec_id").equals(emb.column("vec_id"))


def test_skew_runtime_blowup_regex_catches_slow_lines():
    """The skew sweep's bounded-runtime parse must flag a query over
    the bound on both PASS and FAIL lines and ignore fast ones."""
    import re as _re

    pat = _re.compile(r"^(PASS|FAIL) (\S+):.*\[([0-9.]+)s\]")
    fast = pat.search("PASS top_tokens: 20 rows, 3 cols [0.7s]")
    slow = pat.search("PASS minhash_lsh_near_dups: 9 rows, 3 cols [241.3s]")
    failslow = pat.search("FAIL knn_ivf_cosine: rows 3 vs 4 [500.0s]")
    assert fast and float(fast.group(3)) < edge_sweep_max()
    assert slow and float(slow.group(3)) > edge_sweep_max()
    assert failslow and float(failslow.group(3)) > edge_sweep_max()


def edge_sweep_max() -> float:
    import edge_sweep

    return edge_sweep.SKEW_MAX_QUERY_SEC


def test_row_scale_tiling_invariants():
    """make_row_scale (tools/edge_sweep.py --row-scale, the r14
    row-COUNT axis) must be deterministic, multiply rows exactly K,
    keep PKs unique across copies, keep the orders<->lineitem FK
    closed inside every copy (shared orderkey stride), grow user
    cardinality, keep documents' copies NEAR-dups (not exact) with
    n_chars recomputed, and pass dimension tables through untouched —
    breaking any of these silently drains the sweep's signal."""
    import pyarrow.parquet as pq

    import edge_sweep

    ev = pq.read_table("/root/testdata/sf0.001/events.parquet")
    a = edge_sweep.make_row_scale("events", ev)
    b = edge_sweep.make_row_scale("events", ev)
    assert a.equals(b), "row-scale generation must be deterministic"
    k = edge_sweep.ROW_SCALE_K
    assert a.num_rows == ev.num_rows * k
    ids = a.column("event_id").to_pylist()
    assert len(ids) == len(set(ids)), "event_id must stay unique across copies"
    base_users = len(set(ev.column("user_id").to_pylist()))
    assert len(set(a.column("user_id").to_pylist())) == base_users * k

    orders = pq.read_table("/root/testdata/sf0.001/orders.parquet")
    li = pq.read_table("/root/testdata/sf0.001/lineitem.parquet")
    ok = set(edge_sweep.make_row_scale("orders", orders).column("o_orderkey").to_pylist())
    lk = set(edge_sweep.make_row_scale("lineitem", li).column("l_orderkey").to_pylist())
    assert not (lk - ok), "every tiled lineitem row must keep its order"

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    d = edge_sweep.make_row_scale("documents", docs)
    txt = d.column("text").to_pylist()
    nch = d.column("n_chars").to_pylist()
    assert all(t is None or len(t) == c for t, c in zip(txt, nch))
    n = docs.num_rows
    base_txt = docs.column("text").to_pylist()
    # copies are near-dups, never byte-identical to their source row
    for c in range(1, k):
        for i in (0, n - 1):
            if base_txt[i] is not None:
                assert txt[c * n + i] != base_txt[i]
                assert txt[c * n + i].startswith(base_txt[i])

    nation = pq.read_table("/root/testdata/sf0.001/nation.parquet")
    assert edge_sweep.make_row_scale("nation", nation).equals(nation), (
        "dimension tables pass through untouched"
    )
