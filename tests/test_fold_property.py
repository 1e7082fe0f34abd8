"""Property test for the shared sessionization fold: the vectorized
gaps-and-islands + segment fold must equal a naive per-event fold for
any event multiset and any carried state. Pure pandas/numpy — no
Spark session — so hypothesis can run hundreds of cases."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from streaming_data_lake_spark.streaming.sessionize import _fold_batch

GAP_US = 3_000_000  # 3 s in microseconds — tight gap to force many sessions


def naive_fold(events, carried, gap_us):
    """Reference: every carried pending session is ONE MORE interval
    in a start-sorted ascending merge over per-event point intervals —
    exactly the batch gaps-and-islands SQL and session_window on the
    full replayed stream. (The pre-r10 reference treated the carried
    state as the running accumulator, which absorbed ANY earlier
    event — ``t - carried_end`` is negative, hence trivially within
    gap — merging sessions the oracle keeps separate, and kept late
    events from merging with each other before the carried span;
    r10 review pass 2 fixed the implementation, and this reference
    mirrors the corrected contract.) Events carry (ts, cents, finite):
    a non-finite value contributes 0 cents and 0 to the session's
    finite-value count (nfin), mirroring the NULL-skipping decimal
    SUM contract."""
    segs = [(t, t, 1, c if f else 0, 1 if f else 0) for t, c, f in sorted(events)]
    segs.extend(tuple(c) for c in (carried or []))
    segs.sort(key=lambda s: (s[0], s[1]))
    merged = []
    start, end, n, cents, nfin = segs[0]
    for s, e, k, c, f in segs[1:]:
        if s - end > gap_us:
            merged.append((start, end, n, cents, nfin))
            start, end, n, cents, nfin = s, e, k, c, f
        else:
            end = max(end, e)
            n += k
            cents += c
            nfin += f
    merged.append((start, end, n, cents, nfin))
    return merged


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60_000_000),  # ts within a minute
        st.integers(min_value=0, max_value=99_999),  # exact cents
        st.booleans(),  # finite? False -> NaN value (excluded)
    ),
    min_size=1,
    max_size=60,
)

_one_session = st.tuples(
    st.integers(min_value=0, max_value=10_000_000),  # start
    st.integers(min_value=0, max_value=20_000_000),  # end (may exceed early ts)
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=0, max_value=1_000_000),
    st.integers(min_value=0, max_value=10),  # nfin (finite-value count)
).map(lambda t: (min(t[0], t[1]), max(t[0], t[1]), t[2], t[3], min(t[4], t[2])))

# The r17 sealed-emission protocol carries a LIST of pending sessions.
carried_strategy = st.lists(_one_session, min_size=0, max_size=4)


@settings(max_examples=300, deadline=None)
@given(events=events_strategy, carried=carried_strategy)
def test_fold_batch_matches_naive(events, carried):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([t for t, _, _ in events], unit="us"),
            "value": [c / 100.0 if f else float("nan") for _, c, f in events],
        }
    )
    got = _fold_batch(pdf, carried, GAP_US)
    want = naive_fold(events, carried, GAP_US)
    assert got == want


def test_emit_sessions_all_excluded_total_is_null():
    """A session whose every value was NULL/non-finite (nfin == 0)
    emits total_value NULL, matching the NULL-skipping decimal SUM of
    the batch oracle and the certified sessionize_native path — not
    0.0 (ADVICE r12)."""
    from streaming_data_lake_spark.streaming.sessionize import _emit_sessions

    out = _emit_sessions(7, [(0, 10, 2, 0, 0), (20, 30, 3, 150, 2)])
    assert out["total_value"].isna().tolist() == [True, False]
    assert out["total_value"][1] == 1.5
    # the mask must survive Arrow conversion as a NULL, not a NaN
    import pyarrow as pa

    col = pa.Table.from_pandas(out)["total_value"]
    assert col.null_count == 1


# ---------------------------------------------------------------------------
# Morton (z-order) spread: pure-Python mirror of the SQL steps
# ---------------------------------------------------------------------------


def _py_spread(x: int) -> int:
    from streaming_data_lake_spark.queries.analytics import _Z_SPREAD_STEPS

    for sh, mask in _Z_SPREAD_STEPS:
        x = (x | (x << sh)) & mask
    return x


def _py_unspread(x: int) -> int:
    """Collect the even bit positions back into a compact int."""
    out = 0
    for i in range(16):
        out |= ((x >> (2 * i)) & 1) << i
    return out


@given(st.integers(0, 65535), st.integers(0, 65535))
@settings(max_examples=300, deadline=None)
def test_morton_interleave_roundtrip(x, y):
    """interleave(x, y) de-interleaves back to (x, y) and is
    monotone-per-dimension on shared prefixes — the property the
    SQL expression text encodes step-for-step."""
    z = _py_spread(x) | (_py_spread(y) << 1)
    assert _py_unspread(z) == x
    assert _py_unspread(z >> 1) == y
    assert 0 <= z < 1 << 32


def test_morton_sql_matches_python(spark):
    """The shared `<< | &` SQL expression text computes the same key
    as the Python mirror for a boundary grid (0, 1, powers, maxima)."""
    from pyspark.sql import functions as F

    from streaming_data_lake_spark.queries.analytics import _Z_SPREAD_STEPS, _z_step

    vals = [0, 1, 2, 255, 256, 1023, 21845, 65535]
    df = spark.createDataFrame(
        [(x, y) for x in vals for y in vals], "zx long, zy long"
    )
    expect = {
        (x, y): _py_spread(x) | (_py_spread(y) << 1) for x in vals for y in vals
    }
    probe = df.withColumn("x0", F.col("zx")).withColumn("y0", F.col("zy"))
    for sh, mask in _Z_SPREAD_STEPS:
        probe = probe.select(
            F.expr(_z_step("zx", sh, mask)).alias("zx"),
            F.expr(_z_step("zy", sh, mask)).alias("zy"),
            "x0",
            "y0",
        )
    rows = probe.select(
        "x0", "y0", F.expr("zx | (zy << 1)").alias("z")
    ).collect()
    for r in rows:
        assert r.z == expect[(r.x0, r.y0)], (r.x0, r.y0)
