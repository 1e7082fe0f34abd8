"""Property tests for the sketch / chunking constructions.

Pure-python mirrors of the exact arithmetic the Spark queries and
DuckDB oracles share (md5-derived h32, HLL registers + linear
counting, Count-Min grid, overlapping chunk spec) — no Spark session,
so hypothesis can run hundreds of cases. The Spark-vs-oracle parity
of the same arithmetic is certified separately by tools/check.py.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

HLL_M = 64
HLL_ALPHA = 0.709
CMS_D = 4
CMS_W = 256
CHUNK, STRIDE = 64, 48


def h32(s: str) -> int:
    """Mirror of functions/hashing.h32: first 8 md5 hex chars."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def h32_seeded(s: str, seed: int) -> int:
    return h32(f"{seed}:{s}")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_estimate(values) -> float:
    regs: dict[int, int] = {}
    for v in values:
        h = h32(str(v))
        bucket, w = h % HLL_M, h >> 6
        rho = 27 if w == 0 else 27 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    denom = sum(2.0 ** -m for m in regs.values()) + (HLL_M - len(regs))
    raw = HLL_ALPHA * HLL_M * HLL_M / denom
    if raw <= 2.5 * HLL_M and len(regs) < HLL_M:
        return HLL_M * math.log(HLL_M / (HLL_M - len(regs)))
    return raw


@settings(max_examples=200, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=3000),
    st.integers(min_value=1, max_value=5),
)
def test_hll_estimate_tracks_cardinality_and_ignores_duplicates(ids, dup):
    est = hll_estimate(list(ids) * dup)  # duplicates must not move the estimate
    assert est == hll_estimate(ids)
    n = len(ids)
    # m=64 → σ ≈ 1.04/√64 ≈ 13%; allow 5σ plus slack for the
    # linear-counting crossover. A real regression (wrong rho, wrong
    # bucket split, missing correction) lands far outside this.
    assert 0.25 * n <= est <= 2.5 * n


def test_hll_rho_bits_partition_the_hash():
    """bucket and rho consume disjoint bits: 6 + 26 = 32."""
    for v in range(1000):
        h = h32(str(v))
        assert h < 2**32
        assert (h % HLL_M) | ((h >> 6) << 6) == h


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def cms_estimates(tokens):
    truth = Counter(tokens)
    grid: Counter = Counter()
    for t, n in truth.items():
        for s in range(CMS_D):
            grid[(s, h32_seeded(t, s) % CMS_W)] += n
    return truth, {
        t: min(grid[(s, h32_seeded(t, s) % CMS_W)] for s in range(CMS_D))
        for t in truth
    }


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=1, max_size=400))
def test_cms_never_underestimates(tokens):
    truth, est = cms_estimates(tokens)
    for t, n in truth.items():
        assert est[t] >= n  # the Count-Min guarantee
    # With few distinct tokens relative to 4×256 cells, most
    # estimates are exact; at minimum the most frequent token's
    # estimate is bounded by total mass.
    total = sum(truth.values())
    assert all(e <= total for e in est.values())


# ---------------------------------------------------------------------------
# Overlapping chunking spec
# ---------------------------------------------------------------------------


def chunks_of(n_tok: int):
    out = []
    for i in range(math.ceil(n_tok / STRIDE)):
        lo = i * STRIDE
        hi = min(lo + CHUNK, n_tok)
        if hi > lo:
            out.append((i, lo, hi))
    return out


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=5000))
def test_chunk_cover_and_overlap(n_tok):
    ch = chunks_of(n_tok)
    # Full coverage, in order, no gaps.
    assert ch[0][1] == 0 and ch[-1][2] == n_tok
    for (_, lo_a, hi_a), (_, lo_b, hi_b) in zip(ch, ch[1:]):
        assert lo_b == lo_a + STRIDE
        # consecutive full chunks share CHUNK - STRIDE = 16 tokens
        assert lo_b < hi_a or hi_a - lo_a < CHUNK
    # Every position covered by at least one chunk.
    covered = set()
    for _, lo, hi in ch:
        covered.update(range(lo, hi))
    assert covered == set(range(n_tok))


def test_histogram_quantile_estimate_brackets_order_statistic(spark, duck):
    """The histogram sketch's guarantee, asserted exactly: the
    estimate is the upper edge of the bin holding the ceil(p*n)-th
    order statistic x, so est - width < x <= est for every group and
    both quantiles."""
    from streaming_data_lake_spark.queries import all_queries
    from tests.conftest import SF_DIR

    est_rows = (
        all_queries()["value_histogram_quantiles"].fn(spark, SF_DIR).collect()
    )
    width = 5.0
    for r in est_rows:
        for p, est in ((50, r.p50_est), (95, r.p95_est)):
            t = (p * r.n_events + 99) // 100  # ceil(p*n/100), as in the query
            x = duck.execute(
                "SELECT value FROM events WHERE event_type = ? "
                "ORDER BY value LIMIT 1 OFFSET ?",
                [r.event_type, t - 1],
            ).fetchone()[0]
            assert est - width < x <= est, (r.event_type, p, x, est)
