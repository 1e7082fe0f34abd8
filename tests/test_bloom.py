"""Bloom runtime-filter properties: no false negatives ever, exact
results after the verifying join even when the bitmap is adversarially
tiny (forcing false positives), and bounded bitmap size."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_lake_spark.operators.bloom import bloom_bitmap, bloom_prefilter


def _tables(spark):
    dim = spark.createDataFrame([(i,) for i in range(0, 200, 7)], "k long")
    fact = spark.createDataFrame([(i, i % 200) for i in range(2000)], "id long, k long")
    return dim, fact


def test_no_false_negatives_tiny_bitmap(spark):
    dim, fact = _tables(spark)
    # 64 bits for ~29 keys: heavy collisions guaranteed.
    bm = bloom_bitmap(dim, "k", m_bits=64, k=2)
    cand = set(r.id for r in bloom_prefilter(fact, "k", bm, m_bits=64, k=2).collect())
    true = set(
        r.id
        for r in fact.join(dim, "k", "left_semi").collect()
    )
    assert true <= cand  # Bloom may over-approximate, never under


def test_exact_after_verify_join(spark):
    dim, fact = _tables(spark)
    bm = bloom_bitmap(dim, "k", m_bits=64, k=2)
    cand = bloom_prefilter(fact, "k", bm, m_bits=64, k=2)
    got = sorted(r.id for r in cand.join(dim, "k", "left_semi").collect())
    want = sorted(r.id for r in fact.join(dim, "k", "left_semi").collect())
    assert got == want


def test_bitmap_one_row_bounded(spark):
    dim, _ = _tables(spark)
    rows = bloom_bitmap(dim, "k", m_bits=1024, k=3).collect()
    assert len(rows) == 1
    bmap = rows[0].bmap
    assert len(bmap) <= 1024 // 64
    assert all(0 <= w < 1024 // 64 for w in bmap)


def test_default_sizing_prunes(spark):
    dim, fact = _tables(spark)
    bm = bloom_bitmap(dim, "k")
    n_cand = bloom_prefilter(fact, "k", bm).count()
    n_true = fact.join(dim, "k", "left_semi").count()
    assert n_true <= n_cand < fact.count()


def test_non_multiple_of_64_bits_keeps_final_partial_word(spark):
    """m_bits that is not a multiple of 64 (the docstring's 'size m
    from the dim count' produces these) must not truncate the final
    partial word — that would crash under ANSI element_at or, worse,
    silently drop TRUE matches (false negatives the exact join cannot
    recover)."""
    dim, fact = _tables(spark)
    bm = bloom_bitmap(dim, "k", m_bits=100, k=3)
    cand = set(
        r.id for r in bloom_prefilter(fact, "k", bm, m_bits=100, k=3).collect()
    )
    true = set(r.id for r in fact.join(dim, "k", "left_semi").collect())
    assert true <= cand
