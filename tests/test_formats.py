"""Table-format adapter: backend selection + parquet backend ops
(SURVEY.md S7/S10/X1-X3 behind one interface)."""

import os
import tempfile

import pytest

from streaming_data_lake_spark.formats import (
    DeltaFormat,
    ParquetEmulationFormat,
    resolve_format,
)


def test_resolve_picks_parquet_when_no_delta(spark):
    # This environment ships no delta jars, so the emulation backend wins.
    assert DeltaFormat.available(spark) is False
    assert resolve_format(spark).name == "parquet"


def test_resolve_env_override(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "parquet")
    assert isinstance(resolve_format(spark), ParquetEmulationFormat)


def test_resolve_explicit_prefer_wins(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "delta")
    assert resolve_format(spark, prefer="parquet").name == "parquet"


def test_resolve_unavailable_backend_raises(spark):
    with pytest.raises(RuntimeError, match="not available"):
        resolve_format(spark, prefer="delta")


def test_resolve_unknown_backend_raises(spark):
    with pytest.raises(ValueError, match="unknown table format"):
        resolve_format(spark, prefer="orc-acid")


def test_parquet_backend_upsert_roundtrip(spark):
    fmt = resolve_format(spark)
    ref = os.path.join(tempfile.mkdtemp(prefix="fmt_"), "t")
    fmt.merge_upsert(
        spark, ref, spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), ["k"]
    )
    fmt.merge_upsert(
        spark, ref, spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), ["k"]
    )
    got = {(r["k"], r["v"]) for r in fmt.read_table(spark, ref).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_parquet_backend_versioning_roundtrip(spark):
    fmt = resolve_format(spark)
    ref = os.path.join(tempfile.mkdtemp(prefix="fmt_"), "vt")
    df1 = spark.range(5).withColumnRenamed("id", "n")
    df2 = spark.range(9).withColumnRenamed("id", "n")
    assert fmt.commit_snapshot(spark, ref, df1, "append") == 1
    assert fmt.commit_snapshot(spark, ref, df2, "overwrite") == 2
    assert fmt.read(spark, ref, version=1).count() == 5
    assert fmt.read(spark, ref).count() == 9
    snaps = {
        (r["version"], r["operation"], r["n_rows"])
        for r in fmt.snapshots(spark, ref).collect()
    }
    assert snaps == {(1, "append", 5), (2, "overwrite", 9)}
    assert fmt.expire_snapshots(spark, ref, keep_last=1) == [1]
    assert fmt.read(spark, ref).count() == 9
    with pytest.raises(ValueError, match="version 1"):
        fmt.read(spark, ref, version=1)


def test_parquet_format_threads_n_buckets(spark, tmp_path):
    """Format-level callers can pin the emulation's bucket count like
    direct sources.upsert callers (ADVICE r8 #4); Delta would ignore
    it the way it ignores ts_col."""
    from streaming_data_lake_spark.formats import ParquetEmulationFormat
    from streaming_data_lake_spark.layout import read_layout_meta

    fmt = ParquetEmulationFormat()
    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    fmt.merge_upsert(spark, t, df, ["k"], n_buckets=4)
    assert read_layout_meta(t)["n_buckets"] == 4
    hook = fmt.foreach_batch_upsert(spark, t, ["k"], n_buckets=4)
    hook(spark.createDataFrame([(2, "B")], "k long, v string"), 1)
    assert read_layout_meta(t)["n_buckets"] == 4
    rows = {r["k"]: r["v"] for r in fmt.read_table(spark, t).collect()}
    assert rows == {1: "a", 2: "B"}
