"""Unit tests for the partition-overlay publication helpers (pure
filesystem — no Spark session needed)."""

from __future__ import annotations

import os

from streaming_data_lake_spark.overlay import (
    atomic_swap,
    has_partition_dirs,
    link_untouched_partitions,
    tmp_sibling,
)


def _mk(path, content=b"x"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(content)


def test_link_untouched_partitions_reuses_inodes(tmp_path):
    live = str(tmp_path / "t")
    tmp = str(tmp_path / "t__tmp_x")
    _mk(os.path.join(live, "day=2024-01-01", "a.parquet"))
    _mk(os.path.join(live, "day=2024-01-02", "b.parquet"))
    _mk(os.path.join(live, "_SUCCESS"))
    _mk(os.path.join(tmp, "day=2024-01-02", "b2.parquet"))  # rewritten
    n = link_untouched_partitions(live, tmp, "day", {"day=2024-01-02"})
    assert n == 1
    src = os.path.join(live, "day=2024-01-01", "a.parquet")
    dst = os.path.join(tmp, "day=2024-01-01", "a.parquet")
    assert os.stat(src).st_ino == os.stat(dst).st_ino
    # rewritten partition untouched by the link pass
    assert os.listdir(os.path.join(tmp, "day=2024-01-02")) == ["b2.parquet"]


def test_atomic_swap_publishes_and_cleans(tmp_path):
    live = str(tmp_path / "t")
    tmp = str(tmp_path / "t__tmp_y")
    _mk(os.path.join(live, "old.parquet"))
    _mk(os.path.join(tmp, "new.parquet"))
    atomic_swap(live, tmp)
    assert os.listdir(live) == ["new.parquet"]
    assert not os.path.exists(tmp)
    leftovers = [e for e in os.listdir(tmp_path) if "__old_" in e]
    assert leftovers == []


def test_has_partition_dirs(tmp_path):
    t = str(tmp_path / "t")
    _mk(os.path.join(t, "part-0.parquet"))
    assert not has_partition_dirs(t, "day")
    _mk(os.path.join(t, "day=2024-01-01", "a.parquet"))
    assert has_partition_dirs(t, "day")
    assert not has_partition_dirs(t, "kb")
    assert not has_partition_dirs(str(tmp_path / "missing"), "day")


def test_tmp_sibling_is_colocated_and_swept_namable(tmp_path):
    t = str(tmp_path / "t")
    s = tmp_sibling(t)
    assert os.path.dirname(s) == os.path.dirname(t)
    assert "__tmp_" in os.path.basename(s)
