"""bench.py is driver-executed per round; a stale HEADLINE name (a
renamed/deleted query) would crash the run and cost the round its
BENCH_r{N}.json. Pin the harness contract: every headline name
resolves in the registry, the per-round order shuffle is
deterministic in its seed, and the seed derivation tracks the
CORRECTNESS files on disk."""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_headline_names_resolve_in_registry():
    from streaming_data_lake_spark.queries import all_queries

    registered = set(all_queries())
    missing = [n for n in bench.HEADLINE if n not in registered]
    assert not missing, f"headline names not in registry: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_order_shuffle_is_deterministic_permutation():
    a = list(bench.HEADLINE)
    random.Random(9).shuffle(a)
    b = list(bench.HEADLINE)
    random.Random(9).shuffle(b)
    assert a == b
    assert sorted(a) == sorted(bench.HEADLINE)
    c = list(bench.HEADLINE)
    random.Random(10).shuffle(c)
    assert c != a  # different round, different order


def test_round_seed_tracks_correctness_files(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SEED", "123")
    assert bench._round_seed() == 123
    monkeypatch.delenv("SPARK_GRAFT_BENCH_SEED")
    # live repo: one past the highest CORRECTNESS round on disk
    import glob
    import re

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    assert bench._round_seed() == (max(rounds) if rounds else 0) + 1
