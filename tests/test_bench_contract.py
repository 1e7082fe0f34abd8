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


def test_prev_bench_reads_driver_wrapper_and_bare_line(tmp_path):
    """_prev_bench must unwrap the driver's {"parsed": {...}} file
    shape, accept a bare JSON line, pick the HIGHEST round, and
    return (None, round) for artifacts without per-query data."""
    import json

    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"queries": {"q": 1.0}, "cpu_calibration_sec": 0.3})
    )
    payload, rnd = bench._prev_bench(str(tmp_path))
    assert rnd == 3 and payload["queries"] == {"q": 1.0}
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"n": 1, "parsed": {"queries": {"z": 2.0},
                                       "cpu_calibration_sec": 0.25}})
    )
    payload, rnd = bench._prev_bench(str(tmp_path))
    assert rnd == 10 and payload["queries"] == {"z": 2.0}
    (tmp_path / "BENCH_r11.json").write_text(json.dumps({"n": 1, "tail": "x"}))
    payload, rnd = bench._prev_bench(str(tmp_path))
    assert rnd == 11 and payload is None


def test_find_regressions_normalizes_and_applies_floor():
    """The tripwire flags >1.5x NORMALIZED (host calibration divided
    out on both sides) and ignores sub-floor absolute moves — the r12
    phantom-spike class (VERDICT r12 "Next round" #6)."""
    prev = {
        "queries": {
            "real_regression": 1.0,   # 1.0s at cal 0.273 -> 1.0 norm
            "host_noise_only": 1.0,
            "tiny_flap": 0.10,        # 0.1 -> 0.25 is 2.5x but sub-floor
            "new_query": None,
        },
        "cpu_calibration_sec": 0.273,
    }
    prev["queries"].pop("new_query")
    # current run measured on a 2x-loaded host (calibration 0.546):
    # raw times double for host reasons; only real_regression ALSO
    # doubled in normalized terms (raw 4.0 = 2x host x 2x code).
    cur = {"real_regression": 4.0, "host_noise_only": 2.0,
           "tiny_flap": 0.50, "brand_new": 9.9}
    out = bench.find_regressions(cur, 0.546, prev, 0.273)
    assert [r["query"] for r in out] == ["real_regression"]
    assert out[0]["ratio"] == 2.0
    assert out[0]["prev_normalized"] == 1.0 and out[0]["now_normalized"] == 2.0
