"""locks.acquire_flock: the shared degradation path must be loud and
leak-free (ADVICE r15): when open() succeeds but flock() itself
raises (ENOLCK on NFS), the half-acquired fh is closed — not leaked —
and one stderr line records that the caller is proceeding
unserialized."""

from __future__ import annotations

import errno
import fcntl

from streaming_data_lake_spark.locks import acquire_flock


def test_acquire_flock_success_returns_locked_fh(tmp_path):
    fh = acquire_flock(str(tmp_path / "t.lock"), "unit test")
    assert fh is not None and not fh.closed
    fh.close()


def test_flock_failure_closes_fh_and_warns(tmp_path, monkeypatch, capsys):
    seen = []

    def boom(fh, op):
        seen.append(fh)
        raise OSError(errno.ENOLCK, "No locks available")

    monkeypatch.setattr(fcntl, "flock", boom)
    out = acquire_flock(str(tmp_path / "t.lock"), "unit test")
    assert out is None
    # The half-acquired handle was closed, not leaked — the silent
    # variant of this bug ran the cycle unserialized AND leaked an fd
    # per cycle.
    assert len(seen) == 1 and seen[0].closed
    err = capsys.readouterr().err
    assert "UNSERIALIZED" in err and "unit test" in err


def test_cycle_still_runs_without_lock(tmp_path, monkeypatch, capsys):
    """Callers treat None as 'run anyway under the single-writer
    assumption' — a lock outage must degrade, not abort."""

    def boom(fh, op):
        raise OSError(errno.ENOLCK, "No locks available")

    monkeypatch.setattr(fcntl, "flock", boom)
    assert acquire_flock(str(tmp_path / "t.lock"), "degradation") is None
    assert "single-writer" in capsys.readouterr().err
