"""Advisory-flock acquisition shared by every serialized writer.

Three write paths serialize multi-process races with a blocking
``flock`` on a sibling lock file: the materializer's whole-cycle
lock and watermark-store lock (plans/materialize.py) and the
upsert sink's whole-MERGE lock (sources/upsert.py). All three
degrade to a documented single-writer assumption where flock is
unavailable — but that degradation must be LOUD and leak-free
(ADVICE r15): if ``open()`` succeeds and ``flock()`` itself then
fails (ENOLCK on NFS is the classic), the naive handler leaks the
open descriptor and silently runs the cycle UNSERIALIZED,
reintroducing the exact double-append race the lock exists to
prevent, with no signal. This helper closes the fh in that branch
and emits one stderr line so an unserialized run is always visible.
"""

from __future__ import annotations

import sys
from typing import IO


def acquire_flock_nonblocking(
    lock_path: str, what: str
) -> tuple[str, IO[str] | None]:
    """NON-blocking variant for opportunistic serialization (the
    orphan sweep's base-missing restore): returns
    ``("acquired", fh)`` (close fh to release), ``("busy", None)``
    when a live holder owns the lock (the caller should defer to the
    holder), or ``("unavailable", None)`` when flock itself cannot be
    used here — LOUDLY, like :func:`acquire_flock`, because the
    caller proceeding anyway is running under the documented
    single-writer assumption with no serialization."""
    fh = None
    try:
        import fcntl

        fh = open(lock_path, "a")
        fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
        return "acquired", fh
    except BlockingIOError:
        if fh is not None:
            fh.close()
        return "busy", None
    except (ImportError, OSError) as exc:
        if fh is not None:
            fh.close()
        print(
            f"locks: non-blocking flock unavailable for {what} at "
            f"{lock_path!r} ({exc!r}); caller proceeding UNSERIALIZED "
            f"under the documented single-writer assumption",
            file=sys.stderr,
        )
        return "unavailable", None


def acquire_flock(lock_path: str, what: str) -> IO[str] | None:
    """Open ``lock_path`` and take a blocking exclusive flock.

    Returns the open file handle (close it to release the lock), or
    ``None`` when the lock cannot be taken — after closing any
    half-acquired handle and warning on stderr that ``what`` is
    proceeding unserialized. Callers must treat ``None`` as "the
    single-writer assumption is now load-bearing", never as success.
    """
    fh = None
    try:
        import fcntl

        fh = open(lock_path, "a")
        fcntl.flock(fh, fcntl.LOCK_EX)
        return fh
    except (ImportError, OSError) as exc:
        if fh is not None:
            fh.close()
        print(
            f"locks: flock unavailable for {what} at {lock_path!r} "
            f"({exc!r}); proceeding UNSERIALIZED under the documented "
            f"single-writer assumption",
            file=sys.stderr,
        )
        return None
