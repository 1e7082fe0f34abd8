"""Durable artifact cache — build-once physical layouts that any
session (and any PROCESS) can reuse.

The engine materializes several physical artifacts that exist purely
to make later reads cheap: bucketed copies of fact tables (co-located
joins), banded LSH signature tables (near-dup candidate generation),
the day-partitioned events layout (partition-pruned time scans), and
the IVF index (cluster-pruned ANN probes). In the reference these
artifacts live in the lake itself — Iceberg tables written once by
setup/maintenance jobs and read by every query afterwards
(`scripts/setup.sh`, `scripts/maintenance.sh`,
`iceberg/apply_tables.py:105-136`). A per-process temp dir loses that
property: every new driver process pays the full build again, which
at 100 TB is exactly the cost the artifact exists to amortize.

This module provides the lake-side analog: a content-keyed cache
directory (default ``$TMPDIR/spark_graft_artifacts``, override with
``$SPARK_GRAFT_ARTIFACTS``) where each artifact lives under a key
derived from its KIND, its build PARAMETERS, and the size+mtime
fingerprint of every INPUT file. Properties:

- **Correct under concurrency.** Builders write into a private
  ``<final>.tmp-<pid>-<nonce>`` directory and publish with an atomic
  ``os.rename``; a reader can never observe a half-built artifact,
  and two processes racing to build the same key both succeed (the
  loser discards its copy).
- **Fresh by construction.** The key fingerprints the input files
  (relative path, size, mtime_ns), so rewriting the source data
  yields a new key; stale artifacts are simply never addressed again.
- **Session-independent.** Nothing in the artifact references a
  SparkSession or a catalog; bucketed artifacts carry their schema as
  JSON so any fresh session can re-register them as external bucketed
  tables (see plans/bucketing.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

_MARKER = "_GRAFT_COMPLETE"
_ENV = "SPARK_GRAFT_ARTIFACTS"


def cache_root() -> str:
    return os.environ.get(_ENV) or os.path.join(
        tempfile.gettempdir(), "spark_graft_artifacts"
    )


def _input_fingerprint(path: str) -> list[tuple[str, int, int]]:
    """(relpath, size, mtime_ns) for every regular file under
    ``path`` (or the single file itself), sorted for determinism."""
    path = os.path.abspath(path)
    if os.path.isfile(path):
        st = os.stat(path)
        return [(os.path.basename(path), st.st_size, st.st_mtime_ns)]
    out: list[tuple[str, int, int]] = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            fp = os.path.join(root, f)
            st = os.stat(fp)
            out.append((os.path.relpath(fp, path), st.st_size, st.st_mtime_ns))
    out.sort()
    return out


def artifact_path(kind: str, inputs: list[str], params: dict) -> str:
    """Deterministic cache location for (kind, params, input files)."""
    payload = {
        "kind": kind,
        "v": 1,
        "params": params,
        "inputs": {os.path.abspath(p): _input_fingerprint(p) for p in inputs},
    }
    digest = hashlib.md5(
        json.dumps(payload, sort_keys=True).encode()
    ).hexdigest()[:20]
    return os.path.join(cache_root(), f"{kind}-{digest}")


def is_complete(path: str) -> bool:
    return os.path.isfile(os.path.join(path, _MARKER))


def ensure(kind: str, inputs: list[str], params: dict, build) -> str:
    """Return the directory of a complete artifact, building it via
    ``build(tmp_dir)`` if absent. ``build`` must create ``tmp_dir``
    (or tolerate it existing) and fill it; publication is an atomic
    rename, so concurrent builders are safe and readers never see a
    partial artifact."""
    final = artifact_path(kind, inputs, params)
    if is_complete(final):
        return final
    os.makedirs(cache_root(), exist_ok=True)
    tmp = f"{final}.tmp-{os.getpid()}-{os.urandom(4).hex()}"
    try:
        build(tmp)
        with open(os.path.join(tmp, _MARKER), "w") as fh:
            fh.write("ok")
        try:
            os.rename(tmp, final)
        except OSError:
            # Lost the publish race (or a stale complete artifact
            # reappeared): keep the winner, drop our copy below.
            if not is_complete(final):
                raise
    except BaseException:
        # Our build failed, but if a concurrent builder published a
        # complete artifact meanwhile, the caller can use it — a
        # loser's failure is moot once a winner exists.
        if not is_complete(final):
            raise
    finally:
        # Whatever happened, never leave a private tmp dir behind.
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return final


def cached_parquet(spark, kind: str, inputs: list[str], params: dict, build_df):
    """A DataFrame materialized once as a parquet artifact and read
    back by any session/process. ``build_df`` is a thunk returning
    the frame to persist — only invoked on a cache miss. For derived
    datasets that are semantically durable products of a run (e.g.
    the verified near-dup pair list), not just physical layouts."""

    def _build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        build_df().write.mode("overwrite").parquet(os.path.join(tmp, "data"))

    art = ensure(kind, inputs, params, _build)
    return spark.read.parquet(os.path.join(art, "data"))
