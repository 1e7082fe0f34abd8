"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched pandas functions over
``mapInPandas``. The decode step itself is STUBBED (no image/audio
libraries in this environment): ``decode_stub=True`` routes to a
deterministic fake "decoder" so the Spark-side plumbing — schema,
batch iteration, partition sizing — is real and testable;
``decode_stub=False`` raises ``NotImplementedError`` where a real
``PIL.Image.open`` / ``soundfile.read`` call would go.

Scale notes: binary payloads make wide rows — keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition
of payloads fits executor memory, and never groupBy/shuffle the
binary column itself (extract features first, then drop it).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, byte_len long, payload binary"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, byte_len long, "
    "checksum string, fake_width int, fake_height int"
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a deterministic binary payload column from text (UTF-8
    bytes) with typed metadata — the ingestion shape a real pipeline
    would get from a binary-file datasource.

    NULL text produces no media row (a binary-file datasource emits
    rows only for files that exist); without the filter a NULL
    payload reaches the pandas workers and ``bytes(None)`` aborts the
    whole stage — one bad document would kill a 100 TB extract job
    (edge-sweep finding)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(id_col) % 2 == 0, "image/png").otherwise("audio/wav").alias("media_type"),
        F.length(payload).cast("long").alias("byte_len"),
        payload.alias("payload"),
    )


def extract_media_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    With ``decode_stub`` the "decoder" derives deterministic fake
    dimensions from the payload bytes; without it, the real decode is
    not implemented in this environment.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile; not available here"
                )
            # NULL payloads are undecodable media: skip the row, don't
            # abort the stage on bytes(None)/len(None) (ADVICE r12 —
            # same contract as resize_media/sample_frames).
            pdf = pdf[pdf["payload"].notna()]
            checksums = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            lens = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "checksum": checksums,
                    # fake decode: dims derived from byte length
                    "fake_width": (lens % 640 + 1).astype("int32"),
                    "fake_height": (lens % 480 + 1).astype("int32"),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, media_type string, byte_len long, payload binary"
)

FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_len long, frame_md5 string"
)


def resize_media(
    media: DataFrame, target_chars: int, decode_stub: bool = True
) -> DataFrame:
    """Resize step: 1→1 payload transformation over ``mapInPandas``.

    Real path (``decode_stub=False``) would decode, resample to the
    target resolution, and re-encode — not implemented here. The stub
    keeps the plumbing real by normalizing every decoded payload to
    exactly ``target_chars`` characters (truncate + NUL-pad) and
    re-encoding, so schemas, batch shapes, and downstream feature
    extraction are exercised.

    The budget is CHARACTERS, not bytes: a fixed byte budget slices
    multibyte codepoints in half (the decode(errors='ignore') repair
    is not expressible in the SQL oracle, so byte semantics could
    never be certified on non-ASCII corpora — edge-sweep finding),
    and a real resize fixes the LOGICAL size (pixels/samples), of
    which the re-encoded byte length is an output, not the target.
    ``byte_len`` therefore varies per row on multibyte text.

    The stub "decoder" accepts only UTF-8 payloads (all
    ``attach_fake_media`` ever emits). A payload that is not valid
    UTF-8 is an undecodable input: it is SKIPPED (no output row),
    exactly as a real resize skips a corrupt image, instead of
    aborting the whole stage with UnicodeDecodeError — the
    one-bad-row failure mode the engine rejects everywhere else
    (ADVICE r11)."""

    def decode_or_none(b) -> str | None:
        # NULL payloads are undecodable too: bytes(None) raises
        # TypeError, which would abort the stage and break the
        # skip-don't-abort contract (ADVICE r12).
        if b is None:
            return None
        try:
            return bytes(b).decode("utf-8")
        except UnicodeDecodeError:
            return None

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media resize requires PIL/ffmpeg; not available here"
                )
            decoded = pdf["payload"].map(decode_or_none)
            ok = decoded.notna()
            pdf, decoded = pdf[ok], decoded[ok]
            resized = decoded.map(
                lambda s: s[:target_chars].ljust(target_chars, "\0").encode("utf-8")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": resized.map(len),
                    "payload": resized,
                }
            )

    return media.mapInPandas(op, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, frame_chars: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling: 1→N row expansion over ``mapInPandas`` (each
    payload yields one row per frame). Real path would demux video /
    window audio; the stub "decodes" the UTF-8 payload and windows it
    into fixed-size character frames — deterministic, so the DuckDB
    oracle reproduces the exact frame checksums.

    Same undecodable-input contract as :func:`resize_media`: a
    payload that is not valid UTF-8 yields no frames (skip, don't
    abort the stage)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg; not available here"
                )
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # NULL media: skip, don't abort (ADVICE r12)
                try:
                    s = bytes(payload).decode("utf-8")
                except UnicodeDecodeError:
                    continue  # undecodable media: skip, don't abort
                for i in range(0, max(len(s), 1), frame_chars):
                    chunk = s[i : i + frame_chars]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i // frame_chars)
                    out["frame_len"].append(len(chunk))
                    out["frame_md5"].append(
                        hashlib.md5(chunk.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=FRAME_SCHEMA)
