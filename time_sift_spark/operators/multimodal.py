"""Multimodal (binary) column operators — the plumbing is real, the
codec is stubbed (charter: image/audio libs are not in this container).

Design (charter: "treat image/audio/video as opaque binary columns with
typed metadata"):

* ``blob_metadata``     — pure-expression metadata over a binary column:
  byte size, md5, magic-byte format sniff.  No Python, codegen'd.
* ``decode_image``      — Arrow-batched ``mapInPandas``.  If PIL were
  installed it would decode for real; here the decode step is either a
  clearly-marked ``NotImplementedError`` or a DETERMINISTIC fake whose
  outputs are pure arithmetic on the blob's md5 — which makes the whole
  Pandas-UDF batch path oracle-checkable end-to-end (the DuckDB oracle
  reproduces the same arithmetic in SQL).
* ``extract_features``  — same pattern: fixed-dim pseudo-embedding
  derived deterministically from content bytes.

Scale: metadata is a projection (scan-bound); decode is mapInPandas with
Arrow batches — the shape you'd use for a real codec (CPU-bound per
partition, no shuffle), so the partitioning story is already correct.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError

# magic-byte prefixes (hex, uppercase) → format tag
MAGIC = (
    ("FFD8FF", "jpeg"),
    ("89504E47", "png"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi container
    ("494433", "mp3"),
    ("25504446", "pdf"),
)

try:  # the real codec is gated behind an import-try (not in this image)
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def sniff_format_expr(binary_col: str):
    """Magic-byte format sniff as a pure Column expression."""
    col = f"upper(hex(substring({binary_col}, 1, 8)))"
    expr = "'unknown'"
    for prefix, tag in reversed(MAGIC):
        expr = f"CASE WHEN startswith({col}, '{prefix}') THEN '{tag}' ELSE {expr} END"
    return F.expr(expr)


def blob_metadata(df: DataFrame, binary_col: str, *, keep_cols: Sequence[str] = ()) -> DataFrame:
    """Typed metadata for an opaque binary column (no Python, no shuffle)."""
    if binary_col not in df.columns:
        raise ColumnNotFoundError(f"column {binary_col!r} not in {df.columns}")
    b = F.col(binary_col)
    return df.select(
        *keep_cols,
        F.length(b).alias("size_bytes"),
        F.md5(b).alias("blob_md5"),
        sniff_format_expr(binary_col).alias("format"),
    )


def _fake_dims(md5_hex: str) -> tuple[int, int, int]:
    """Deterministic fake decode: dims are arithmetic on the md5 prefix.

    Spec (mirrored by the SQL oracle — keep in sync with
    queries.decode_image oracle): h = int(md5[:15], 16);
    width = 32 + h % 993; height = 32 + (h // 993) % 993; channels = 3.
    """
    h = int(md5_hex[:15], 16)
    return 32 + h % 993, 32 + (h // 993) % 993, 3


def decode_image(
    df: DataFrame,
    binary_col: str,
    *,
    id_col: str,
    fake: bool = True,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode an image blob → (id, width, height, channels, format).

    With PIL absent and ``fake=False`` this raises NotImplementedError at
    executor time — the honest stub.  ``fake=True`` (default) runs the
    deterministic fake decode so the full mapInPandas pipeline (schema,
    Arrow batching, partition preservation) is exercised and verified.
    """
    for c in (binary_col, id_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")

    schema = f"{id_col} long, width int, height int, channels int, format string"
    magic = list(MAGIC)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake and not _HAVE_PIL:
                raise NotImplementedError(
                    "real image decode requires PIL, which is not installed; "
                    "use fake=True for the deterministic stub"
                )
            out = []
            for vid, blob in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(blob) if blob is not None else b""
                digest = hashlib.md5(raw).hexdigest()
                w, hgt, c = _fake_dims(digest)
                hexhead = raw[:8].hex().upper()
                fmt = next((tag for p, tag in magic if hexhead.startswith(p)), "unknown")
                out.append((vid, w, hgt, c, fmt))
            yield pd.DataFrame(out, columns=[id_col, "width", "height", "channels", "format"])

    return df.select(id_col, binary_col).mapInPandas(_decode, schema)


def resize_image(
    df: DataFrame, binary_col: str, *, id_col: str, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize stub: real PIL path gated behind the import-try; the fake
    emits the target dims plus a deterministic content hash of what WOULD
    be the resized bytes (md5 of original ++ target dims) so pipelines
    downstream have a stable key to join on."""
    for c in (binary_col, id_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    schema = f"{id_col} long, width int, height int, resized_md5 string"

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake and not _HAVE_PIL:
                raise NotImplementedError("real resize requires PIL; use fake=True")
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(blob) if blob is not None else b""
                digest = hashlib.md5(raw + f"{width}x{height}".encode()).hexdigest()
                rows.append((vid, width, height, digest))
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "resized_md5"])

    return df.select(id_col, binary_col).mapInPandas(_resize, schema)


def sample_frames(
    df: DataFrame, binary_col: str, *, id_col: str, every_n: int = 10, fake: bool = True
) -> DataFrame:
    """Video frame-sampling stub: one output row per sampled frame.

    The fake derives a deterministic frame count from the blob hash and
    emits every ``every_n``-th frame index with a per-frame content hash —
    the real decoder would slot into the same mapInPandas shape (one
    input row fanning out to N output rows)."""
    for c in (binary_col, id_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    schema = f"{id_col} long, frame_idx int, frame_md5 string"

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires a video codec; use fake=True")
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(blob) if blob is not None else b""
                digest = hashlib.md5(raw).hexdigest()
                n_frames = 1 + int(digest[:4], 16) % 100
                for idx in range(0, n_frames, every_n):
                    # frame hash spec (mirrored by the SQL oracle — keep in
                    # sync with queries.sample_frames oracle):
                    # md5(blob ++ ascii(idx))
                    fd = hashlib.md5(raw + str(idx).encode()).hexdigest()
                    rows.append((vid, idx, fd))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_md5"])

    return df.select(id_col, binary_col).mapInPandas(_sample, schema)


def extract_features(
    df: DataFrame, binary_col: str, *, id_col: str, dim: int = 8
) -> DataFrame:
    """Deterministic pseudo-embedding from content bytes (stub for a real
    visual/audio encoder; identical Arrow plumbing and output schema)."""
    for c in (binary_col, id_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    schema = f"{id_col} long, feature array<float>"

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(blob) if blob is not None else b""
                d = hashlib.md5(raw).digest()
                # repeat digest to dim floats in [-1, 1)
                vals = [((d[i % 16] / 128.0) - 1.0) for i in range(dim)]
                rows.append((vid, vals))
            yield pd.DataFrame(rows, columns=[id_col, "feature"])

    return df.select(id_col, binary_col).mapInPandas(_feat, schema)
