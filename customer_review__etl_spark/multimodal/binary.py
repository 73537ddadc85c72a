"""Binary-column operators: metadata extraction (JVM-side) and a
feature-extraction decode pass (Arrow-batched mapInPandas).

Since the driver testdata ships no media files, the blob stand-in is
the UTF-8 encoding of `documents.text` (ASCII by construction, so
byte offsets == char offsets); a production deployment reads real
bytes via spark.read.format("binaryFile") with the identical plan
shape.

Scale notes:
- metadata (length/digest/magic) never leaves the JVM;
- decode runs in mapInPandas so each Arrow batch amortizes the Python
  hop, and the iterator form streams batches without materializing a
  partition in memory;
- media bytes are never shuffled: decode is a narrow map, and any
  downstream grouping is on the extracted (small) features.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, n_channels INT, mean_lum DOUBLE"
)


def with_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the binary stand-in column."""
    return df.withColumn("blob", F.encode(F.col(text_col), "UTF-8"))


def binary_meta(df_blob: DataFrame) -> DataFrame:
    """JVM-side binary metadata: size, digest, magic prefix."""
    return df_blob.select(
        "doc_id",
        F.length("blob").cast("long").alias("n_bytes"),
        F.md5("blob").alias("digest"),
        F.lower(F.hex(F.substring(F.col("blob"), 1, 4))).alias("magic_hex"),
    )


def _decode_ppm(blob: bytes) -> tuple[int, int, int, float]:
    """Binary PPM (P6) decode — pure Python, no libraries: parse the
    'P6 <w> <h> <maxval>' header (whitespace/#-comment tolerant per
    the Netpbm spec), then mean Rec.601 luminance over the raw RGB
    payload. Exact integer header parse; the only float is the final
    mean, a deterministic sum/size division."""
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if pos >= len(blob):  # header ends before 3 fields parsed
            raise ValueError("truncated PPM header")
        if blob[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        if not blob[start:pos].isdigit():
            raise ValueError("malformed PPM header field")
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval, then raw bytes
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    px = blob[pos : pos + w * h * 3]
    if len(px) != w * h * 3:
        raise ValueError("truncated PPM payload")
    # integer-exact weighted sum; one division at the end
    lum_num = sum(
        299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2]
        for i in range(0, len(px), 3)
    )
    return w, h, 3, lum_num / (1000.0 * 255.0 * w * h)


def decode_image(blob: bytes) -> tuple[int, int, int, float]:
    """REAL image decode. Uncompressed binary PPM (P6) decodes with
    the dependency-free parser above — a real bytes→pixels path that
    runs in this environment. Compressed formats (PNG/JPEG) route to
    Pillow when installed; the guard below remains for deployments
    without it."""
    if blob is None:
        return 0, 0, 0, 0.0
    if blob[:2] == b"P6":
        return _decode_ppm(blob)
    raise NotImplementedError(
        "compressed-format decoding requires Pillow; PPM(P6) decodes "
        "natively, fake_decode covers arbitrary bytes in tests"
    )


def fake_decode(blob: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in decoder: derives a fake (width, height,
    channels, mean luminance) from the content digest so results are
    stable across runs/engines while exercising the real batch path."""
    if blob is None:
        return (0, 0, 0, 0.0)
    d = hashlib.md5(blob).digest()
    return (
        64 + d[0] % 192,          # width 64..255
        64 + d[1] % 192,          # height
        1 + d[2] % 4,             # channels 1..4
        d[3] / 255.0,             # mean luminance in [0,1]
    )


FRAME_STRIDE = 10  # sample every 10th frame


def frame_sample(df_blob: DataFrame) -> DataFrame:
    """Video-style frame sampling plumbing: derive the frame count from
    blob metadata (stand-in: 1 + n_bytes % 60; a real container parses
    the header), generate every FRAME_STRIDE-th index JVM-side with
    `sequence`, and explode to one row per sampled frame.

    The blob itself is NOT carried through the explode — at scale the
    per-frame decode joins frame indices back to blobs inside one
    mapInPandas pass (extract_features' batch path), so media bytes are
    never replicated per frame nor shuffled."""
    n_frames = (F.length("blob").cast("long") % 60 + 1).alias("n_frames")
    return (
        df_blob.select("doc_id", n_frames)
        .select(
            "doc_id",
            "n_frames",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.col("n_frames") - 1,
                    F.lit(FRAME_STRIDE).cast("long"),
                )
            ).alias("frame_idx"),
        )
    )


BLOB_CHUNK_BYTES = 128  # demo size; production shards media in MBs


def blob_chunks(df_blob: DataFrame) -> DataFrame:
    """Byte-range sharding of a binary column — the primitive behind
    parallel processing of large media objects (multi-GB videos can't
    be one task's row): fixed-size chunks with (chunk_idx, byte count,
    content digest), all JVM-side via binary substring — bytes are
    sliced, never decoded, never shuffled whole. Downstream per-chunk
    work (upload parts, rolling hashes, scan-for-magic) parallelizes
    on (doc_id, chunk_idx).

    The digest is md5 of the chunk's lowercase hex — not of the raw
    bytes — solely so the DuckDB oracle (which cannot slice blobs,
    only their hex image) can recompute it; same information."""
    n_bytes = F.length("blob").cast("long")
    c = BLOB_CHUNK_BYTES
    chunks = F.when(
        n_bytes > 0,
        F.sequence(
            F.lit(0).cast("long"),
            F.ceil(n_bytes / F.lit(c)).cast("long") - 1,
        ),
    )
    return (
        df_blob.select("doc_id", "blob", chunks.alias("idxs"))
        .select("doc_id", "blob", F.explode("idxs").alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            F.length(
                F.expr(f"substring(blob, chunk_idx * {c} + 1, {c})")
            )
            .cast("long")
            .alias("n_chunk_bytes"),
            F.md5(
                F.lower(
                    F.hex(
                        F.expr(f"substring(blob, chunk_idx * {c} + 1, {c})")
                    )
                )
            ).alias("chunk_digest"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def extract_features(df_blob: DataFrame, real: bool = False) -> DataFrame:
    """mapInPandas decode pass over the binary column.

    `real=True` routes to decode_image (NotImplementedError here);
    the default uses the deterministic fake. Batch shape, Arrow
    transfer, and output schema are identical either way.
    """
    decoder = decode_image if real else fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "mean_lum": [f[3] for f in feats],
                }
            )

    return df_blob.select("doc_id", "blob").mapInPandas(run, FEATURE_SCHEMA)
