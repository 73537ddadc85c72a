"""Multimodal plans: binary-column metadata (SQL-checked) and the
Arrow-batched decode/feature-extract pass (rows-only; the decoder is
a deterministic stub — see multimodal/binary.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..multimodal import binary as B
from ..sources import tables
from . import QuerySpec


def _blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.with_blob(tables.load(spark, sf_dir, "documents"))


def _blobs_par(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repartitioned load for the Python decode path."""
    return B.with_blob(tables.load_parallel(spark, sf_dir, "documents"))


def mm01_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata: byte length, md5 digest, magic prefix —
    all JVM-side, media bytes never shuffled."""
    return B.binary_meta(_blobs(spark, sf_dir))


def mm02_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract via mapInPandas (deterministic stub
    decoder; real decoders plug into the same batch path)."""
    return B.extract_features(_blobs_par(spark, sf_dir))


def mm03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: metadata-derived frame count → strided
    index explode, media bytes never replicated (see binary.frame_sample)."""
    return B.frame_sample(_blobs(spark, sf_dir))


SPECS = [
    QuerySpec(
        "mm01_binary_meta",
        mm01_binary_meta,
        """
        SELECT doc_id,
               octet_length(encode(text))::BIGINT AS n_bytes,
               md5(text) AS digest,  -- == md5 of the UTF-8 bytes
               -- first 4 BYTES (not chars): slice the hex string, since
               -- DuckDB cannot slice blobs; 4 bytes == 8 hex digits
               lower(substr(hex(encode(text)), 1, 8)) AS magic_hex
        FROM documents
        """,
    ),
    QuerySpec("mm02_decode_features", mm02_decode_features, None),
    QuerySpec(
        "mm03_frame_sample",
        mm03_frame_sample,
        f"""
        WITH meta AS (
          SELECT doc_id,
                 octet_length(encode(text))::BIGINT % 60 + 1 AS n_frames
          FROM documents
        )
        SELECT doc_id, n_frames, CAST(_u.frame_idx AS BIGINT) AS frame_idx
        FROM meta, UNNEST(range(0, n_frames, {B.FRAME_STRIDE})) AS _u(frame_idx)
        """,
    ),
]
