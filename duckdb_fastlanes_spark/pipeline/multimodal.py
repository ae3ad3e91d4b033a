"""Multimodal columns: opaque ``binary`` payloads + typed metadata structs.

The FastLanes format reserves a JPEG column type it never materializes
(/root/reference/src/reader/row_group_statistics.cpp:116) — this module is
that hook made real on Spark: media travel as BinaryType columns with a typed
metadata struct; decode / feature-extract run as Arrow-batched pandas
functions over ``mapInPandas``.

The image/audio codec libraries are not in this container, so the *decode*
step is a deterministic fake behind ``decode_image`` (clearly marked); the
Spark-side plumbing — schema, batch iteration, partition parallelism — is real
and tested. Swap ``_fake_decode`` for PIL/libvips and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.registry import register

#: schema of a decoded media feature row (what a real decoder would emit)
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_format", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
    ]
)


def attach_media(df: DataFrame) -> DataFrame:
    """Attach a synthetic binary media payload + typed metadata struct to each
    document row. Payload = md5 digest bytes of the text (deterministic fake
    of stored media); metadata mirrors a real ingest (format, nbytes)."""
    payload = F.unhex(F.md5("text"))
    return df.select(
        "doc_id",
        payload.alias("media"),
        F.struct(
            F.lit("jpeg").alias("format"),
            F.octet_length(payload).alias("nbytes"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """STUB decoder — deterministic fake standing in for PIL/libvips (libs not
    in this container). Derives (width, height, mean_luma) from the payload
    bytes so tests are stable. A real deployment replaces only this function."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 64
    height = 64 + h[1] % 64
    mean_luma = round(sum(payload) / (len(payload) * 255.0), 6)
    return width, height, mean_luma


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Decode an image payload → (width, height, mean_luma).

    Real codecs are unavailable in this environment; a deterministic fake is
    used instead (see ``_fake_decode``). Raise if someone expects real pixels.
    """
    return _fake_decode(payload)


def extract_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas: one Python worker per
    input partition, pandas batch in / pandas batch out — the canonical Spark
    shape for media pipelines (no collect, no per-row UDF overhead)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media, meta in zip(pdf["doc_id"], pdf["media"], pdf["media_meta"]):
                width, height, luma = decode_image(bytes(media))
                rows.append(
                    (int(doc_id), meta["format"], int(meta["nbytes"]), width, height, luma)
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media_df.mapInPandas(run, FEATURE_SCHEMA)


@register(
    "multimodal_metadata",
    oracle="""
    SELECT
        doc_id,
        'jpeg'                       AS media_format,
        CAST(16 AS BIGINT)           AS payload_bytes,
        source                       AS origin,
        md5(text)                    AS content_hex
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column plumbing, SQL-observable part: payload size from the
    binary column + metadata struct fields (md5-digest payload is 16 bytes)."""
    d = table(spark, sf_dir, "documents")
    media = attach_media(d)
    return media.join(d.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.col("media_meta.format").alias("media_format"),
        F.col("media_meta.nbytes").cast("bigint").alias("payload_bytes"),
        F.col("media_meta.origin").alias("origin"),
        F.lower(F.hex("media")).alias("content_hex"),
    )


@register("multimodal_features")  # no oracle: mapInPandas decode is not SQL-expressible
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode path: binary payload → mapInPandas feature extraction
    (stubbed codec). Driver records the weaker rows-only check."""
    d = table(spark, sf_dir, "documents")
    return extract_features(attach_media(d)).orderBy("doc_id")


#: schema of a resized-image row
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("resized", T.BinaryType(), False),
    ]
)

#: schema of a sampled video frame row (one input row → many frame rows)
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_hash", T.StringType(), False),
    ]
)


def resize_images(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every image payload to (width, height) — mapInPandas, one Arrow
    batch per partition. STUB pixels: the 'resized' payload is a deterministic
    digest of (payload, dims) standing in for the real scaled bitmap; a real
    deployment swaps only the inner two lines for PIL's Image.resize."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                fake_pixels = hashlib.sha256(
                    bytes(media) + f"{width}x{height}".encode()
                ).digest()
                out.append((int(doc_id), width, height, fake_pixels))
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return media_df.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(media_df: DataFrame, every_nth: int = 4, n_frames: int = 16) -> DataFrame:
    """Frame-sample a 'video' payload: one input row expands to ceil(n/every_nth)
    frame rows — the mapInPandas shape where output cardinality differs from
    input (a pandas_udf cannot do this). STUB decode: frame i's content is a
    deterministic digest of (payload, i); a real deployment decodes with
    pyav/ffmpeg per sampled index without touching the surrounding plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                for i in range(0, n_frames, every_nth):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    hashes.append(
                        hashlib.sha256(bytes(media) + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return media_df.mapInPandas(run, FRAME_SCHEMA)


@register("multimodal_frame_sample")  # no oracle: mapInPandas row expansion
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the documents-as-videos corpus: every 4th of 16
    frames per payload → 4 frame rows per document. Rows-only check; the
    pytest suite pins cardinality and determinism."""
    d = table(spark, sf_dir, "documents")
    return sample_frames(attach_media(d)).orderBy("doc_id", "frame_idx")


#: schema of decoded audio features
AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms_level", T.DoubleType(), False),
    ]
)


def extract_audio_features(media_df: DataFrame) -> DataFrame:
    """Audio feature extraction over mapInPandas: payload → (sample_rate,
    n_samples, duration, RMS level). STUB codec (no soundfile/librosa in this
    container): features derive deterministically from the payload bytes; a
    real decoder replaces only the inner block — the Arrow batching, schema,
    and partition parallelism are the production shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(media)
                h = hashlib.sha256(payload).digest()
                sample_rate = (8000, 16000, 22050, 44100)[h[2] % 4]
                n_samples = sample_rate * (1 + h[3] % 30)  # 1-30 s of audio
                rms = round(sum(payload) / (len(payload) * 255.0), 6)
                rows.append(
                    (int(doc_id), sample_rate, n_samples, n_samples / sample_rate, rms)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return media_df.mapInPandas(run, AUDIO_SCHEMA)


@register("multimodal_audio_features")  # no oracle: mapInPandas decode
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality decode path (rows-only check; pytest pins schema,
    determinism, and rate/duration invariants)."""
    d = table(spark, sf_dir, "documents")
    return extract_audio_features(attach_media(d)).orderBy("doc_id")


@register(
    "multimodal_payload_dedup",
    oracle="""
    WITH groups AS (
        SELECT md5(text) AS fp, count(*) AS n, min(doc_id) AS keep_id
        FROM documents GROUP BY 1
    )
    SELECT count(*) AS distinct_payloads,
           CAST(sum(n) AS BIGINT) AS total_rows,
           count(*) FILTER (WHERE n > 1) AS dup_groups,
           CAST(max(n) AS BIGINT) AS max_copies
    FROM groups
    """,
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keyed on the BINARY media payload itself: group directly
    on the opaque bytes column (BinaryType grouping — no hex/string detour
    in the engine), emit the dedup profile. This is how a media pipeline
    drops byte-identical assets before any decode spend. The oracle states
    the same profile via the md5 fingerprint the payload was derived from
    (attach_media: payload = unhex(md5(text))), so byte-level and
    fingerprint-level grouping must agree exactly."""
    d = table(spark, sf_dir, "documents")
    media = attach_media(d)
    groups = media.groupBy("media").agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep_id")
    )
    return groups.agg(
        F.count(F.lit(1)).alias("distinct_payloads"),
        F.sum("n").cast("bigint").alias("total_rows"),
        F.count_if(F.col("n") > 1).alias("dup_groups"),
        F.max("n").cast("bigint").alias("max_copies"),
    )
