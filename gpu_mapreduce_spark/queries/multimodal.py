"""Multimodal queries over the media table derived from `documents`
(operators/multimodal.py). The content bytes are ASCII text, so the DuckDB
oracle can mirror byte-level operations (substring/md5/length) on VARCHAR —
verified byte-equivalent (octet_length == length for every doc)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import multimodal as mm
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_MEDIA_SQL = """
    media AS (
        SELECT doc_id AS media_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
               text,
               CAST(64 + n_chars % 512 AS INT) AS width,
               CAST(64 + doc_id % 512 AS INT) AS height,
               CAST(n_chars * 10 AS BIGINT) AS duration_ms
        FROM documents
    )
"""


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.media_table(table(spark, sf_dir, "documents"))


@register(
    "media_stats",
    tags=("llm", "multimodal"),
    oracle=f"""
        WITH {_MEDIA_SQL}
        SELECT media_id, kind,
               CAST(length(text) AS INT) AS nbytes,
               md5(text) AS content_md5,
               width, height, duration_ms
        FROM media
    """,
)
def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata + payload summary; content touched only for
    length/hash (metadata-only variants prune the binary column at the
    scan)."""
    return mm.media_stats(_media(spark, sf_dir))


@register(
    "media_frames",
    tags=("llm", "multimodal"),
    oracle=f"""
        WITH {_MEDIA_SQL}
        SELECT media_id,
               CAST(f - 1 AS INT) AS frame_idx,
               md5(substring(text, (f - 1) * {mm.FRAME_BYTES} + 1, {mm.FRAME_BYTES}))
                   AS frame_md5
        FROM media, LATERAL (
            SELECT unnest(generate_series(1,
                CAST(ceil(length(text) / {mm.FRAME_BYTES}.0) AS BIGINT))) AS f
        )
        WHERE kind = 'video'
    """,
)
def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas frame sampler whose md5-per-block output a
    SQL oracle verifies byte-for-byte — the UDF plumbing check."""
    return mm.frame_sample(_media(spark, sf_dir))


@register(
    "media_resize",
    tags=("llm", "multimodal"),
    oracle=f"""
        WITH {_MEDIA_SQL}
        SELECT media_id, kind, width, height,
               CAST(floor(width * 1 / 2) AS INT) AS new_width,
               CAST(floor(height * 1 / 2) AS INT) AS new_height,
               CAST(length(text) AS INT) AS nbytes,
               CAST(ceil(length(text) * 1 / 2) AS INT) AS thumb_bytes,
               md5(substring(text, 1, CAST(ceil(length(text) * 1 / 2) AS INT)))
                   AS thumb_md5
        FROM media
    """,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake 1/2-scale resize (meta dims floored, thumbnail = leading byte
    crop) — the brief's resize slot with the decode-real gating pattern;
    thumb_md5 verified byte-for-byte by the oracle."""
    return mm.resize_stub(_media(spark, sf_dir), num=1, den=2)


@register(
    "media_decode_features",
    tags=("llm", "multimodal"),
    oracle=f"""
        WITH {_MEDIA_SQL},
        bytes AS (
            SELECT media_id, kind,
                   list_transform(generate_series(1, length(text)),
                                  i -> ascii(substring(text, i, 1))) AS bs
            FROM media
        )
        SELECT media_id, kind,
               CASE WHEN len(bs) > 0
                    THEN CAST(list_sum(bs) AS DOUBLE) / len(bs)
                    ELSE 0.0 END AS mean_byte,
               CAST(len(bs) AS INT) AS n_bytes,
               array_to_string(
                   list_transform(generate_series(0, 15),
                       b -> CAST(len(list_filter(bs, x -> x // 16 = b)) AS INT)),
                   ',') AS hist16
        FROM bytes
    """,
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-decoder byte statistics via Arrow-batched mapInPandas. The
    content bytes are ASCII (octet_length == length for every doc, all sf),
    so the DuckDB oracle replays the byte loop with ascii() per char:
    mean_byte is an exact integer sum over one division (bit-identical
    doubles), hist16 a 16-bucket high-nibble histogram emitted as a
    canonical comma string for hash-stable output. Real codec decode is
    media_decode_real (queries/media_decode.py): pure-stdlib BMP/WAV
    decoders over generated decodable payloads, driver-checked."""
    out = mm.decode_fake(_media(spark, sf_dir))
    return out.select(
        "media_id",
        "kind",
        "mean_byte",
        "n_bytes",
        F.array_join(F.transform("hist16", lambda x: x.cast("string")), ",").alias(
            "hist16"
        ),
    )
