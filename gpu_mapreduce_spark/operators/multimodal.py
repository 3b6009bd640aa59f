"""Multimodal column handling (builder brief "beyond-reference"
§multimodal): image/audio/video as opaque BINARY columns with typed
metadata, decode / feature-extract / frame-sample as Arrow-batched
mapInPandas operators.

The container has no image/audio codecs, so the actual decode step is
STUBBED behind `decode_real` (NotImplementedError) and the tested path uses
a deterministic fake "decoder" (byte-level statistics) — the Spark-side
plumbing (binary schema, metadata struct, Arrow batch shape, partitioning)
is real and oracle-/test-verified.

Scale notes: media rows are wide (MBs of binary per row at production
scale); mapInPandas streams Arrow batches so executor memory holds one
batch, not one partition, of decoded output. Keep
spark.sql.files.maxPartitionBytes sized so a partition's binary fits the
Arrow batch budget; metadata-only queries never touch `content` thanks to
parquet column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 256  # fake frame sampler: one "frame" per 256-byte block

_KINDS = ["image", "audio", "video"]


def media_table(docs: DataFrame) -> DataFrame:
    """Derive a typed media table from documents: content = utf8 bytes of
    the text (stand-in for real image/audio payloads), metadata struct with
    per-kind fields. Schema: (media_id, kind, content BINARY,
    meta STRUCT<width INT, height INT, duration_ms BIGINT>)."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("content"),
        F.struct(
            (64 + F.col("n_chars") % 512).cast("int").alias("width"),
            (64 + F.col("doc_id") % 512).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata/payload summary — pure codegen, content only touched for
    length+hash: (media_id, kind, nbytes, content_md5, width, height,
    duration_ms)."""
    return media.select(
        "media_id",
        "kind",
        F.length("content").alias("nbytes"),
        F.md5("content").alias("content_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


def frame_sample(media: DataFrame) -> DataFrame:
    """Frame sampler for video rows: split content into FRAME_BYTES blocks,
    emit (media_id, frame_idx, frame_md5) per block — the Arrow-batched
    mapInPandas path a real video pipeline would use (batch in, many rows
    out), with md5 outputs that a SQL oracle can verify byte-for-byte."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_md5": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                for idx in range(0, len(data), FRAME_BYTES):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx // FRAME_BYTES)
                    out["frame_md5"].append(
                        hashlib.md5(data[idx : idx + FRAME_BYTES]).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").select(
        "media_id", "content"
    ).mapInPandas(sample, schema="media_id bigint, frame_idx int, frame_md5 string")


def decode_fake(media: DataFrame) -> DataFrame:
    """Deterministic fake decoder: byte-level statistics standing in for
    pixel/sample statistics. (media_id, kind, mean_byte, n_bytes,
    hist16 ARRAY<INT> — 16-bucket byte histogram.)"""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "media_id": [],
                "kind": [],
                "mean_byte": [],
                "n_bytes": [],
                "hist16": [],
            }
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                data = bytes(content)
                hist = [0] * 16
                for byte in data:
                    hist[byte >> 4] += 1
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["mean_byte"].append(sum(data) / len(data) if data else 0.0)
                rows["n_bytes"].append(len(data))
                rows["hist16"].append(hist)
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "content").mapInPandas(
        decode,
        schema="media_id bigint, kind string, mean_byte double, n_bytes int,"
        " hist16 array<int>",
    )


def resize_stub(media: DataFrame, num: int = 1, den: int = 2) -> DataFrame:
    """Deterministic fake resize at scale num/den: metadata dims scaled
    (floor), thumbnail = the leading ceil(nbytes·num/den) content bytes (a
    byte-crop — a REAL resample needs codecs; see decode_real for the
    gating pattern). Pure codegen (substring on the binary column stays
    JVM-side; no Python); thumb_md5 lets a SQL oracle verify the produced
    bytes exactly. Output: (media_id, kind, width, height, new_width,
    new_height, nbytes, thumb_bytes, thumb_md5)."""
    tlen = F.ceil(F.length("content") * num / den).cast("int")
    return media.select(
        "media_id",
        "kind",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.floor(F.col("meta.width") * num / den).cast("int").alias("new_width"),
        F.floor(F.col("meta.height") * num / den).cast("int").alias("new_height"),
        F.length("content").alias("nbytes"),
        tlen.alias("thumb_bytes"),
        F.md5(F.col("content").substr(F.lit(1), tlen)).alias("thumb_md5"),
    )


def decode_real(media: DataFrame) -> DataFrame:
    """Real codec decode — requires image/audio libraries this container
    doesn't ship. The call signature and schema match decode_fake so a
    deployment with codecs swaps implementations without plan changes."""
    raise NotImplementedError(
        "real media decoding needs PIL/soundfile/av; use decode_fake for the "
        "pipeline shape, or install codecs and implement decode() here"
    )
