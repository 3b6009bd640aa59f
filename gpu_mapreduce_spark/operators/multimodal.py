"""Multimodal column handling (builder brief "beyond-reference"
§multimodal): image/audio/video as opaque BINARY columns with typed
metadata, decode / feature-extract / frame-sample as Arrow-batched
mapInPandas operators.

The container ships no codec LIBRARIES, so `decode_real` decodes the two
real formats a pure stdlib parser can handle exactly — 24-bpp BI_RGB BMP
and PCM16 WAV (struct-only; tested against hand-built files) — and
quarantines everything else as fmt='unknown' rows; `decode_fake`
(deterministic byte statistics) remains the oracle-replayable stand-in
the registered queries use, exercising the same Arrow plumbing (binary
schema, metadata struct, batch shape, partitioning).

Scale notes: media rows are wide (MBs of binary per row at production
scale); mapInPandas streams Arrow batches so executor memory holds one
batch, not one partition, of decoded output. Keep
spark.sql.files.maxPartitionBytes sized so a partition's binary fits the
Arrow batch budget; metadata-only queries never touch `content` thanks to
parquet column pruning.
"""

from __future__ import annotations

import hashlib
import struct
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


def decode_bmp_bytes(data: bytes) -> dict:
    """Pure-stdlib decode of an uncompressed 24-bpp BI_RGB Windows bitmap
    (BITMAPINFOHEADER). Returns width/height/channels, the pixel-value
    count and exact integer value sum, and the md5 of the CANONICAL
    decoded stream (top-down, row-major, RGB byte order) — i.e. the
    md5 changes if the decode (row padding, bottom-up flip, BGR swap)
    is wrong, not just if the input bytes differ. Raises ValueError on
    anything that isn't this one honestly-supported format."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", data, 14)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if hdr_size < 40 or bpp != 24 or compression != 0 or width <= 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} comp={compression})")
    flip = height > 0  # positive height = bottom-up storage
    height = abs(height)
    row_bytes = ((width * 3 + 3) // 4) * 4  # rows pad to 4-byte boundary
    if len(data) < pix_off + row_bytes * height:
        raise ValueError("truncated BMP pixel array")
    md5 = hashlib.md5()
    vsum = 0
    rows = range(height - 1, -1, -1) if flip else range(height)
    for r in rows:
        row = data[pix_off + r * row_bytes : pix_off + r * row_bytes + width * 3]
        # stored BGR -> canonical RGB
        rgb = bytes(
            row[i + (2 - c)]
            for i in range(0, width * 3, 3)
            for c in range(3)
        )
        md5.update(rgb)
        vsum += sum(rgb)
    return {
        "fmt": "bmp",
        "width": width,
        "height": height,
        "channels": 3,
        "sample_rate": None,
        "n_values": width * height * 3,
        "value_sum": vsum,
        "decoded_md5": md5.hexdigest(),
    }


def decode_wav_bytes(data: bytes) -> dict:
    """Pure-stdlib decode of a RIFF/WAVE file with 16-bit PCM samples.
    Walks the chunk list (2-byte aligned per RIFF), requires a PCM fmt
    chunk and a data chunk. Returns channels/sample_rate, total sample
    count, the exact integer sum of all sample values, and the md5 of the
    canonical little-endian int16 sample stream. Raises ValueError on
    non-PCM16 content."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            # same guard as the data chunk: a declared size past the
            # available bytes or short of the 16-byte PCM header is a
            # truncated stream — keep the documented ValueError contract
            # uniform instead of leaking struct.error to direct callers
            if len(body) < size or len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            # a declared size past the available bytes (slice clamped) or an
            # odd PCM byte count is a truncated/corrupt stream: quarantine
            # like a truncated BMP, never silently decode a partial stream
            if len(body) < size or size % 2:
                raise ValueError("truncated or odd-length WAV data chunk")
            pcm = body
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even offsets
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format} bits={bits})")
    n = len(pcm) // 2
    samples = struct.unpack(f"<{n}h", pcm)
    return {
        "fmt": "wav",
        "width": None,
        "height": None,
        "channels": channels,
        "sample_rate": sample_rate,
        "n_values": n,
        "value_sum": sum(samples),
        "decoded_md5": hashlib.md5(pcm).hexdigest(),
    }


def _synth_byte(media_id: int, i: int) -> int:
    """Byte i of media_id's canonical decoded stream — the shared generation
    formula the DuckDB oracle replays as `1 + (media_id*31 + i*7) % 127`.
    Values stay in 1..127 (printable-ish ASCII range) so the oracle can
    rebuild the exact byte stream as a VARCHAR via chr() and md5 it: for
    code points 1..127 UTF-8 is one byte, so md5(string) == md5(bytes)."""
    return 1 + (media_id * 31 + i * 7) % 127


def synth_bmp_bytes(media_id: int) -> bytes:
    """Deterministic DECODABLE 24-bpp BI_RGB BMP for the media fixture:
    w = 4 + id%5, h = 3 + id%4, canonical top-down RGB byte i = _synth_byte.
    Encoded bottom-up/BGR/4-byte-padded — exercising exactly the flip/swap/
    pad logic decode_bmp_bytes must undo to reproduce the canonical
    stream."""
    w, h = 4 + media_id % 5, 3 + media_id % 4
    canon = bytes(_synth_byte(media_id, i) for i in range(w * h * 3))
    row_bytes = ((w * 3 + 3) // 4) * 4
    pix = bytearray()
    for r in range(h - 1, -1, -1):  # store bottom-up
        row = canon[r * w * 3 : (r + 1) * w * 3]
        for x in range(0, w * 3, 3):  # RGB -> stored BGR
            pix += bytes((row[x + 2], row[x + 1], row[x]))
        pix += b"\x00" * (row_bytes - w * 3)
    header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return header + dib + bytes(pix)


def synth_wav_bytes(media_id: int) -> bytes:
    """Deterministic DECODABLE PCM16 WAV: channels = 1 + id%2, n =
    channels * (4 + id%5) total samples — always a whole number of frames,
    so the data-chunk byte count is a multiple of block align and a real
    codec swapped in for the stdlib decoder accepts the fixture (r08
    ADVICE: the previous 8 + id%9 gave stereo files a fractional final
    frame — well-formed to our decoder, malformed RIFF to a strict one).
    rate = 8000 + (id%4)*4000; PCM byte i = _synth_byte (both bytes of
    every sample in 1..127, so samples are positive and the oracle's
    lo + 256*hi reconstruction is exact)."""
    channels = 1 + media_id % 2
    n = channels * (4 + media_id % 5)
    rate = 8000 + (media_id % 4) * 4000
    pcm = bytes(_synth_byte(media_id, i) for i in range(2 * n))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def media_table_decodable(docs: DataFrame) -> DataFrame:
    """Mixed media table with REAL decodable payloads, keyed off doc_id:
    id % 3 == 0 -> synth BMP, == 1 -> synth WAV, == 2 -> the doc's utf8
    text bytes (a non-media payload decode_real must quarantine). The
    payload builder is Arrow-batched mapInPandas — fixture-side synthesis
    standing in for the storage read that supplies real payloads at
    100 TB; the decode plumbing downstream is identical either way."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "content": []}
            for mid, text in zip(pdf["media_id"], pdf["text"]):
                mid = int(mid)
                if mid % 3 == 0:
                    payload = synth_bmp_bytes(mid)
                elif mid % 3 == 1:
                    payload = synth_wav_bytes(mid)
                else:
                    payload = str(text).encode("utf-8")
                out["media_id"].append(mid)
                out["content"].append(payload)
            yield pd.DataFrame(out)

    return docs.select(F.col("doc_id").alias("media_id"), "text").mapInPandas(
        build, schema="media_id bigint, content binary"
    )


_DECODE_REAL_SCHEMA = (
    "media_id bigint, fmt string, width int, height int, channels int,"
    " sample_rate int, n_values bigint, value_sum bigint, decoded_md5 string"
)


def decode_real(media: DataFrame) -> DataFrame:
    """Real decode of real formats, zero external codecs: 24-bpp BI_RGB
    BMP and PCM16 WAV via the pure-stdlib parsers above, dispatched on
    magic bytes inside one Arrow-batched mapInPandas pass (same plumbing
    as decode_fake; a deployment adding PIL/soundfile extends the
    dispatch table, not the plan). Undecodable payloads become one
    fmt='unknown' row with NULL stats instead of failing the task — at
    100 TB a corrupt object must cost one row, not a job retry; callers
    count/quarantine them. decoded_md5 is the md5 of the CANONICAL
    decoded stream (RGB top-down for bmp, LE int16 for wav), so a wrong
    flip/pad/endianness decode changes the answer.

    Reference parity: the reference's byte-payload map stage
    (mrmpi map over file contents, e.g. app/wordfreq file variants) never
    interprets media; this operator is the beyond-reference multimodal
    axis with the decode made real (builder brief §multimodal)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "fmt", "width", "height", "channels",
            "sample_rate", "n_values", "value_sum", "decoded_md5",
        ]
        for pdf in batches:
            rows: list[list] = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    # struct.error: a truncated header/chunk fails the
                    # unpack before any of the parsers' own validation
                    # can turn it into a ValueError; TypeError: a NULL
                    # payload (bytes(None)). All three are one-row
                    # quarantine cases, never task failures.
                    data = bytes(content)
                    if data[:2] == b"BM":
                        d = decode_bmp_bytes(data)
                    elif data[:4] == b"RIFF":
                        d = decode_wav_bytes(data)
                    else:
                        raise ValueError("unknown magic")
                except (ValueError, struct.error, TypeError):
                    d = {
                        "fmt": "unknown", "width": None, "height": None,
                        "channels": None, "sample_rate": None,
                        "n_values": None, "value_sum": None,
                        "decoded_md5": None,
                    }
                rows.append([mid, *(d[c] for c in cols[1:])])
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "content").mapInPandas(
        decode, schema=_DECODE_REAL_SCHEMA
    )
