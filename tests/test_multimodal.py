"""Independent verification of the fake-decoder path (rows-only in the
driver) and of decode_real against hand-built BMP/WAV files whose decoded
statistics are computed here byte-by-byte, independently of the operator."""

from __future__ import annotations

import hashlib
import struct

import pytest

from gpu_mapreduce_spark.operators import multimodal as mm
from gpu_mapreduce_spark.sources.tables import table
from tests.conftest import SF_DIR


def _bmp_24(width: int, height: int, pixels_rgb: list[list[tuple]]) -> bytes:
    """Build a real bottom-up 24-bpp BI_RGB BMP from top-down RGB rows,
    including the 4-byte row padding — the parts a wrong decoder gets
    wrong."""
    row_bytes = ((width * 3 + 3) // 4) * 4
    pix = b""
    for row in reversed(pixels_rgb):  # file stores bottom-up
        raw = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # and BGR
        pix += raw + b"\x00" * (row_bytes - len(raw))
    header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pix), 2835, 2835, 0, 0)
    return header + dib + pix


def _wav_pcm16(channels: int, rate: int, samples: list[int]) -> bytes:
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_real_bmp_wav_and_quarantine(spark):
    # 3x2 image: distinct channel values everywhere so a BGR-swap or
    # bottom-up-flip mistake changes the canonical stream md5
    rows_rgb = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    bmp = _bmp_24(3, 2, rows_rgb)
    canonical = b"".join(bytes(p) for row in rows_rgb for p in row)
    samples = [0, 1000, -1000, 32767, -32768, 123]
    wav = _wav_pcm16(2, 44100, samples)
    media = spark.createDataFrame(
        [(1, bmp), (2, wav), (3, b"\x89PNG not supported")],
        "media_id bigint, content binary",
    )
    got = {r.media_id: r.asDict() for r in mm.decode_real(media).collect()}
    assert got[1] == {
        "media_id": 1, "fmt": "bmp", "width": 3, "height": 2,
        "channels": 3, "sample_rate": None, "n_values": 18,
        "value_sum": sum(sum(p) for row in rows_rgb for p in row),
        "decoded_md5": hashlib.md5(canonical).hexdigest(),
    }
    assert got[2] == {
        "media_id": 2, "fmt": "wav", "width": None, "height": None,
        "channels": 2, "sample_rate": 44100, "n_values": len(samples),
        "value_sum": sum(samples),
        "decoded_md5": hashlib.md5(
            struct.pack(f"<{len(samples)}h", *samples)
        ).hexdigest(),
    }
    assert got[3]["fmt"] == "unknown" and got[3]["decoded_md5"] is None


def test_decode_real_pure_parsers_reject_malformed():
    with pytest.raises(ValueError):  # truncated pixel array
        mm.decode_bmp_bytes(_bmp_24(3, 2, [[(0, 0, 0)] * 3] * 2)[:-5])
    with pytest.raises(ValueError):  # 8-bit PCM unsupported
        bad = bytearray(_wav_pcm16(1, 8000, [1, 2, 3]))
        bad[34] = 8  # bits_per_sample field
        mm.decode_wav_bytes(bytes(bad))
    with pytest.raises(ValueError):  # truncated data chunk (declared size
        # exceeds available bytes) must quarantine, not decode a partial stream
        mm.decode_wav_bytes(_wav_pcm16(1, 8000, [1, 2, 3])[:-2])
    with pytest.raises(ValueError):  # odd-length PCM byte count
        odd = bytearray(_wav_pcm16(1, 8000, [1, 2]))
        odd[-8:-4] = struct.pack("<I", 3)  # data chunk declares 3 bytes
        mm.decode_wav_bytes(bytes(odd[:-1]))
    with pytest.raises(ValueError):  # truncated fmt chunk: the documented
        # ValueError contract, not a struct.error leak (r08 ADVICE)
        good = _wav_pcm16(1, 8000, [1, 2])
        mm.decode_wav_bytes(good[:20])  # cuts inside the fmt body


def test_synth_wav_whole_frames():
    """Stereo fixtures must contain a whole number of frames (data bytes a
    multiple of block align) — a strict RIFF codec rejects fractional final
    frames even though the stdlib decoder tolerates them (r08 ADVICE)."""
    for mid in range(32):
        d = mm.decode_wav_bytes(mm.synth_wav_bytes(mid))
        assert d["n_values"] % d["channels"] == 0


def test_synth_payloads_round_trip_to_formula():
    """The generated decodable fixtures must decode back to the closed-form
    stats the media_decode_real oracle replays — checked here byte-by-byte
    against the generation formula, independently of the SQL."""
    for mid in [0, 3, 6, 123, 4998]:  # % 3 == 0 -> bmp
        w, h = 4 + mid % 5, 3 + mid % 4
        canon = bytes(1 + (mid * 31 + i * 7) % 127 for i in range(w * h * 3))
        d = mm.decode_bmp_bytes(mm.synth_bmp_bytes(mid))
        assert (d["fmt"], d["width"], d["height"], d["channels"]) == ("bmp", w, h, 3)
        assert d["n_values"] == w * h * 3 and d["value_sum"] == sum(canon)
        assert d["decoded_md5"] == hashlib.md5(canon).hexdigest()
    for mid in [1, 4, 7, 124, 4999]:  # % 3 == 1 -> wav
        ch = 1 + mid % 2
        n = ch * (4 + mid % 5)  # whole frames: n is a multiple of channels
        pcm = bytes(1 + (mid * 31 + i * 7) % 127 for i in range(2 * n))
        d = mm.decode_wav_bytes(mm.synth_wav_bytes(mid))
        assert (d["fmt"], d["channels"], d["sample_rate"]) == (
            "wav", 1 + mid % 2, 8000 + (mid % 4) * 4000
        )
        assert d["n_values"] == n
        assert d["value_sum"] == sum(
            pcm[2 * k] + 256 * pcm[2 * k + 1] for k in range(n)
        )
        assert d["decoded_md5"] == hashlib.md5(pcm).hexdigest()


def test_decode_fake_matches_python(spark, ddb):
    docs = table(spark, SF_DIR, "documents")
    got = {
        r.media_id: (r.kind, r.mean_byte, r.n_bytes, list(r.hist16))
        for r in mm.decode_fake(mm.media_table(docs)).collect()
    }
    want_rows = ddb.sql("SELECT doc_id, text FROM documents").fetchall()
    kinds = ["image", "audio", "video"]
    assert len(got) == len(want_rows)
    for doc_id, text in want_rows:
        data = text.encode()
        hist = [0] * 16
        for byte in data:
            hist[byte >> 4] += 1
        kind, mean_byte, n_bytes, hist16 = got[doc_id]
        assert kind == kinds[doc_id % 3]
        assert n_bytes == len(data)
        assert mean_byte == pytest.approx(sum(data) / len(data))
        assert hist16 == hist


def test_decode_real_quarantines_nonmedia_corpus(spark):
    """The documents-derived media table's utf8 payloads are not BMP/WAV:
    every row must land in the fmt='unknown' quarantine, none may error."""
    docs = table(spark, SF_DIR, "documents")
    out = mm.decode_real(mm.media_table(docs).limit(20))
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.fmt == "unknown" and r.value_sum is None for r in rows)
