"""Independent verification of the fake-decoder path (rows-only in the
driver) and the stub contract for real decoding."""

from __future__ import annotations

import pytest

from gpu_mapreduce_spark.operators import multimodal as mm
from gpu_mapreduce_spark.sources.tables import table
from tests.conftest import SF_DIR


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


def test_decode_real_is_stubbed(spark):
    docs = table(spark, SF_DIR, "documents")
    with pytest.raises(NotImplementedError):
        mm.decode_real(mm.media_table(docs))
