"""Real-decoder media query (r08 tail registration): decode_real over a
mixed media table whose BMP/WAV payloads are deterministically GENERATED
from media_id (operators/multimodal.synth_bmp_bytes / synth_wav_bytes) —
promoting the r07 pure-stdlib decoders from unit-tested to driver-checked.

The oracle never parses bytes: it replays the generation parameters in SQL
(widths/heights/sample counts are closed-form in media_id; the canonical
decoded stream's bytes are `1 + (media_id*31 + i*7) % 127`, all in 1..127,
so DuckDB rebuilds the exact stream as a VARCHAR via chr() and md5s it —
one-byte UTF-8 makes md5(string) == md5(bytes)). A wrong bottom-up flip,
BGR swap, row-padding slip, or endianness mistake in the decoder changes
decoded_md5/value_sum and fails the hash gate; text payloads (id % 3 == 2)
must land as fmt='unknown' quarantine rows, so both decode outcomes are
present at every sf.

Reference parity: beyond-reference multimodal axis (builder brief); the
reference's byte-payload map stage (examples/wordfreq.cpp file variants)
never interprets media."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import multimodal as mm
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

# byte i of media_id's canonical decoded stream (operators/multimodal.
# _synth_byte), as a DuckDB expression
_B = "(1 + (media_id * 31 + {i} * 7) % 127)"
_BYTE = _B.format(i="i")
_LO = _B.format(i="(2 * k)")
_HI = _B.format(i="(2 * k + 1)")


@register(
    "media_decode_real",
    bench=True,
    tags=("llm", "multimodal"),
    oracle=f"""
        WITH m AS (SELECT doc_id AS media_id FROM documents),
        bmp AS (
            SELECT media_id, 4 + media_id % 5 AS w, 3 + media_id % 4 AS h
            FROM m WHERE media_id % 3 = 0
        ),
        wav AS (
            SELECT media_id, (1 + media_id % 2) * (4 + media_id % 5) AS n,
                   CAST(1 + media_id % 2 AS INT) AS ch,
                   CAST(8000 + (media_id % 4) * 4000 AS INT) AS sr
            FROM m WHERE media_id % 3 = 1
        )
        SELECT media_id, 'bmp' AS fmt,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(3 AS INT) AS channels, CAST(-1 AS INT) AS sample_rate,
               CAST(w * h * 3 AS BIGINT) AS n_values,
               CAST(list_sum(list_transform(range(0, w * h * 3),
                    i -> {_BYTE})) AS BIGINT) AS value_sum,
               md5(array_to_string(list_transform(range(0, w * h * 3),
                    i -> chr(CAST({_BYTE} AS INT))), '')) AS decoded_md5
        FROM bmp
        UNION ALL
        SELECT media_id, 'wav',
               CAST(-1 AS INT), CAST(-1 AS INT), ch, sr,
               CAST(n AS BIGINT),
               CAST(list_sum(list_transform(range(0, n),
                    k -> {_LO} + 256 * {_HI})) AS BIGINT),
               md5(array_to_string(list_transform(range(0, 2 * n),
                    i -> chr(CAST({_BYTE} AS INT))), ''))
        FROM wav
        UNION ALL
        SELECT media_id, 'unknown',
               CAST(-1 AS INT), CAST(-1 AS INT), CAST(-1 AS INT),
               CAST(-1 AS INT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
               ''
        FROM m WHERE media_id % 3 = 2
    """,
)
def media_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode_real over the decodable media fixture: BMP rows decode with
    width/height/value stats, WAV rows with channels/sample_rate/sample
    stats, text rows quarantine as fmt='unknown' — all three outcomes in
    one Arrow-batched mapInPandas pass, hash-checked against the SQL
    replay of the generation formula. NULL stats are folded to -1/''
    sentinels (the funnel t2/t3 discipline): nullable numerics come back
    from the oracle harness's pandas fetch as float64, which the value
    normalizer formats differently from Spark's ints."""
    import pyspark.sql.functions as F

    media = mm.media_table_decodable(table(spark, sf_dir, "documents"))
    out = mm.decode_real(media)
    return out.select(
        "media_id",
        "fmt",
        *[
            F.coalesce(c, F.lit(-1)).cast(t).alias(c)
            for c, t in [
                ("width", "int"), ("height", "int"), ("channels", "int"),
                ("sample_rate", "int"), ("n_values", "bigint"),
                ("value_sum", "bigint"),
            ]
        ],
        F.coalesce("decoded_md5", F.lit("")).alias("decoded_md5"),
    )
