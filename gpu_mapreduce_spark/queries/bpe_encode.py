"""Tokenizer APPLY registration (r09 tail; SCALE.md r09 design 1): encode
every document with the K_MERGES trained BPE merges — the corpus-scale dual
of bpe_merge_steps (train once, tokenize everything), the canonical
"tokenize the corpus" map pass of an LLM data pipeline.

Topology (operators/bpe.encode_with_merges): the merge list is a bounded
at-rest artifact — trained ONCE per (session, sf_dir) via fixtures.derived
(the production analog is the tokenizer's published merges file) — and the
apply pass folds it over the DISTINCT-word table (vocab-sized, K chained
rewrites in one lineage, zero driver round-trips), then every (doc, pos,
word) occurrence picks up its encoded state through one broadcast join and
folds to a per-doc digest. The corpus is read once; the only corpus-sized
exchange is the doc-keyed digest aggregate. At 100 TB the broadcast vocab
join IS how a tokenizer service ships its trie — a real tokenizer swaps in
as an Arrow-batched UDF without changing the plan.

Oracle: queries/bpe.bpe_cte_chain replays the K training rounds to the
final per-word states w{K}; every document's token stream is then
re-encoded by a positional join against w{K} — per-doc token count =
Σ symbols per word, digest = md5 of the ' '+symbol states concatenated in
word order (the state separator is outside the token alphabet, so the
concatenation is unambiguous). Exact strings and integers throughout.

Reference parity: the reference ships no tokenizer; the iterative
train-then-map shape mirrors oink/cc_find.cpp's rounds feeding a final map
pass (cited at operators/bpe.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import bpe
from gpu_mapreduce_spark.queries.bpe import bpe_cte_chain
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table


def _bpe_merges(spark: SparkSession, sf_dir: str) -> list[tuple[str, str]]:
    """Session-memoized trained merge list [(a, b), ...] — the bounded
    tokenizer artifact every apply pass reuses (K rows; the pagerank
    scalar-collect discipline). Training cost lands once per session, on
    whichever consumer's warm-up touches it first."""
    from gpu_mapreduce_spark.sources import fixtures

    def build() -> list[tuple[str, str]]:
        merges, _words, _docw = bpe.bpe_train(
            spark, table(spark, sf_dir, "documents"), bpe.K_MERGES
        )
        return [(a, b) for (_step, a, b, _cnt) in merges]

    return fixtures.derived(spark, sf_dir, "bpe_merges", build)


def _encode_oracle(k: int) -> str:
    return f"""{bpe_cte_chain(k)},
        tokp AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '{bpe.WORD_RE}'))
                       AS word,
                   unnest(range(1, len(regexp_extract_all(lower(text),
                                                          '{bpe.WORD_RE}')) + 1))
                       AS pos
            FROM documents
        )
        SELECT t.doc_id,
               CAST(SUM(length(w.s) - length(replace(w.s, ' ', '')))
                    AS BIGINT) AS n_tokens_bpe,
               md5(string_agg(w.s, '' ORDER BY t.pos)) AS tokens_digest
        FROM tokp t JOIN w{k} w USING (word)
        GROUP BY t.doc_id"""


@register(
    "bpe_encode_corpus",
    bench=True,
    tags=("llm", "textstats", "vocab", "pipeline"),
    oracle=_encode_oracle(bpe.K_MERGES),
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained merges to every document: (doc_id, n_tokens_bpe,
    tokens_digest) with the digest order-faithful over the doc's word
    stream — the hash gate pins the whole encoded token sequence of every
    document, not just its length. Documents with no [a-z0-9] runs emit no
    row on either engine (the explode/unnest agree)."""
    docs = table(spark, sf_dir, "documents")
    return bpe.encode_with_merges(docs, _bpe_merges(spark, sf_dir))
