"""Tokenizer retrain + vocab-drift report (r09 tail registration; SCALE.md
r10 design 2, landed early) — ivf_index_swap's dual on the tokenizer axis.
A pipeline that trained its BPE merges on the existing corpus accumulates
vocab drift as deltas land; the remedy is the same out-of-band schedule:
retrain on the full corpus, diff the merge tables, re-encode, and report
which documents' tokenizations changed.

The two vocabularies are the suite's existing disciplines:
  OLD  K_OLD = 5 merges trained on the EXISTING split only (doc_id % 8 != 7
       — the ann_index_append existing/delta convention on the document
       axis), session-memoized like every trained artifact. The smaller
       merge budget is the realistic retrain trigger: the corpus grew, so
       the retrain also grows the vocab (K_OLD < K_MERGES), exactly how
       production tokenizers evolve — and it guarantees the report's every
       branch carries rows (the fixture splits are distribution-stable
       enough that an equal-budget retrain reproduces the same top-8
       merges, which would leave the doc-delta half vacuously empty and
       an encode bug invisible to the hash gate).
  NEW  the full-corpus K_MERGES merges every encode consumer already
       applies (queries/bpe_encode._bpe_merges) — after the swap,
       bpe_encode_corpus and fertility_report are ALREADY tokenizing under
       it, which is the path flip.

Output ('merge' rows): exactly K rows (step, old_token, new_token,
rank_in_new) from operators/bpe.merge_diff — ranks keyed on the merge PAIR,
not the concatenated token (distinct pairs can concatenate identically while
rewriting differently), first occurrence wins, -1 = trained out; steps past
an early stop pad with '' tokens so both engines emit the fixed K rows.
Output ('doc' rows): per-doc encoded-length deltas (n_old, n_new) for every
document whose token SEQUENCE changed (digest inequality, not length — equal
lengths can hide a reordered merge).

Topology: both trainings fold the corpus ONCE to their word table
(bpe_merge_steps posture; the old training is session-memoized so its cost
lands once); the diff is vocab-sized and driver-side (K rows — the pagerank
scalar discipline); the two encodes are each one corpus scan + one broadcast
vocab join + one doc-keyed digest aggregate (encode_with_merges), and the
changed-doc join is doc_id-keyed on two narrow digest tables. At 100 TB
nothing but the per-doc digest rows shuffles.

Oracle: two bpe_cte_chain replays side by side (the ivf_assign_ctes prefix
discipline) — the unprefixed chain trains AND encodes the full corpus (its
w{K} is the new vocab table); the o_-prefixed chain trains on the existing
split only, and bpe_rewrite_chain folds its merges over the FULL corpus's
w0 (f_w{K}) because the old vocab must encode words the training split
never saw, exactly as operators/bpe._encoded_vocab builds the apply-side
vocab from the corpus being encoded, not the training corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import bpe
from gpu_mapreduce_spark.queries.bpe import bpe_cte_chain, bpe_rewrite_chain
from gpu_mapreduce_spark.queries.bpe_encode import _bpe_merges
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

# existing/delta split on the document axis (the ann_index_append 8/7
# convention): docs with doc_id % 8 == 7 are the accumulated delta the old
# tokenizer never trained on
_MOD = 8
_REM = 7
# the old tokenizer's smaller merge budget (module docstring: the retrain
# grows the vocab, and an equal budget would make the diff vacuous)
_K_OLD = 5


def _bpe_merges_old(spark: SparkSession, sf_dir: str) -> list[tuple[str, str]]:
    """Session-memoized OLD merge list: _K_OLD merges trained on the
    existing split only (doc_id % _MOD != _REM) — the tokenizer artifact a
    pipeline shipped before the delta landed."""
    from gpu_mapreduce_spark.sources import fixtures

    def build() -> list[tuple[str, str]]:
        docs = table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % _MOD != _REM
        )
        merges, _words, _docw = bpe.bpe_train(spark, docs, _K_OLD)
        return [(a, b) for (_step, a, b, _cnt) in merges]

    return fixtures.derived(spark, sf_dir, "bpe_merges_old", build)


def _swap_oracle(k: int, k_old: int) -> str:
    om = "\n            UNION ALL ".join(
        f"SELECT {r} AS step, a, b FROM o_b{r}" for r in range(1, k_old + 1)
    )
    nm = "\n            UNION ALL ".join(
        f"SELECT {r} AS step, a, b FROM b{r}" for r in range(1, k + 1)
    )
    enc = """
            SELECT t.doc_id,
                   CAST(SUM(length(w.s) - length(replace(w.s, ' ', '')))
                        AS BIGINT) AS n_tok,
                   md5(string_agg(w.s, '' ORDER BY t.pos)) AS dg
            FROM tokp t JOIN {vocab} w USING (word)
            GROUP BY t.doc_id"""
    return f"""{bpe_cte_chain(k)},
        {bpe_cte_chain(
            k_old,
            prefix="o_",
            train_where=f"WHERE doc_id % {_MOD} <> {_REM}",
            with_clause=False,
        ).lstrip()}{bpe_rewrite_chain(k_old, "f_", "w0", "o_")},
        om AS ({om}),
        nm AS ({nm}),
        rk AS (SELECT om.step, CAST(MIN(nm.step) AS BIGINT) AS rank
               FROM om JOIN nm ON om.a = nm.a AND om.b = nm.b
               GROUP BY om.step),
        steps AS (SELECT unnest(range(1, {k + 1})) AS step),
        tokp AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '{bpe.WORD_RE}'))
                       AS word,
                   unnest(range(1, len(regexp_extract_all(lower(text),
                                                          '{bpe.WORD_RE}')) + 1))
                       AS pos
            FROM documents
        ),
        o_enc AS ({enc.format(vocab=f"f_w{k_old}")}),
        n_enc AS ({enc.format(vocab=f"w{k}")})
        SELECT 'merge' AS kind, CAST(s.step AS BIGINT) AS id,
               coalesce(o.a || o.b, '') AS old_token,
               coalesce(n.a || n.b, '') AS new_token,
               CAST(coalesce(r.rank, -1) AS BIGINT) AS rank_in_new,
               CAST(0 AS BIGINT) AS n_old, CAST(0 AS BIGINT) AS n_new
        FROM steps s
        LEFT JOIN om o USING (step)
        LEFT JOIN nm n USING (step)
        LEFT JOIN rk r USING (step)
        UNION ALL
        SELECT 'doc', o.doc_id, '', '', CAST(0 AS BIGINT),
               o.n_tok, n.n_tok
        FROM o_enc o JOIN n_enc n USING (doc_id)
        WHERE o.dg <> n.dg"""


@register(
    "tokenizer_swap",
    bench=True,
    tags=("llm", "textstats", "vocab", "incremental"),
    oracle=_swap_oracle(bpe.K_MERGES, _K_OLD),
)
def tokenizer_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrain-and-swap report for the tokenizer: 'merge' rows = the fixed-K
    merge-table diff (operators/bpe.merge_diff, padded to K); 'doc' rows =
    (doc_id, n_old, n_new) encoded lengths for every document whose token
    sequence changed under the full-corpus retrain. Both merge lists are
    session-memoized bounded artifacts; the corpus is scanned ONCE (both
    vocabs ride one broadcast — r15), nothing else is corpus-sized."""
    docs = table(spark, sf_dir, "documents")
    old = _bpe_merges_old(spark, sf_dir)
    new = _bpe_merges(spark, sf_dir)
    diff = list(bpe.merge_diff(old, new))
    while len(diff) < bpe.K_MERGES:
        diff.append((len(diff) + 1, "", "", -1))
    merge_df = spark.createDataFrame(
        [("merge", step, ot, nt, rank, 0, 0) for (step, ot, nt, rank) in diff],
        schema="kind string, id bigint, old_token string, new_token string,"
        " rank_in_new bigint, n_old bigint, n_new bigint",
    )
    # ONE corpus pass encodes under BOTH vocabs (r15, guide §2.4): the
    # two-pass encode + doc_id self-join shape scanned and shuffled the
    # corpus twice for the identity pairing — see
    # operators/bpe.encode_pair_with_merges for the equivalence argument
    doc_df = (
        bpe.encode_pair_with_merges(docs, old, new)
        .filter(F.col("dg_old") != F.col("dg_new"))
        .select(
            F.lit("doc").alias("kind"),
            F.col("doc_id").alias("id"),
            F.lit("").alias("old_token"),
            F.lit("").alias("new_token"),
            F.lit(0).cast("bigint").alias("rank_in_new"),
            "n_old",
            "n_new",
        )
    )
    return merge_df.unionByName(doc_df)
