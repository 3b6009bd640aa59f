"""BPE merge-loop registration (r08 tail; SCALE.md r08 design 1):
K fixed merge rounds over the corpus word table, output = the merged-vocab
table (one row per round: step, merged token, pair count at selection)
UNION the final per-doc token counts — so the hash gate pins every round's
argmax AND the full rewrite cascade (a wrong merge in round 2 changes
every later round and every doc count).

Oracle: DuckDB replays each round as a CTE pair — pair counts via
unnest(list_transform(range…)) over the same space-separated symbol
states, the argmax as ORDER BY cnt DESC, a, b LIMIT 1, the rewrite as
list_reduce with the identical ends-with/append fold (operators/bpe.py
module docstring; probed semantics: list_reduce seeds with the first
element, which is why states fold over ' '||symbol prefixed elements).

Engine notes: the state string's separator (space) is outside the token
alphabet [a-z0-9] by construction; counts are exact BIGINTs everywhere
(DuckDB SUM casts from HUGEINT); tie-breaks are total (cnt DESC, a, b —
binary collation on a shared lowercase alphabet)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import bpe
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table


def _rewrite_cte(out: str, src: str, b: str) -> str:
    """One merge-rewrite CTE body: `{out}` = the word states of `{src}`
    with the single merge in `{b}` applied greedily left-to-right
    non-overlapping (the operators/bpe.apply_merge fold, replayed with
    DuckDB's list_reduce). LEFT JOIN ON TRUE so an exhausted corpus (empty
    `{b}`) degrades to the identity rewrite instead of an empty vocab:
    ends_with(acc, ' ' || NULL) is NULL, the CASE falls to its ELSE arm,
    and the fold copies the state unchanged — matching bpe_train's early
    stop with the merges found so far."""
    return f"""
        {out} AS (
            SELECT word, wt,
                   list_reduce(
                       list_transform(string_split(s, ' ')[2:],
                                      t -> ' ' || t),
                       (acc, x) -> CASE WHEN ends_with(acc, ' ' || {b}.a)
                                         AND x = ' ' || {b}.b
                                        THEN acc || {b}.b
                                        ELSE acc || x END) AS s
            FROM {src} LEFT JOIN {b} ON TRUE
        )"""


def bpe_cte_chain(
    k: int, prefix: str = "", train_where: str = "", with_clause: bool = True
) -> str:
    """The shared WITH-clause prefix replaying k BPE merge rounds: word
    tables ({{p}}tok/{{p}}docw/{{p}}w0) plus per-round ({{p}}p{{r}},
    {{p}}b{{r}}, {{p}}w{{r}}) CTEs. Ends after {{p}}w{{k}} — callers
    append their own final CTEs/SELECT (bpe_merge_steps pins the merge
    table + doc counts; bpe_encode_corpus in queries/bpe_encode.py
    re-encodes every document against w{{k}}).

    `prefix` lets one oracle hold two tokenizer replays side by side and
    `train_where` restricts the TRAINING corpus (tokenizer_swap's
    old-vocab chain: trained on the existing shard split, diffed against
    the full-corpus retrain) — the ivf_assign_ctes prefix discipline.
    `with_clause=False` drops the leading WITH so a second chain can be
    comma-appended to an open WITH list."""
    p = prefix
    lead = "WITH " if with_clause else ""
    parts = [
        f"""
        {lead}{p}tok AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '{bpe.WORD_RE}'))
                       AS word
            FROM documents {train_where}
        ),
        {p}docw AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS n
                 FROM {p}tok GROUP BY doc_id, word),
        {p}w0 AS (SELECT word, CAST(SUM(n) AS BIGINT) AS wt,
                      regexp_replace(word, '(.)', ' \\1', 'g') AS s
               FROM {p}docw GROUP BY word)"""
    ]
    for r in range(1, k + 1):
        parts.append(
            f""",
        {p}p{r} AS (
            SELECT pr.a AS a, pr.b AS b, CAST(SUM(wt) AS BIGINT) AS cnt
            FROM (
                SELECT wt,
                       unnest(list_transform(
                           range(2, len(string_split(s, ' '))),
                           i -> {{'a': string_split(s, ' ')[i],
                                  'b': string_split(s, ' ')[i + 1]}})) AS pr
                FROM {p}w{r - 1}
            ) GROUP BY pr.a, pr.b
        ),
        {p}b{r} AS (SELECT a, b, cnt FROM {p}p{r}
                    ORDER BY cnt DESC, a, b LIMIT 1),{_rewrite_cte(f"{p}w{r}", f"{p}w{r - 1}", f"{p}b{r}")}"""
        )
    return "".join(parts)


def bpe_rewrite_chain(k: int, out_prefix: str, src_w0: str, b_prefix: str) -> str:
    """Comma-separated rewrite-only chain {out_prefix}w1..{out_prefix}w{k}:
    fold the ALREADY-SELECTED merges {b_prefix}b1..{b_prefix}b{k} over the
    word table `src_w0`, in training order, with no pair re-counting — the
    SQL replay of operators/bpe._encoded_vocab applying a foreign merge
    list (tokenizer_swap encodes the FULL corpus under the subset-trained
    old vocab, so the rewrite source and the training corpus differ)."""
    parts = []
    for r in range(1, k + 1):
        src = src_w0 if r == 1 else f"{out_prefix}w{r - 1}"
        parts.append("," + _rewrite_cte(f"{out_prefix}w{r}", src, f"{b_prefix}b{r}"))
    return "".join(parts)


def _bpe_oracle(k: int) -> str:
    merge_selects = "\n        UNION ALL ".join(
        f"SELECT 'merge' AS kind, CAST({r} AS BIGINT) AS id,"
        f" a || b AS token, cnt FROM b{r}"
        for r in range(1, k + 1)
    )
    parts = [bpe_cte_chain(k)]
    parts.append(
        f""",
        flen AS (SELECT word,
                        CAST(length(s) - length(replace(s, ' ', ''))
                             AS BIGINT) AS n_sym
                 FROM w{k}),
        docs_out AS (
            SELECT 'doc' AS kind, d.doc_id AS id, '' AS token,
                   CAST(SUM(d.n * f.n_sym) AS BIGINT) AS cnt
            FROM docw d JOIN flen f USING (word) GROUP BY d.doc_id
        )
        {merge_selects}
        UNION ALL SELECT kind, id, token, cnt FROM docs_out"""
    )
    return "".join(parts)


@register(
    "bpe_merge_steps",
    bench=True,
    tags=("llm", "textstats", "vocab", "iterative"),
    oracle=_bpe_oracle(bpe.K_MERGES),
)
def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K_MERGES BPE merge rounds over `documents`: 'merge' rows carry
    (step, merged token, selection count), 'doc' rows the final per-doc
    token counts. Corpus folds once to the word table; rounds are
    vocab-sized aggregates with one-row driver collects (operators/bpe)."""
    docs = table(spark, sf_dir, "documents")
    merges, words, docw = bpe.bpe_train(spark, docs, bpe.K_MERGES)
    merge_df = spark.createDataFrame(
        [("merge", step, a + b, cnt) for (step, a, b, cnt) in merges],
        schema="kind string, id bigint, token string, cnt bigint",
    )
    doc_df = bpe.doc_token_counts(docw, words).select(
        F.lit("doc").alias("kind"),
        F.col("doc_id").alias("id"),
        F.lit("").alias("token"),
        F.col("cnt"),
    )
    return merge_df.union(doc_df)
