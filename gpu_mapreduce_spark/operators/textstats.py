"""Text-analysis operators for the training-data pipeline layer (builder
brief "beyond-reference" §text-analysis; no reference analog — the closest
is the wordfreq tokenizer, examples/wordfreq.cpp:120-129, which `tokens`
generalizes).

Design rules:
  - Everything is a codegen'd column expression (split/filter/size/md5) —
    no Python in the row path, so the operators scale like any scan.
  - Cross-engine determinism: token rules avoid regex character classes
    whose definitions differ between Java regex and RE2 (explicit lists
    instead); ratios are double divisions of integer counts (bit-identical
    on both engines); the fingerprint is md5 of a canonical normal form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny function-word lists for the language-ID heuristic (top function words;
# any real system would ship hundreds — the pipeline shape is what matters)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "von", "zu", "ist", "nicht"],
    "es": ["el", "la", "de", "los", "que", "y", "en", "es"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "est"],
}

# GPT-2-ish pre-tokenizer shape: letter runs, digit runs, single other glyphs
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped (ARRAY<STRING>)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def bpe_ish_tokens(text: Column) -> Column:
    """Sub-word-ish tokens: the cheap regex stand-in for a BPE pre-tokenizer
    (letter runs / digit runs / single punctuation glyphs)."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def stopword_hits(toks: Column, lang: str) -> Column:
    """How many tokens are function words of `lang` (explicit IN-list, not a
    regex — identical semantics on every engine)."""
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(words)))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token statistics: counts, distinct counts, mean token length,
    BPE-ish token count — the unit costs a training-data pipeline budgets by."""
    t = tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_uniq_tokens"),
        (
            F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
            / F.size(t).cast("double")
        ).alias("avg_token_len"),
        F.size(bpe_ish_tokens(F.col(text_col))).alias("n_bpe_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def quality_score(
    docs: DataFrame, text_col: str = "text", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Heuristic document-quality signals (length, stopword density, token
    diversity) + a keep/drop flag — the C4-style filter shape.

    `keep_cols` passes input columns through (e.g. the text column, so a
    later per-doc stage can chain onto this output as one collapsed
    projection instead of re-scanning and joining back on doc_id)."""
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    n_stop = F.size(
        F.filter(t, lambda x: F.lower(x).isin(STOPWORDS["en"]))
    )
    n_uniq = F.size(F.array_distinct(t))
    stop_ratio = n_stop / n_tok.cast("double")
    uniq_ratio = n_uniq / n_tok.cast("double")
    return docs.select(
        "doc_id",
        *keep_cols,
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        (
            (n_tok >= 10) & (n_tok <= 10000) & (stop_ratio >= 0.01) & (uniq_ratio >= 0.2)
        ).alias("keep"),
    )


def lang_id(
    docs: DataFrame, text_col: str = "text", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """N-gram-free language-ID heuristic: argmax of function-word hits with a
    fixed tie-break order (en > de > es > fr), 'und' (undetermined) when no
    function word matches at all. `keep_cols` as in quality_score."""
    t = tokens(F.col(text_col))
    scores = {lang: stopword_hits(t, lang) for lang in STOPWORDS}
    s = docs.select(
        "doc_id", *keep_cols, *[c.alias(f"s_{lang}") for lang, c in scores.items()]
    )
    e, d, sp, fr = F.col("s_en"), F.col("s_de"), F.col("s_es"), F.col("s_fr")
    guess = (
        F.when(e + d + sp + fr == 0, F.lit("und"))
        .when((e >= d) & (e >= sp) & (e >= fr), F.lit("en"))
        .when((d >= sp) & (d >= fr), F.lit("de"))
        .when(sp >= fr, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return s.select(
        "doc_id", *keep_cols, "s_en", "s_de", "s_es", "s_fr", guess.alias("guess")
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical content fingerprint: md5 of the lowercased,
    whitespace-collapsed text — the exact-dedup key."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm.cast("binary")).alias("fp"))


def _ngrams(t: Column, n: int) -> Column:
    """Word n-grams of a token array as strings (empty array below n tokens).

    Guarded sequence: Spark's sequence(start, stop) DESCENDS when
    stop < start, so the short-doc case must short-circuit to an empty
    array rather than rely on an empty sequence."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
    )
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def hashed_grams(corpus: DataFrame, n: int = 5) -> DataFrame:
    """(doc_id, h): each document's DISTINCT word n-grams as portable
    60-bit BIGINT keys — the shared front end of both decontamination
    queries. Gram strings die inside one scan-shaped stage (tokenize →
    gram array → explode → md5 in the SAME projection); only 16-byte
    (doc_id, h) pairs reach the dedup exchange.

    Shape rationale (r07, measured at sf0.1): hashing INSIDE the array
    (array_distinct(transform(ngrams, hash60))) keeps every md5/conv in
    Spark's interpreted higher-order-function evaluator with the token
    array spliced into the lambda — steady-state ~1.5-4 s with
    reproducible 17-68 s JIT-deopt excursions on repeat execution. This
    flat form runs the md5 in whole-stage codegen and replaces the
    per-doc array_distinct with a map-side-combinable hash aggregate:
    0.6-1.4 s steady, no excursions, identical rows. At 100 TB the
    dropDuplicates exchange carries already-combined narrow pairs —
    the canonical distinct topology."""
    from gpu_mapreduce_spark.functions.portable import hash60

    toks = corpus.select("doc_id", tokens(F.col("text")).alias("_t"))
    return (
        toks.select("doc_id", F.explode(_ngrams(F.col("_t"), n)).alias("_g"))
        .select("doc_id", hash60(F.col("_g")).alias("h"))
        .dropDuplicates(["doc_id", "h"])
    )


# PII patterns, written to the COMMON subset of Java regex (Spark) and RE2
# (DuckDB): literal classes, bounded repeats, \b word boundaries — no
# lookaround, no backrefs (RE2 has neither), so both engines match the same
# spans. The phone/IP shapes are deliberately narrow (the fixture's injected
# forms), standing in for the full pattern library of a production scrubber.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"
PII_IP_RE = r"\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII detection + redaction — the scrub step every training
    corpus passes through before the tokenizer. Pure codegen string
    expressions (regexp_extract_all / regexp_replace), zero Python.

    Redaction order is FIXED (email -> ip -> phone) and the replacement
    tokens contain no digits/'@', so a later pattern can never match text a
    prior replacement produced; the oracle replays the identical order.
    Output carries md5 of the redacted text (not the text itself) so the
    row stays narrow however large the document is."""
    txt = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(txt, F.lit(PII_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(txt, F.lit(PII_PHONE_RE), 0))
    n_ips = F.size(F.regexp_extract_all(txt, F.lit(PII_IP_RE), 0))
    red = F.regexp_replace(txt, PII_EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PII_IP_RE, "<IP>")
    red = F.regexp_replace(red, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        n_emails.cast("int").alias("n_emails"),
        n_phones.cast("int").alias("n_phones"),
        n_ips.cast("int").alias("n_ips"),
        ((n_emails + n_phones + n_ips) > 0).alias("any_pii"),
        F.md5(red.cast("binary")).alias("redacted_fp"),
    )


def contamination(
    corpus: DataFrame, bench_mod: int = 97, n: int = 5
) -> DataFrame:
    """Benchmark-contamination check: flag corpus documents sharing any word
    n-gram with a held-out benchmark set (docs with original id divisible by
    `bench_mod`; the `< 1_000_000` guard keeps the fixture's injected
    dup-copies — ids offset by 1e6/2e6 — on the corpus side only).

    The decontamination shape used on web-scale corpora: the benchmark gram
    set is BOUNDED (eval suites are tiny relative to the corpus), so it
    broadcasts and the corpus side never shuffles — one scan to explode
    per-doc distinct grams, one broadcast-hash semi-ish join, one doc-keyed
    count. Per-doc `array_distinct` keeps the join input at distinct grams,
    so n_contam counts distinct overlapping grams."""
    t = tokens(F.col("text"))
    grams = corpus.select(
        "doc_id", F.explode(F.array_distinct(_ngrams(t, n))).alias("g")
    )
    bench = (
        grams.filter(
            ((F.col("doc_id") % bench_mod) == 0) & (F.col("doc_id") < 1_000_000)
        )
        .select("g")
        .distinct()
    )
    hits = (
        # bcast-audit: bounded (fixed benchmark gram set)
        grams.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_contam"))
    )
    n_c = F.coalesce(F.col("n_contam"), F.lit(0)).cast("int")
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select("doc_id", n_c.alias("n_contam"), (n_c > 0).alias("contaminated"))
    )


BLOOM_BITS = 16384  # sized for the fixture's benchmark gram set (n ~ 3.5k
#   at sf0.1): fill = 1-exp(-K*n/m) ~ 0.57, FP = fill^K ~ 11% worst-case,
#   ~4e-5 at sf0.001. Production sizes m proportional to n (~10 bits/gram
#   for ~1% FP) — bits, so even 1e9 grams is ~1.25 GB of filter state
#   (shipped as a broadcast variable / runtime Bloom injection at that
#   sizing, not an in-plan literal — see bloom_probe) where the gram
#   strings themselves would be ~40 GB.
BLOOM_K = 4


def _with_bloom_bits(hashed: DataFrame) -> DataFrame:
    """Append the K bit positions _b0.._b{K-1} for the BIGINT key column
    `h`: K disjoint 14-bit fields of the key's own 60 bits (m = 2^14) —
    the Kirsch-Mitzenmacher one-hash construction, and since the pipeline
    already keys grams by their portable 60-bit hash the Bloom bits cost
    ZERO additional hashing (K independent salted md5s measured 2x the
    whole probe's cost; a shared salted md5 still paid one md5 per gram
    per consumer)."""
    return hashed.select(
        "*",
        *[
            (F.shiftrightunsigned("h", 14 * j) % BLOOM_BITS).alias(f"_b{j}")
            for j in range(BLOOM_K)
        ],
    )


def bloom_build(bench: DataFrame) -> str:
    """Fold a bounded gram set's BLOOM_K bit positions into one
    BLOOM_BITS-char '0'/'1' string (a distinct-bit collect — at most
    BLOOM_BITS rows cross the driver, the pagerank-scalar discipline).
    The returned string IS the filter: it ships to every task as ONE
    string constant, where the gram set itself could not broadcast."""
    set_bits = {
        r.bit
        for r in _with_bloom_bits(bench)
        .select(
            F.explode(
                F.array(*[f"_b{j}" for j in range(BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
        .collect()
    }
    return "".join(
        "1" if i in set_bits else "0" for i in range(BLOOM_BITS)
    )


def bloom_probe(grams: DataFrame, bits: str) -> DataFrame:
    """Keep only (doc_id, h) rows whose K Bloom bits are all '1' in
    `bits` — the filter ships as BLOOM_BITS/64 packed BIGINT words in one
    array literal and each probe is element_at + shift + mask: O(1)
    integer codegen per probe, no join, no shuffle. (The first cut read
    the '0'/'1' string literal with substring(_bs, _b+1, 1); UTF8String
    substring COUNTS CODE POINTS from the start, so every probe walked
    ~BLOOM_BITS/2 bytes of the constant — 8 s for 340k rows at sf0.1
    against 0.3 s for the packed-word form.) No false negatives by
    construction; false positives are eliminated by the caller's exact
    verify join.

    Mechanism vs scale: an in-plan literal is the TEST-SCALE stand-in.
    A production-sized filter (GBs of bits) ships as a broadcast
    variable probed in an Arrow-batched UDF, or comes for free from
    Spark's own runtime Bloom-filter injection
    (spark.sql.optimizer.runtime.bloomFilter.enabled inserts exactly
    this might_contain prefilter on the shuffle-join's probe side) —
    the QUERY SHAPE (bits prefilter -> exact verify equi-join) is what
    this operator pins, and it is unchanged under either transport."""
    # explicit check, not assert: stripped under python -O, a wrong-length
    # string would build a truncated word array and element_at would return
    # NULL out of range — silently filtering every row
    if len(bits) != BLOOM_BITS:
        raise ValueError(f"bloom bits length {len(bits)} != {BLOOM_BITS}")
    words = [
        sum(1 << k for k in range(64) if bits[j * 64 + k] == "1")
        for j in range(BLOOM_BITS // 64)
    ]
    # two's-complement fold into BIGINT range; bit k survives the cast.
    # One parsed literal array (r14): the per-word F.lit loop cost ~2
    # py4j round-trips per word × BLOOM_BITS/64 words per call.
    warr = F.expr(
        "array({})".format(
            ",".join(
                f"CAST({w - (1 << 64) if w >= 1 << 63 else w} AS BIGINT)"
                for w in words
            )
        )
    ).alias("_bw")
    cond = None
    for j in range(BLOOM_K):
        # & 1, not % 2: shift 0 leaves a bit-63 word negative, and Spark's
        # % keeps the dividend's sign (-3 % 2 = -1, never == 1). SQL text
        # because pyspark's shiftrightunsigned only takes a literal shift.
        t = F.expr(
            f"(shiftrightunsigned(element_at(_bw,"
            f" cast(_b{j} div 64 as int) + 1),"
            f" cast(_b{j} % 64 as int)) & 1) = 1"
        )
        cond = t if cond is None else (cond & t)
    probed = _with_bloom_bits(grams).select("*", warr)
    return probed.filter(cond).select("doc_id", "h")


def contamination_bloom(
    corpus: DataFrame, bench_mod: int = 97, n: int = 5
) -> DataFrame:
    """contamination()'s report through a BLOOM-FILTER prefilter — the
    decontamination shape for when the benchmark gram set outgrows a set
    broadcast (a 100M-gram eval suite is GBs of strings; its Bloom is
    bits). Gram identity is the portable 60-bit hash, assigned AT THE
    EXPLODE so gram strings die in the scan projection (the
    split_contamination allocation discipline — the string-gram variant's
    checkpoint reproducibly hit the degraded-heap regime); the oracle
    replays the identical hashing. Three stages:

      1. build: the benchmark keys' BLOOM_K bit positions (14-bit slices
         of the key itself — zero extra hashing) distinct-collected into a
         BLOOM_BITS-char bit string (bounded driver traffic).
      2. probe: every corpus gram key tests its K bits against the string
         LITERAL in-row — pure codegen, no join, no shuffle; only Bloom
         survivors (true hits + bounded false positives) continue.
      3. verify: survivors equi-join the true benchmark key set,
         eliminating false positives — the output is exact over the hashed
         gram identity and the oracle replays the same join. A Bloom
         filter has no false negatives BY CONSTRUCTION (every inserted
         key's bits are set), so the prefilter is sound, not
         probabilistic-recall.

    The (doc_id, h) gram table feeds build, probe, and verify — eagerly
    checkpointed once (16 bytes/row; the multi-consumer reuse
    discipline)."""
    grams = hashed_grams(corpus, n).localCheckpoint(eager=True)
    bench = (
        grams.filter(
            ((F.col("doc_id") % bench_mod) == 0) & (F.col("doc_id") < 1_000_000)
        )
        .select("h")
        .distinct()
    )
    survivors = bloom_probe(grams, bloom_build(bench))
    hits = (
        # bcast-audit: bounded (fixed benchmark gram set; at production
        # sizing this verify join is a shuffle equi-join over the already
        # Bloom-pruned survivor stream)
        survivors.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_contam"))
    )
    n_c = F.coalesce(F.col("n_contam"), F.lit(0)).cast("int")
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select("doc_id", n_c.alias("n_contam"), (n_c > 0).alias("contaminated"))
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: duplicate word-n-gram
    fractions (1 - distinct/total for n = 2, 3) and the most-frequent-token
    mass fraction, plus a keep flag at the published-style thresholds —
    the repetition family of quality filters (the counterpart of
    quality_score's length/stopword family).

    Cost model: n-gram fractions are linear in doc tokens (array build +
    distinct); top_token_frac is O(uniq x tokens) per doc — fine under the
    pipeline's length cap (quality_score keeps <= 10k tokens), and per-doc
    work never shuffles: the whole operator is one scan-shaped projection."""
    t = tokens(F.col(text_col))
    n_tok = F.size(t)

    def dup_frac(n: int) -> Column:
        g = _ngrams(t, n)
        return F.when(F.size(g) > 0,
                      1.0 - F.size(F.array_distinct(g)) / F.size(g).cast("double")
                      ).otherwise(F.lit(0.0))

    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(t),
            lambda x: F.size(F.filter(t, lambda y: y == x)),
        )
    )
    top_frac = F.when(n_tok > 0, top_cnt / n_tok.cast("double")).otherwise(
        F.lit(0.0)
    )
    dup2, dup3 = dup_frac(2), dup_frac(3)
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        dup2.alias("dup_bigram_frac"),
        dup3.alias("dup_trigram_frac"),
        top_frac.alias("top_token_frac"),
        ((dup2 <= 0.2) & (dup3 <= 0.15) & (top_frac <= 0.3)).alias("rep_keep"),
    )


CLF_SCALE = 10_000  # fixed-point scale of the ratio features
CLF_THRESHOLD = 8_000  # keep gate on score_u (calibrated: ~60-65% keep)
CLF_LEN_CAP = 1_000  # length feature saturates here
# integer weights of the linear quality classifier (fasttext-filter shape):
# reward stopword density / token diversity / length, punish repetition
CLF_W = {"stop_u": 3, "uniq_u": 2, "dup2_u": -2, "top_u": -1, "len": 5}


def classifier_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc linear quality-classifier score table (doc_id, n_tokens,
    score_u, keep) — SCALE.md r08 design 3.

    Features are EXACT integers: raw counts from the quality_score /
    repetition_stats families, ratios as fixed-point integer divisions
    ((CLF_SCALE * num) div den — both engines truncate non-negative
    operands identically), so score_u = Σ w_i · f_i is replayable in SQL
    verbatim. This is the stand-in for a learned linear filter (fasttext
    quality classifier): swapping trained weights changes constants, not
    the plan. One scan-shaped codegen projection, zero Python."""
    t = tokens(F.col(text_col))
    bi = _ngrams(t, 2)
    n_tok = F.size(t).cast("bigint")
    feats = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.size(F.filter(t, lambda x: F.lower(x).isin(STOPWORDS["en"])))
        .cast("bigint")
        .alias("n_stop"),
        F.size(F.array_distinct(t)).cast("bigint").alias("n_uniq"),
        F.size(bi).cast("bigint").alias("n_bi"),
        (F.size(bi) - F.size(F.array_distinct(bi))).cast("bigint").alias("dup_bi"),
        F.when(
            n_tok > 0,
            F.array_max(
                F.transform(
                    F.array_distinct(t),
                    lambda x: F.size(F.filter(t, lambda y: y == x)),
                )
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("top_cnt"),
    )
    u = feats.select(
        "doc_id",
        "n_tokens",
        F.expr(
            f"CASE WHEN n_tokens > 0 THEN ({CLF_SCALE} * n_stop) div n_tokens"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("stop_u"),
        F.expr(
            f"CASE WHEN n_tokens > 0 THEN ({CLF_SCALE} * n_uniq) div n_tokens"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("uniq_u"),
        F.expr(
            f"CASE WHEN n_bi > 0 THEN ({CLF_SCALE} * dup_bi) div n_bi"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("dup2_u"),
        F.expr(
            f"CASE WHEN n_tokens > 0 THEN ({CLF_SCALE} * top_cnt) div n_tokens"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("top_u"),
    )
    score = (
        F.lit(CLF_W["stop_u"]).cast("bigint") * F.col("stop_u")
        + F.lit(CLF_W["uniq_u"]).cast("bigint") * F.col("uniq_u")
        + F.lit(CLF_W["dup2_u"]).cast("bigint") * F.col("dup2_u")
        + F.lit(CLF_W["top_u"]).cast("bigint") * F.col("top_u")
        + F.lit(CLF_W["len"]).cast("bigint")
        * F.least(F.col("n_tokens"), F.lit(CLF_LEN_CAP).cast("bigint"))
    )
    return u.select(
        "doc_id",
        "n_tokens",
        score.alias("score_u"),
        (score >= CLF_THRESHOLD).alias("keep"),
    )


def pack_assignments(
    docs: DataFrame,
    capacity: int = 512,
    shards: int = 8,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document packing layout: (doc_id, shard, n_tokens, bin [, carry
    columns]) — the assignment table pack_sequences summarizes and the
    shard sink (queries/training_sink.py) writes out as training shards.

    True first-fit packing is a sequential recurrence, so the scale form is
    the standard start-offset relaxation: within a shard (doc_id % shards —
    shard count scales with the cluster), docs are laid out in doc_id order
    and a doc starts in bin = (its start offset) div capacity. Each bin's
    total can exceed capacity by at most one straddling doc (max doc len -
    1 overflow) — the bounded slack streaming packers accept. One
    SHARD-PARTITIONED window cumsum (never a global window); deterministic,
    so a SQL oracle replays the identical layout. `carry` columns (e.g.
    text) ride the one shard-keyed exchange — no join-back needed."""
    from pyspark.sql import Window

    t = tokens(F.col("text"))
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % shards).cast("int").alias("shard"),
        F.size(t).cast("bigint").alias("n_tokens"),
        *carry,
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    laid = sized.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off"),
        *carry,
    )
    return laid.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr(f"start_off div {capacity}").cast("bigint").alias("bin"),
        *carry,
    )


def pack_sequences(
    docs: DataFrame, capacity: int = 512, shards: int = 8
) -> DataFrame:
    """Sequence packing for training batches: assign whole documents to
    fixed-token-budget bins (the step that turns a cleaned corpus into
    constant-length training rows; beyond-reference, builder brief).
    Layout semantics and scale notes: pack_assignments. This form adds the
    per-bin summary groupBy whose doc_id digest proves the assignment
    byte-for-byte against the oracle's replay."""
    binned = pack_assignments(docs, capacity, shards)
    return binned.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        F.md5(
            F.concat_ws(
                ",", F.sort_array(F.collect_list("doc_id")).cast("array<string>")
            )
        ).alias("docs_digest"),
    )
