"""Property-based cross-checks (hypothesis) for the text/KV layer the
other property suites don't model — href extraction + inverted index
(the reference's flagship InvertedIndex workload), combiner_concat,
n-gram counting, and the kv/kmv stat counters — against pure-Python
models on adversarial inputs: malformed anchors, unterminated quotes,
nested angle brackets, within-doc n-gram repeats, empty value groups."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import core, text

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# HTML-ish soup: anchor fragments, quotes, brackets, url-ish atoms — shapes
# that stress the pattern's boundaries (a '<a href="' with no closing quote
# must match nothing; back-to-back anchors must both match)
_ATOMS = ['<a href="', '"', ">", "</a>", "u1", "u2", " ", "<", "x"]
htmlish = st.lists(st.sampled_from(_ATOMS), min_size=0, max_size=14).map("".join)
corpus_st = st.lists(htmlish, min_size=1, max_size=6)

_HREF_RE = re.compile('<a href="([^"]*)"')


@given(corpus=corpus_st)
@settings(**_SETTINGS)
def test_extract_hrefs_and_inverted_index_match_model(spark, corpus):
    docs = spark.createDataFrame(
        [(f"f{i}", t) for i, t in enumerate(corpus)], "filename string, text string"
    )
    got_pairs = sorted(
        (r.url, r.filename) for r in text.extract_hrefs(docs).collect()
    )
    want_pairs = sorted(
        (u, f"f{i}") for i, t in enumerate(corpus) for u in _HREF_RE.findall(t)
    )
    assert got_pairs == want_pairs

    got_idx = {r.url: r.files for r in text.inverted_index(docs).collect()}
    by_url: dict[str, set[str]] = {}
    for u, f in want_pairs:
        by_url.setdefault(u, set()).add(f)
    assert got_idx == {u: " ".join(sorted(fs)) for u, fs in by_url.items()}


kv_lists = st.lists(
    st.tuples(st.sampled_from("abc"), st.integers(-99, 99)), min_size=1, max_size=25
)


@given(data=kv_lists)
@settings(**_SETTINGS)
def test_combiner_concat_matches_model(spark, data):
    df = spark.createDataFrame(data, "k string, v int")
    got = {r.k: r.vals for r in text.combiner_concat(df).collect()}
    want: dict[str, list[str]] = {}
    for k, v in data:
        want.setdefault(k, []).append(str(v))
    assert got == {k: " ".join(sorted(vs)) for k, vs in want.items()}


token_lists = st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12)


@given(
    corpus=st.lists(token_lists, min_size=1, max_size=5),
    n=st.integers(1, 3),
    min_count=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_ngram_counts_matches_model(spark, corpus, n, min_count):
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {r.g: r.cnt for r in text.ngram_counts(docs, n=n, min_count=min_count).collect()}
    cnt: Counter = Counter()
    for toks in corpus:  # occurrences, incl. within-doc repeats
        for i in range(len(toks) - n + 1):
            cnt[" ".join(toks[i : i + n])] += 1
    assert got == {g: c for g, c in cnt.items() if c >= min_count}


@given(data=kv_lists)
@settings(**_SETTINGS)
def test_kv_and_kmv_stats_match_model(spark, data):
    df = spark.createDataFrame(data, "k string, v int")
    r = core.kv_stats(df, exact=True).collect()[0]
    vals = [v for _k, v in data]
    assert (r.nkv, r.nkeys, r.vmin, r.vmax, r.key_bytes) == (
        len(data),
        len({k for k, _v in data}),
        min(vals),
        max(vals),
        sum(len(k) for k, _v in data),
    )
    kmv = df.groupBy("k").agg(F.collect_list("v").alias("vals"))
    s = core.kmv_stats(kmv).collect()[0]
    sizes = Counter(k for k, _v in data)
    assert (s.nkmv, s.nvalues, s.max_nvalues, s.min_nvalues) == (
        len(sizes),
        len(data),
        max(sizes.values()),
        min(sizes.values()),
    )
