"""operators/bpe vs a pure-Python BPE model (the model-based discipline of
tests/test_properties_*): same overlapping pair counts, same greedy
left-to-right non-overlapping merge, same (cnt DESC, a, b) tie-break —
exact equality on merges and per-doc token counts."""

from __future__ import annotations

import re
from collections import Counter

from gpu_mapreduce_spark.operators import bpe


def model_bpe(docs: dict[int, str], k: int):
    docw: Counter = Counter()
    for d, t in docs.items():
        for w in re.findall(bpe.WORD_RE, t.lower()):
            docw[(d, w)] += 1
    weight: dict[str, int] = {}
    for (_, w), n in docw.items():
        weight[w] = weight.get(w, 0) + n
    state = {w: list(w) for w in weight}
    merges = []
    for step in range(1, k + 1):
        pc: Counter = Counter()
        for w, sy in state.items():
            for i in range(len(sy) - 1):
                pc[(sy[i], sy[i + 1])] += weight[w]
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, cnt))
        for w, sy in state.items():
            out: list = []
            for x in sy:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            state[w] = out
    doc_counts: dict[int, int] = {}
    for (d, w), n in docw.items():
        doc_counts[d] = doc_counts.get(d, 0) + n * len(state[w])
    return merges, doc_counts


def _run_case(spark, docs: dict[int, str], k: int):
    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    merges, words, docw = bpe.bpe_train(spark, df, k)
    got_docs = {
        r.doc_id: r.cnt for r in bpe.doc_token_counts(docw, words).collect()
    }
    want_merges, want_docs = model_bpe(docs, k)
    assert merges == want_merges
    assert got_docs == want_docs


def test_bpe_overlap_and_ties(spark):
    """'aaaa' under pair (a,a) must merge to [aa, aa] (greedy non-overlap),
    while the pair COUNT for aaaa is 3 (overlapping) — the two places naive
    implementations diverge; plus count ties resolved by (a, b)."""
    _run_case(
        spark,
        {
            0: "aaaa aaaa baa",
            1: "abab aab AAAA",  # lowercased -> aaaa again
            2: "xy xy xy zz zz q",
        },
        k=4,
    )


def test_bpe_multichar_merge_chain(spark):
    """Later rounds must merge multi-char symbols (ab+c, then abc+d…) and
    words reduced to one symbol must stop contributing pairs."""
    _run_case(
        spark,
        {
            0: "abcd abcd abcd ab",
            1: "abc abcd cd cd",
            2: "d c b a0 9z",
        },
        k=5,
    )
