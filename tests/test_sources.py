"""Tests for the corpus readers (the reference's three map-file variants,
src/mapreduce.cpp:1060-1558) and the trivial KV sinks — exercised on a
scratch corpus under the repo's .tmp dir."""

from __future__ import annotations

import os
import shutil

import pytest

from gpu_mapreduce_spark.operators import core
from gpu_mapreduce_spark.sources import text_corpus

TMP = "/root/repo/.tmp/corpus"


@pytest.fixture(scope="module")
def corpus_dir():
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(f"{TMP}/sub", exist_ok=True)
    with open(f"{TMP}/a.txt", "w") as f:
        f.write("alpha beta\ngamma\n")
    with open(f"{TMP}/sub/b.txt", "w") as f:
        f.write("delta\n")
    yield TMP
    shutil.rmtree(TMP, ignore_errors=True)


def test_read_files_whole_and_recursive(spark, corpus_dir):
    rows = {r.filename: r.text for r in text_corpus.read_files(spark, corpus_dir).collect()}
    assert rows == {"a.txt": "alpha beta\ngamma\n", "b.txt": "delta\n"}


def test_read_lines_record_safe(spark, corpus_dir):
    rows = sorted(
        (r.filename, r.line) for r in text_corpus.read_lines(spark, corpus_dir).collect()
    )
    assert rows == [("a.txt", "alpha beta"), ("a.txt", "gamma"), ("b.txt", "delta")]


def test_read_files_binary(spark, corpus_dir):
    rows = {os.path.basename(r.path): bytes(r.content)
            for r in text_corpus.read_files_binary(spark, corpus_dir).collect()}
    assert rows["a.txt"] == b"alpha beta\ngamma\n"
    assert rows["b.txt"] == b"delta\n"


def test_task_range(spark):
    df = text_corpus.task_range(spark, 10, num_partitions=4)
    assert df.rdd.getNumPartitions() == 4
    assert sorted(r.itask for r in df.collect()) == list(range(10))


def test_wordfreq_from_files_end_to_end(spark, corpus_dir):
    """The reference's flagship demo pipeline (examples/wordfreq.cpp:64-93):
    read files → tokenize → count → top-k, over the file reader."""
    from gpu_mapreduce_spark.operators import text

    docs = text_corpus.read_files(spark, corpus_dir)
    top = text.wordfreq(text.tokenize(docs), ntop=3).collect()
    counts = {(r.word, r.cnt) for r in top}
    # corpus: alpha beta gamma delta — all count 1; top-3 by (cnt desc, word)
    assert counts == {("alpha", 1), ("beta", 1), ("delta", 1)}


def test_clone_and_scan_sink(spark, corpus_dir):
    kv = spark.createDataFrame([("a", 1), ("a", 2)], "k string, v int")
    cloned = core.clone(kv).collect()
    assert sorted((r.k, list(r.vals)) for r in cloned) == [("a", [1]), ("a", [2])]
    out = f"{TMP}/sink"
    core.scan_sink(kv, out)
    back = spark.read.csv(out).collect()
    assert len(back) == 2
