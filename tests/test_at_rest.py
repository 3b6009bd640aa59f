"""The r06 at-rest/incremental claims, checked mechanically:

- dedup_lsh_at_rest: output is SOUND (⊆ the exact cross-set Jaccard pair
  set) and the probe consumes the persisted index (band-partitioned
  parquet exists on disk; the per-run plan reads it rather than
  re-signing the existing corpus).
- packed_shards_append: bins the delta never touched are byte-identical
  to the base-only packing — the append perturbs exactly the straddling
  tail bins and beyond, nothing else.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import dedup as dedup_ops
from gpu_mapreduce_spark.queries.dedup_at_rest import (
    _SPLIT,
    _T,
    _lsh_index_at_rest,
    dedup_lsh_at_rest,
)
from gpu_mapreduce_spark.queries.sink_append import packed_shards_append
from gpu_mapreduce_spark.sources import fixtures
from tests.conftest import SF_DIR


def test_lsh_at_rest_sound_and_from_index(spark):
    got = {
        (r.a, r.b): r.jac for r in dedup_lsh_at_rest(spark, SF_DIR).collect()
    }
    assert got, "fixture must produce cross-set near-dup pairs"
    # soundness: every reported pair is a true exact-Jaccard pair at >= _T
    corpus = fixtures.corpus(spark, SF_DIR)
    sh = {
        r.doc_id: set(r.shs)
        for r in corpus.select(
            "doc_id", dedup_ops.shingle_array(text_col="text").alias("shs")
        ).collect()
    }
    for (a, b), jac in got.items():
        assert a < _SPLIT <= b, "pairs must be (existing, delta)"
        inter = len(sh[a] & sh[b])
        true_j = inter / (len(sh[a]) + len(sh[b]) - inter)
        assert abs(true_j - jac) < 1e-12 and true_j >= _T
    # the index is real at-rest state: band directories on disk, reused
    # across runs (memoized path), and the existing side of the verify
    # reads parquet, not a re-shingle of the corpus
    root = _lsh_index_at_rest(spark, SF_DIR)
    assert sorted(
        d for d in os.listdir(f"{root}/bands") if d.startswith("band=")
    ), "band-partitioned index missing"
    assert _lsh_index_at_rest(spark, SF_DIR) == root, "memo must hit"


def test_append_preserves_untouched_bins(spark):
    from gpu_mapreduce_spark.operators import textstats as ts
    from gpu_mapreduce_spark.queries.packing import _CAP, _SHARDS

    after = packed_shards_append(spark, SF_DIR).collect()
    # base-only layout, computed directly (no sink) for comparison
    existing = fixtures.corpus(spark, SF_DIR).filter(
        F.col("doc_id") < _SPLIT
    )
    rows = ts.pack_assignments(
        existing, capacity=_CAP, shards=_SHARDS, carry=("text",)
    )
    pairs = F.sort_array(
        F.collect_list(F.struct("doc_id", F.md5("text").alias("h")))
    )
    base = {
        (r.shard, r.bin): (r.n_docs, r.bin_tokens, r.content_digest)
        for r in rows.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        pairs,
                        lambda s: F.concat_ws(
                            ":", s.doc_id.cast("string"), s.h
                        ),
                    ),
                )
            ).alias("content_digest"),
        )
        .collect()
    }
    touched = untouched = 0
    for r in after:
        if r.n_delta == 0 and (r.shard, r.bin) in base:
            assert base[(r.shard, r.bin)] == (
                r.n_docs,
                r.bin_tokens,
                r.content_digest,
            ), f"append perturbed untouched bin {(r.shard, r.bin)}"
            untouched += 1
        elif r.n_delta > 0:
            touched += 1
    assert untouched > 0 and touched > 0, (
        "fixture must exercise both untouched and appended bins"
    )


def test_index_compaction_yields_one_file_per_cell(spark, tmp_path):
    """The digest proves content; only the LISTING proves the compaction
    compacted: the fragmented post-append state holds base + delta part
    files in every touched cell directory, the compacted root exactly
    one part file per cell."""
    import os

    from pyspark.sql import functions as F

    from gpu_mapreduce_spark.operators import similarity
    from gpu_mapreduce_spark.queries.ann_append import (
        _MOD,
        _REM,
        _ivf_existing_at_rest,
    )
    from gpu_mapreduce_spark.queries.compaction import compact_codes_root
    from gpu_mapreduce_spark.queries.ivfpq_append import (
        _CODES_SCHEMA,
        _ivfpq_existing_at_rest,
        _pq_books_existing,
    )
    from gpu_mapreduce_spark.sources.tables import table
    from tests.conftest import SF_DIR

    def parts_per_cell(root):
        out = {}
        for d in os.listdir(root):
            if d.startswith("cid="):
                out[d] = len(
                    [f for f in os.listdir(os.path.join(root, d))
                     if f.endswith(".parquet")]
                )
        return out

    centroids, _ = _ivf_existing_at_rest(spark, SF_DIR)
    books = _pq_books_existing(spark, SF_DIR)
    base_root = _ivfpq_existing_at_rest(spark, SF_DIR)
    delta = table(spark, SF_DIR, "embeddings").filter(
        F.col("vec_id") % _MOD == _REM
    )
    delta_rows = similarity.pq_encode(delta, books).join(
        similarity.ivf_assign(delta, centroids).select("vec_id", "cid"),
        "vec_id",
    )
    delta_dir = str(tmp_path / "delta")
    delta_rows.write.mode("overwrite").partitionBy("cid").parquet(delta_dir)
    added = spark.read.schema(_CODES_SCHEMA).parquet(delta_dir)
    compact_dir = str(tmp_path / "compact")
    compacted = compact_codes_root(spark, base_root, added, compact_dir)

    frag_cells = parts_per_cell(base_root)
    delta_cells = parts_per_cell(delta_dir)
    comp_cells = parts_per_cell(compact_dir)
    # fragmented state: touched cells hold base + delta files
    touched = set(frag_cells) & set(delta_cells)
    assert touched, "delta touched no cell — vacuous fixture"
    assert all(
        frag_cells[c] + delta_cells[c] >= 2 for c in touched
    ), (frag_cells, delta_cells)
    # compacted: exactly one part file per cell, same total rows
    assert comp_cells and all(n == 1 for n in comp_cells.values()), comp_cells
    n_frag = (
        spark.read.schema(_CODES_SCHEMA).parquet(base_root).count()
        + added.count()
    )
    assert compacted.count() == n_frag
