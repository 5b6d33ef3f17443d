"""Bloom-filter anti-join dedup (operators/dedup.py bloom_*).

Reference-corpus membership probe for incremental-crawl dedup: the
reference side collapses to a fixed-size packed bitset (<=1041 rows),
the probe side takes k broadcast equi-joins and never shuffles.

Properties under test:
  * no false negatives — every key that IS in the reference scores
    n_hits == k (the Bloom guarantee the anti-join semantics rest on)
  * keep == (n_hits < k), and false-positive full hits are rare at the
    tested fill factor
  * bitset is bounded by ceil(65536/63) rows whatever the corpus size
  * the probe plan is broadcast-join-only (no SortMergeJoin: the corpus
    side must not shuffle)
  * null probe keys degrade to n_hits = 0 / keep = true on both engines
"""

import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.dedup import (
    bloom_bitset,
    bloom_probe,
    bloom_reference_antijoin,
)


@pytest.fixture(scope="module")
def ref_probe(spark):
    ref = spark.createDataFrame(
        [(f"reference-doc-{i}",) for i in range(300)], ["text"]
    )
    probe = spark.createDataFrame(
        [(i, f"reference-doc-{i}") for i in range(300)]
        + [(i, f"fresh-doc-{i}") for i in range(300, 600)],
        ["doc_id", "text"],
    )
    return ref, probe


def test_no_false_negatives_and_keep_flag(spark, ref_probe):
    ref, probe = ref_probe
    out = bloom_reference_antijoin(probe, ref).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == 600
    for i in range(300):  # in-reference keys: guaranteed full hit
        assert by_id[i].n_hits == 4, f"false negative at doc {i}"
        assert not by_id[i].keep
    for r in out:  # flag is derived, never inconsistent
        assert r.keep == (r.n_hits < 4)
    # fresh keys: full-hit FP rate at 1200/65536 fill ~ 1e-7 per doc
    fp = [i for i in range(300, 600) if not by_id[i].keep]
    assert len(fp) <= 3, f"implausible Bloom FP count: {fp}"


def test_bitset_bounded_and_word_range(spark):
    ref = spark.createDataFrame([(f"k{i}",) for i in range(5000)], ["text"])
    rows = bloom_bitset(ref).collect()
    assert len(rows) <= 1041  # ceil(65536 / 63)
    assert all(0 <= r.word_idx <= 65535 // 63 for r in rows)
    assert all(r.bits != 0 for r in rows)


def test_probe_plan_is_broadcast_only(spark, ref_probe):
    ref, probe = ref_probe
    out = bloom_probe(probe, bloom_bitset(ref))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # corpus side must not shuffle


def test_null_key_is_definite_keep(spark):
    ref = spark.createDataFrame([("seen",)], ["text"])
    probe = spark.createDataFrame(
        [(1, "seen"), (2, None), (3, "unseen")],
        "doc_id: long, text: string",
    )
    out = {r.doc_id: r for r in bloom_reference_antijoin(probe, ref).collect()}
    assert out[1].n_hits == 4 and not out[1].keep
    assert out[2].n_hits == 0 and out[2].keep
    assert out[3].keep


def test_key_expr_prefix(spark):
    """Probing on a derived key expression (content prefix) matches docs
    whose prefix — not full text — is in the reference."""
    ref = spark.createDataFrame([("abcdefghij-SUFFIX-ONE",)], ["text"])
    probe = spark.createDataFrame(
        [(1, "abcdefghij-SUFFIX-TWO"), (2, "zzzzzzzzzz-SUFFIX-TWO")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in bloom_reference_antijoin(
            probe, ref, key_expr="substring(text, 1, 10)"
        ).collect()
    }
    assert not out[1].keep  # shared 10-char prefix -> full hit
    assert out[2].keep
