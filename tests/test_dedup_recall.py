"""Near-dup detector quality: LSH and SimHash candidate generation
measured against the exact all-pairs Jaccard ground truth."""

from __future__ import annotations

import pytest

from data_engineering_for_e_commerce_logistics_spark.catalog import read_parquet_table
from data_engineering_for_e_commerce_logistics_spark.operators import dedup

SF = "/root/testdata/sf0.01"  # 500 docs, 25 planted near-dup pairs


@pytest.fixture(scope="module")
def docs(spark):
    return read_parquet_table(spark, f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def ground_truth(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.6)
    return {(r.id_a, r.id_b) for r in pairs.collect()}


def test_minhash_lsh_full_recall(spark, docs, ground_truth):
    got = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_dedup(docs, threshold=0.6).collect()
    }
    # verified LSH output ⊆ ground truth by construction (same verify
    # threshold), and 8 bands × 2 rows gives ~full recall at j≥0.6
    assert got <= ground_truth
    recall = len(got) / len(ground_truth)
    assert recall >= 0.95, f"LSH recall {recall:.2f} below 0.95"


def test_simhash_pairs_find_planted_dups(spark, docs, ground_truth):
    sig = dedup.simhash(docs, shingle_k=2)
    got = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_near_pairs(sig, max_hamming=6).collect()
    }
    hits = len(got & ground_truth)
    recall = hits / len(ground_truth)
    # simhash at 64 bits is a coarser detector than minhash — expect
    # most planted pairs, tolerate some misses, and candidates must
    # stay far from all-pairs (precision of the bucketing)
    assert recall >= 0.6, f"simhash recall {recall:.2f}"
    n_docs = docs.count()
    assert len(got) < n_docs * 5  # not a quadratic candidate blowup


def test_simhash_rejects_bits_over_64(spark, docs):
    """ADVICE r03: the two-half nibble recovery covers md5 bits 0-63
    only; bits > 64 would silently re-read the lo half, so the
    contract is an explicit assert."""
    import pytest

    with pytest.raises(AssertionError, match="at most 64 bits"):
        dedup.simhash(docs, bits=65)


def test_exact_duplicates_no_false_positives(spark, docs):
    out = dedup.exact_duplicates(docs)
    # corpus has no exact dups: every fingerprint group has one member
    assert out.count() == docs.count()
    assert out.filter("n_copies > 1").count() == 0
