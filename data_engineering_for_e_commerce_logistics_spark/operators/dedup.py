"""Corpus deduplication operators — exact and near-dup, designed for
100 TB document tables.

Four families (BASELINE.json north star):

* exact:     hash-groupBy on a normalized fingerprint — one shuffle on
             the 16-byte digest, perfectly balanced.
* MinHash+LSH: shingle → K minhashes → B bands → bucket join → verify.
             The hash family is "lexicographic min of md5(seed:shingle)"
             — md5 hex strings compare identically everywhere, which
             makes the signature (and thus the oracle diff) engine-
             independent, unlike xxhash/murmur whose implementations
             differ across engines.  Candidate generation touches only
             docs sharing a band bucket: the cross-join never happens.
* SimHash:   64-bit weighted bit-vote fingerprint; hamming-adjacent
             buckets give near-dup candidates.
* n-gram Jaccard: the exact verifier (array_intersect/union on distinct
             shingle sets) — used standalone (small inputs) or as the
             LSH verify stage.

Scale shape: every stage is explode → hash-shuffle on short keys →
aggregate.  No driver-side loops, no UDFs; AQE splits skewed buckets
(a hot band bucket = a cluster of near-identical docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------


def shingles_col(text: Column | str = "text", k: int = 3) -> Column:
    """Distinct word-k-gram shingles of a single-space-tokenized text.

    Guarded so texts with fewer than k tokens yield an empty array
    (Spark's sequence(1, n) would run *descending* for n<1)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(c, " ")
    n = F.size(toks)
    joined = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.array_distinct(F.when(n >= k, joined).otherwise(F.array()))


def sql_shingles(tok: str = "tok", k: int = 3) -> str:
    """DuckDB-equivalent shingle expression (list_transform over
    generate_series).  ``tok`` must name an in-scope token-list column
    (e.g. from a CTE ``SELECT string_split(text,' ') AS tok``)."""
    parts = " || ' ' || ".join(f"{tok}[i+{j}]" for j in range(k))
    return (
        f"list_distinct(list_transform(generate_series(1, greatest("
        f"len({tok}) - {k - 1}, 0)), i -> {parts}))"
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via normalized-md5 fingerprint groupBy: one row per
    distinct content hash with the kept (min) id and the group size.
    One shuffle on the digest; group sizes are bounded by true dup
    multiplicity, so no skew beyond real duplicates."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), "\\s+", " ")
    return (
        df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """K-column minhash signature per document.

    Plan: explode distinct shingles (docs × ~shingles rows), then ONE
    hash-aggregate computing all K mins — a single shuffle on id_col.
    min(md5('<seed>:' || shingle)) is a valid minwise family because
    md5 is uniform over hex strings and lexicographic order on
    fixed-width hex is a total order."""
    ex = df.select(
        F.col(id_col), F.explode(shingles_col(text_col, shingle_k)).alias("shingle")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Band the signature and self-join band buckets → candidate pairs.

    rows-per-band r = num_hashes // bands; band key = md5 of the
    concatenated row hashes.  The unpivot (B rows/doc) shuffles on the
    band key, so only same-bucket docs ever meet; output is distinct
    (a, b) with a < b."""
    r = num_hashes // bands
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"mh{b * r + j}") for j in range(r)]
        band_rows.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            )
        )
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_rows)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs; keeps pairs at or
    above threshold.  Joins are on doc ids (broadcast-able when the
    shingle table is small; hash joins at scale)."""
    sh = docs.select(
        F.col(id_col), shingles_col(text_col, shingle_k).alias("sh")
    )
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        )
        .withColumn(
            "jaccard",
            # try_divide: two empty shingle sets give 0/0 — NULL (and
            # filtered) in both engines, instead of an ANSI-mode throw.
            F.try_divide(
                F.col("inter").cast("double"),
                F.size("sh_a") + F.size("sh_b") - F.col("inter"),
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Full pipeline: signature → LSH candidates → Jaccard verify."""
    sig = minhash_signature(df, text_col, id_col, num_hashes, shingle_k)
    cand = lsh_candidate_pairs(sig, id_col, num_hashes, bands)
    return jaccard_verify(cand, df, text_col, id_col, shingle_k, threshold)


# ---------------------------------------------------------------------------
# n-gram Jaccard (all-pairs; the small-corpus / verify primitive)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """All-pairs shingle Jaccard ≥ threshold.  Quadratic — correct for
    small corpora and as the ground-truth oracle for LSH recall; at
    scale use minhash_lsh_dedup (same output contract)."""
    sh = df.select(F.col(id_col), shingles_col(text_col, shingle_k).alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.try_divide(
                F.col("inter").cast("double"),
                F.size("sh_a") + F.size("sh_b") - F.col("inter"),
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    shingle_k: int = 2,
) -> DataFrame:
    """64-bit SimHash: per shingle take md5-derived bits, per bit
    position vote +1/-1, sign of the vote is the fingerprint bit.

    Expressed as explode → per-bit conditional sums → bit assembly;
    one shuffle on id_col.  (No DuckDB oracle: 128→64-bit hash
    arithmetic is not portably expressible — rows-only check.)"""
    ex = df.select(
        F.col(id_col), F.explode(shingles_col(text_col, shingle_k)).alias("shingle")
    )
    # 64 bits from the md5 hex: bit j = hex nibble (j//4) bit (j%3)
    h = F.md5(F.col("shingle"))
    votes = []
    for j in range(bits):
        nibble = F.conv(F.substring(h, j // 4 + 1, 1), 16, 10).cast("int")
        bit = F.shiftrightunsigned(nibble, j % 4).bitwiseAND(F.lit(1))
        votes.append(
            F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"v{j}")
        )
    voted = ex.groupBy(id_col).agg(*votes)
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(2**j).cast("long") if j < 63 else F.when(
            F.col(f"v{j}") > 0, F.lit(-(2**63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return voted.select(F.col(id_col), sig.alias("simhash"))
