"""Oracle-checked entries for the training-data-pipeline operators
(dedup / text analysis / similarity search) over documents/embeddings.

The MinHash oracle mirrors the engine's construction exactly: the
hash family is lexicographic-min of md5('<seed>:'||shingle) hex
strings, which is engine-portable (md5 hex is identical everywhere),
so signatures, band buckets, candidate pairs, and verified Jaccards
all match bitwise.  Cosine scores match bitwise because both sides
use a strict left-fold sum (Spark aggregate(0.0, +) ≡ DuckDB
list_reduce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions import sql_exact_round
from ..operators import dedup, similarity, text
from ..operators.dedup import sql_shingles

# --- Exact dedup ------------------------------------------------------------


def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.exact_duplicates(docs)


DEDUP_EXACT_SQL = """
SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint,
       min(doc_id) AS kept_id,
       count(*)    AS n_copies
FROM documents
GROUP BY 1
"""

# --- MinHash + LSH near-dedup ----------------------------------------------

NUM_HASHES, BANDS, SHINGLE_K, THRESHOLD = 16, 8, 3, 0.6


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.minhash_lsh_dedup(
        docs,
        num_hashes=NUM_HASHES,
        bands=BANDS,
        shingle_k=SHINGLE_K,
        threshold=THRESHOLD,
    )


def minhash_pipeline_ctes() -> str:
    """CTE body mirroring minhash_signature's Kirsch-Mitzenmacher
    family exactly (one md5 per shingle → two 60-bit hex ints →
    (h1 + i*h2) mod P), ending in a `verified(id_a, id_b, jaccard)`
    CTE.  Shared by the pair query and the cluster query's recursive
    oracle."""
    p = 2_147_483_647  # dedup.MINHASH_PRIME
    r = NUM_HASHES // BANDS
    mins = ",\n         ".join(
        f"min((h1 + {i} * h2) % {p}) AS mh{i}" for i in range(NUM_HASHES)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS bucket FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"cast(mh{b * r + j} as varchar)" for j in range(r)
            ),
        )
        for b in range(BANDS)
    )
    return f"""
tok AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
sh AS (SELECT doc_id, unnest({sql_shingles('tok', SHINGLE_K)}) AS shingle
       FROM tok),
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {p} AS h1,
         ('0x' || substr(md5(shingle), 17, 15))::BIGINT % {p} AS h2
  FROM sh
),
sig AS (SELECT doc_id,
         {mins}
        FROM hashed GROUP BY doc_id),
bands AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
shl AS (SELECT doc_id, {sql_shingles('tok', SHINGLE_K)} AS ws FROM tok),
verified AS (
  SELECT id_a, id_b,
         len(list_intersect(a.ws, b.ws))::DOUBLE /
         (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) AS jaccard
  FROM cand
  JOIN shl a ON cand.id_a = a.doc_id
  JOIN shl b ON cand.id_b = b.doc_id
  WHERE len(list_intersect(a.ws, b.ws))::DOUBLE /
        (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= {THRESHOLD}
)
"""


DEDUP_MINHASH_SQL = f"""
WITH {minhash_pipeline_ctes()}
SELECT id_a, id_b, jaccard FROM verified
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.ngram_jaccard_pairs(
        docs, shingle_k=SHINGLE_K, threshold=THRESHOLD
    )


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
shl AS (SELECT doc_id, {sql_shingles('tok', SHINGLE_K)} AS ws FROM tok)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.ws, b.ws))::DOUBLE /
       (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) AS jaccard
FROM shl a JOIN shl b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.ws, b.ws))::DOUBLE /
      (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= {THRESHOLD}
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures — fully oracle-checked since r03: the 64-bit
    assembly IS portable SQL (md5 hex nibble → strpos, per-bit vote
    sums, shift/CASE assembly with the sign bit mapped to -2^63), so
    DuckDB reproduces every signature bit-exactly."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.simhash(docs)


def _simhash_oracle_sql(bits: int = 64, shingle_k: int = 2) -> str:
    """Generate the DuckDB twin of ``operators.dedup.simhash``:
    same shingles, same md5 nibble bits, same +1/-1 votes, same
    little-endian assembly (bit 63 = sign bit → -(2^63))."""
    nibs = ",\n       ".join(
        f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) AS nib{i}"
        for i in range(bits // 4)
    )
    votes = ",\n       ".join(
        f"sum(CASE WHEN (nib{j // 4} >> {j % 4}) & 1 = 1 THEN 1 ELSE -1 END)"
        f" AS v{j}"
        for j in range(bits)
    )
    terms = [
        f"(CASE WHEN v{j} > 0 THEN CAST(1 AS BIGINT) << {j} ELSE 0 END)"
        for j in range(bits - 1)
    ]
    terms.append(
        f"(CASE WHEN v{bits - 1} > 0"
        " THEN CAST(-9223372036854775807 AS BIGINT) - 1 ELSE 0 END)"
    )
    assembly = "\n         + ".join(terms)
    return f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
),
sh AS (
  SELECT doc_id, unnest({sql_shingles("tok", shingle_k)}) AS shingle FROM tok
),
hx AS (SELECT doc_id, md5(shingle) AS h FROM sh),
nb AS (
  SELECT doc_id,
       {nibs}
  FROM hx
),
v AS (
  SELECT doc_id,
       {votes}
  FROM nb GROUP BY doc_id
)
SELECT doc_id,
       CAST({assembly} AS BIGINT) AS simhash
FROM v
"""


DEDUP_SIMHASH_SQL = _simhash_oracle_sql()


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via hamming-band buckets.  Oracle = the
    all-pairs xor/bit_count scan over the (oracle-identical)
    signatures: the pigeonhole banding is LOSSLESS for
    max_hamming < n_bands, so the banded engine result and the oracle's
    quadratic scan are the same set by construction, not approximately.
    (≥95% recall vs n-gram-jaccard ground truth asserted in pytest.)"""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.simhash_near_pairs(dedup.simhash(docs), max_hamming=3)


DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH sig AS ({DEDUP_SIMHASH_SQL})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# --- Text analysis ----------------------------------------------------------


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return text.token_stats(docs)


TEXT_TOKEN_STATS_SQL = """
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       ceil(length(text) / 4.0)::BIGINT AS n_bpe_est,
       {avg_tok} AS avg_token_len
FROM documents
""".format(
    avg_tok=sql_exact_round(
        "(length(text) - len(string_split(text, ' ')) + 1)"
        " / len(string_split(text, ' '))",
        4,
    )
)


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return text.quality_score(docs)


_EN_STOP_SQL = "['" + "','".join(text.STOPWORDS["en"]) + "']"

# The tokenized-documents subselect and the rounded quality-score
# expression (over its dtoks/ntoks/text/n_chars columns) are shared
# with the cluster-representatives oracle (corpus_queries).
QUALITY_T_SUBSELECT = """SELECT doc_id, text, n_chars,
         list_distinct(string_split(text, ' ')) AS dtoks,
         len(string_split(text, ' ')) AS ntoks
  FROM documents"""

QUALITY_SCORE_EXPR = sql_exact_round(
    "0.25 * (CASE WHEN n_chars >= 100 AND n_chars <= 10000"
    "            THEN 1.0 ELSE 0.5 END)"
    " + 0.25 * least(len(list_intersect(dtoks, " + _EN_STOP_SQL + ")) / 3.0, 1.0)"
    " + 0.25 * (len(dtoks) / ntoks)"
    " + 0.25 * (length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))"
    "            / greatest(length(text), 1))",
    4,
)

TEXT_QUALITY_SQL = f"""
WITH t AS (
  {QUALITY_T_SUBSELECT}
)
SELECT doc_id,
       len(dtoks) AS n_distinct_tokens,
       {sql_exact_round('len(dtoks) / ntoks', 4)} AS type_token_ratio,
       len(list_intersect(dtoks, {_EN_STOP_SQL})) AS stopword_hits,
       {sql_exact_round(
           "length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))"
           " / greatest(length(text), 1)", 4)} AS alpha_ratio,
       {QUALITY_SCORE_EXPR} AS quality_score
FROM t
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return text.lang_id(docs)


def _lang_id_sql() -> str:
    hits = {
        code: (
            "len(list_intersect(list_distinct(string_split(text, ' ')), ['"
            + "','".join(text.STOPWORDS[code])
            + "']))"
        )
        for code in sorted(text.STOPWORDS)
    }
    mx = "greatest(" + ", ".join(hits.values()) + ")"
    cases = " ".join(
        f"WHEN {hits[code]} = mx THEN '{code}'" for code in sorted(text.STOPWORDS)
    )
    return f"""
WITH t AS (SELECT doc_id, lang, text, {mx} AS mx FROM documents)
SELECT doc_id, lang AS labeled_lang, mx AS best_hits,
       CASE WHEN mx > 0 THEN (CASE {cases} END) ELSE 'unknown' END AS detected_lang
FROM t
"""


TEXT_LANG_ID_SQL = _lang_id_sql()


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return text.fingerprint(docs)


TEXT_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint,
       length(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS n_chars_norm
FROM documents
"""

# --- Embedding-cosine near-dedup -------------------------------------------

# 0.45 rather than a realistic near-dup 0.95: the synthetic embeddings
# are near-orthogonal random vectors (max pairwise cosine ≈0.51 at
# sf0.01), so a 0.95 threshold returned zero rows at every SF and the
# driver's hash check proved only that both engines agree on "empty".
# At 0.45 the query emits real pairs and the threshold comparison is
# exercised on both sides of the boundary (cosines are fold-sum
# bitwise-identical cross-engine, so the >= cannot disagree).
COSINE_DUP_THRESHOLD = 0.45


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors: pairs with cosine ≥ threshold.

    All-pairs at this corpus size (the exactness baseline); the scale
    path reuses the sign-bucket/IVF candidate generation
    (similarity.ann_sign_bucket_topk) with the same verify expression.
    Fold-sum cosines are bitwise engine-identical, so the ≥ filter
    can't disagree.  Input bounded (dedup.bounded_input) so the
    baseline cannot silently become a corpus-scale cross join."""
    from ..operators.similarity import cosine, with_norm

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    emb = dedup.bounded_input(
        emb, dedup.ALL_PAIRS_MAX_ROWS, "similarity.ann_sign_bucket_topk"
    )
    base = with_norm(emb)
    a = base.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
        )
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
        .select("id_a", "id_b", "cosine")
    )


DEDUP_EMBEDDING_COSINE_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM e
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
                   (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
                  (x, y) -> x + y) / (a.nrm * b.nrm) >= {COSINE_DUP_THRESHOLD}
"""

# --- Similarity search ------------------------------------------------------

QUERY_IDS = list(range(10))
TOPK = 5
ANN_BITS = 8


def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.brute_force_topk(emb, query_ids=QUERY_IDS, k=TOPK)


EMBEDDING_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM e
),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
      WHERE vec_id IN ({", ".join(map(str, QUERY_IDS))})),
s AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(q.qv, c.v), p -> p[1] * p[2]),
                     (a, b) -> a + b) / (q.qnrm * c.nrm) AS cosine
  FROM q, n c WHERE q.query_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= {TOPK}
"""


def embedding_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.ann_sign_bucket_topk(
        emb, query_ids=QUERY_IDS, k=TOPK, bits=ANN_BITS
    )


_BUCKET_SQL = " || ".join(
    f"(CASE WHEN v[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(ANN_BITS)
)

EMBEDDING_ANN_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm,
         {_BUCKET_SQL} AS bucket
  FROM e
),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM n
      WHERE vec_id IN ({", ".join(map(str, QUERY_IDS))})),
s AS (
  SELECT q.query_id, q.bucket, c.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(q.qv, c.v), p -> p[1] * p[2]),
                     (a, b) -> a + b) / (q.qnrm * c.nrm) AS cosine
  FROM q JOIN n c ON q.bucket = c.bucket AND q.query_id <> c.vec_id
)
SELECT query_id, bucket, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= {TOPK}
"""
