"""Text-analysis operators for the training-data pipeline surface.

Beyond-reference operators (BASELINE.json north star): token counting,
quality scoring, language ID, and document fingerprinting over a
``documents(doc_id, text, ...)`` table.  All pure built-in-function
plans (split / transform / filter / aggregate lambdas) — JVM-side,
whole-stage-codegen'd, no Python UDFs — so they scale linearly with
the corpus and shuffle nothing (per-row maps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import exact_round

# Small in-query stopword lists per language for the n-gram/stopword
# language-ID heuristic.  Deliberately tiny: language ID at corpus
# scale is a per-row map; richer lists plug in without plan changes.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "una"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"],
}


def tokens_col(text: Column | str = "text") -> Column:
    """Whitespace tokenization (split on single space; the corpus is
    single-space-joined).  Empty-string tokens are preserved, matching
    both engines' split semantics."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting (whitespace + BPE-ish char/4 estimate) and basic
    length stats per document."""
    toks = tokens_col(text_col)
    return df.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        # BPE-ish upper bound: ~1 token / 4 chars, ceil
        F.ceil(F.length(text_col) / F.lit(4.0)).cast("long").alias("n_bpe_est"),
        exact_round(
            (F.length(text_col) - F.size(toks) + 1) / F.size(toks), 4
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality score in [0,1]: length band, stopword
    presence, type-token ratio, and alphabetic purity — the standard
    cheap pre-filters for LLM corpus cleaning, as one per-row map."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), en_stop))
    ttr = F.size(F.array_distinct(toks)) / n_tokens
    len_score = F.when(
        (F.col("n_chars") >= 100) & (F.col("n_chars") <= 10000), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    alpha_ratio = F.length(
        F.regexp_replace(F.col(text_col), "[^a-zA-Z ]", "")
    ) / F.greatest(F.length(text_col), F.lit(1))
    score = (
        F.lit(0.25) * len_score
        + F.lit(0.25) * F.least(stop_hits / F.lit(3.0), F.lit(1.0))
        + F.lit(0.25) * ttr
        + F.lit(0.25) * alpha_ratio
    )
    return df.select(
        "doc_id",
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        exact_round(ttr, 4).alias("type_token_ratio"),
        stop_hits.alias("stopword_hits"),
        exact_round(alpha_ratio, 4).alias("alpha_ratio"),
        exact_round(score, 4).alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: count token hits against each
    language's stopword list; argmax with deterministic tiebreak on
    language code order.  Expressed as a single per-row expression —
    no shuffle, no UDF."""
    toks = F.array_distinct(tokens_col(text_col))

    def hits_for(code: str) -> Column:
        lst = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        return F.size(F.array_intersect(toks, lst))

    max_hits = F.greatest(*[hits_for(c) for c in sorted(STOPWORDS)])
    # argmax with first-match-wins tiebreak in sorted code order: build
    # the when-chain from the last code backwards so earlier codes win.
    lang_expr = F.lit("unknown")
    for code in sorted(STOPWORDS, reverse=True):
        lang_expr = F.when(
            (hits_for(code) == max_hits) & (max_hits > 0), F.lit(code)
        ).otherwise(lang_expr)
    return df.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        max_hits.alias("best_hits"),
        lang_expr.alias("detected_lang"),
    )


def hash_embedding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: int = 16,
) -> DataFrame:
    """Deterministic hash-feature embedding (feature hashing / "hashing
    trick"): each token votes an unnormalized ±1 into one of ``dims``
    buckets via md5 (bucket sums are raw vote counts; consumers that
    need unit scale normalize downstream, e.g. with_norm's L2).
    The container-safe stand-in for a model encoder — the Spark
    plumbing (tokenize → explode → bucket-aggregate → vector assembly)
    is exactly what a real embedding UDF pipeline needs, minus the
    model call, and it feeds the similarity operators directly.

    Pure JVM expressions; one shuffle on id_col."""
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))
    h = F.md5(F.col("tok"))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(dims)
    )
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("int") % 2 == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    votes = (
        toks.select(F.col(id_col), bucket.alias("b"), sign.alias("s"))
        .groupBy(id_col, "b")
        .agg(F.sum("s").alias("v"))
    )
    return (
        votes.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("b", "v"))), lambda x: x["v"]
            ).alias("sparse"),
            F.array_sort(F.collect_list("b")).alias("present"),
        )
        .select(
            F.col(id_col),
            # densify: missing buckets are 0.0 (array_position yields 0
            # for absent values, and element_at(_, 0) throws — guard)
            F.transform(
                F.sequence(F.lit(0), F.lit(dims - 1)),
                lambda d: F.when(
                    F.array_position(F.col("present"), d) > 0,
                    F.element_at(
                        F.col("sparse"),
                        F.array_position(F.col("present"), d).cast("int"),
                    ),
                ).otherwise(F.lit(0.0)),
            ).alias("embedding"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of case/whitespace-normalized text —
    the exact-dedup key (normalization-robust variant of raw md5)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), "\\s+", " ")
    return df.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("n_chars_norm"),
    )
