"""Text-analysis operators for training-data pipelines.

Everything here is JVM-side (built-in ``pyspark.sql.functions`` only — no
Python UDFs), so the expressions stay inside whole-stage codegen and push
down to the parquet scan. Each operator has an exact ANSI-SQL mirror in
``arhivum_spark.queries`` so the DuckDB oracle can value-check it.

Reference lineage: the reference classifies rows with cheap per-row
predicates (MetadataService.java:81-180 file-class predicates,
Zone eligibility docs/shared/DEDUPLICATION.md:13-21) and fingerprints
content with deterministic digests (HashService.java:58-109). These
operators are the text-corpus generalization: language ID, quality
scoring, token statistics, and content fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword lists (public, ubiquitous function words).
# Deterministic scoring: language score = # tokens that are stopwords of that
# language; winner = max score with lexicographic tiebreak; all-zero -> "und"
# (ISO 639-3 undetermined).
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "en": ["the", "a", "and", "is", "not", "of", "to", "in", "on", "for"],
    "es": ["el", "la", "y", "es", "no", "un", "con", "en", "por", "para"],
    "fr": ["le", "la", "et", "est", "pas", "un", "avec", "dans", "sur", "pour"],
}

# BPE-ish token pattern: runs of letters, runs of digits, or single
# punctuation marks — the standard pre-tokenization split.
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _tokens(text_col: str) -> Column:
    # Module-wide tokenization contract shared with operators/dedup_text
    # (see its module docstring): maximal runs of non-whitespace, where
    # whitespace = the six ASCII separators \x20,\x09-\x0d; runs collapse,
    # no empty tokens. Keeps "n-gram similarity" (here) and "substring
    # containment" / MinHash kernels (dedup_text) agreeing on what a
    # token is for any caption containing tabs/newlines.
    # null-safe: a null text has zero tokens (size(split(NULL)) is -1
    # under legacy sizeOfNull — every ratio/argmax downstream would
    # silently misbehave on null rows otherwise)
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "[ \t\n\x0b\f\r]+"),
        lambda t: t != "",
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row stopword-hit score for every language + the argmax label.

    Pure array intrinsics: split -> per-language count of stopword tokens.
    One projection, no shuffle, no Python.
    """
    toks = _tokens(text_col)
    out = df
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        out = out.withColumn(
            f"score_{lang}",
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))),
        )
    # argmax with lexicographic tiebreak, zero -> "und"
    best = None
    for lang in sorted(STOPWORDS):
        score = F.col(f"score_{lang}")
        if best is None:
            best = F.struct(score.alias("s"), F.lit(lang).alias("l"))
        else:
            best = F.when(
                score > best["s"], F.struct(score.alias("s"), F.lit(lang).alias("l"))
            ).otherwise(best)
    return out.withColumn(
        "lang_pred", F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality-scoring features (Gopher/C4-style cheap filters):
    token count, mean token length, punctuation ratio, digit ratio,
    stopword ratio.
    """
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    all_sw = F.array(
        *[F.lit(w) for ws in STOPWORDS.values() for w in ws]
    )
    n_chars = F.length(F.col(text_col))
    n_punct = F.length(F.regexp_replace(F.col(text_col), "[a-z0-9 ]", ""))
    n_digit = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn(
            "mean_token_len",
            F.round(
                F.when(
                    n_tok > 0,
                    F.aggregate(
                        toks, F.lit(0), lambda acc, t: acc + F.length(t)
                    ).cast("double")
                    / n_tok,
                ).otherwise(F.lit(0.0)),
                4,
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(
                    F.lit(0.0)
                ),
                4,
            ),
        )
        .withColumn(
            "digit_ratio",
            F.round(
                F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(
                    F.lit(0.0)
                ),
                4,
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.when(
                    n_tok > 0,
                    F.size(F.filter(toks, lambda t: F.array_contains(all_sw, t)))
                    .cast("double")
                    / n_tok,
                ).otherwise(F.lit(0.0)),
                4,
            ),
        )
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish pre-tokenization count.

    The regex count is a deterministic proxy for tokenizer cost — the number
    of letter-runs / digit-runs / punctuation marks in the lowercased text.
    """
    lowered = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    return df.withColumn("ws_tokens", F.size(_tokens(text_col))).withColumn(
        "bpeish_tokens",
        F.size(F.regexp_extract_all(lowered, F.lit(TOKEN_PATTERN), 0)),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint of whitespace-normalized lowercased text.

    The text analogue of the reference's content SHA-256
    (HashService.java:58-109): md5 over the canonical form, so trivially
    re-formatted copies collide (the exact-dedup key for documents).
    """
    # normalize the full six-separator whitespace class (the module
    # contract), not just spaces: a line-wrapped copy ('foo\nbar') must
    # collide with 'foo bar' — the docstring's exact claim
    canon = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            "[ \t\n\x0b\f\r]+",
            " ",
        )
    )
    return df.withColumn("fingerprint", F.md5(canon))


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (id_a < id_b, jaccard >= t).

    The exact version of what MinHash+LSH estimates
    (operators/dedup_text.minhash_lsh_pairs) — quadratic in gram-sharing
    documents, so at 10^12 scale it serves as (a) the small-scale oracle for
    LSH recall tests and (b) the verify step AFTER LSH blocking. Shuffle
    carries (gram_hash, id) only.
    """
    toks = df.select(
        F.col(id_col).alias("_id"), _tokens(text_col).alias("t")
    ).withColumn("n_tok", F.size("t"))
    grams = toks.select(
        "_id",
        F.explode(
            F.array_distinct(
                F.when(
                    F.col("n_tok") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.col("n_tok") - (n - 1)),
                        lambda i: F.xxhash64(F.concat_ws(" ", F.slice("t", i, n))),
                    ),
                ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", "t")))),
            )
        ).alias("gram"),
    )
    sizes = grams.groupBy("_id").agg(F.count("*").alias("sz"))
    inter = (
        grams.alias("a")
        .join(grams.alias("b"), "gram")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
    )
