"""Text analysis for large-scale training-data pipelines.

Not part of the cuGraph reference surface (cuGraph is graph-only) —
these are the pipeline operators a 100 TB training-data curation run
needs over a ``documents(doc_id, text, lang, source, n_chars)`` table:
language-ID, quality scoring, token counting, document fingerprinting.

Everything here is built-in ``pyspark.sql.functions`` only (JVM-side,
whole-stage codegen, no Python UDFs) so the expressions inline into the
scan stage: one pass over the text column, no shuffle at all unless the
caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword profiles for the n-gram/stopword heuristic
# language identifier. Word lists are the standard high-frequency
# function words of each language (public knowledge).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "pour", "une"],
    "es": ["el", "la", "los", "que", "de", "en", "es", "por", "con", "para"],
}


def _stopword_regex(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Stopword-profile language ID: per language, count stopword hits
    in the lowercased text; argmax wins, ties → lexicographically first
    language, no hits at all → 'und' (undetermined)."""
    lowered = F.lower(F.col(text_col))
    scores = [
        F.struct(
            F.size(F.regexp_extract_all(lowered, F.lit(_stopword_regex(ws)), 1)).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(LANG_PROFILES.items())
    ]
    # argmax by (hits, lang-reversed): sort_array ascending puts the
    # winner last; ties resolve to the later struct → to get min-lang
    # tie-break we compare on (hits, negated-rank) instead.
    ranked = [
        F.struct(
            s["hits"].alias("hits"),
            F.lit(-i).alias("tie"),  # earlier language wins ties
            s["lang"].alias("lang"),
        )
        for i, s in enumerate(scores)
    ]
    best = F.array_max(F.array(*ranked))
    return df.withColumn(
        out_col,
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def token_count(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "n_tokens",
    mode: str = "whitespace",
) -> DataFrame:
    """Token counting: ``whitespace`` (split on runs of whitespace) or
    ``bpe_ish`` (a GPT-style pre-tokenizer regex: word pieces, numbers,
    punctuation runs — the standard `'s|'t|...|\\w+|\\d|[^\\s\\w]+`
    family)."""
    if mode == "whitespace":
        c = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        c = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(c)
    elif mode == "bpe_ish":
        c = F.size(
            F.regexp_extract_all(
                F.col(text_col),
                F.lit(r"('s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+)"),
                1,
            )
        )
    else:
        raise ValueError(mode)
    return df.withColumn(out_col, c.cast("long"))


def quality_score(
    df: DataFrame, text_col: str = "text", out_col: str = "quality"
) -> DataFrame:
    """Heuristic document quality in [0,1] from length / punctuation /
    stopword / word-length signals (the classic C4/Gopher-style rule
    family, re-expressed as one vectorized expression):

    - length_ok: 50 ≤ chars ≤ 100_000
    - mean word length in [3, 12]
    - stopword ratio ≥ 0.05 (any profile language)
    - non-alnum ratio ≤ 0.4
    Score = mean of the four indicator signals.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    words = F.split(F.trim(text), r"\s+")
    n_words = F.greatest(F.size(words), F.lit(1))
    mean_wlen = n_chars / n_words
    all_stop = _stopword_regex(
        sorted({w for ws in LANG_PROFILES.values() for w in ws})
    )
    stop_ratio = F.size(F.regexp_extract_all(F.lower(text), F.lit(all_stop), 1)) / n_words
    non_alnum = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")) / F.greatest(n_chars, F.lit(1))
    ind = [
        ((n_chars >= 50) & (n_chars <= 100_000)).cast("double"),
        ((mean_wlen >= 3.0) & (mean_wlen <= 12.0)).cast("double"),
        (stop_ratio >= 0.05).cast("double"),
        (non_alnum <= 0.4).cast("double"),
    ]
    score = sum(ind[1:], ind[0]) / F.lit(float(len(ind)))
    return df.withColumn(out_col, score)


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fingerprint",
    hash_fn: str = "xxhash64",
) -> Column | DataFrame:
    """Content fingerprint: keyed 64-bit hash of the whitespace-
    normalized, lowercased text — equal fingerprints ⇔ near-identical
    content up to whitespace/case (the exact-dedup key; for shingled
    near-dup see ``dedup.minhash_signatures``). ``hash_fn="md5_60"``
    switches to the ANSI-SQL-portable 60-bit hash (dedup._hash64) so
    the DuckDB oracle gate can verify values exactly; production
    default stays xxhash64."""
    from .dedup import _hash64

    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, _hash64(norm, None, hash_fn))


def shingles(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "shingles",
    n: int = 3,
) -> DataFrame:
    """Word n-gram shingle array (distinct), built with higher-order SQL
    functions (transform over a sequence — JVM-side, no UDF)."""
    words = F.split(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"[^\w\s]", "")), r"\s+"
    )
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return df.withColumn(
        out_col, F.when(k > 0, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))
    )
