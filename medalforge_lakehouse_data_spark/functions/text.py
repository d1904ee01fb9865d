"""Text-analysis operators for training-data pipelines.

All built from JVM-side pyspark.sql.functions Column expressions (no
Python in the row path): language-ID (stopword-hit heuristic), quality
scoring (length/punctuation/stopword ratios), token counting
(whitespace + BPE-ish regex), document fingerprinting (rolling hash via
Spark's xxhash64 over normalized shingles)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword seed sets (public common words)
LANG_STOPWORDS = {
    "en": ["the", "and", "is", "of", "to", "a", "in", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "im", "ein"],
    "pt": ["o", "a", "de", "que", "e", "do", "da", "em", "um", "para"],
}

# BPE-ish tokenizer: word pieces, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def tokens(col: Column | str) -> Column:
    """Array of BPE-ish tokens (regexp_extract_all, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0)


def token_count(col: Column | str) -> Column:
    return F.array_size(tokens(col))


def whitespace_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.array_size(F.split(F.trim(c), r"\s+"))


def _word_set(col: Column) -> Column:
    return F.array_distinct(F.split(F.lower(F.trim(col)), r"[\s\p{Punct}]+"))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts over the distinct word set."""
    c = F.col(col) if isinstance(col, str) else col
    words = _word_set(c)
    return {
        lang: F.array_size(
            F.array_intersect(words, F.array(*[F.lit(w) for w in sw]))
        )
        for lang, sw in LANG_STOPWORDS.items()
    }


def lang_id(col: Column | str, min_hits: int = 1) -> Column:
    """Argmax language by stopword hits; 'und' when nothing matches.
    Deterministic tie-break: language name order."""
    scores = lang_scores(col)
    pairs = [
        F.struct(s.alias("hits"), F.lit(lang).alias("lang"))
        for lang, s in sorted(scores.items())
    ]
    best = F.array_max(F.array(*pairs))
    return F.when(best["hits"] >= min_hits, best["lang"]).otherwise(F.lit("und"))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, punctuation ratio,
    stopword ratio, mean word length, uppercase ratio."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    toks = F.split(F.trim(c), r"\s+")
    n_tokens = F.array_size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    words = _word_set(c)
    en_sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.array_size(F.array_intersect(words, en_sw))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)),
        "upper_ratio": n_upper / F.greatest(n_chars, F.lit(1)),
        "mean_word_len": (F.length(F.regexp_replace(c, r"\s+", ""))
                          / F.greatest(n_tokens, F.lit(1))),
        "stopword_ratio": stop_hits / F.greatest(F.array_size(words), F.lit(1)),
    }


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: rewards sane length, some stopwords,
    moderate punctuation (heuristics in the C4/Gopher-rules tradition)."""
    f = quality_features(col)
    len_ok = F.when((f["n_tokens"] >= 5) & (f["n_tokens"] <= 100000), 1.0).otherwise(0.2)
    word_ok = F.when((f["mean_word_len"] >= 2) & (f["mean_word_len"] <= 12), 1.0).otherwise(0.3)
    punct_ok = F.when(f["punct_ratio"] <= 0.3, 1.0).otherwise(0.4)
    stop_ok = F.when(f["stopword_ratio"] >= 0.01, 1.0).otherwise(0.5)
    return (len_ok * 0.3 + word_ok * 0.2 + punct_ok * 0.2 + stop_ok * 0.3).cast("double")


def _normalized(col: Column) -> Column:
    """Canonical text form: lowercased, whitespace runs collapsed to one
    space, trimmed — the equivalence class fingerprints key on."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fingerprint(col: Column | str) -> Column:
    """64-bit document fingerprint: xxhash64 of the normalized text —
    an exact-dup key stable under whitespace/case reformatting. Equal
    fingerprints ⇔ equal normalized content (up to 2^-64 collisions).

    Round-2 change: round 1 keyed on the min shingle hash (a 1-perm
    MinHash), which collides for merely-similar docs with probability ≈
    their Jaccard — wrong for an exact-dup key. That behavior lives on
    as min_shingle_fingerprint for near-dup bucketing."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(_normalized(c))


def min_shingle_fingerprint(col: Column | str, shingle_k: int = 5) -> Column:
    """1-permutation MinHash: min xxhash64 over the k-word shingle set of
    the normalized text. Collision probability between two docs ≈ their
    shingle Jaccard — a cheap near-dup bucketing key, NOT an exact key."""
    c = F.col(col) if isinstance(col, str) else col
    norm = _normalized(c)
    words = F.split(norm, " ")
    n = F.array_size(words)
    shingles = F.when(
        n >= shingle_k,
        F.transform(
            F.sequence(F.lit(0), n - shingle_k),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, shingle_k))),
        ),
    ).otherwise(F.array(F.xxhash64(norm)))
    return F.array_min(shingles)


def with_text_analysis(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass convenience: attach lang/quality/token/fingerprint cols."""
    f = quality_features(text_col)
    return (
        df.withColumn("lang_pred", lang_id(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("n_tokens_bpe", token_count(text_col))
        .withColumn("n_tokens_ws", whitespace_token_count(text_col))
        .withColumn("punct_ratio", f["punct_ratio"])
        .withColumn("fingerprint", fingerprint(text_col))
    )
