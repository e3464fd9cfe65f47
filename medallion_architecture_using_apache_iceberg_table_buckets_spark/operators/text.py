"""Text analysis operators: language-ID, quality scoring, token
counting, fingerprinting. All built-in expressions (whole-stage
codegen); each has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, words

# marker vocabularies for the n-gram/stopword language heuristic;
# checked in deterministic priority order en > de > es > fr on ties
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "es": ["el", "los", "y", "que", "es", "una"],
    "fr": ["le", "les", "et", "des", "est", "une"],
}

EN_STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "for"]


def _marker_hits(words_col, markers: list[str]):
    arr = F.array(*[F.lit(w) for w in markers])
    return F.size(F.filter(words_col, lambda w: F.array_contains(arr, w)))


def langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language heuristic.

    Scores each language by marker-token occurrences; argmax with a
    fixed priority order on ties, 'und' (undetermined) when no marker
    hits. (A real pipeline swaps in fastText/CLD3 via a pandas UDF —
    the operator shape stays identical.)
    """
    w = words(text_col)
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        *[_marker_hits(w, m).alias(f"score_{lang}") for lang, m in LANG_MARKERS.items()],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best <= 0, "und")
    for lang in LANG_MARKERS:  # insertion order = priority order
        pred = pred.when(F.col(f"score_{lang}") == best, lang)
    return scored.select(
        "doc_id",
        *[f"score_{lang}" for lang in LANG_MARKERS],
        pred.alias("predicted_lang"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword quality features + composite score.

    score = 0.5 * min(1, n_words/120) + 0.3 * stop_ratio
          + 0.2 * alpha_ratio, rounded to 4.
    """
    norm = normalize_text(text_col)
    w = words(text_col)
    n_words = F.size(w)
    n_chars = F.length(text_col)
    alpha_chars = F.length(F.regexp_replace(F.lower(text_col), "[^a-z]", ""))
    stop_cnt = _marker_hits(w, EN_STOPWORDS)
    alpha_ratio = F.round(alpha_chars / n_chars, 4)
    stop_ratio = F.round(stop_cnt / n_words, 4)
    score = F.round(
        F.least(F.lit(1.0), n_words / F.lit(120.0)) * 0.5
        + stop_cnt / n_words * 0.3
        + alpha_chars / n_chars * 0.2,
        4,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("int").alias("n_chars"),
        n_words.cast("int").alias("n_words"),
        F.round(F.length(F.regexp_replace(norm, " ", "")) / n_words, 4).alias("avg_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens vs BPE-ish regex tokens ([a-z]+ | digits |
    single punctuation) — the standard pre-tokenizer split."""
    ws_tokens = F.size(F.split(F.trim(text_col), r"\s+"))
    re_tokens = F.size(
        F.regexp_extract_all(F.lower(text_col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens.cast("int").alias("ws_tokens"),
        re_tokens.cast("int").alias("re_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: full md5 of normalized text + a 63-bit
    rolling polynomial hash over its words (order-sensitive, unlike
    the md5 of the sorted vocabulary)."""
    norm = normalize_text(text_col)
    from .dedup import token_id

    rolling = F.aggregate(
        words(text_col),
        F.lit(7).cast("long"),
        # modulus 2^57 keeps acc*31 + id < 2^63 (ANSI mode raises on overflow)
        lambda acc, w: (acc * 31 + token_id(w)) % F.lit(144_115_188_075_855_872),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fp_md5"),
        rolling.alias("fp_rolling"),
    )
