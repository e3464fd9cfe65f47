"""Text expression helpers shared by dedup / text-analysis operators.

Each has an exact DuckDB-SQL twin (documented inline) so operator
results can be oracle-checked across engines. Note DuckDB's
``regexp_replace`` needs the ``'g'`` flag to replace globally —
Spark's replaces all matches by default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DuckDB twin:
#   trim(regexp_replace(regexp_replace(lower(x), '[^a-z0-9 ]', ' ', 'g'),
#        ' +', ' ', 'g'))
def normalize_text(c: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace."""
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " "), " +", " ")
    )


# DuckDB twin: string_split(<normalized>, ' ')
def words(c: Column | str) -> Column:
    """Token list of the normalized text."""
    return F.split(normalize_text(c), " ")


def word_shingles(words_col: Column, n: int = 3) -> Column:
    """Word n-grams as strings (the near-dup shingle unit).

    JVM-side: slice + concat over a sequence of start offsets; empty
    array when the document has fewer than n words. DuckDB twin uses
    lead() windows over unnested words (same output set); both
    produce space-joined n-grams.
    """
    starts = F.sequence(F.lit(1), F.size(words_col) - (n - 1))
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(words_col, i, n)))
    return F.when(F.size(words_col) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def stopword_count(words_col: Column, stopwords: list[str]) -> Column:
    """Occurrences (with repeats) of any stopword in the token list.

    DuckDB twin: len(list_filter(words, w -> list_contains([...], w)))
    """
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(words_col, lambda w: F.array_contains(arr, w)))
