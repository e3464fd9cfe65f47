"""Column-expression helpers — all JVM-side built-ins, no UDFs.

These compose pyspark.sql.functions into the vector/text primitives
the extension operators need, keeping the hot path inside whole-stage
codegen (a row-at-a-time Python UDF here would be 10-100x slower at
100 TB — SURVEY.md §2.10 keeps the data plane UDF-free).
"""

from .vector import cosine_sim, dot, l2_norm, to_double_array  # noqa: F401
from .text import (  # noqa: F401
    normalize_text,
    words,
    word_shingles,
    stopword_count,
)
