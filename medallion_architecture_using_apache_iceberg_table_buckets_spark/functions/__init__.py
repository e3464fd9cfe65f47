"""Column-expression helpers — JVM-side built-ins on the hot path.

These compose pyspark.sql.functions into the vector/text primitives
the extension operators need, keeping the hot path inside whole-stage
codegen (a row-at-a-time Python UDF here would be 10-100x slower at
100 TB — SURVEY.md §2.10 keeps the data plane UDF-free). The one
exception is ``avro_functions``: the stock-signature from_avro /
to_avro Column surface, which delegates to spark-avro when the jar
is loaded and otherwise falls back to an Arrow-serialized UDF —
API-compat path only; bulk pipelines use avro_codec's mapInArrow.
"""

from .avro_functions import from_avro, to_avro  # noqa: F401
from .vector import cosine_sim, dot, l2_norm, to_double_array  # noqa: F401
from .text import (  # noqa: F401
    normalize_text,
    words,
    word_shingles,
    stopword_count,
)
