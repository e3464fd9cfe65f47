"""Text analysis operators: language-ID, quality scoring, token
counting, fingerprinting. All built-in expressions (whole-stage
codegen); each has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

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


# Gopher-style quality-filter rule parameters (Rae et al. 2021,
# "Scaling Language Models" appendix A1.1, adapted to the synthetic
# corpus scale). All comparisons are integer cross-multiplications so
# the keep decision is bit-exact in any engine — no float thresholds.
QF_MIN_WORDS = 20
QF_MAX_WORDS = 100_000
QF_MIN_AVG_WLEN = 3   # 3 <= total_word_chars / n_words <= 10
QF_MAX_AVG_WLEN = 10
QF_MIN_ALPHA_PCT = 60      # alpha chars >= 60% of all chars
QF_MIN_STOP_HITS = 2       # >= 2 stopword occurrences
QF_MAX_WORD_LEN = 20       # no single token longer than this
QF_MIN_DISTINCT_PCT = 20   # distinct words >= 20% of words (repetition)


def quality_filter(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """C4/Gopher-style document filter: per-rule flags + keep verdict.

    Emits one row per doc with each rule's pass flag, the keep
    decision (AND of all rules), and the first failed rule's name
    (priority = declaration order) for drop accounting. Map-only —
    no shuffle; at 100 TB this is a single scan-project pass and the
    flags let the pipeline report per-rule drop rates with one
    follow-up aggregation.
    """
    w = words(text_col)
    n_words = F.size(w)
    n_chars = F.length(text_col)
    alpha_chars = F.length(F.regexp_replace(F.lower(text_col), "[^a-z]", ""))
    word_chars = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    stop_cnt = _marker_hits(w, EN_STOPWORDS)
    max_wlen = F.coalesce(F.array_max(F.transform(w, F.length)), F.lit(0))
    n_distinct = F.size(F.array_distinct(w))
    rules = [
        ("word_count", (n_words >= QF_MIN_WORDS) & (n_words <= QF_MAX_WORDS)),
        ("avg_word_len", (word_chars >= QF_MIN_AVG_WLEN * n_words)
                         & (word_chars <= QF_MAX_AVG_WLEN * n_words)),
        ("alpha_ratio", alpha_chars * 100 >= QF_MIN_ALPHA_PCT * n_chars),
        ("stopwords", stop_cnt >= QF_MIN_STOP_HITS),
        ("max_word_len", max_wlen <= QF_MAX_WORD_LEN),
        ("repetition", n_distinct * 100 >= QF_MIN_DISTINCT_PCT * n_words),
    ]
    keep = rules[0][1]
    for _, cond in rules[1:]:
        keep = keep & cond
    reason = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        reason = F.when(~cond, F.lit(name)).otherwise(reason)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("int").alias("n_words"),
        *[cond.alias(f"ok_{name}") for name, cond in rules],
        keep.alias("keep"),
        reason.alias("drop_reason"),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split docs into fixed-size token windows with overlap — the
    sequence-packing prep step for a training pipeline (context
    windows of `size` tokens, stride `size - overlap`).

    Chunks start at 1, 1+stride, ...; a chunk is emitted only if it
    contributes at least one token beyond the previous chunk's end
    (start <= n_tokens - overlap), so the last chunk may be short but
    never redundant. explode() is the only data expansion — no
    shuffle, no UDF; at 100 TB this is a map-only pass whose output
    is ~(1 + overlap/size)x the input tokens.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got size={size} overlap={overlap}")
    stride = size - overlap
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("w") - overlap, F.lit(1)), F.lit(stride)
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), words(text_col).alias("w"))
        .select("doc_id", F.size("w").alias("doc_tokens"),
                F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.least(F.lit(size), F.col("doc_tokens") - F.col("start") + 1)
             .cast("int").alias("n_tokens"),
        )
    )


def chunk_texts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """chunk_tokens + the materialized chunk text (separate entry so
    count-only consumers never pay for the string rebuild)."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got size={size} overlap={overlap}")
    stride = size - overlap
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("w") - overlap, F.lit(1)), F.lit(stride)
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), words(text_col).alias("w"))
        .select("doc_id", "w", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice("w", F.col("start"), size)).alias("chunk_text"),
        )
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per doc by TF-IDF.

    idf uses the raw rational N/df (not log) so the score is the
    exact IEEE double tf*N/df in every engine — ln() differs in the
    last ulp across libm implementations and would poison value-hash
    comparison; the rational form preserves the same per-doc ranking.
    Plan: one explode + (doc,term) count, a df-table join whose
    strategy is left to AQE, one per-doc window for the top-k — the
    same shape at 100 TB, with the term-df aggregation map-side
    combined. The df table is NOT broadcast-pinned: at web scale the
    vocabulary (typos, numbers, code tokens) reaches 1e8-1e9 distinct
    terms, far past driver/executor broadcast budgets — AQE converts
    the join to broadcast only when the built table is actually small.
    Only the 1-row corpus count keeps an explicit broadcast.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.col("n_docs") / F.col("df"), 4))
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", F.col("rk").cast("int").alias("rk"))
    )


def sparse_cosine_topk(
    df: DataFrame,
    query_ids: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Sparse-vector retrieval: top-k corpus docs per query doc by
    TF-IDF cosine over the shared-term posting join — the classical
    IR counterpart to the dense ANN family (and the lexical half a
    hybrid retriever fuses with embeddings).

    Exactness discipline: weights are MILLI-QUANTIZED BIGINTs
    (``round(tf * N * 1000 / df)`` — rational idf like
    :func:`tfidf_topk`, no libm ``ln``), so dot products and norm
    squares are INTEGER sums — immune to float summation order —
    accumulated in DECIMAL(38,0) (no overflow, exact in Spark and
    DuckDB's int128 alike); the only float ops are two correctly-
    rounded ``sqrt``s and one divide at the end. The SQL oracle
    replays every step bit-exactly.

    At 100 TB: the weighted posting table IS the inverted index — it
    is built from ONE corpus tokenize pass and PERSISTED (what an
    index build is: a materialization), and every downstream branch
    (norms, the query postings, the probe join) reads the
    materialization instead of re-deriving the corpus aggregate —
    without it Spark re-expands the tokenize subtree per reference
    (16 Generate nodes measured). The query-side posting table
    (|Q| probe docs' terms) is BROADCAST onto the corpus postings,
    so retrieval is a map-only probe plus the per-query top-k
    window. No all-pairs join; the df table is never
    broadcast-pinned (web-scale vocabularies exceed broadcast
    budgets — AQE decides)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    weights = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.col("n_docs") * 1000.0 / F.col("df"))
            .cast("long")
            .alias("w"),
        )
        .persist()
    )
    # the squares/products MUST be computed in decimal, not long: a
    # df=1 term's weight is n_docs * 1000, so at 5M docs (the 1000x
    # third-decade fixture) w^2 = 2.5e19 > Long.MaxValue — ANSI mode
    # turns that into a hard ARITHMETIC_OVERFLOW. Casting one operand
    # first makes the multiply a decimal op (same exact integer
    # values, DuckDB's int128 semantics, no overflow until 38 digits).
    norms = weights.groupBy("doc_id").agg(
        F.sum(
            (F.col("w").cast("decimal(19,0)") * F.col("w"))
            .cast("decimal(38,0)")
        ).alias("n2")
    ).persist()
    qids = query_ids.select(F.col(id_col).alias("query_id"))
    qw = weights.join(
        F.broadcast(qids), weights["doc_id"] == qids["query_id"]
    ).select("query_id", "term", F.col("w").alias("qw"))
    dots = (
        weights.join(F.broadcast(qw), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            # decimal multiply for the same overflow reason as n2
            F.sum(
                (F.col("qw").cast("decimal(19,0)") * F.col("w"))
                .cast("decimal(38,0)")
            ).alias("dot")
        )
    )
    qn = norms.select(
        F.col("doc_id").alias("query_id"), F.col("n2").alias("qn2")
    )
    scored = (
        dots.join(F.broadcast(qn.join(F.broadcast(qids), "query_id")),
                  "query_id")
        .join(norms, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("n2").cast("double"))
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "cos_sim",
                F.col("rnk").cast("int").alias("rnk"))
    )


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    shard_col: str,
    order_cols: list[str],
    budget: int = 256,
) -> DataFrame:
    """Token-stream sequence packing: chunks are concatenated in
    ``order_cols`` order within each shard and cut every ``budget``
    tokens — each row learns which training sequence its first token
    lands in (seq_id) and where (seq_offset).

    This is the standard concatenate-and-split packing of LLM
    pretraining (documents joined by the tokenizer, cut into fixed
    windows). One exclusive-prefix window sum per shard — a single
    shuffle on the shard key, so packing 100 TB parallelizes across
    shards while each shard's layout is deterministic (total order =
    order_cols, which must be a per-shard unique key).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("_cum", cum)
        .withColumn("seq_id", F.expr(f"_cum div {int(budget)}"))
        .withColumn("seq_offset", F.col("_cum") % F.lit(int(budget)))
        .drop("_cum")
    )


def repetition_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Intra-document repetition metrics (the Gopher repetition-rule
    family): the fraction of a doc's word n-gram occurrences whose
    n-gram appears more than once in that doc (``dup_gram_frac``) and
    the share of the single most frequent n-gram (``top_gram_frac``).
    Autogenerated/spam text scores near 1.0; natural prose stays low
    — the standard cut drops docs above a dup-fraction threshold.

    Plan: explode n-grams, count per (doc, gram) with map-side
    combine, then re-aggregate per doc — two key-local shuffles, no
    driver state, so it scales with corpus bytes. Docs shorter than
    ``n`` words emit 0 grams and 0.0 fractions.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # materialize the word array in its own projection FIRST: referring
    # to words(text) inside the transform lambda would re-run the
    # regex+split chain for every gram element (no common-subexpression
    # elimination inside higher-order lambdas — measured 15s -> 1.5s
    # at sf0.1 for this operator)
    tokened = df.select(
        F.col(id_col).alias("doc_id"), words(text_col).alias("_w")
    )
    w = F.col("_w")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - F.lit(n) + F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    base = tokened.select(
        "doc_id",
        F.when(F.size(w) >= n, grams).otherwise(
            F.array().cast("array<string>")
        ).alias("grams"),
    )
    per_gram = (
        base.select("doc_id", F.explode_outer("grams").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(F.lit(0))).alias("dup_occ"),
        F.max("cnt").alias("top_cnt"),
    )
    # left join back so zero-gram docs keep a row
    ids = df.select(F.col(id_col).alias("doc_id")).distinct()
    return (
        ids.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(
                F.coalesce(F.col("dup_occ") / F.col("n_grams"), F.lit(0.0)), 4
            ).alias("dup_gram_frac"),
            F.round(
                F.coalesce(F.col("top_cnt") / F.col("n_grams"), F.lit(0.0)), 4
            ).alias("top_gram_frac"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/validation split keyed on the NORMALIZED
    CONTENT hash, not the doc id: two byte-different copies of the
    same text (whitespace/punctuation variants included) always land
    on the same side, so exact/normalized duplicates can never leak
    train→val. Near-duplicates need the minhash keep-list first
    (dedup.py) — this operator closes the exact-duplicate hole that
    id-hash splits leave open.

    Map-only (one md5 per row, no shuffle); the split is a pure
    function of content, so reruns and backfills agree forever.
    """
    from .sampling import hash_draw

    if not 0 <= val_pct <= 100:
        raise ValueError(f"val_pct must be in [0,100], got {val_pct}")
    bucket = (hash_draw(normalize_text(text_col)) % 100).cast("int")
    return df.select(
        F.col(id_col).alias("doc_id"),
        bucket.alias("bucket"),
        F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


# PII patterns shared by detect and redact; written in the common
# Java-regex / RE2 subset so Spark and the DuckDB oracle compile the
# same automaton (\b, \d, bounded repeats only — no lookaround).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[- .]\d{3}[- .]\d{4}\b",
}


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII detection + redaction: emails, IPv4 addresses, and
    NANP-style phone numbers found by pattern, counted per document,
    and replaced with typed placeholders ([EMAIL]/[IP]/[PHONE]).

    Redaction order is fixed (email, ip, phone) so a token consumed
    by an earlier pattern can't be re-matched by a later one — the
    oracle applies the same order. Map-only: three regexp_count +
    three regexp_replace per row, all whole-stage codegen; no
    shuffle, so it scales with corpus bytes. (A production pipeline
    adds NER-model detection via a pandas UDF behind the same
    column contract.)
    """
    t = F.col(text_col)
    counts = {
        kind: F.regexp_count(t, F.lit(pat)).cast("int").alias(f"n_{kind}s")
        for kind, pat in PII_PATTERNS.items()
    }
    red = t
    for kind, pat in PII_PATTERNS.items():  # insertion order = apply order
        red = F.regexp_replace(red, pat, f"[{kind.upper()}]")
    total = sum(F.regexp_count(t, F.lit(p)) for p in PII_PATTERNS.values())
    return df.select(
        F.col(id_col).alias("doc_id"),
        *counts.values(),
        red.alias("redacted_text"),
        (total > 0).alias("has_pii"),
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_words: int = 10,
    min_docs: int = 3,
) -> DataFrame:
    """Corpus-level paragraph dedup with document reassembly (the
    CCNet/C4 boilerplate-removal step): segment each document into
    fixed ``para_words``-word paragraphs, drop every paragraph that
    appears verbatim in >= ``min_docs`` distinct documents (cookie
    banners, navigation chrome, license headers), and reassemble the
    surviving paragraphs in their original order.

    Plan: the paragraph list is built expression-side (one slice per
    window, no per-word explode), then ONE posexplode feeds a
    count-distinct on the paragraph string (key-local shuffle, heavy
    hitters only survive the HAVING), a plain left join marks common
    paragraphs (the common set is small by construction — AQE
    broadcasts it at runtime; no pinned hint, the tfidf lesson), and
    reassembly is a per-doc collect_list + array_sort. Three
    shuffles total, all on keys that scale with corpus size.
    """
    if para_words < 1:
        raise ValueError(f"para_words must be >= 1, got {para_words}")
    tokened = df.select(F.col(id_col).alias("doc_id"), words(text_col).alias("_w"))
    w = F.col("_w")
    n_paras = F.ceil(F.size(w) / F.lit(para_words)).cast("int")
    paras_arr = F.when(
        n_paras >= 1,
        F.transform(
            F.sequence(F.lit(0), n_paras - F.lit(1)),
            lambda i: F.concat_ws(
                " ", F.slice(w, i * para_words + F.lit(1), para_words)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    paras = tokened.select(
        "doc_id", F.posexplode_outer(paras_arr).alias("para_idx", "para")
    ).filter(F.col("para").isNotNull())
    common = (
        paras.groupBy("para")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("para", F.lit(True).alias("is_common"))
    )
    marked = paras.join(common, "para", "left")
    keep = F.col("is_common").isNull()
    kept_struct = F.when(
        keep, F.struct(F.col("para_idx").alias("i"), F.col("para").alias("p"))
    )
    return marked.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(F.array_sort(F.collect_list(kept_struct)), lambda s: s["p"]),
        ).alias("clean_text"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_paras_kept"),
        F.sum(F.when(keep, 0).otherwise(1)).cast("long").alias("n_paras_dropped"),
    )


def token_rarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token-rarity profile against the corpus unigram
    table: average and minimum corpus frequency of the document's
    tokens. Low avg_token_freq = novel/rare vocabulary (or noise);
    high = boilerplate-heavy. The unigram-LM perplexity filter most
    pipelines run is this operator with log-probs — the join shape
    is identical, and integer frequencies keep the oracle exact
    (libm log differs across engines in the last ulp).

    Plan: one explode + count per token (key-local shuffle), join
    tokens back to frequencies (no pinned broadcast — the vocabulary
    is corpus-sized at web scale, AQE decides), one per-doc
    re-aggregation. All arithmetic is integer sums plus a single
    identical-operand division — bit-identical across engines.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("tok")
    ).filter(F.col("tok") != "")
    freqs = toks.groupBy("tok").agg(F.count("*").alias("tok_freq"))
    return (
        toks.join(freqs, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.sum("tok_freq").cast("double") / F.count("*"), 4
            ).alias("avg_token_freq"),
            F.min("tok_freq").cast("long").alias("min_token_freq"),
        )
    )


def ngram_surprisal_stream(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The bigram-surprisal occurrence stream ``(doc_id, w1, w2,
    s_micro)`` under the corpus-self-trained add-one bigram LM —
    the shared core of :func:`ngram_lm_scores` and the DoReMi-style
    mixture reweighting (sampling.doremi_mixture_weights). Each
    occurrence's surprisal is micro-unit-quantized BEFORE any
    aggregation, so every consumer aggregates exact integers."""
    toked = df.select(
        F.col(id_col).alias("doc_id"), words(text_col).alias("_w")
    )
    w = F.col("_w")
    bigram = toked.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - F.lit(1)),
                    lambda i: F.struct(
                        F.element_at(w, i).alias("w1"),
                        F.element_at(w, i + F.lit(1)).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    # persisted: the count tables are Zipf-bounded (distinct grams,
    # NOT corpus-sized) and every consumer reference otherwise
    # re-expands the corpus tokenize subtree under it — the scoring
    # join alone re-tokenized the corpus 3 extra times (8 Generate
    # nodes measured on the add-one query before the persist)
    uni = (
        toked.select(F.explode(w).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("cu"))
        .persist()
    )
    big = bigram.groupBy("w1", "w2").agg(F.count("*").alias("cb")).persist()
    vocab = uni.agg(F.count("*").alias("V"))

    return (
        bigram.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "s_micro",
            F.round(
                -F.log(
                    (F.col("cb") + F.lit(1)).cast("double")
                    / (F.col("cu") + F.col("V")).cast("double")
                )
                * F.lit(1_000_000.0)
            ).cast("long"),
        )
    )


def gram_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The stored count artifact an add-one bigram LM is built from:
    one row per distinct unigram and bigram of the corpus —
    ``(gram_type 'uni'|'big', w1, w2, cnt)`` with ``w2 = ''`` for
    unigrams so the gram key is never null (a maintained table
    merges on it; null keys don't equi-join). The token and bigram
    streams are exactly :func:`ngram_surprisal_stream`'s, so counts
    produced here reproduce that LM's probabilities (vocab size V =
    the table's 'uni' row count).

    Plan shape: unigram and bigram occurrences explode from ONE
    projection into one map-side-combined groupBy — a single corpus
    scan and a single shuffle (a union of per-type groupBys would
    scan and tokenize the corpus once per gram order); output is
    Zipf-bounded (distinct grams), never corpus-sized.
    """
    toked = df.select(F.col(id_col).alias("doc_id"), words(text_col).alias("_w"))
    w = F.col("_w")
    gram_struct = "array<struct<gram_type:string,w1:string,w2:string>>"
    unis = F.transform(
        w,
        lambda t: F.struct(
            F.lit("uni").alias("gram_type"),
            t.alias("w1"),
            F.lit("").alias("w2"),
        ),
    )
    bigs = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(1)),
            lambda i: F.struct(
                F.lit("big").alias("gram_type"),
                F.element_at(w, i).alias("w1"),
                F.element_at(w, i + F.lit(1)).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast(gram_struct))
    return (
        toked.select(F.explode(F.concat(unis, bigs)).alias("g"))
        .groupBy(
            F.col("g.gram_type").alias("gram_type"),
            F.col("g.w1").alias("w1"),
            F.col("g.w2").alias("w2"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def incremental_gram_counts(
    history_counts: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental n-gram LM maintenance — the statistics member of
    the incremental family (next to ``minhash_lsh_probe`` /
    ``incremental_components`` / ``ivf_incremental_assign``): merge
    a NEW batch's gram counts into the stored count table WITHOUT
    re-reading the historical corpus, and emit only the upsert
    delta.

    ``history_counts`` is a stored :func:`gram_counts` table. The
    output has one row per distinct gram OF THE BATCH with the
    merged total ``history + batch`` — exactly the row set a MERGE
    INTO the stored table needs (grams absent from the batch are
    untouched and not re-emitted). Counts are additive, so delta +
    stored history == full recompute over the combined corpus; the
    driver oracle hashes the delta against the combined-corpus
    counts semi-joined to the batch's gram set, proving correctness
    and minimality in one check.

    Plan shape (100 TB): one tokenize + count pass over the BATCH
    only, then one equi-join against the stored table on the gram
    key — both sides Zipf-bounded; history text is never touched.
    """
    batch_counts = gram_counts(batch, text_col, id_col).withColumnRenamed(
        "cnt", "b_cnt"
    )
    hist = history_counts.withColumnRenamed("cnt", "h_cnt")
    return batch_counts.join(hist, ["gram_type", "w1", "w2"], "left").select(
        "gram_type",
        "w1",
        "w2",
        (F.coalesce("h_cnt", F.lit(0)) + F.col("b_cnt"))
        .cast("long")
        .alias("cnt"),
    )


def ngram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style n-gram language-model quality signal (Wenzek et
    al. 2020): score every document by its average bigram surprisal
    under an add-one-smoothed bigram LM trained on the corpus itself
    — ``-ln((c(w1,w2) + 1) / (c(w1) + V))`` averaged over the doc's
    bigram occurrences. High average surprisal = improbable word
    sequences (noise, boilerplate soup, wrong-language text); the
    CCNet pipeline buckets the corpus by exactly this statistic
    (there via a pretrained KenLM; self-trained counts here keep the
    operator closed over its input).

    Determinism across engines: each occurrence's surprisal is
    quantized to an INTEGER count of 1e-6 units before aggregation,
    so the per-doc sum is exact and the average is one
    correctly-rounded division of identical integers — no
    summation-order noise (a plain avg-of-doubles flipped a 6th
    decimal on real docs). ``ln`` is the one libm call — measured
    agreement Spark vs DuckDB on 200k smoothed count ratios at this
    quantization: 0 mismatches (both are <=1-ulp log
    implementations; a 1-ulp disagreement only flips the micro-unit
    rounding at ~1e-10 probability per value).

    Plan shape (100 TB): bigram and unigram counting are map-side
    combined groupBys; scoring joins the doc's bigram stream to the
    count tables on the gram key — corpus-sized equi-joins, AQE
    decides the strategy; V is one scalar broadcast. No driver
    state, no all-pairs anything. Docs with fewer than 2 words emit
    ``n_bigrams = 0`` with NULL surprisal (SQL avg-over-empty).
    """
    scored = ngram_surprisal_stream(df, text_col, id_col)
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(
            F.sum("s_micro").cast("double")
            / (F.count("*") * F.lit(1_000_000.0)),
            6,
        ).alias("avg_surprisal"),
    )
    docs = df.select(F.col(id_col).alias("doc_id"))
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
            "n_bigrams"
        ),
        "avg_surprisal",
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 ranked retrieval over the corpus (Robertson et al.;
    the Lucene-variant IDF ``ln(1 + (N - df + 0.5)/(df + 0.5))``,
    which is always positive). The classic lexical-retrieval scorer —
    the counterpart of the TF-IDF profile for "find training docs
    about X" curation queries and the standard hybrid-search partner
    of the ANN operators.

    Plan: the corpus is tokenized ONCE — a single explode feeds one
    ``groupBy(doc_id)`` whose conditional aggregates produce ``dl``
    plus a fixed-width ``tf`` column per query term (the term set is
    tiny and fixed, so partial aggregation collapses each partition's
    token stream to per-doc rows of width ``|terms| + 1`` before the
    shuffle). Corpus stats (N, sum_dl) AND every per-term document
    frequency then come from ONE 1-row aggregate over that per-doc
    frame — Spark reuses the groupBy's exchange for both consumers
    (ReusedExchange), so the scan + tokenize runs exactly once. The
    1-row stats frame broadcasts onto the matched docs and the final
    top-k is one TakeOrderedAndProject. Nothing corpus-sized ever
    sits on a build side. (The previous two-branch formulation
    tokenized the corpus twice — the dl subtree and the tf subtree
    each re-evaluated ``words()``; at scale the tokenize pass is the
    dominant cost, so this halves it.)

    Determinism: tf, dl, df, N are integers; avgdl is one exact
    division; each term's score contribution is quantized to integer
    micro-units BEFORE the per-doc sum (the ngram_lm_scores recipe)
    — here a fixed-order sum of longs, exact — so the cross-engine
    sum is exact and only ln's final ulp could ever flip a 6th
    decimal (~1e-10/value measured risk).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    per_doc = _bm25_per_doc(df, terms, text_col, id_col)
    stats = _bm25_stats(per_doc, len(terms))
    return _bm25_rank(per_doc, stats, len(terms), k, k1, b)


def _bm25_per_doc(
    df: DataFrame, terms: list[str], text_col: str, id_col: str
) -> DataFrame:
    """BM25's per-document index rows ``(doc_id, dl, tf_0..tf_n)`` —
    one tokenize pass, one map-side-combined groupBy. This frame is
    the STORED per-doc postings artifact of the incremental variant:
    rows are per-doc independent, so the index is append-only."""
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(text_col)).alias("term"),
    )
    # words('') == [''] (never an empty array), so every doc survives
    # the explode; the '' token is excluded from dl by the filter.
    return ex.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("term") != "", F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("dl"),
        *[
            F.sum(
                F.when(F.col("term") == t, F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )


def _bm25_stats(per_doc: DataFrame, n_terms: int) -> DataFrame:
    """The 1-row corpus-stats aggregate ``(N, sum_dl, df_0..df_n)``
    over a per-doc index frame. Every column is ADDITIVE across
    disjoint doc sets — the property the incremental variant's
    stats merge relies on."""
    return per_doc.agg(
        F.count("*").alias("N"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(n_terms)
        ],
    )


def _bm25_rank(
    per_doc: DataFrame,
    stats: DataFrame,
    n_terms: int,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Score + top-k over a per-doc index frame and a broadcast 1-row
    stats frame — the shared tail of :func:`bm25_topk` and
    :func:`bm25_topk_incremental`, byte-identical arithmetic (integer
    micro-unit quantization before the exact per-doc sum)."""
    matched = per_doc.filter(
        reduce(or_, [F.col(f"tf_{i}") > 0 for i in range(n_terms)])
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("N")

    def _idf_micro(i: int):
        # identical arithmetic to the per-term broadcast the old plan
        # computed, so quantized values match the oracle bit-for-bit
        return F.round(
            F.log(
                F.lit(1.0)
                + (F.col("N") - F.col(f"df_{i}") + F.lit(0.5))
                / (F.col(f"df_{i}") + F.lit(0.5))
            )
            * F.lit(1_000_000.0)
        ).cast("long")

    def _contrib_micro(i: int):
        tf = F.col(f"tf_{i}")
        return F.when(
            tf > 0,
            F.round(
                _idf_micro(i).cast("double")
                * (tf * F.lit(k1 + 1.0))
                / (
                    tf
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
                )
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    total = _contrib_micro(0)
    n_matched = (F.col("tf_0") > 0).cast("long")
    for i in range(1, n_terms):
        total = total + _contrib_micro(i)
        n_matched = n_matched + (F.col(f"tf_{i}") > 0).cast("long")
    scored = matched.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.round(total.cast("double") / F.lit(1_000_000.0), 6).alias("bm25"),
        n_matched.alias("n_matched_terms"),
    )
    return (
        scored.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "bm25", "n_matched_terms")
    )


def bm25_topk_incremental(
    history: DataFrame,
    batch: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 retrieval served from an INCREMENTALLY MAINTAINED index —
    the retrieval member of the incremental family (next to
    ``incremental_gram_counts`` / ``minhash_lsh_probe`` /
    ``ivf_incremental_assign``), proving the maintained artifacts are
    sufficient to ANSWER queries, not merely to exist.

    The stored artifacts a running pipeline keeps are (a) the per-doc
    index frame (:func:`_bm25_per_doc` rows — append-only, since each
    row depends on its own document alone) and (b) the 1-row corpus
    stats, every column additive. A new batch costs ONE batch-only
    tokenize pass: its per-doc rows APPEND to the stored index and
    its 1-row stats merge by element-wise addition — history text is
    never re-read. Scoring then runs the byte-identical
    :func:`_bm25_rank` arithmetic over the appended index and merged
    stats, so the result equals :func:`bm25_topk` over the combined
    corpus EXACTLY — the driver oracle hashes this operator against
    the full-corpus recompute, which is the equivalence proof.

    Plan shape (100 TB): the batch pass is one map-side-combined
    groupBy over the batch; the stats merge is a 1-row x 1-row cross
    join; the scoring side reads the stored index (corpus-sized but
    columnar and query-term-prunable), never the corpus text.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    pd_h = _bm25_per_doc(history, terms, text_col, id_col)
    pd_b = _bm25_per_doc(batch, terms, text_col, id_col)
    st_h = _bm25_stats(pd_h, len(terms))
    st_b = _bm25_stats(pd_b, len(terms)).select(
        F.col("N").alias("_b_N"),
        F.col("sum_dl").alias("_b_sum_dl"),
        *[
            F.col(f"df_{i}").alias(f"_b_df_{i}")
            for i in range(len(terms))
        ],
    )
    merged = st_h.crossJoin(st_b).select(
        (F.col("N") + F.col("_b_N")).alias("N"),
        (F.col("sum_dl") + F.col("_b_sum_dl")).alias("sum_dl"),
        *[
            (F.col(f"df_{i}") + F.col(f"_b_df_{i}")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    return _bm25_rank(
        pd_h.unionByName(pd_b), merged, len(terms), k, k1, b
    )


def repeated_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """ExactSubstr-style repeated-span detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): find
    every word ``k``-gram that occurs at least ``min_count`` times
    ANYWHERE in the corpus (other docs or elsewhere in the same doc),
    merge each document's duplicated gram positions into maximal
    overlapping spans, and report per-doc span count / covered-token
    count / coverage fraction. The paper removes the covered bytes;
    this operator emits the measurements that drive that cut (and
    paragraph_dedup performs a coarser removal).

    The suffix-array machinery of the paper is a single-node design;
    the positional-k-gram formulation here computes the same covered
    regions for duplicates of length >= k with only key-local
    shuffles: explode positional TOKENS (map-only), assemble each
    position's k-gram with ``lead()`` windows (one shuffle on
    doc_id), count per gram (one shuffle, map-side combine),
    inner-join positions to the duplicated-gram set (shuffle on gram;
    at web scale both sides are corpus-sized, AQE picks the
    strategy), then a per-doc gaps-and-islands window merge (reuses
    the doc_id shuffle). All arithmetic is integer except the final
    division — oracle-exact.

    Why lead() windows and not a transform() lambda: higher-order
    functions are CodegenFallback, and Spark's InferFiltersFromGenerate
    copies the generator expression into a synthesized filter below
    the posexplode — with a gram-building lambda that filter
    re-evaluated the full tokenize chain (two regexes over the whole
    text) PER GRAM ELEMENT per row, interpreted. Executor stacks
    showed all task threads inside RegExpReplace.eval; the 10x
    step-up ran 30+ minutes. The lead() formulation whole-stage-
    codegens end-to-end and tokenizes each doc exactly once.

    Two duplicated positions i < j chain into one span when
    j <= i + k (their k-token windows overlap or touch); an island
    covering positions [s, e] spans e - s + k tokens.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    tokened = df.select(
        F.col(id_col).alias("doc_id"), words(text_col).alias("_w")
    )
    w = F.col("_w")
    # normalized text is trimmed + collapsed, so the only empty token
    # is the lone "" a fully-empty doc splits into
    n_tokens = F.when(
        (F.size(w) == 1) & (F.element_at(w, 1) == ""), F.lit(0)
    ).otherwise(F.size(w))
    base = tokened.select("doc_id", n_tokens.alias("n_tokens"), "_w")
    toks = base.select(
        "doc_id",
        F.posexplode_outer("_w").alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    seq = Window.partitionBy("doc_id").orderBy("pos")
    gram_parts = [F.col("tok")] + [
        F.lead("tok", j).over(seq) for j in range(1, k)
    ]
    # every window expression sits in ONE projection BEFORE the
    # filter: the k-1 lead() calls and the completeness probe must
    # see the unfiltered token stream (filtering first would shift
    # the leads and truncate boundary grams)
    posed = (
        toks.select(
            "doc_id",
            "pos",
            "tok",
            F.concat_ws(" ", *gram_parts).alias("gram"),
            F.lead("tok", k - 1).over(seq).alias("_last"),
        )
        .filter(F.col("_last").isNotNull() & (F.col("tok") != ""))
        .select("doc_id", "pos", "gram")
    )
    dup = (
        posed.groupBy("gram")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_count)
        .select("gram")
    )
    marked = posed.join(dup, "gram").select("doc_id", "pos")
    bydoc = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(bydoc)
    with_island = marked.withColumn(
        "new_span",
        F.when(prev.isNull() | (F.col("pos") > prev + k), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_span").over(
            bydoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = with_island.groupBy("doc_id", "island").agg(
        (F.max("pos") - F.min("pos") + k).alias("span_tokens")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    ids = base.select("doc_id", "n_tokens")
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("dup_coverage"),
    )


def nb_train_predict(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial Naive Bayes trained and applied in one plan — the
    model-based document classifier slot of a curation pipeline
    (the role fastText-style quality/domain classifiers play in
    published LLM data recipes; here self-trained on the corpus's
    own labels, so the operator is closed over its input like the
    bigram LM). Returns ``(doc_id, <label>, pred_<label>, correct)``
    per document.

    Training is three aggregations over the exploded word stream:
    per-(word, class) counts, per-class token totals, and class
    priors; V is one scalar. Scoring joins each word occurrence to
    the class axis (a broadcast of the tiny class frame), LEFT-joins
    the count table on (word, class) with add-one smoothing, and
    sums per (doc, class); argmax breaks ties to the smallest class
    label. Determinism: every ln is micro-unit-quantized per
    occurrence before summation (the bigram-LM precedent), so class
    scores are exact BIGINTs and the argmax never compares floats.

    Plan shape (100 TB): the occurrence stream is corpus-sized and
    each occurrence fans out to |classes| rows (a handful); the
    (word, class) count join is a keyed equi-join AQE sizes; class
    frame and V broadcast. No driver state, no window over the
    corpus — the argmax window partitions by doc_id."""
    from pyspark.sql import Window

    docs = df.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).alias("label")
    )
    occ = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(words(text_col)).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    tagged = occ.join(docs, "doc_id")
    wc = tagged.groupBy("w", "label").agg(F.count("*").alias("cwl"))
    tl = tagged.groupBy("label").agg(F.count("*").alias("tl"))
    vocab = occ.select("w").distinct().agg(F.count("*").alias("V"))
    td = docs.agg(F.count("*").alias("td"))
    classes = (
        docs.groupBy("label")
        .agg(F.count("*").alias("nd"))
        .join(tl, "label", "left")
        .select(
            F.col("label").alias("cls"),
            "nd",
            F.coalesce(F.col("tl"), F.lit(0)).alias("tl"),
        )
        .crossJoin(F.broadcast(td))
        .select(
            "cls",
            "tl",
            F.round(
                F.log(F.col("nd").cast("double") / F.col("td").cast("double"))
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("prior_micro"),
        )
    )
    wc2 = wc.select(
        F.col("w").alias("_w2"), F.col("label").alias("_c2"), "cwl"
    )
    scored_words = (
        occ.crossJoin(F.broadcast(classes))
        .crossJoin(F.broadcast(vocab))
        .join(
            wc2,
            (F.col("w") == F.col("_w2")) & (F.col("cls") == F.col("_c2")),
            "left",
        )
        .select(
            "doc_id",
            "cls",
            F.round(
                F.log(
                    (F.coalesce(F.col("cwl"), F.lit(0)) + F.lit(1)).cast(
                        "double"
                    )
                    / (F.col("tl") + F.col("V")).cast("double")
                )
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("s_micro"),
        )
    )
    per_dc = scored_words.groupBy("doc_id", "cls").agg(
        F.sum("s_micro").alias("wsum")
    )
    full = (
        docs.crossJoin(F.broadcast(classes.select("cls", "prior_micro")))
        .join(per_dc, ["doc_id", "cls"], "left")
        .select(
            "doc_id",
            "label",
            "cls",
            (
                F.col("prior_micro")
                + F.coalesce(F.col("wsum"), F.lit(0).cast("long"))
            ).alias("score"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("cls")
    )
    return (
        full.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("label").alias(label_col),
            F.col("cls").alias(f"pred_{label_col}"),
            (F.col("label") == F.col("cls")).cast("int").alias("correct"),
        )
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_words: int = 8,
) -> DataFrame:
    """Content-defined chunking (the Rabin/Gear-CDC idea at word
    granularity): a chunk boundary falls AFTER every word whose
    portable 60-bit hash is ``0 mod avg_words`` — so boundaries are
    decided by CONTENT, not position, and an insertion near the top
    of a document shifts only the chunk it lands in, not every
    downstream chunk (the property that makes CDC the storage/crawl
    dedup primitive; fixed-size windows re-chunk everything after an
    edit). Expected chunk length is ``avg_words`` words.

    Returns ``(doc_id, chunk_id, n_words, chunk_fp)`` — chunk_id is
    the 0-based chunk ordinal inside the doc, chunk_fp the md5 of
    the space-joined chunk words. Everything is relational: explode
    the word stream with positions, flag boundary words by hash, a
    running SUM window PARTITIONED BY doc (never global) numbers the
    chunks, and one hash-agg builds the fingerprints — at 100 TB
    this is a scan + one per-doc window + one shuffle on
    (doc, chunk)."""
    from .dedup import token_id

    docw = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words(text_col)).alias("pos", "w"),
    ).filter(F.col("w") != "")
    from pyspark.sql import Window

    flagged = docw.withColumn(
        "is_boundary",
        (token_id(F.col("w")) % F.lit(avg_words) == 0).cast("int"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = flagged.withColumn(
        "chunk_id",
        F.coalesce(F.sum("is_boundary").over(win), F.lit(0)).cast("long"),
    )
    return (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "w"))),
                        lambda s: s.getField("w"),
                    ),
                    " ",
                )
            ).alias("chunk_fp"),
        )
    )


def cdc_shared_chunk_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_words: int = 8,
    min_shared: int = 2,
    max_fp_docs: int = 32,
) -> DataFrame:
    """Chunk-overlap near-dup detection on the CDC fingerprints —
    the storage-dedup application of :func:`cdc_chunks`: two
    documents that share ``min_shared``+ content-defined chunks
    overlap in real content even when neither whole-doc hashing nor
    whole-doc shingling fires (CDC boundaries realign after edits,
    so a copied-then-edited passage still produces identical chunk
    fingerprints). Returns ``(doc_a, doc_b, shared_chunks)`` with
    doc_a < doc_b.

    Scale fence: a chunk fingerprint appearing in more than
    ``max_fp_docs`` documents is a STOP-CHUNK (boilerplate — nav
    bars, license headers) and is excluded BEFORE the self-join, the
    same frequency cap every shingle-blocked dedup in this package
    applies — so the join fan-out per fingerprint is bounded and the
    plan is an equi-join on chunk_fp, never a cross product."""
    chunks = cdc_chunks(df, text_col, id_col, avg_words).select(
        "doc_id", "chunk_fp"
    ).distinct()
    fp_freq = chunks.groupBy("chunk_fp").agg(
        F.count("*").alias("_nf")
    )
    live = chunks.join(
        fp_freq.filter(F.col("_nf") <= max_fp_docs).select("chunk_fp"),
        "chunk_fp",
    )
    a = live.select(F.col("chunk_fp"), F.col("doc_id").alias("doc_a"))
    b = live.select(F.col("chunk_fp"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "chunk_fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("shared_chunks"))
        .filter(F.col("shared_chunks") >= min_shared)
    )


def kn_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM quality signal (Kneser &
    Ney 1995; the smoothing KenLM ships and the CCNet pipeline's
    scorer actually uses) — the upgrade over the add-one model in
    :func:`ngram_lm_scores`:

        p(w2|w1) = max(c(w1,w2) - D, 0) / h(w1)
                 + D * N1+(w1,*) / h(w1) * N1+(*,w2) / N1+(*,*)

    with D = ``discount``, h(w1) = the bigram-history count
    (sum of c(w1,*)), N1+ the distinct-continuation /
    distinct-history / total bigram-type counts — the
    "how many contexts has this word followed" continuation
    probability that makes KN beat raw-frequency backoff.

    Determinism: every statistic is an integer count; the probability
    is assembled with a FIXED operand order and each occurrence's
    -ln(p) is micro-quantized to an integer before any aggregation
    (the ngram_lm_scores recipe), so the per-doc average is exact
    integer arithmetic plus one division.

    At 100 TB: four map-side-combined gram aggregates (c(w1,w2),
    h/N1+ per history, N1+ per continuation, one scalar), the scoring
    join is gram-keyed (AQE picks strategies), the type-total is a
    1-row broadcast. Same plan family as ngram_lm_scores."""
    toked = df.select(
        F.col(id_col).alias("doc_id"), words(text_col).alias("_w")
    )
    w = F.col("_w")
    bigram = toked.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - F.lit(1)),
                    lambda i: F.struct(
                        F.element_at(w, i).alias("w1"),
                        F.element_at(w, i + F.lit(1)).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    # persisted: big is the Zipf-bounded bigram-type table; hist,
    # cont, types, and the scoring join all read it — unpersisted,
    # each reference re-expanded the corpus tokenize underneath
    # (10 Generate nodes measured)
    big = bigram.groupBy("w1", "w2").agg(F.count("*").alias("cb")).persist()
    hist = big.groupBy("w1").agg(
        F.sum("cb").alias("hn"), F.count("*").alias("n1f")
    )
    cont = big.groupBy("w2").agg(F.count("*").alias("n1b"))
    types = big.agg(F.count("*").alias("n1all"))

    d = F.lit(float(discount))
    p = (
        F.greatest(F.col("cb") - d, F.lit(0.0)) / F.col("hn")
        + d * F.col("n1f") / F.col("hn")
        * (F.col("n1b") / F.col("n1all"))
    )
    scored = (
        bigram.join(big, ["w1", "w2"])
        .join(hist, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .withColumn(
            "s_micro",
            F.round(-F.log(p) * F.lit(1_000_000.0)).cast("long"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(
            F.sum("s_micro").cast("double")
            / (F.count("*") * F.lit(1_000_000.0)),
            6,
        ).alias("avg_kn_surprisal"),
    )
    docs = df.select(F.col(id_col).alias("doc_id"))
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
            "n_bigrams"
        ),
        "avg_kn_surprisal",
    )


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional inverted-index phrase retrieval: docs containing
    the EXACT word sequence ``phrase``, with occurrence count and
    first position — the boolean/phrase query primitive of a lexical
    search stack (BM25 ranks bags; this matches adjacency).

    Plan: ONE posexplode builds the positional posting stream, a
    scan-local ``isin`` filter drops every posting outside the
    phrase's terms BEFORE any shuffle (at web scale this is the whole
    game: a 3-term phrase touches ~3 posting lists, not the corpus),
    then each term's postings join on ``(doc_id, pos - i)`` — pure
    equi-joins on aligned start positions, no window, no cross
    product. Occurrence counting is one per-doc aggregate."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    toked = df.select(F.col(id_col).alias("doc_id"), words(text_col).alias("_w"))
    # persisted: each phrase term's branch probes this SMALL filtered
    # posting set — without it every branch re-tokenizes the corpus
    # (|phrase| full passes; the BM25 single-pass rule)
    postings = (
        toked.select("doc_id", F.posexplode("_w").alias("pos", "term"))
        .filter(F.col("term").isin([t.lower() for t in phrase]))
        .persist()
    )
    aligned = None
    for i, t in enumerate(phrase):
        p = postings.filter(F.col("term") == t.lower()).select(
            "doc_id", (F.col("pos") - F.lit(i)).alias("start")
        )
        aligned = p if aligned is None else aligned.join(p, ["doc_id", "start"])
    return (
        aligned.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.min("start").cast("long").alias("first_pos"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003 — the MOSS local fingerprinting algorithm, at word-k-gram
    granularity): hash every k-gram, slide a ``window``-gram window,
    and select each window's MINIMUM hash, breaking ties by the
    RIGHTMOST position; the distinct (hash, position) selections are
    the document's fingerprint set. Guarantee: every shared run of
    window+k-1 tokens shares at least one fingerprint, with expected
    density 2/(window+1) — a principled sub-sample of the shingle
    set, where head/modulo sampling has no locality guarantee.

    Relational formulation: positioned k-gram ids -> each gram
    covers the ``window`` window-starts [pos-window+1, pos] (a
    sequence explode, map-side x window) -> per-start min hash ->
    rightmost argmin -> DISTINCT selections. Two bounded hash-aggs
    keyed by (doc, start); nothing corpus-global.

    Returns per doc: ``n_grams``, ``n_fingerprints``, and
    ``fp_checksum`` (sum of selected hashes — order-invariant,
    engine-portable)."""
    n_grams, sel = _winnowing_selections(df, text_col, id_col, k, window)
    fps = sel.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fingerprints"),
        F.sum("mh").cast("long").alias("fp_checksum"),
    )
    return (
        n_grams.join(fps, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce("n_fingerprints", F.lit(0)).cast("long")
            .alias("n_fingerprints"),
            F.coalesce("fp_checksum", F.lit(0)).cast("long")
            .alias("fp_checksum"),
        )
    )


def _winnowing_selections(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    window: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared winnowing core: returns (per-doc gram counts,
    distinct (doc_id, mh, sel_pos) fingerprint selections)."""
    from .dedup import token_id

    sk, sw = int(k), int(window)
    toks = df.select(
        F.col(id_col).alias("doc_id"), words(text_col).alias("w")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    grams = F.when(
        F.size("w") >= sk,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - (sk - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                token_id(F.concat_ws(" ", F.slice(F.col("w"), i, sk)))
                .alias("gid"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gid:long>>"))
    g = toks.select("doc_id", F.explode(grams).alias("s")).select(
        "doc_id", F.col("s.pos").alias("pos"), F.col("s.gid").alias("gid")
    )
    n_grams = g.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    # a gram at pos covers window-starts max(1, pos-window+1)..pos;
    # full windows only (starts beyond n_grams-window+1 are clipped),
    # per the algorithm; the cover list is a map-side sequence explode
    covers = g.select(
        "doc_id", "gid", "pos",
        F.explode(
            F.sequence(
                F.greatest(F.col("pos") - (sw - 1), F.lit(1)), F.col("pos")
            )
        ).alias("start"),
    )
    covers = covers.join(
        n_grams.select(
            "doc_id", (F.col("n_grams") - (sw - 1)).alias("max_start")
        ),
        "doc_id",
    ).filter(F.col("start") <= F.col("max_start"))
    wmin = covers.groupBy("doc_id", "start").agg(F.min("gid").alias("mh"))
    sel = (
        covers.join(wmin, ["doc_id", "start"])
        .filter(F.col("gid") == F.col("mh"))
        .groupBy("doc_id", "start", "mh")
        .agg(F.max("pos").alias("sel_pos"))  # rightmost min per window
        .select("doc_id", "mh", "sel_pos")
        .distinct()
    )
    return n_grams, sel


def winnowing_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_fp_docs: int = 32,
) -> DataFrame:
    """Fingerprint-overlap near-dup pairs on winnowing selections —
    the dedup application MOSS itself runs: two documents sharing
    ``min_shared``+ winnowed hashes overlap in real content, with
    the winnowing guarantee that any shared run of window+k-1 tokens
    yields at least one shared fingerprint. Sits between CDC chunk
    overlap (coarser: expected-8-word chunks) and ExactSubstr
    (exhaustive alignment) on the recall/cost curve, at ~2/(w+1) of
    the shingle-join volume.

    Scale fence: fingerprints in more than ``max_fp_docs`` documents
    are boilerplate stop-hashes, excluded BEFORE the self-join —
    the same frequency cap every blocked dedup here applies, so the
    equi-join fan-out per hash is bounded."""
    _, sel = _winnowing_selections(df, text_col, id_col, k, window)
    fp = sel.select("doc_id", "mh").distinct()
    keep = (
        fp.groupBy("mh")
        .count()
        .filter(F.col("count") <= int(max_fp_docs))
        .select("mh")
    )
    live = fp.join(keep, "mh")
    a = live.select("mh", F.col("doc_id").alias("doc_a"))
    b = live.select("mh", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "mh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= int(min_shared))
    )


#: UTF-8 double-encoding artifacts ("mojibake"): a CP1252/Latin-1
#: reread of UTF-8 bytes turns every non-ASCII char into a sequence
#: led by one of these characters (the core ftfy-style detector
#: set); plus the U+FFFD replacement char a lossy decode inserts.
#: Escaped so the source stays ASCII-clean.
MOJIBAKE_MARKS = ["Ã", "Â", "â€", "�"]


def mojibake_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Encoding-damage scoring: count UTF-8 double-encoding artifact
    sequences (``MOJIBAKE_MARKS`` — the A-tilde / A-circumflex /
    a-circumflex+euro lead sequences a CP1252 misdecode produces,
    plus U+FFFD replacement chars) and flag damaged docs. Pure
    string arithmetic — occurrences via length difference after
    literal replace, no regex-engine divergence — and map-only: the
    cheap first-pass screen every crawl-scale corpus runs before
    tokenization."""
    t = F.col(text_col)
    n_marks = None
    for m in MOJIBAKE_MARKS[:-1]:
        cnt = (
            (F.length(t) - F.length(F.replace(t, F.lit(m), F.lit(""))))
            / len(m)
        ).cast("long")
        n_marks = cnt if n_marks is None else (n_marks + cnt)
    repl = MOJIBAKE_MARKS[-1]
    n_repl = (
        F.length(t) - F.length(F.replace(t, F.lit(repl), F.lit("")))
    ).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_marks.alias("n_mojibake_marks"),
        n_repl.alias("n_replacement_chars"),
        ((n_marks + n_repl) > 0).cast("int").alias("damaged"),
    )


def length_outlier_stats(
    df: DataFrame,
    len_col: str = "n_chars",
    group_col: str = "source",
    z_cut: float = 3.0,
) -> DataFrame:
    """Robust per-source length-outlier profile: median and MAD
    (median absolute deviation) of ``len_col`` per ``group_col``,
    then count docs whose robust z-score |x-med| / (1.4826*MAD)
    exceeds ``z_cut`` — the corpus-health screen for truncated or
    concatenated documents (mean/stddev would let one giant doc mask
    the rest). Exact interpolated medians over integers produce only
    .0/.5 values, so every comparison is engine-deterministic; the
    cut is evaluated as 20000*|x-med| > round(2*14826*z_cut)*MAD to
    stay in exact decimal arithmetic. Two bounded group-by passes,
    no corpus-wide window."""
    scale = int(round(2 * 14826 * float(z_cut)))
    med = df.groupBy(group_col).agg(
        F.percentile(F.col(len_col), F.lit(0.5)).alias("med"),
        F.count("*").alias("n_docs"),
    )
    dev = df.join(med, group_col).select(
        F.col(group_col),
        # 2*|x-med| is an exact integer (med is a .0/.5 half)
        (F.abs(F.col(len_col) - F.col("med")) * 2)
        .cast("long")
        .alias("adev2"),
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile(F.col("adev2"), F.lit(0.5)).alias("mad2")
    )
    out = (
        dev.join(mad, group_col)
        .groupBy(group_col)
        .agg(
            F.sum(
                (F.col("adev2") * 10000 > F.lit(scale) * F.col("mad2") / 2)
                .cast("long")
            ).alias("n_outliers")
        )
    )
    return (
        med.join(mad, group_col)
        .join(out, group_col)
        .select(
            F.col(group_col),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round("med", 1).alias("median_len"),
            F.round(F.col("mad2") / 2, 2).alias("mad_len"),
            F.col("n_outliers"),
        )
    )


def heaps_law_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10,
) -> DataFrame:
    """Empirical Heaps-law curve: cumulative vocabulary size vs
    cumulative token count at ``buckets`` corpus prefixes (by id —
    ingestion order). The sub-linear vocab growth curve is the
    standard corpus-composition diagnostic: a kink flags a source
    switch or template flood, and the curve's flattening rate is
    what tokenizer-vocab sizing reads off. All-integer outputs.

    Relational: one token explode -> per-word FIRST doc (min id) ->
    each word/doc joins the (tiny, broadcast) cutoff list with an
    inequality — fan-out <= buckets per row, then two bounded
    hash-aggs. The cutoffs derive from max(id) IN-PLAN (broadcast
    scalar frame, the IVF-seeding precedent), so nothing is
    collected to the driver."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(text_col)).alias("w"),
    ).filter(F.col("w") != "")
    nmax = df.agg(F.max(F.col(id_col)).alias("max_id"))
    cuts = (
        nmax.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.lit(int(buckets))),
                    lambda b: F.struct(
                        b.alias("bucket"),
                        (
                            F.floor(
                                (F.col("max_id") + 1) * b / int(buckets)
                            ) - 1
                        ).cast("long").alias("cutoff_doc"),
                    ),
                )
            ).alias("c")
        )
        .select(F.col("c.bucket").alias("bucket"),
                F.col("c.cutoff_doc").alias("cutoff_doc"))
    )
    doc_tokens = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens")
    )
    cum_tokens = (
        doc_tokens.join(
            F.broadcast(cuts),
            F.col("doc_id") <= F.col("cutoff_doc"),
        )
        .groupBy("bucket", "cutoff_doc")
        .agg(F.sum("n_tokens").cast("long").alias("cum_tokens"))
    )
    first_doc = toks.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    cum_vocab = (
        first_doc.join(
            F.broadcast(cuts),
            F.col("first_doc") <= F.col("cutoff_doc"),
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cum_vocab"))
    )
    return (
        cum_tokens.join(cum_vocab, "bucket")
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "cutoff_doc", "cum_tokens", "cum_vocab",
        )
    )


def feature_hash_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Hashing-trick term-frequency vectors (Weinberger et al.
    ICML'09 — the feature extractor behind spark.ml's HashingTF and
    vowpal-wabbit): every token occurrence lands in bucket
    ``h(token) mod dim`` with a +/-1 sign from an INDEPENDENT hash
    bit, and the per-(doc, bucket) weight is the signed occurrence
    sum. The signed variant makes collisions cancel in expectation,
    so the sketch preserves inner products — the standard
    fixed-width featurizer for quality classifiers over unbounded
    vocabularies (no dictionary, no fit step, works on the first
    pass of a 100 TB corpus).

    Hash derivation is engine-portable md5 (same family as
    dedup.token_id): bucket from the top-60-bit slice mod dim, sign
    from hex digit 16 — disjoint digest bits, so bucket and sign are
    independent. DuckDB twins documented in the oracle.

    Plan: one explode + one (doc_id, bucket) hash-agg with map-side
    combine — linear in token count, keyed by doc so vocabulary skew
    (stopwords) cannot hot-spot a reducer. Returns only non-zero
    coordinates: (doc_id, bucket, weight, n_terms) where n_terms
    counts the occurrences folded into the bucket (collision
    observability).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(text_col)).alias("tok"),
    ).filter(F.col("tok") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
        % dim
    )
    sign = F.when(
        F.conv(F.substring(F.md5(F.col("tok")), 16, 1), 16, 10).cast("long")
        % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        toks.select(
            "doc_id",
            bucket.cast("int").alias("bucket"),
            sign.alias("sign"),
        )
        .groupBy("doc_id", "bucket")
        .agg(
            F.sum("sign").cast("long").alias("weight"),
            F.count("*").cast("long").alias("n_terms"),
        )
        .filter(F.col("weight") != 0)
    )


def source_tv_divergence(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source unigram-distribution drift: total-variation distance
    TV(source) = 1/2 * sum_t |p_t(source) - p_t(corpus)| — the
    source-mix health check (a source drifting from the corpus blend
    shows up before quality filters catch individual docs). TV is
    used instead of KL/JS deliberately: it needs NO log(), so the
    whole statistic stays in exact integer arithmetic (libm log
    differs in the last ulp across engines and would poison the
    value-hash contract).

    Exactness: with c_t = corpus count, s_t = source count, N and
    n_s the token totals, TV = sum_t |s_t*N - c_t*n_s| / (2*n_s*N).
    The numerator is summed as DECIMAL(38,0) — order-independent and
    overflow-free at any corpus size (counts*totals ~ 1e24 << 1e38);
    only the final per-source division happens in double. Terms
    absent from a source contribute c_t*n_s each, folded CLOSED-FORM
    as n_s*(N - sum of c_t over the source's own terms) — so the
    plan never outer-joins the vocabulary per source.

    Plan (100 TB): one (source, term) hash-agg, one term-keyed join
    of per-source term counts to corpus term counts (AQE picks the
    strategy; the corpus side is vocabulary-sized), two bounded
    per-source aggs, one broadcast of the 1-row grand total.
    """
    toks = df.select(
        F.col(source_col).alias("source"),
        F.explode(words(text_col)).alias("tok"),
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("source", "tok").agg(F.count("*").alias("s_cnt"))
    cf = tf.groupBy("tok").agg(F.sum("s_cnt").alias("c_cnt"))
    ns = tf.groupBy("source").agg(
        F.sum("s_cnt").cast("decimal(38,0)").alias("n_s")
    )
    n_total = cf.agg(F.sum("c_cnt").cast("decimal(38,0)").alias("n_all"))
    joined = (
        tf.join(cf, "tok")
        .join(ns, "source")
        .crossJoin(F.broadcast(n_total))
    )
    per_src = joined.groupBy("source").agg(
        F.sum(
            F.abs(
                F.col("s_cnt").cast("decimal(38,0)") * F.col("n_all")
                - F.col("c_cnt").cast("decimal(38,0)") * F.col("n_s")
            )
        ).alias("present_num"),
        F.sum("c_cnt").cast("decimal(38,0)").alias("covered_c"),
        F.first("n_s").alias("n_s"),
        F.first("n_all").alias("n_all"),
    )
    return per_src.select(
        "source",
        F.col("n_s").cast("long").alias("n_tokens"),
        F.round(
            (
                F.col("present_num")
                + F.col("n_s") * (F.col("n_all") - F.col("covered_c"))
            ).cast("double")
            / (
                F.lit(2.0)
                * F.col("n_s").cast("double")
                * F.col("n_all").cast("double")
            ),
            4,
        ).alias("tv4"),
    )


def segment_ttr(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    segment_tokens: int = 50,
) -> DataFrame:
    """Segmental type-token ratio: each document's token stream cut
    into fixed-size segments (the standard correction for TTR's
    length sensitivity), with per-segment distinct-type counts and
    the ratio as an EXACT ppm integer. The lexical-diversity signal
    that separates template/boilerplate output (low TTR everywhere)
    from organic prose — and, segment-wise, catches documents whose
    tail degenerates into repetition even when the head is clean.

    Plan (100 TB): one posexplode (map-only) + one
    (doc, segment, token)-keyed distinct and one (doc, segment) agg
    — keyed shuffles whose group width is bounded by
    ``segment_tokens``; ppm math in BIGINT `div`."""
    from ..functions.text import words

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words(text_col)).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    seg = toks.selectExpr(
        "doc_id", f"pos div {int(segment_tokens)} AS seg", "tok"
    )
    return (
        seg.groupBy("doc_id", "seg")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.countDistinct("tok").cast("long").alias("n_types"),
        )
        .selectExpr(
            "doc_id", "CAST(seg AS BIGINT) AS seg", "n_tokens", "n_types",
            "(1000000 * n_types) div n_tokens AS ttr_ppm",
        )
    )
