"""Deterministic sampling operators for training-data pipelines.

Two families, both reproducible run-to-run and engine-to-engine
(decisions derive from md5 of the row key, never from an RNG seeded
per-partition — Spark's ``DataFrame.sample`` changes membership when
partitioning changes, which is unacceptable for dataset curation):

- ``sample_hash``        : map-only Bernoulli-by-hash — THE 100 TB
                           path (no shuffle, keep decision is a
                           scan-local predicate)
- ``sample_stratified``  : exact per-stratum quota (ceil(fraction *
                           stratum size)) via one window shuffle —
                           when exact proportions matter more than a
                           map-only plan

DuckDB twin of the hash draw:
``('0x' || substr(md5(key), 1, 15))::BIGINT`` — uniform on
[0, 16^15); keep iff below ``fraction * 16^15``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 16 ** 15  # top 15 hex chars of md5 = 60 bits


def hash_draw(key: F.Column) -> F.Column:
    """Uniform 60-bit draw from a row key (string-cast first)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")


def sample_hash(
    df: DataFrame,
    fraction: float,
    key_col: str,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep iff md5-draw(key) falls in
    the first ``fraction`` of the hash space.

    Map-only (no shuffle, no state); membership is a pure function of
    the key, so re-runs, retries, and repartitions all agree, and a
    later run at a LARGER fraction is a superset of the earlier
    sample (nested samples — the standard curation trick for scaling
    experiments: the 1% set is contained in the 10% set).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    threshold = int(fraction * HASH_SPACE)
    return df.filter(hash_draw(F.col(key_col)) < F.lit(threshold))


def sample_stratified(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    key_col: str,
) -> DataFrame:
    """Exact per-stratum quota sample: the ``ceil(fraction * n)``
    rows of each stratum with the smallest md5 draw (ties broken by
    key — total order, so the result is a deterministic set).

    One shuffle (both windows share the stratum partitioning). Skewed
    strata are fine for counting, but a single stratum larger than an
    executor's window buffer spills; at that point prefer
    ``sample_hash`` (approximately proportional, no shuffle at all).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    w = Window.partitionBy(*strata_cols)
    rn = F.row_number().over(w.orderBy(hash_draw(F.col(key_col)), F.col(key_col)))
    quota = F.ceil(F.count("*").over(w) * F.lit(fraction))
    return (
        df.withColumn("_rn", rn)
        .withColumn("_quota", quota)
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def sample_mixture(
    df: DataFrame,
    rates: dict[str, float],
    domain_col: str,
    key_col: str,
) -> DataFrame:
    """Training-mixture construction: per-domain deterministic
    Bernoulli rates (e.g. upweight-by-keeping-more of high-quality
    sources, downsample boilerplate-heavy ones — the DoReMi /
    Pile-style domain reweighting step, realized as sampling).

    Domains absent from ``rates`` are DROPPED — an explicit mixture
    is an allowlist; silently passing an unlisted domain through is
    how unvetted data leaks into a training set.

    Same scale story as ``sample_hash``: map-only, no shuffle — the
    keep decision is a scan-local predicate on (domain, md5(key)),
    and the per-domain thresholds are precomputed integers compiled
    into a literal map, so membership is a pure function of the row
    (retry/repartition/rerun stable), and samples nest as any
    domain's rate grows.
    """
    for d, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for domain {d!r} must be in [0,1], got {r}")
    thresholds = F.create_map(
        *[
            F.lit(x)
            for d, r in sorted(rates.items())
            for x in (d, int(r * HASH_SPACE))
        ]
    )
    thr = thresholds[F.col(domain_col)]
    # null threshold (unlisted domain) compares to null -> filter drops
    return df.filter(hash_draw(F.col(key_col)) < thr)


def sample_weighted(
    df: DataFrame,
    weight_col: str,
    k: int,
    by: list[str] | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement: the ``k`` rows (per
    ``by`` group, or globally) chosen with probability proportional
    to ``weight_col`` — Efraimidis-Spirakis A-ES reservoir keys,
    ranked deterministically instead of streamed (Efraimidis &
    Spirakis 2006: each row draws u ~ U(0,1] and the top-k by
    u^(1/w) IS a weight-proportional sample without replacement).
    The curation use: "keep the best-k docs per source, biased by
    quality score, reproducibly".

    Determinism: u derives from the md5 hash draw (never an RNG), and
    the ranking key is ``ln(u)/w`` (monotone in u^(1/w)) quantized to
    integer micro-units — cross-engine exact modulo ln's final ulp,
    ties broken by key. Rows with weight <= 0 or NULL are excluded
    (zero-weight rows are unsampleable by definition).

    Plan: one window shuffle on the group key (global k uses a
    single TakeOrderedAndProject instead — no single-partition
    window). The hash draw and key arithmetic are scan-local.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # u in (0, 1]: (draw + 1) / HASH_SPACE over the 60-bit space
    u = (hash_draw(F.col(key_col)) + F.lit(1)).cast("double") / F.lit(
        float(HASH_SPACE)
    )
    # A-ES key ln(u)/w: maximizing u^(1/w) == maximizing ln(u)/w
    # (ln(u) <= 0); quantize BEFORE ranking so both engines rank the
    # same integers
    key_micro = F.round(
        F.log(u) / F.col(weight_col) * F.lit(1_000_000.0)
    ).cast("long")
    base = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("_aes_micro", key_micro)
    if by:
        w = Window.partitionBy(*by).orderBy(
            F.desc("_aes_micro"), F.col(key_col)
        )
        return (
            base.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn", "_aes_micro")
        )
    return (
        base.orderBy(F.desc("_aes_micro"), F.col(key_col))
        .limit(k)
        .drop("_aes_micro")
    )


def epoch_shuffle_keys(
    df: DataFrame,
    epochs: int,
    key_col: str,
) -> DataFrame:
    """Deterministic per-epoch global shuffle ORDER for training-data
    sequencing: each epoch gets an independent pseudo-random
    permutation of the corpus, reproducible run-to-run (restart a
    crashed epoch, get the same order) and engine-to-engine.

    The permutation is materialized as a sortable KEY
    (``md5(epoch || '|' || row key)``), NOT as a global row_number —
    a rank column would force every row through one partition's
    window, while writers consume the key scale-safely with
    ``repartitionByRange(shuffle_key).sortWithinPartitions(...)``
    (a range-partitioned sort, Spark's normal TB-scale ordering
    path). One output row per (row, epoch); the epoch expansion is
    an explode of a literal array — map-only, no shuffle in this
    operator at all.
    """
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    ep = F.explode(
        F.array(*[F.lit(e) for e in range(epochs)])
    ).alias("epoch")
    out = df.select(F.col(key_col), ep)
    return out.select(
        key_col,
        F.col("epoch").cast("int").alias("epoch"),
        F.md5(
            F.concat_ws(
                "|", F.col("epoch").cast("string"),
                F.col(key_col).cast("string"),
            )
        ).alias("shuffle_key"),
    )


def doremi_mixture_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    eta: float = 1.0,
) -> DataFrame:
    """DoReMi-style domain mixture reweighting (Xie et al. 2023,
    arXiv:2305.10429, single-round proxy): upweight sources whose
    text is HARDER for a reference model than the corpus average.
    The full DoReMi alternates proxy-model training with exponential
    weight updates; the data-engine half of one update is exactly
    this query — per-domain excess loss under a reference model,
    mapped through ``share * exp(eta * excess)`` and normalized.
    The reference model here is the corpus-self-trained add-one
    bigram LM (text.ngram_surprisal_stream), so the operator is
    closed over its input like the CCNet scorer.

    Determinism across engines: per-occurrence surprisal is
    micro-unit-quantized, so every per-source aggregate is an exact
    BIGINT; the excess and share divisions are correctly-rounded
    IEEE ops on identical integers; ``exp`` is the one libm call
    (the ngram-LM ``ln`` precedent), and its result is nano-unit
    quantized per source BEFORE the normalizing sum, so the
    normalization denominator is an exact integer — no
    summation-order noise.

    Plan shape (100 TB): the LM stream's corpus-sized gram equi-joins
    (AQE decides), one hash-agg to source granularity, then
    scalar-sized arithmetic: corpus totals and the weight-sum
    normalizer each broadcast as 1-row aggregates. No driver state.
    Sources with zero bigrams take excess 0 (share-only weight)."""
    from .text import ngram_surprisal_stream

    stream = ngram_surprisal_stream(df, text_col, id_col)
    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    )
    per_src_bg = (
        stream.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("s_micro").cast("long").alias("sum_s_micro"),
        )
    )
    srcs = (
        src.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .join(per_src_bg, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            F.coalesce(F.col("sum_s_micro"), F.lit(0).cast("long")).alias(
                "sum_s_micro"
            ),
        )
    )
    totals = srcs.agg(
        F.sum("n_docs").alias("td"),
        F.sum("n_bigrams").alias("tb"),
        F.sum("sum_s_micro").alias("ts"),
    )
    j = srcs.crossJoin(F.broadcast(totals))
    src_avg = F.col("sum_s_micro").cast("double") / (
        F.col("n_bigrams").cast("double") * F.lit(1_000_000.0)
    )
    corp_avg = F.col("ts").cast("double") / (
        F.col("tb").cast("double") * F.lit(1_000_000.0)
    )
    excess = F.when(
        F.col("n_bigrams") > 0,
        F.greatest(F.lit(0.0), src_avg - corp_avg),
    ).otherwise(F.lit(0.0))
    share = F.col("n_docs").cast("double") / F.col("td").cast("double")
    scored = j.select(
        "source",
        "n_docs",
        "n_bigrams",
        "sum_s_micro",
        F.round(excess, 6).alias("excess"),
        F.round(share * F.exp(F.lit(eta) * excess) * F.lit(1e9))
        .cast("long")
        .alias("wr_nano"),
    )
    w_tot = scored.agg(F.sum("wr_nano").alias("w_tot"))
    return (
        scored.crossJoin(F.broadcast(w_tot))
        .select(
            "source",
            "n_docs",
            "n_bigrams",
            "sum_s_micro",
            "excess",
            F.round(
                F.col("wr_nano").cast("double")
                / F.col("w_tot").cast("double"),
                6,
            ).alias("weight"),
        )
    )


def dsir_scores(
    df: DataFrame,
    target_ids: DataFrame,
    n_buckets: int = 1024,
    select_n: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    corpus document by its log importance weight under two hashed
    bigram bag-of-ngrams unigram models — a TARGET model (counts from
    ``target_ids``'s docs, the domain you want more of) and a RAW
    model (counts from the whole corpus) — then mark the top
    ``select_n`` docs. log w(x) = sum over the doc's bucket
    occurrences of ln(p_target(b)) - ln(p_raw(b)), add-one smoothed
    over ``n_buckets`` hashed-feature buckets.

    Determinism (the ngram_lm_scores recipe): each bucket's log-ratio
    is micro-quantized to an INTEGER once, in a BOUNDED per-bucket
    table; per-doc scores are exact integer dot products of doc
    bucket counts with that table. Bucket ids hash via the engine's
    md5 convention, replayed verbatim by the oracle.

    At 100 TB: ONE corpus tokenize pass builds the per-doc bucket
    counts, which are persisted (both models and the scoring read
    them); the model table is ``n_buckets`` rows — broadcast by
    construction, like a trained classifier's weights. Raw counts
    come from a map-side-combined aggregate; selection is one global
    top-N window over doc-granularity rows. Never anything all-pairs;
    the deliberately bounded feature space is the published method's
    own design (DSIR's hashed n-grams exist exactly so the model
    stays broadcastable)."""
    toked = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    ).select(
        "doc_id",
        F.expr("regexp_extract_all(lower(_t), '[a-z0-9]+', 0)").alias("_w"),
    )
    w = F.col("_w")
    grams = toked.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - F.lit(1)),
                    lambda i: F.concat_ws(
                        " ", F.element_at(w, i), F.element_at(w, i + F.lit(1))
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10)
        .cast("long") % F.lit(n_buckets)
    ).alias("b")
    doc_b = grams.select("doc_id", bucket).groupBy("doc_id", "b").agg(
        F.count("*").cast("long").alias("n")
    ).persist()
    tids = target_ids.select(F.col(id_col).alias("doc_id"))
    t_counts = (
        doc_b.join(F.broadcast(tids), "doc_id")
        .groupBy("b")
        .agg(F.sum("n").alias("ct"))
    )
    r_counts = doc_b.groupBy("b").agg(F.sum("n").alias("cr"))
    # bounded model table: n_buckets rows with integer micro log-ratio
    model = (
        spark_range_buckets(df.sparkSession, n_buckets)
        .join(t_counts, "b", "left")
        .join(r_counts, "b", "left")
        .select(
            "b",
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
        )
    )
    tt = model.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    lp = (
        model.crossJoin(F.broadcast(tt))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.col("ct") + F.lit(1)).cast("double")
                        / (F.col("tt") + F.lit(n_buckets)).cast("double")
                    )
                    - F.log(
                        (F.col("cr") + F.lit(1)).cast("double")
                        / (F.col("tr") + F.lit(n_buckets)).cast("double")
                    )
                )
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    scored = (
        doc_b.join(F.broadcast(lp), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * F.col("lr_micro")).cast("long")
            .alias("dsir_micro"),
            F.sum("n").cast("long").alias("n_grams"),
        )
    )
    all_docs = df.select(F.col(id_col).alias("doc_id"))
    full = all_docs.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_grams"), F.lit(0).cast("long")).alias("n_grams"),
        F.coalesce(F.col("dsir_micro"), F.lit(0).cast("long")).alias(
            "dsir_micro"
        ),
    )
    # top-N via orderBy+limit = TakeOrderedAndProject (distributed
    # partial top-N per partition, merged on the driver) — a global
    # row_number window would sort everything in ONE partition
    top = (
        full.orderBy(F.desc("dsir_micro"), F.asc("doc_id"))
        .limit(select_n)
        .select("doc_id", F.lit(1).alias("_sel"))
    )
    return full.join(F.broadcast(top), "doc_id", "left").select(
        "doc_id",
        "n_grams",
        "dsir_micro",
        F.coalesce(F.col("_sel"), F.lit(0)).cast("int").alias("selected"),
    )


def spark_range_buckets(spark, n_buckets: int) -> DataFrame:
    """All bucket ids 0..n_buckets-1 — buckets no gram hashed into
    still need their smoothed log-ratio so totals match the oracle."""
    return spark.range(n_buckets).select(F.col("id").cast("long").alias("b"))


def reservoir_sample_keys(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "r1",
) -> DataFrame:
    """Deterministic k-per-group reservoir sample via bottom-k
    hashing: rank rows inside each group by ``md5(seed|key)`` (key
    tie-break) and keep ranks 1..k. Distribution-equivalent to a
    sequential reservoir (every size-k subset equally likely under
    the hash's uniformity) but ORDER-FREE and mergeable — the
    property a distributed pipeline needs, where a true sequential
    reservoir would serialize the stream. Re-running with the same
    seed reproduces the sample exactly (audit/restart), changing the
    seed redraws it.

    The per-group window never sees the corpus: partitions by
    ``group_col`` (bounded domains at any scale; for a heavy group
    the bottom-k trick composes with per-partition pre-truncation to
    k before the final rank, which AQE handles as an ordinary
    skew-join-free agg).
    """
    from pyspark.sql import Window

    hk = F.md5(
        F.concat_ws(
            "|", F.lit(str(seed)), F.col(key_col).cast("string")
        )
    ).alias("draw_key")
    w = Window.partitionBy(group_col).orderBy("draw_key", key_col)
    return (
        df.select(F.col(group_col), F.col(key_col), hk)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .select(
            group_col, key_col,
            F.col("rk").cast("int").alias("rk"),
        )
    )


def token_budget_selection(
    df: DataFrame,
    quality_col: str,
    tokens_col: str,
    id_col: str = "doc_id",
    budget_frac: float = 0.3,
) -> DataFrame:
    """Greedy token-budget curation: rank documents by
    (quality desc, id) and keep the prefix whose CUMULATIVE token
    count fits the budget (``budget_frac`` of the corpus total) —
    "fill the training budget with the best documents", the selection
    step every fixed-compute pretraining run performs after scoring.
    Returns (doc_id, n_tokens, cum_tokens) for the kept prefix; a doc
    is kept iff the running total THROUGH it fits (classic greedy
    prefix, no partial documents).

    The global ranked prefix-sum is DISTRIBUTED (the same
    machinery as events_user_ltv_deciles' distributed rank, applied
    to a cumulative measure): a range repartition on the total order
    gives ordered partitions; per-partition token totals (<=
    #shuffle-partitions rows — bounded planning metadata) turn into
    cumulative offsets via a tiny window; each doc's global running
    total = its partition's offset + a PARTITIONED local cumsum. No
    document-cardinality frame ever passes through a single-partition
    window, and the budget itself is a 1-row broadcast scalar. The
    explicit partition count keeps both branches' pids in sync under
    AQE (see the LTV rationale).
    """
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(quality_col).alias("q"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    ranged = base.repartitionByRange(
        n_part, F.desc("q"), F.asc("doc_id")
    ).withColumn("pid", F.spark_partition_id())
    w_prior = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        ranged.groupBy("pid")
        .agg(F.sum("n_tokens").alias("part_tokens"))
        .select(
            "pid",
            F.coalesce(F.sum("part_tokens").over(w_prior), F.lit(0))
            .alias("off"),
        )
    )
    w_local = Window.partitionBy("pid").orderBy(
        F.desc("q"), F.asc("doc_id")
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        ranged.withColumn("local_cum", F.sum("n_tokens").over(w_local))
        .join(F.broadcast(offsets), "pid")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("off") + F.col("local_cum")).cast("long")
            .alias("cum_tokens"),
        )
    )
    budget = base.agg(
        F.floor(F.sum("n_tokens") * F.lit(float(budget_frac)))
        .cast("long")
        .alias("budget")
    )
    return (
        cum.crossJoin(F.broadcast(budget))
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "n_tokens", "cum_tokens")
    )


def incremental_slice_stats(
    history_stats: DataFrame,
    batch_stats: DataFrame,
    keys: list[str],
    sums: list[str],
) -> DataFrame:
    """Incremental corpus data-card maintenance — merge a NEW
    batch's per-slice ADDITIVE statistics (doc counts, token/char
    totals, …) into the stored per-slice table and emit only the
    upsert delta: one row per slice PRESENT IN THE BATCH with the
    merged ``history + batch`` totals. Slices the batch never
    touched are not re-emitted, so the output applies as a MERGE
    INTO the stored card instead of rewriting it.

    Only additive columns belong in the stored artifact; derived
    ratios (avg tokens per doc, corpus shares) are computed at read
    time from the sums — a share's denominator moves with EVERY
    batch, so storing it would force a full-card rewrite and break
    the delta contract this operator exists to provide.

    Plan shape (100 TB): the stored card is slice-count-sized (tiny),
    the batch aggregation is one map-side-combined groupBy over the
    batch only, and the merge is a broadcast-sized equi-join on the
    slice key — history text is never touched.
    """
    if not sums:
        raise ValueError("sums must be non-empty")
    h = history_stats.select(
        *keys, *[F.col(c).alias(f"_h_{c}") for c in sums]
    )
    return batch_stats.join(h, keys, "left").select(
        *keys,
        *[
            (F.coalesce(f"_h_{c}", F.lit(0)) + F.col(c))
            .cast("long")
            .alias(c)
            for c in sums
        ],
    )
