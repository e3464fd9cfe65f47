"""Quality-filter rules, deterministic sampling, token chunking,
TF-IDF ranking — rule-level checks the oracle diff can't see
(it only proves Spark==DuckDB, not that the rules do what the
docstrings claim)."""

from pyspark.sql import functions as F

from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
    sampling as SA,
    text as TX,
)

GOOD = ("the quick brown fox jumps over a lazy dog and then runs to "
        "the old stone bridge in the rain for an hour and a half")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_filter_rules(spark):
    rows = [
        (1, GOOD),                                   # passes everything
        (2, "too short for the corpus"),             # word_count
        (3, " ".join(["antidisestablishmentarianism"] * 30)),  # avg/max wlen + stopwords
        (4, "the " + "9999 " * 40 + "of it is and to in a"),   # alpha_ratio
        (5, " ".join(["word"] * 40)),                # stopwords + repetition
    ]
    out = {r["doc_id"]: r for r in TX.quality_filter(_docs(spark, rows)).collect()}
    assert out[1]["keep"] and out[1]["drop_reason"] is None
    assert not out[2]["keep"] and out[2]["drop_reason"] == "word_count"
    # doc 3: first failed rule in declaration order wins
    assert not out[3]["ok_avg_word_len"] and not out[3]["ok_max_word_len"]
    assert out[3]["drop_reason"] == "avg_word_len"
    assert not out[4]["ok_alpha_ratio"] and out[4]["drop_reason"] == "alpha_ratio"
    assert not out[5]["ok_stopwords"] and not out[5]["ok_repetition"]
    assert out[5]["drop_reason"] == "stopwords"


def test_sample_hash_nested_and_repartition_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    small = {r.k for r in SA.sample_hash(df, 0.05, "k").collect()}
    big = {r.k for r in SA.sample_hash(df, 0.20, "k").collect()}
    assert small and small < big  # nested samples
    again = {r.k for r in SA.sample_hash(df.repartition(7), 0.05, "k").collect()}
    assert again == small  # membership independent of partitioning
    assert 0.01 < len(small) / 2000 < 0.10  # roughly the asked fraction


def test_sample_stratified_exact_quota(spark):
    import math

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "k long, g string")
    per_stratum = {r.g: r.cnt for r in df.groupBy("g").agg(F.count("*").alias("cnt")).collect()}
    out = SA.sample_stratified(df, ["g"], 0.1, "k")
    got = {r.g: r.cnt for r in out.groupBy("g").agg(F.count("*").alias("cnt")).collect()}
    assert got == {g: math.ceil(0.1 * n) for g, n in per_stratum.items()}
    # deterministic set, not just deterministic counts
    again = {(r.k, r.g) for r in SA.sample_stratified(df.repartition(5), ["g"], 0.1, "k").collect()}
    assert again == {(r.k, r.g) for r in out.collect()}


def test_chunk_tokens_boundaries(spark):
    def chunks(n_words):
        doc = _docs(spark, [(1, " ".join(f"w{i}" for i in range(n_words)))])
        return sorted(
            (r.chunk_id, r.n_tokens)
            for r in TX.chunk_tokens(doc, size=32, overlap=8).collect()
        )

    assert chunks(8) == [(0, 8)]           # shorter than one window
    assert chunks(32) == [(0, 32)]         # exactly one window, no echo chunk
    assert chunks(33) == [(0, 32), (1, 9)]  # tail contributes 1 new token
    assert chunks(56) == [(0, 32), (1, 32)]  # 56 = 32 + stride 24
    assert chunks(57) == [(0, 32), (1, 32), (2, 9)]


def test_chunk_texts_reconstruct(spark):
    doc = _docs(spark, [(1, " ".join(f"w{i}" for i in range(40)))])
    out = {r.chunk_id: r.chunk_text for r in TX.chunk_texts(doc, size=32, overlap=8).collect()}
    assert out[0].split(" ") == [f"w{i}" for i in range(32)]
    assert out[1].split(" ") == [f"w{i}" for i in range(24, 40)]


def test_tfidf_ranks_rare_terms_first(spark):
    rows = [
        (1, "shared shared rare1"),
        (2, "shared shared rare2"),
        (3, "shared shared rare3"),
    ]
    out = TX.tfidf_topk(_docs(spark, rows), k=1).collect()
    # 'shared' has tf=2 but df=3 -> score 2; each rareN has tf=1 df=1 -> score 3
    assert {(r.doc_id, r.term) for r in out} == {(1, "rare1"), (2, "rare2"), (3, "rare3")}


def test_pack_sequences_layout(spark):
    rows = [(0, i, 0, 100) for i in range(5)] + [(1, i, 1, 90) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id long, shard_id long, n_tokens long")
    out = {(r.shard_id, r.chunk_id): (r.seq_id, r.seq_offset)
           for r in TX.pack_sequences(df, "n_tokens", "shard_id",
                                      ["doc_id", "chunk_id"], budget=256).collect()}
    # shard 0: cum-before 0,100,200,300,400 -> seqs 0,0,0,1,1
    assert out[(0, 0)] == (0, 0)
    assert out[(0, 1)] == (0, 100)
    assert out[(0, 2)] == (0, 200)
    assert out[(0, 3)] == (1, 300 - 256)
    assert out[(0, 4)] == (1, 400 - 256)
    # shard 1 packs independently: 0,90,180
    assert out[(1, 0)] == (0, 0)
    assert out[(1, 2)] == (0, 180)


def test_sample_mixture_rates_and_allowlist(spark):
    import pytest

    df = (
        spark.range(0, 3000)
        .withColumnRenamed("id", "k")
        .withColumn(
            "dom",
            F.when(F.col("k") % 3 == 0, "a")
            .when(F.col("k") % 3 == 1, "b")
            .otherwise("c"),
        )
    )
    out = SA.sample_mixture(df, {"a": 0.8, "b": 0.1}, "dom", "k")
    by_dom = {
        r["dom"]: r["n"]
        for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    assert "c" not in by_dom  # unlisted domain dropped (allowlist)
    assert 0.6 < by_dom["a"] / 1000 < 0.95
    assert 0.03 < by_dom["b"] / 1000 < 0.20
    # per-domain membership == sample_hash at the same rate (nesting,
    # determinism, and partition independence all inherited)
    a_only = {
        r.k for r in SA.sample_hash(df.filter(F.col("dom") == "a"), 0.8, "k").collect()
    }
    assert {r.k for r in out.filter(F.col("dom") == "a").collect()} == a_only
    with pytest.raises(ValueError):
        SA.sample_mixture(df, {"a": 1.5}, "dom", "k")


def test_repetition_scores_rank_repetitive_docs(spark):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.text import (
        repetition_scores,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),          # all unique
            (2, "spam ham spam ham spam ham spam ham"),          # one gram cycle
            (3, "alpha beta gamma alpha beta gamma"),            # doubled text
            (4, "single"),                                       # < n words
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_scores(df).collect()}
    # unique doc: zero duplicate grams
    assert out[1].dup_gram_frac == 0.0
    # brute-force expected values for doc 2: grams are
    # [spam ham, ham spam] * alternating -> 7 grams, all duplicated
    assert out[2].n_grams == 7
    assert out[2].dup_gram_frac == 1.0
    assert out[2].top_gram_frac == round(4 / 7, 4)
    # doubled text scores strictly higher than unique text
    assert out[3].dup_gram_frac > out[1].dup_gram_frac
    # short doc: no grams, zero fractions, but the row exists
    assert out[4].n_grams == 0 and out[4].dup_gram_frac == 0.0


def test_leakage_safe_split_coassigns_duplicates(spark):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.text import (
        leakage_safe_split,
    )

    base = [(i, f"some document body number {i} with words") for i in range(60)]
    # byte-different duplicates: whitespace, casing, punctuation noise
    dups = [
        (1000 + i, f"  SOME document BODY number {i} with words!! ")
        for i in range(60)
    ]
    df = spark.createDataFrame(base + dups, "doc_id long, text string")
    out = leakage_safe_split(df, val_pct=30)
    rows = {r.doc_id: r for r in out.collect()}
    # every duplicate lands on its original's side, always
    for i in range(60):
        assert rows[i].split == rows[1000 + i].split, i
        assert rows[i].bucket == rows[1000 + i].bucket, i
    # both sides are populated at val_pct=30 over 60 distinct contents
    sides = {r.split for r in rows.values()}
    assert sides == {"train", "val"}
    # deterministic: a rerun reproduces the assignment exactly
    again = {r.doc_id: r.split for r in leakage_safe_split(df, val_pct=30).collect()}
    assert again == {k: v.split for k, v in rows.items()}
    # id-hash split (the naive approach) WOULD leak these pairs:
    # sanity-check our premise by showing some pair differs under it
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.sampling import (
        hash_draw,
    )

    naive = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id", (hash_draw(F.col("doc_id")) % 100 < 30).alias("b")
        ).collect()
    }
    assert any(naive[i] != naive[1000 + i] for i in range(60))


def test_sample_weighted_aes_invariants(spark):
    """A-ES weighted sampling: a dominant weight wins the k=1 draw,
    zero/NULL weights are unsampleable, per-group quotas hold, and
    the top-k set nests inside the top-(k+1) set (ranking a fixed
    key list)."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.sampling import (
        sample_weighted,
    )

    rows = [(i, "g", 1.0) for i in range(1, 100)] + [(1000, "g", 1e9)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    got = sample_weighted(df, "w", k=1, by=["grp"]).collect()
    assert [r["doc_id"] for r in got] == [1000]

    mixed = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 0.0), (3, "a", None), (4, "a", 2.0),
         (5, "b", 1.0)],
        "doc_id long, grp string, w double",
    )
    out = sample_weighted(mixed, "w", k=2, by=["grp"]).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["grp"], set()).add(r["doc_id"])
    assert by_g["a"] == {1, 4}  # zero/NULL excluded, quota 2 of 2 valid
    assert by_g["b"] == {5}

    big = spark.createDataFrame(
        [(i, "g", float(1 + i % 7)) for i in range(200)],
        "doc_id long, grp string, w double",
    )
    k3 = {r["doc_id"] for r in sample_weighted(big, "w", k=3, by=["grp"]).collect()}
    k4 = {r["doc_id"] for r in sample_weighted(big, "w", k=4, by=["grp"]).collect()}
    assert len(k3) == 3 and len(k4) == 4 and k3 < k4

    # global k (no grouping) uses the limit path
    g2 = sample_weighted(big, "w", k=5).collect()
    assert len(g2) == 5


def test_epoch_shuffle_keys(spark):
    """Each epoch is a deterministic, distinct permutation; the key
    is reproducible run-to-run."""
    import pytest

    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.sampling import (
        epoch_shuffle_keys,
    )

    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    a = epoch_shuffle_keys(df, epochs=2, key_col="doc_id").collect()
    assert len(a) == 80
    by_epoch = {}
    for r in a:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["shuffle_key"]
    assert set(by_epoch) == {0, 1}
    order0 = sorted(by_epoch[0], key=lambda d: by_epoch[0][d])
    order1 = sorted(by_epoch[1], key=lambda d: by_epoch[1][d])
    assert order0 != order1          # independent permutations
    assert set(order0) == set(order1) == set(range(40))
    # reproducible
    b = epoch_shuffle_keys(df, epochs=2, key_col="doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError):
        epoch_shuffle_keys(df, epochs=0, key_col="doc_id")


def test_doremi_mixture_weights(spark):
    """Harder sources get upweighted beyond their share; weights
    normalize to ~1; exact evidence columns are consistent."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.sampling import (
        doremi_mixture_weights,
    )

    easy = "the cat sat on the mat and the cat sat again"
    rows = [(i, easy, "easy") for i in range(30)]
    # hard source: unique word soup -> every bigram is rare
    rows += [
        (100 + i, f"zq{i}a wbx{i} grl{i}m vnt{i}k plo{i}d", "hard")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in doremi_mixture_weights(df).collect()}
    assert set(out) == {"easy", "hard"}
    assert out["easy"]["n_docs"] == 30 and out["hard"]["n_docs"] == 10
    # the hard source's surprisal excess is positive, the easy one's 0
    assert out["hard"]["excess"] > 0.0
    assert out["easy"]["excess"] == 0.0
    # normalized
    assert abs(out["easy"]["weight"] + out["hard"]["weight"] - 1.0) < 1e-5
    # upweighted beyond its 25% share
    assert out["hard"]["weight"] > 10 / 40
    # deterministic
    again = {r["source"]: r for r in doremi_mixture_weights(df).collect()}
    assert sorted(map(tuple, out.values())) == sorted(
        map(tuple, again.values())
    )


def test_dsir_scores_prefers_target_like_docs(spark):
    """DSIR importance weights: docs sharing the target domain's
    bigrams score above disjoint-vocabulary docs; every doc appears
    exactly once; exactly select_n docs are selected; sub-2-word
    docs score 0 with n_grams 0."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.sampling import (
        dsir_scores,
    )

    target_text = (
        "spark shuffle partitions broadcast join executor memory spill"
    )
    # raw corpus much larger than the target set, so the smoothed
    # log-ratio signal dominates the add-one baseline
    rows = (
        [(i, target_text) for i in range(5)]              # the target set
        + [(10, "spark shuffle partitions broadcast tuning")]  # target-like
        + [
            (20 + i, f"sourdough recipe v{i} flour water salt yeast oven")
            for i in range(20)
        ]
        + [(90, "one")]                                   # no bigrams
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dsir_scores(
            df, df.filter("doc_id < 5"), n_buckets=64, select_n=6
        ).collect()
    }
    assert len(got) == 27
    # the target docs and the target-like doc carry clearly positive
    # importance weights; a no-gram doc is NEUTRAL (log-weight 0) —
    # exactly DSIR's semantics
    for i in list(range(5)) + [10]:
        assert got[i]["dsir_micro"] > 0, i
    assert got[90]["n_grams"] == 0 and got[90]["dsir_micro"] == 0
    assert sum(r["selected"] for r in got.values()) == 6
    # top-6 = the five target docs + the target-like doc, every
    # off-domain doc unselected
    assert all(got[i]["selected"] == 1 for i in list(range(5)) + [10])
    assert all(got[20 + i]["selected"] == 0 for i in range(20))
    # target-like beats every off-domain score
    assert got[10]["dsir_micro"] > max(
        got[20 + i]["dsir_micro"] for i in range(20)
    )
