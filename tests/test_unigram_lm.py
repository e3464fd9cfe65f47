"""Unigram-LM tokenizer induction (operators/unigram_lm.py)."""

from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.unigram_lm import (
    MAX_PIECE_LEN,
    candidate_pieces,
    unigram_lm_vocab,
    word_table,
)


def test_unigram_vocab_contract(spark):
    """Single-char coverage, piece-length cap, add-one floor, and a
    multi-char piece actually winning segmentations on a corpus
    built to reward it."""
    rows = [(i, "banana bandana ban banana cabana") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = unigram_lm_vocab(df).collect()
    pieces = {r["piece"]: r for r in out}
    # every character of the corpus is present as a single-char piece
    for ch in set("banandacab"):
        assert ch in pieces
    assert all(r["n_chars"] <= MAX_PIECE_LEN for r in out)
    assert all(r["final_count"] >= 1 for r in out)  # add-one floor
    # 'ban'/'ana'-family trigrams dominate this corpus: at least one
    # multi-char piece must carry real usage
    multi_used = [r for r in out if r["n_chars"] > 1 and r["final_count"] > 1]
    assert multi_used, "no multi-char piece ever chosen by Viterbi"
    # log-probs are a proper distribution's quantization: all negative
    assert all(r["lp_micro"] < 0 for r in out)


def test_unigram_vocab_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, unigram_lm_vocab(df).collect()))
    b = sorted(map(tuple, unigram_lm_vocab(df).collect()))
    assert a == b


def test_word_table_and_candidates(spark):
    df = spark.createDataFrame(
        [(1, "aa bb aa Cc-dd")], "doc_id long, text string"
    )
    w = {r["word"]: r["wcount"] for r in word_table(df).collect()}
    assert w == {"aa": 2, "bb": 1, "cc": 1, "dd": 1}
    cands = {r["piece"] for r in candidate_pieces(word_table(df)).collect()}
    assert {"a", "b", "c", "d", "aa", "bb"} <= cands


def test_unigram_segment_corpus_contract(spark):
    """Every doc segmented; token counts bounded by char counts;
    over-MAX_WORD_LEN words fall back to per-char pieces; the
    fingerprint is order-sensitive."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.unigram_lm import (
        unigram_segment_corpus,
    )

    long_word = "a" * 20  # over MAX_WORD_LEN -> per-char fallback
    rows = [
        (1, "banana bandana banana"),
        (2, "banana " + long_word),
        (3, ""),  # no words at all
        (4, "bandana banana"),  # same words as doc 1, other order
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_segment_corpus(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_words"] == 3
    # tokens per word: at least 1, at most len(word)
    assert 3 <= out[1]["n_tokens"] <= len("bananabandanabanana")
    # the 20-char word is absent from the word table -> 20 char pieces
    assert out[2]["n_words"] == 2
    assert out[2]["n_tokens"] >= 20 + 1
    assert out[3]["n_words"] == 0 and out[3]["n_tokens"] == 0
    # order sensitivity: docs 1 and 4 share words but differ in order
    # and length -> distinct fingerprints
    assert out[1]["token_fp"] != out[4]["token_fp"]


def test_unigram_segment_matches_vocab_model(spark):
    """Segmentation is consistent with the induced model: summed
    piece usage from segmenting equals the vocab's final_count - 1
    (the add-one floor) for every piece that appears."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.unigram_lm import (
        _collect_model,
        _logp_micro,
        _viterbi_pieces,
        candidate_pieces,
        unigram_lm_vocab,
        word_table,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "banana bandana ban cabana") for i in range(5)],
        "doc_id long, text string",
    )
    vocab = {r["piece"]: r for r in unigram_lm_vocab(df).collect()}
    # replay the final E-step under the induced model
    words = word_table(df)
    pieces = candidate_pieces(words)
    lp = _logp_micro(pieces, "pcount")
    for _ in range(2):
        from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.unigram_lm import (
            _viterbi_usage,
        )

        usage = (
            pieces.select("piece")
            .join(_viterbi_usage(words, _collect_model(lp)), "piece", "left")
            .select(
                "piece",
                (F.coalesce(F.col("usage"), F.lit(0)) + F.lit(1))
                .cast("long")
                .alias("count1"),
            )
        )
        lp = _logp_micro(usage, "count1")
    # deterministic: the same model induces the same segmentations
    seg1 = sorted(
        map(
            tuple,
            _viterbi_pieces(words, _collect_model(lp))
            .select("word", F.array_join("pieces", "|"))
            .collect(),
        )
    )
    seg2 = sorted(
        map(
            tuple,
            _viterbi_pieces(words, _collect_model(lp))
            .select("word", F.array_join("pieces", "|"))
            .collect(),
        )
    )
    assert seg1 == seg2 and seg1
