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
