"""SentencePiece-style unigram-LM tokenizer induction and
application (Kudo 2018, "Subword Regularization", arXiv:1804.10959)
— the second tokenizer family next to BPE (operators/bpe.py),
distributed Spark-first.

Classic formulation over the word-frequency table: seed a candidate
piece inventory from substring frequencies, then run EM — the E-step
Viterbi-segments every distinct word under the current unigram piece
log-probabilities and counts piece usage (weighted by word
frequency); the M-step re-normalizes probabilities from usage. Two
differences from the reference implementation keep every step
exactly replayable by a generated SQL oracle (the BPE-oracle
recipe):

- log-probabilities are quantized to integer micro-units
  (``round(ln(p) * 1e6)``), so Viterbi's DP is EXACT INTEGER
  arithmetic — no float compare ever decides a segmentation;
- the Viterbi argmax tie-breaks deterministically by larger last
  piece (encoded as ``score * 8 + k``, exact for 60-bit scores and
  collision-free: ``8*(s1-s2) == k2-k1`` has no solution for
  distinct ``k`` in 1..3).

Scale design: everything runs on the DISTINCT-WORD table (Zipf: the
word table is tiny relative to the corpus — the same reduction BPE
uses), so the corpus is touched once to build it. The Viterbi pass
itself is a single map-only stage: the model is a vocabulary-sized
``piece -> lp_micro`` table (|chars| + N_MULTI rows, bounded by
construction) that the driver collects and broadcasts, and an
Arrow-batched ``pandas_udf`` runs the per-word integer DP with zero
shuffles — the murmur3/cosine precedent in this package, justified
because the inner loop is a data-dependent DP with backtrace that
column expressions cannot express, the input is the Zipf-reduced
word table (not the corpus), and Python bigints reproduce the
integer-exact scores bit-for-bit.

(A first cut unrolled the DP into MAX_WORD_LEN join/argmax stages
over the word table. Correct, but it is the wrong Spark plan twice
over: ~33 eager checkpoints per pass serialize into a driver-side
job storm, and Catalyst's size-only stats estimator multiplies
``sizeInBytes`` through every join, so checkpointed plans accumulate
multi-thousand-digit BigInteger stats whose ``rewriteStatsAndConstraints``
on the NEXT pass's checkpoints dominates wall-clock — super-linearly
in the number of Viterbi passes. The broadcast-model UDF removes the
joins, the checkpoints, and the stats tower in one move.)

Words longer than ``MAX_WORD_LEN`` are excluded from INDUCTION
(SentencePiece's trainer applies analogous caps); at apply time they
fall back to single-char segmentation (chars are always in the
inventory).

Reference parity note: the reference pipeline (scripts/
raw-bronze.py, bronze-silver.py) carries no tokenizer machinery;
this module belongs to the LLM-curation extension surface.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_WORD_LEN = 16
MAX_PIECE_LEN = 3
N_MULTI = 48  # multi-char candidate pieces kept (top by frequency)


def word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct lowercase alpha words with corpus frequencies,
    capped at MAX_WORD_LEN for induction."""
    return (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("word")
        )
        .filter(F.length("word") <= MAX_WORD_LEN)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wcount"))
    )


def _substrings(words: DataFrame) -> DataFrame:
    """(word, wcount, j, k, piece, end_pos): every start position j
    (1-based) x piece length k (1..MAX_PIECE_LEN) inside each word."""
    s1 = words.select(
        "word",
        "wcount",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("j"),
    )
    s2 = s1.select(
        "word",
        "wcount",
        "j",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(
                    F.lit(MAX_PIECE_LEN),
                    F.length("word") - F.col("j") + F.lit(1),
                ),
            )
        ).alias("k"),
    )
    return s2.select(
        "word",
        "wcount",
        "j",
        "k",
        F.expr("substring(word, j, k)").alias("piece"),
        (F.col("j") + F.col("k") - F.lit(1)).alias("end_pos"),
    )


def candidate_pieces(words: DataFrame) -> DataFrame:
    """Seed inventory: every single character (coverage guarantee)
    plus the top-N_MULTI multi-char substrings by weighted frequency
    (ties by piece text). ``pcount`` is the substring-occurrence
    frequency weighted by word count — the classic seed estimate."""
    counts = _substrings(words).groupBy("piece").agg(
        F.sum("wcount").alias("pcount")
    )
    single = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.desc("pcount"), F.asc("piece"))
        .limit(N_MULTI)
    )
    return single.unionByName(multi)


def _logp_micro(pieces: DataFrame, count_col: str = "pcount") -> DataFrame:
    """(piece, lp_micro): micro-quantized unigram log-probability
    from counts — the 1-row total broadcasts."""
    total = pieces.agg(F.sum(count_col).alias("_tot"))
    return pieces.crossJoin(F.broadcast(total)).select(
        "piece",
        F.round(
            F.log(
                F.col(count_col).cast("double") / F.col("_tot").cast("double")
            )
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("lp_micro"),
    )


def _collect_model(lp: DataFrame) -> dict:
    """Driver-side model snapshot: vocabulary-sized (bounded at
    |distinct chars| + N_MULTI rows by candidate_pieces), collected
    AFTER micro-quantization so the broadcast integers are exactly
    the ones the oracle replays — the BPE merge-argmax precedent for
    a bounded planning-scale collect."""
    return {r["piece"]: r["lp_micro"] for r in lp.collect()}


def _viterbi_pieces(words: DataFrame, lp_map: dict) -> DataFrame:
    """Fixed-model Viterbi segmentation of every distinct word:
    ``(word, wcount, pieces array<string>)`` — in reading order —
    for words with a complete path under the model; words with none
    (an inventory char can be absent when it only occurs in
    over-MAX_WORD_LEN words) are dropped, matching the join-DP/
    oracle semantics where they fall to the per-char fallback.

    Map-only: the model broadcasts with the UDF closure; the DP per
    word is O(len * MAX_PIECE_LEN) exact Python-bigint arithmetic
    with the same ``score * 8 + k`` argmax encoding the SQL oracle
    unrolls, so the chosen segmentation is identical bit-for-bit."""

    @F.pandas_udf("array<string>")
    def seg(col: pd.Series) -> pd.Series:
        out = []
        for w in col:
            n = len(w)
            # score[j] = best micro-logprob of w[:j]; bk[j] = length
            # of the last piece of that best split (None = no path)
            score = [0] + [None] * n
            bk = [0] * (n + 1)
            for j in range(1, n + 1):
                best_enc = None
                for k in range(1, min(MAX_PIECE_LEN, j) + 1):
                    prev = score[j - k]
                    if prev is None:
                        continue
                    lpm = lp_map.get(w[j - k : j])
                    if lpm is None:
                        continue
                    enc = (prev + lpm) * 8 + k
                    if best_enc is None or enc > best_enc:
                        best_enc = enc
                        score[j] = prev + lpm
                        bk[j] = k
                if best_enc is None:
                    score[j] = None
            if score[n] is None:
                out.append(None)
                continue
            pieces = []
            j = n
            while j > 0:
                pieces.append(w[j - bk[j] : j])
                j -= bk[j]
            pieces.reverse()
            out.append(pieces)
        return pd.Series(out)

    return (
        words.withColumn("pieces", seg("word"))
        .filter(F.col("pieces").isNotNull())
    )


def _viterbi_usage(words: DataFrame, lp_map: dict) -> DataFrame:
    """E-step: piece usage under the model — Viterbi-segment every
    distinct word (map-only), explode the chosen pieces, and sum
    word frequencies per piece. One narrow stage + one hash-agg
    shuffle over piece keys."""
    return (
        _viterbi_pieces(words, lp_map)
        .select(F.explode("pieces").alias("piece"), "wcount")
        .groupBy("piece")
        .agg(F.sum("wcount").alias("usage"))
    )


def _em_fit(
    words: DataFrame, pieces: DataFrame, em_rounds: int
) -> tuple[DataFrame | None, DataFrame]:
    """Run the EM loop once for both the vocab and segment paths (a
    drift between two copies would silently diverge vocab from
    encode). Returns ``(usage, lp)`` after ``em_rounds`` rounds —
    ``usage`` is None when em_rounds == 0."""
    lp = _logp_micro(pieces, "pcount")
    usage = None
    for _ in range(em_rounds):
        usage = (
            pieces.select("piece")
            .join(_viterbi_usage(words, _collect_model(lp)), "piece", "left")
            .select(
                "piece",
                (F.coalesce(F.col("usage"), F.lit(0)) + F.lit(1))
                .cast("long")
                .alias("count1"),
            )
            # bounded materialization per EM round: the frame is
            # piece-inventory-sized (~100 rows) and feeds both the
            # next round's model collect and the final output join
            .localCheckpoint()
        )
        lp = _logp_micro(usage, "count1")
    return usage, lp


def unigram_lm_vocab(
    df: DataFrame,
    text_col: str = "text",
    em_rounds: int = 2,
) -> DataFrame:
    """Induce the unigram-LM piece vocabulary: seed from substring
    frequencies, then ``em_rounds`` EM iterations (integer-exact
    Viterbi E-step, add-one-smoothed M-step — the +1 keeps every
    candidate alive so coverage never breaks mid-EM, the standard
    smoothing choice).

    Returns ``(piece, n_chars, final_count, lp_micro)`` — the full
    surviving inventory with its post-EM usage (+1) and
    micro-quantized log-probability."""
    words = word_table(df, text_col).persist()
    pieces = candidate_pieces(words).persist()
    usage, lp = _em_fit(words, pieces, em_rounds)
    return (
        usage.join(lp, "piece")
        .select(
            "piece",
            F.length("piece").cast("int").alias("n_chars"),
            F.col("count1").alias("final_count"),
            "lp_micro",
        )
    )


def unigram_segment_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    em_rounds: int = 2,
) -> DataFrame:
    """The APPLY half (the bpe_encode_tokens counterpart): learn the
    unigram model (same EM as :func:`unigram_lm_vocab`), then
    segment every document under the FINAL model — one more map-only
    Viterbi pass over the distinct-word table builds a word ->
    in-order piece-stream map, and the corpus join is a broadcast of
    that (tiny, Zipf) map onto the position-exploded document words.

    Emits order-sensitive evidence per doc: word count, token count,
    and an md5 fingerprint of the full in-order piece stream — a
    segmenter that reorders, drops, or re-ties any piece
    hash-mismatches. Words over MAX_WORD_LEN (absent from the word
    table) fall back to per-char segmentation, as do words with no
    complete model path."""
    words = word_table(df, text_col).persist()
    pieces = candidate_pieces(words).persist()
    _, lp = _em_fit(words, pieces, em_rounds)
    # final-model segmentation of every distinct word (map-only)
    word_pieces = _viterbi_pieces(words, _collect_model(lp)).select(
        "word",
        F.array_join("pieces", "|").alias("pieces_str"),
        F.size("pieces").cast("long").alias("n_pieces"),
    )
    docw = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("pos", "word"),
    )
    per = (
        docw.join(F.broadcast(word_pieces), "word", "left")
        .select(
            "doc_id",
            "pos",
            F.coalesce(
                F.col("pieces_str"),
                F.array_join(
                    F.expr("regexp_extract_all(word, '.', 0)"), "|"
                ),
            ).alias("s"),
            F.coalesce(
                F.col("n_pieces"), F.length("word").cast("long")
            ).alias("nt"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("nt").cast("long").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "s"))
                        ),
                        lambda x: x.getField("s"),
                    ),
                    "|",
                )
            ).alias("token_fp"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_words"), F.lit(0).cast("long")).alias(
                "n_words"
            ),
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
            F.coalesce(F.col("token_fp"), F.md5(F.lit(""))).alias(
                "token_fp"
            ),
        )
    )
