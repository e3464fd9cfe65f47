"""SentencePiece-style unigram-LM tokenizer induction (Kudo 2018,
"Subword Regularization", arXiv:1804.10959) — the second tokenizer
family next to BPE (operators/bpe.py), distributed Spark-first.

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
  piece (encoded as ``score * 8 + k``, exact for 60-bit scores).

Scale design: everything runs on the DISTINCT-WORD table (Zipf: the
word table is tiny relative to the corpus — the same reduction BPE
uses), so the corpus is touched once to build it. The DP unrolls to
``MAX_WORD_LEN`` bounded join/aggregate stages over that table —
stage count is a constant, data per stage is words-sized, and no
step is driver-side except the fixed Python loop emitting the plan
(the BPE precedent). Words longer than ``MAX_WORD_LEN`` are excluded
from INDUCTION (SentencePiece's trainer applies analogous caps);
they would still be segmentable at apply time via single-char
fallback.

Reference parity note: the reference pipeline (scripts/
raw-bronze.py, bronze-silver.py) carries no tokenizer machinery;
this module belongs to the LLM-curation extension surface.
"""

from __future__ import annotations

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


def _viterbi_usage(words: DataFrame, lp: DataFrame) -> DataFrame:
    """E-step: Viterbi-best segmentation of every word under
    ``lp(piece, lp_micro)``; returns (piece, usage) with usage =
    sum of wcount over words using the piece (once per occurrence).

    Forward DP over positions 1..MAX_WORD_LEN as unrolled
    join/argmax stages (exact integer scores, ties to the larger
    last piece via the score*8+k encoding), then an unrolled
    backtrace emitting the chosen pieces. Bounded constant stage
    count; every frame is words-sized."""
    scored = (
        _substrings(words)
        .join(lp, "piece")
        .select("word", "k", "end_pos", "lp_micro")
        .localCheckpoint()
    )
    # bests[j]: (word, score, bk) — best segmentation score of the
    # first j characters and the length of its last piece. Each
    # stage is CHECKPOINTED: position j is consumed by positions
    # j+1..j+3, so an un-materialized lineage branches 3-ways per
    # position and the analyzed plan grows as 3^MAX_WORD_LEN. The
    # frames are distinct-word-sized — 16 tiny bounded
    # materializations per E-step, the same bounded-stage trade the
    # BPE rounds make.
    bests: list[DataFrame] = [
        words.select(
            "word",
            F.lit(0).cast("long").alias("score"),
            F.lit(0).alias("bk"),
        ).localCheckpoint()
    ]
    for j in range(1, MAX_WORD_LEN + 1):
        cand = None
        for k in range(1, min(MAX_PIECE_LEN, j) + 1):
            prev = bests[j - k].select(
                "word", F.col("score").alias("_ps")
            )
            c = (
                scored.filter((F.col("end_pos") == j) & (F.col("k") == k))
                .join(prev, "word")
                .select(
                    "word",
                    (F.col("_ps") + F.col("lp_micro")).alias("score"),
                    F.lit(k).alias("bk"),
                )
            )
            cand = c if cand is None else cand.unionByName(c)
        enc = F.col("score") * F.lit(8) + F.col("bk")
        bests.append(
            cand.groupBy("word")
            .agg(
                F.max_by("score", enc).alias("score"),
                F.max_by("bk", enc).alias("bk"),
            )
            .localCheckpoint()
        )
    ball = None
    for j in range(1, MAX_WORD_LEN + 1):
        bj = bests[j].select("word", F.lit(j).alias("j"), "bk")
        ball = bj if ball is None else ball.unionByName(bj)
    ball = ball.localCheckpoint()
    # backtrace: walk pos -> pos - bk, emitting the chosen piece.
    # Checkpoint per step for the same lineage-branching reason (the
    # emitted union would otherwise re-evaluate every chain prefix).
    cur = words.select("word", "wcount", F.length("word").alias("pos"))
    emitted: list[DataFrame] = []
    for _ in range(MAX_WORD_LEN):
        hit = (
            cur.alias("c")
            .join(
                ball.alias("b"),
                (F.col("c.word") == F.col("b.word"))
                & (F.col("c.pos") == F.col("b.j")),
            )
            .select(
                F.col("c.word").alias("word"),
                F.col("c.wcount").alias("wcount"),
                F.expr(
                    "substring(c.word, c.pos - b.bk + 1, b.bk)"
                ).alias("piece"),
                (F.col("c.pos") - F.col("b.bk")).alias("npos"),
            )
            .localCheckpoint()
        )
        emitted.append(hit.select("piece", "wcount"))
        cur = hit.select(
            "word", "wcount", F.col("npos").alias("pos")
        ).filter(F.col("pos") > 0)
    allp = emitted[0]
    for e in emitted[1:]:
        allp = allp.unionByName(e)
    return allp.groupBy("piece").agg(F.sum("wcount").alias("usage"))


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
    lp = _logp_micro(pieces, "pcount")
    usage = None
    for _ in range(em_rounds):
        usage = (
            pieces.select("piece")
            .join(_viterbi_usage(words, lp), "piece", "left")
            .select(
                "piece",
                (F.coalesce(F.col("usage"), F.lit(0)) + F.lit(1))
                .cast("long")
                .alias("count1"),
            )
            # bounded materialization per EM round: the frame is
            # piece-inventory-sized (~100 rows); without it the next
            # round's Viterbi plan nests this round's 16-stage DP
            # inside every stage and analysis time explodes
            .localCheckpoint()
        )
        lp = _logp_micro(usage, "count1")
    return (
        usage.join(lp, "piece")
        .select(
            "piece",
            F.length("piece").cast("int").alias("n_chars"),
            F.col("count1").alias("final_count"),
            "lp_micro",
        )
    )
