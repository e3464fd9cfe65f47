"""Randomized cross-checks of the tokenizer/CDC kernels against
independent reference implementations (seeded, one Spark job per
check — not per example)."""

import random

from pyspark.sql import functions as F


def _brute_unigram(word, lp):
    """Independent reference: enumerate ALL segmentations into
    pieces of length 1..3 present in lp; best by (total score,
    then last-piece-length-first lexicographic, larger wins) — the
    order the DP's score*8+k argmax realizes."""
    segs = []

    def rec(pos, acc):
        if pos == len(word):
            segs.append(list(acc))
            return
        for k in (1, 2, 3):
            if pos + k <= len(word) and word[pos : pos + k] in lp:
                acc.append(word[pos : pos + k])
                rec(pos + k, acc)
                acc.pop()

    rec(0, [])
    if not segs:
        return None

    def key(seg):
        score = sum(lp[p] for p in seg)
        return (score, [len(p) for p in reversed(seg)])

    return max(segs, key=key)


def test_unigram_viterbi_matches_bruteforce(spark):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.unigram_lm import (
        _viterbi_pieces,
    )

    rng = random.Random(20260815)
    alphabet = "abcd"
    pieces = {c: rng.randint(-9_000_000, -1_000_000) for c in alphabet}
    for _ in range(40):
        ln = rng.randint(2, 3)
        p = "".join(rng.choice(alphabet) for _ in range(ln))
        pieces[p] = rng.randint(-9_000_000, -1_000_000)
    words = list({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(250)
    })
    df = spark.createDataFrame([(w, 1) for w in words], "word string, wcount long")
    got = {
        r["word"]: list(r["pieces"])
        for r in _viterbi_pieces(df, pieces).collect()
    }
    for w in words:
        want = _brute_unigram(w, pieces)
        assert got.get(w) == want, (w, got.get(w), want)


def test_wordpiece_greedy_invariants(spark):
    """Every emitted piece is in the vocab with correct ## position
    marking, concatenation reproduces the word, and at each accepted
    position no LONGER vocab match existed (greedy optimality,
    checked independently)."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.wordpiece import (
        UNK,
        _greedy_pieces,
    )

    rng = random.Random(99)
    alphabet = "abc"
    vocab = {c for c in alphabet} | {"##" + c for c in alphabet}
    for _ in range(30):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 4)))
        vocab.add(s if rng.random() < 0.5 else "##" + s)
    words = list({
        "".join(rng.choice(alphabet + "z") for _ in range(rng.randint(1, 10)))
        for _ in range(200)
    })
    df = spark.createDataFrame([(w, 1) for w in words], "word string, c long")
    got = {
        r["word"]: list(r["pieces"])
        for r in _greedy_pieces(df, vocab).collect()
    }
    for w in words:
        pieces = got[w]
        if pieces == [UNK]:
            continue
        assert not pieces[0].startswith("##")
        assert all(p.startswith("##") for p in pieces[1:])
        assert all(p in vocab for p in pieces)
        joined = "".join(p[2:] if p.startswith("##") else p for p in pieces)
        assert joined == w
        # greedy optimality: at each start, the accepted piece is the
        # longest vocab match available there
        pos = 0
        for p in pieces:
            content = p[2:] if p.startswith("##") else p
            for longer in range(len(w) - pos, len(content), -1):
                cand = w[pos : pos + longer]
                if pos > 0:
                    cand = "##" + cand
                assert cand not in vocab, (w, p, cand)
            pos += len(content)


def test_cdc_chunks_partition_word_stream(spark):
    """CDC chunks exactly partition each doc's word stream (order
    kept, nothing lost), and boundaries match an independent
    per-word hash recomputation."""
    import hashlib

    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.text import (
        cdc_chunks,
    )

    rng = random.Random(7)
    vocabulary = ["alpha", "beta", "gamma", "delta", "eps", "zeta",
                  "eta", "theta", "iota", "kappa", "mu", "nu"]
    rows = [
        (i, " ".join(rng.choice(vocabulary)
                     for _ in range(rng.randint(1, 60))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks(df).collect()

    def tid(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 2147483647

    for doc_id, text in rows:
        words_ = text.split()
        # reference chunking
        ref, cur = [], []
        for w in words_:
            cur.append(w)
            if tid(w) % 8 == 0:
                ref.append(cur)
                cur = []
        if cur:
            ref.append(cur)
        mine = sorted(
            (r for r in out if r["doc_id"] == doc_id),
            key=lambda r: r["chunk_id"],
        )
        assert len(mine) == len(ref)
        for r, chunk in zip(mine, ref):
            assert r["n_words"] == len(chunk)
            import hashlib as h

            assert r["chunk_fp"] == h.md5(" ".join(chunk).encode()).hexdigest()
