"""Distributed BPE merge training (operators/bpe.py, Sennrich 2016).

The Spark side applies merges with an aggregate() stack fold; the
Python replica scans greedily left-to-right.  Equivalence of the two
constructions (plus the oracle's run-parity window formulation in
driver_queries.py) is the correctness argument, so the corpus here is
stacked with the adversarial shapes: overlapping same-symbol runs
('aaa'), chained pairs ('abab'), and merged-token collisions.
"""

from __future__ import annotations

import pytest

from lopez_spark.operators.bpe import bpe_train, bpe_train_python, word_counts


def test_python_replica_hand_worked():
    # freq-weighted: 'ab' pair appears 3x in 'abab' (2 per word? no:
    # ab,ba,ab -> 2) * 5 + 1x in 'ab' * 3 = 13; 'aa' in 'aaa' = 2 * 4 = 8
    wf = {"abab": 5, "ab": 3, "aaa": 4}
    out = bpe_train_python(wf, 2)
    assert out[0] == (0, "a", "b", 13)
    # after merging (a,b): abab->[ab,ab], ab->[ab], aaa->[a,a,a]
    # pairs: (ab,ab)x5, (a,a)x8 -> best (a,a)
    assert out[1] == (1, "a", "a", 8)


def test_python_replica_greedy_runs():
    # 'aaaa' has 3 overlapping (a,a) starts; greedy merges 2
    wf = {"aaaa": 1}
    out = bpe_train_python(wf, 2)
    assert out[0] == (0, "a", "a", 3)
    # after round 0: [aa, aa] -> next best is (aa, aa)
    assert out[1] == (1, "aa", "aa", 1)


def test_python_replica_stops_when_dry():
    assert bpe_train_python({"a": 7}, 3) == []


ADVERSARIAL = {
    "aaaa": 5,
    "aaa": 4,
    "abab": 6,
    "aab": 3,
    "baa": 3,
    "abc": 2,
    "cabab": 1,
    "x": 9,
    "lowlow": 2,
    "lower": 7,
    "lowest": 1,
    "newer": 6,
    "new": 8,
    "wider": 3,
}


def test_spark_matches_replica_on_adversarial_corpus(spark):
    words = spark.createDataFrame(
        list(ADVERSARIAL.items()), "word string, freq long"
    )
    got = [
        (r["round"], r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(words, rounds=6).orderBy("round").collect()
    ]
    assert got == bpe_train_python(ADVERSARIAL, 6)


def test_word_counts(spark):
    docs = spark.createDataFrame(
        [("the cat the hat",), ("the cat 9lives",)], "text string"
    )
    got = {r.word: r.freq for r in word_counts(docs).collect()}
    assert got == {"the": 3, "cat": 2, "hat": 1, "9lives": 1}


def test_fold_does_not_python_udf(spark):
    words = spark.createDataFrame([("abab", 2)], "word string, freq long")
    plan = bpe_train(words, rounds=1)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _encode_python(word: str, merges) -> int:
    """Greedy-leftmost application of trained merges to one word —
    independent apply replica for pinning bpe_vocab."""
    s = list(word)
    for _, l, r, _ in merges:
        ns, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                ns.append(l + r)
                i += 2
            else:
                ns.append(s[i])
                i += 1
        s = ns
    return len(s)


def test_vocab_matches_python_apply(spark):
    from lopez_spark.operators.bpe import bpe_vocab

    words = spark.createDataFrame(
        list(ADVERSARIAL.items()), "word string, freq long"
    )
    merges = bpe_train_python(ADVERSARIAL, 6)
    got = {r.word: r.n_syms for r in bpe_vocab(words, rounds=6).collect()}
    assert got == {w: _encode_python(w, merges) for w in ADVERSARIAL}
