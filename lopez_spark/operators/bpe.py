"""Distributed BPE merge training (Sennrich 2016; the GPT-2 tokenizer
recipe) as DataFrame jobs — no Python on the hot path.

Each merge round is two JVM-side steps over the word-frequency table:

1. *Pair counting*: every word's adjacent symbol pairs weighted by word
   frequency — ``transform(sequence(...))`` + explode + one groupBy
   shuffle on the pair key.  The best pair is a TakeOrdered(1) with a
   deterministic (count DESC, left, right) tie-break.
2. *Merge application*: greedy leftmost merging is a sequential fold,
   expressed as ``aggregate()`` with an array accumulator: push each
   symbol, and when the top of the stack is ``l`` and the incoming
   symbol is ``r``, replace the top with ``lr``.  This is equivalent to
   greedy leftmost non-overlapping matching: a spurious stack match
   would need the merged token ``lr`` to equal ``l`` (impossible —
   ``r`` is nonempty), and a skipped one is exactly the overlap greedy
   matching skips.  One broadcast of the 1-row best pair, zero extra
   shuffles.

At 100 TB the word-frequency table is the classic first aggregation
(tiny vs the corpus: vocabulary grows ~O(corpus^0.7), and BPE training
conventionally runs on a sample anyway); every round is then one
shuffle on the pair key over the vocabulary, not the corpus.  The
reference has no tokenizer (Rust crawl engine, SURVEY §2.8); this is
beyond-reference training-data infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FOLD = """
aggregate(
    syms,
    CAST(array() AS array<string>),
    (acc, x) -> IF(size(acc) > 0 AND element_at(acc, -1) = l AND x = r,
                   concat(slice(acc, 1, size(acc) - 1), array(concat(l, r))),
                   concat(acc, array(x)))
)
"""

_PAIRS = """
explode(transform(sequence(1, size(syms) - 1),
                  i -> struct(element_at(syms, i) AS l,
                              element_at(syms, i + 1) AS r)))
"""


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over ``[a-z0-9]+`` tokens — the standard BPE
    pre-tokenization aggregate (one shuffle on the word key)."""
    return (
        docs.select(
            F.explode(F.expr(f"regexp_extract_all({text_col}, '[a-z0-9]+', 0)")).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _train_loop(
    words: DataFrame, rounds: int
) -> tuple[list[DataFrame], DataFrame]:
    """Shared training loop: returns (per-round 1-row best-pair frames,
    final evolved symbol table).  The evolving symbol table is lazily
    localCheckpoint-ed per round so round k+1's plan does not re-derive
    rounds 1..k."""
    syms = words.select(
        "word", "freq", F.expr("regexp_extract_all(word, '.', 0)").alias("syms")
    )
    merges = []
    for k in range(rounds):
        pairs = (
            syms.filter(F.size("syms") >= 2)
            .select("freq", F.expr(_PAIRS).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1)
        merges.append(best.select(F.lit(k).alias("round"), "l", "r", "cnt"))
        syms = (
            syms.crossJoin(F.broadcast(best))
            .select("word", "freq", F.expr(_FOLD).alias("syms"))
            .localCheckpoint(eager=False)
        )
    return merges, syms


def bpe_train(words: DataFrame, rounds: int) -> DataFrame:
    """Learn ``rounds`` BPE merges from a (word, freq) table.  Returns
    (round, left_sym, right_sym, pair_count) — the ranked merge table a
    tokenizer ships.  Words start as character symbol lists; each round
    merges the globally most frequent adjacent pair (count DESC, then
    lexicographic left/right tie-break)."""
    merges, _ = _train_loop(words, rounds)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.select(
        "round",
        F.col("l").alias("left_sym"),
        F.col("r").alias("right_sym"),
        F.col("cnt").cast("long").alias("pair_count"),
    )


def bpe_vocab(words: DataFrame, rounds: int) -> DataFrame:
    """Train ``rounds`` merges and return the ENCODED vocabulary:
    (word, n_syms) — each word's token count under the learned merge
    table.  This is the apply side of the tokenizer: at 100 TB you
    encode the corpus by broadcast-joining this table onto the token
    stream (vocabulary ~O(corpus^0.7), always broadcastable), never by
    re-folding merges per occurrence."""
    _, syms = _train_loop(words, rounds)
    return syms.select("word", F.size("syms").cast("long").alias("n_syms"))


def bpe_train_python(
    word_freq: dict[str, int], rounds: int
) -> list[tuple[int, str, str, int]]:
    """Straight-line replica for tests: same init, same greedy leftmost
    merge, same (count DESC, left, right) tie-break."""
    table = {w: [c for c in w] for w in word_freq}
    out = []
    for k in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for w, s in table.items():
            f = word_freq[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((k, l, r, cnt))
        for w, s in table.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            table[w] = ns
    return out
