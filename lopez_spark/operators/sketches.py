"""Mergeable metric sketches for crawl-scale counters.

The reference keeps exact in-memory counters merged across workers
(lib-lopez/src/crawler/counter.rs:9-58 ``Counter::merge``).  At a
10^10-URL frontier the *distinct* counters (distinct URLs seen, per-host
distinct pages) can no longer be exact; the standard mergeable
replacements are:

  * HyperLogLog (Flajolet, Fuster, Gandouet, Meunier, AofA 2007) for
    distinct counts — merge is register-wise MAX, the same associative
    shape ``Counter::merge`` relies on;
  * Count-Min (Cormode & Muthukhrishnan, J. Algorithms 2005) for
    frequency estimates — merge is cell-wise addition.

Everything here is integer-exact and engine-agnostic: hashing is md5
(identical in Spark and DuckDB, the registry's stand-in for the
engine-native xxhash64), rho is computed from ``bin()`` lengths, and
the HLL raw estimate uses exact dyadic arithmetic (sum of 2^(33-M[j])
as one BIGINT, one integer division, alpha as an exact rational).  The
gate queries (plans/driver_queries.py ``crawl_hll_registers`` /
``crawl_cms_hotset``) build on the same column expressions, so the
DuckDB oracle checks the deployed device, and the wave engine
(crawler/wave.py, LOPEZ_WAVE_HLL=1) carries the register set in every
committed manifest — the snapshot-metadata metric the north star asks
for.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 64  # default register count (p = 6)

# alpha_m from the HLL paper (Fig. 3), exact rationals scaled by 1000
# for the integer estimate path.
_ALPHA_E3 = {16: 673, 32: 697, 64: 709}


def _check_m(m: int) -> None:
    """Valid register counts: a power of two >= 16 — ``idx = h1 % m``
    is unbiased only for powers of two, and the paper defines alpha_m
    only for m in {16, 32, 64} plus the m >= 128 closed form
    (ADVICE r5: the closed form was silently applied to e.g. m=8 or
    non-power-of-two widths, where it is wrong)."""
    if m < 16 or m & (m - 1):
        raise ValueError(f"HLL register count must be a power of two >= 16, got {m}")


def hll_idx_rho(col: Column | str, m: int = HLL_M) -> tuple[Column, Column]:
    """(register index, rho) columns for one key column.

    idx = first 32 md5 bits mod m; rho = leading-zero rank of the next
    32 bits, computed as ``33 - length(bin(w))`` (w = 0 => 33) — pure
    JVM codegen, identical semantics in DuckDB for the oracle twin.
    """
    _check_m(m)
    h = F.md5(F.col(col) if isinstance(col, str) else col)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    idx = h1 % m
    rho = F.when(h2 == 0, 33).otherwise(F.lit(33) - F.length(F.bin(h2)))
    return idx, rho


def hll_registers(df: DataFrame, col: str, m: int = HLL_M) -> list[int]:
    """Dense register list for the distinct values of ``df[col]``.

    ONE keyed aggregate of at most m rows reaches the driver — partial
    MAX runs map-side, so the cost is a single tiny shuffle regardless
    of row count.  Duplicate keys are free (MAX absorbs them).
    """
    idx, rho = hll_idx_rho(col, m)
    rows = (
        df.select(idx.alias("idx"), rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("mj"))
        .collect()
    )
    regs = [0] * m
    for r in rows:
        regs[int(r["idx"])] = int(r["mj"])
    return regs


def hll_merge(a: list[int], b: list[int]) -> list[int]:
    """Register-wise MAX — HLL(A ∪ B) == merge(HLL(A), HLL(B)), the
    associative/commutative/idempotent merge that makes the sketch safe
    to combine across executors, waves, and resumed crawls."""
    if len(a) != len(b):
        raise ValueError(f"register width mismatch: {len(a)} vs {len(b)}")
    return [x if x >= y else y for x, y in zip(a, b)]


def hll_estimate(regs: list[int]) -> int:
    """Cardinality estimate from a register list.

    Raw estimate in exact integer arithmetic: alpha_m * m^2 /
    sum(2^-M[j]) with the sum carried as the dyadic integer
    S = Σ 2^(33-M[j]) — one integer division, no float.  The paper's
    linear-counting small-range correction (E <= 5m/2 with empty
    registers) uses math.log driver-side; its result is still returned
    as an int."""
    m = len(regs)
    _check_m(m)
    s = sum(1 << (33 - mj) for mj in regs)
    alpha_e3 = _ALPHA_E3.get(m)
    if alpha_e3 is None:  # m >= 128 per the paper's closed form
        alpha_e3 = round(721.3 / (1 + 1.079 / m))
    raw = (alpha_e3 * m * m * (1 << 33)) // (1000 * s)
    v = regs.count(0)
    if v and raw <= (5 * m) // 2:
        return round(m * math.log(m / v))
    return raw


def hist_cells(df: DataFrame, col: str, width: int) -> DataFrame:
    """(b, cnt) fixed-width histogram of an integer column — the third
    classic mergeable metric (merge = cellwise addition, like CMS), and
    the scale path for quantiles: a global sort-based exact quantile is
    one total order over the corpus, while the histogram is one keyed
    aggregate of ~range/width cells from which any quantile is read off
    the cumulative sum (error bounded by the bucket width)."""
    return (
        df.select(F.expr(f"{col} DIV {width}").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_expand(
    counts: DataFrame, key_col: str, weight_col: str, d: int, w: int
) -> DataFrame:
    """(key, wt, r, bucket) cell coordinates from a pre-aggregated
    (key, weight) frame: each key lands in one md5-salted bucket per
    sketch row.  Expanding grouped counts is cell-wise IDENTICAL to
    hashing the raw stream (addition commutes through the group-by) and
    keeps the d-way expansion on the tiny per-key frame."""
    return counts.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).alias("wt"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat("key", F.lit("#"), F.col("r").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % w,
    )


def cms_cells(
    counts: DataFrame, key_col: str, weight_col: str, d: int, w: int
) -> DataFrame:
    """(r, bucket, tot) Count-Min sketch from a pre-aggregated
    (key, weight) frame — d*w cells regardless of key cardinality.
    Merging sketches from different executors/waves is cell-wise
    addition; a key's estimate is MIN over its d cells (see the gated
    ``crawl_cms_hotset`` for the lookup shape)."""
    return (
        cms_expand(counts, key_col, weight_col, d, w)
        .groupBy("r", "bucket")
        .agg(F.sum("wt").alias("tot"))
    )
