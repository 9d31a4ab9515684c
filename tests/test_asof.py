"""As-of join semantics on adversarial fixtures: exact probe/ref ties
(ASOF's `>=` must match the equal-ts ref), duplicate ref timestamps,
probes with no eligible ref (dropped), interleaved users — the Spark
union+window implementation vs a pure-Python scan."""

from pyspark.sql import Window
from pyspark.sql import functions as F


def asof_py(probes, refs):
    """probes/refs: [(user, ts_us)] → {(user, probe_ts): matched_ref_ts}
    with ASOF `probe.ts >= ref.ts` / latest-ref semantics."""
    out = {}
    by_user = {}
    for u, ts in refs:
        by_user.setdefault(u, []).append(ts)
    for u in by_user:
        by_user[u].sort()
    for u, ts in probes:
        cand = [r for r in by_user.get(u, []) if r <= ts]
        if cand:
            out[(u, ts)] = cand[-1]
    return out


def asof_spark(spark, probes, refs):
    a = spark.createDataFrame(
        [(u, t, i) for i, (u, t) in enumerate(probes)], "user_id long, ts long, pid long"
    ).select(
        "user_id", "ts", "pid",
        F.lit(None).cast("long").alias("ref_ts"), F.lit(0).alias("is_ref"),
    )
    b = spark.createDataFrame(refs, "user_id long, ts long").select(
        "user_id", "ts", F.lit(None).cast("long").alias("pid"),
        F.col("ts").alias("ref_ts"), F.lit(1).alias("is_ref"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_ref").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rows = (
        a.unionByName(b)
        .withColumn("m_ts", F.last("ref_ts", ignorenulls=True).over(w))
        .filter((F.col("is_ref") == 0) & F.col("m_ts").isNotNull())
        .select("user_id", "ts", "m_ts")
        .collect()
    )
    return {(r["user_id"], r["ts"]): r["m_ts"] for r in rows}


def test_asof_ties_nomatch_and_dup_refs(spark):
    refs = [
        (1, 100), (1, 100),          # duplicate ref ts
        (1, 200), (1, 500),
        (2, 50),
        (3, 999),                    # user with refs but later than probes
    ]
    probes = [
        (1, 100),   # exact tie → matches ref at 100
        (1, 99),    # before every ref → dropped
        (1, 200),   # tie with second ref
        (1, 201), (1, 499), (1, 500), (1, 10_000),
        (2, 50), (2, 49), (2, 51),
        (3, 1),     # no eligible ref → dropped
        (4, 123),   # user with no refs at all → dropped
    ]
    got = asof_spark(spark, probes, refs)
    want = asof_py(probes, refs)
    assert got == want
    assert (1, 100) in want and want[(1, 100)] == 100  # tie matched
    assert (1, 99) not in want and (4, 123) not in want  # drops happened
