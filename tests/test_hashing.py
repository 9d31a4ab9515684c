"""Parity of the pure-Python XXH64 (oracle side) with Spark's built-in
``F.xxhash64`` (executor side) — the engine's page-id contract."""

from pyspark.sql import functions as F

from lopez_spark.hashing import umod, xxhash64_long, xxhash64_str

STRINGS = [
    "",
    "a",
    "abc",
    "hello world",
    "https://h0.example.test/img-00000000",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "x" * 100,
    "héllo ünïcode ✓",
    "img-00000042#7",
]

LONGS = [0, 1, -1, 42, 2**62, -(2**62), 123456789, -(1 << 63)]


def test_xxhash64_str_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    for s in STRINGS:
        assert xxhash64_str(s) == got[s], s


def test_xxhash64_long_matches_spark(spark):
    df = spark.createDataFrame([(x,) for x in LONGS], ["x"]).select(
        "x", F.xxhash64("x").alias("h")
    )
    got = {r["x"]: r["h"] for r in df.collect()}
    for x in LONGS:
        assert xxhash64_long(x) == got[x], x


def test_umod_non_negative():
    for s in STRINGS:
        h = xxhash64_str(s)
        assert 0 <= umod(h, 37) < 37
