"""Corpus and seed sources (operators S5/S6 read side).

The crawl corpus is an Iceberg-style table of image+caption pairs
(BASELINE.json input_hint).  ``load_images`` validates the mandated
schema on read so downstream stages can rely on it; seed readers accept
the formats a crawl operator actually has (plain text, jsonl, csv) and
funnel into the same canonicalization path as the directives' ``seed``
items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)


class SchemaMismatch(Exception):
    pass


def load_images(spark: SparkSession, path: str) -> DataFrame:
    """Read the image+caption corpus (parquet; an Iceberg table when a
    runtime jar is present) and enforce the input_hint schema."""
    if path.startswith("iceberg:"):  # pragma: no cover - no jar in sandbox
        df = spark.read.format("iceberg").load(path[len("iceberg:") :])
    else:
        df = spark.read.parquet(path)
    want = {f.name: f.dataType.simpleString() for f in IMAGES_SCHEMA.fields}
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = {k: v for k, v in want.items() if got.get(k) != v}
    if missing:
        raise SchemaMismatch(
            f"corpus at {path} does not match the input_hint schema; "
            f"mismatched fields: {missing}; got: {got}"
        )
    return df.select(*want.keys())


def read_seed_urls(spark: SparkSession, path: str, fmt: str = "text") -> DataFrame:
    """Seed URLs as a one-column ('value') DataFrame.
    fmt: text (one URL per line) | jsonl (field 'url') | csv (column 'url')."""
    if fmt == "text":
        return spark.read.text(path)
    if fmt == "jsonl":
        return spark.read.json(path).select(F.col("url").alias("value"))
    if fmt == "csv":
        return spark.read.option("header", "true").csv(path).select(
            F.col("url").alias("value")
        )
    raise ValueError(f"unknown seed format {fmt!r}")
