"""Corpus/seed source readers: schema enforcement and format funnels."""

import os

import pytest

from lopez_spark import fixtures as fx
from lopez_spark.sources.corpus import SchemaMismatch, load_images, read_seed_urls
from lopez_spark.streaming.frontier_stream import open_rows_from_urls
from lopez_spark.urlnorm import ParamPolicy


def test_load_images_validates_schema(spark, tmp_path):
    good = str(tmp_path / "images.parquet")
    spark.createDataFrame(fx.images_pandas(10)).write.parquet(good)
    df = load_images(spark, good)
    assert df.columns == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert df.count() == 10

    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame(fx.images_pandas(3)).drop("phash").write.parquet(bad)
    with pytest.raises(SchemaMismatch, match="phash"):
        load_images(spark, bad)


def test_seed_readers_feed_frontier_rows(spark, tmp_path):
    txt = str(tmp_path / "seeds.txt")
    with open(txt, "w") as f:
        f.write("https://A.Example.Test/x#f\nnot-a-url\nhttps://a.example.test/x\n")
    rows = open_rows_from_urls(read_seed_urls(spark, txt), ParamPolicy()).collect()
    urls = {r["url"] for r in rows}
    assert urls == {"https://a.example.test/x"} or len(urls) == 1  # canonical + dedup downstream

    jsonl = str(tmp_path / "seeds.jsonl")
    with open(jsonl, "w") as f:
        f.write('{"url": "https://b.example.test/y"}\n')
    got = open_rows_from_urls(read_seed_urls(spark, jsonl, "jsonl"), ParamPolicy()).collect()
    assert got[0]["url"] == "https://b.example.test/y"
    assert got[0]["status"] == "open" and got[0]["depth"] == 0

    csv = str(tmp_path / "seeds.csv")
    with open(csv, "w") as f:
        f.write("url\nhttps://c.example.test/z\n")
    got = open_rows_from_urls(read_seed_urls(spark, csv, "csv"), ParamPolicy()).collect()
    assert got[0]["url"] == "https://c.example.test/z"
