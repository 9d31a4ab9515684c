"""Analyses (DSL) throughput measurement (BENCH §9): the compiled
select/aggregator/transformer pipeline over 10^6 synthesized pages.

The reference folds selector matches through aggregators one page at a
time inside each worker (``directives.rs:577-614``); here the whole
rule set compiles to native Column expressions (whole-stage codegen,
zero Python), so analysis throughput is a pure JVM scan.  Pages are
synthesized executor-side from ``spark.range`` (image_id / dims /
caption derived arithmetically — never materialized on the driver).

Usage: python scripts/analyses_bench.py [n_pages]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lopez_spark.analyses import Analyzer, elements_column  # noqa: E402
from lopez_spark.directives.parser import parse_directives  # noqa: E402
from lopez_spark.session import get_spark  # noqa: E402

LCD = r"""
select html {
    page-hash: first(html hash);
    caption: first(text);
    noun: first(text capture "a photo of (\w+)" get "1");
    words: sum(text length);
    pretty-cap: first(text pretty);
}
select img {
    width: first(attr "width" as-number);
    height: sum(attr "height" as-number);
    fmt-ok: count(attr "fmt" in ["raw", "qraw"]);
}
select p.caption {
    n-captions: count;
    cap-hash: first(text hash);
}
select * { n-elements: count; }
"""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    spark = get_spark("analyses-bench", master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    directives = parse_directives(LCD)
    analyzer = Analyzer(directives)
    n_rules = len(analyzer.schema)

    pages = spark.range(0, n_pages, 1, 32).select(
        F.concat(F.lit("img-"), F.lpad(F.col("id").cast("string"), 8, "0")).alias(
            "image_id"
        ),
        (F.col("id") % 48 + 16).cast("int").alias("w"),
        (F.col("id") % 37 + 16).cast("int").alias("h"),
        F.when(F.col("id") % 3 == 0, F.lit("raw")).otherwise(F.lit("qraw")).alias(
            "fmt"
        ),
        F.concat(
            F.lit("a photo of object"),
            (F.col("id") % 1000).cast("string"),
            F.lit(" in scene "),
            F.col("id").cast("string"),
        ).alias("caption"),
    )
    with_dom = pages.select(
        "image_id",
        F.concat(F.lit("https://bench.test/"), F.col("image_id")).alias("url"),
        elements_column(
            F.col("image_id"), F.col("w"), F.col("h"), F.col("fmt"), F.col("caption")
        ).alias("elements"),
    )

    # untimed warm-up (whole-stage codegen compile)
    analyzer.apply(with_dom.limit(10_000)).drop("elements").write.mode(
        "overwrite"
    ).format("noop").save()

    t0 = time.time()
    analyzer.apply(with_dom).drop("elements").write.mode("overwrite").format(
        "noop"
    ).save()
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "n_rules": n_rules,
                "wall_s": round(wall, 2),
                "pages_per_s": round(n_pages / wall),
                "rule_values_per_s": round(n_pages * n_rules / wall),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
