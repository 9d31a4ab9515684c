"""Capture the UN-checkpointed iterative plans of the graph family
(pagerank / hits / opic / lpa over the gated orders-derived 200-node
graph) into plans/r06/graph_<name>_iter_<suffix>.txt — the gated
queries end in an eager localCheckpoint, which hides the iteration
internals from the final frame's explain.

Usage: python scripts/capture_graph_plans.py <suffix> <out_dir>
Run from any checkout (worktree of the round-start commit = "before").
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lopez_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    out_dir = sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_graph_plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    edges = orders.select(
        (F.col("o_custkey") % 200).alias("src"),
        (F.col("o_orderkey") % 200).alias("dst"),
    ).distinct()

    from lopez_spark.graph.hits import hits
    from lopez_spark.graph.lpa import label_propagation
    from lopez_spark.graph.opic import opic
    from lopez_spark.graph.pagerank import pagerank

    # 2 iterations, not the gated 8: the un-checkpointed lineage
    # duplicates the rank subtree per iteration (dangling + contribs
    # both reference it), so an 8-deep explain is tens of MB while the
    # per-iteration STRUCTURE — the thing the before/after diff shows —
    # is identical at depth 2
    frames = {
        "pagerank": pagerank(
            edges, src="src", dst="dst", partitions=8, checkpoint=False,
            iterations=2,
        ),
        "hits": hits(edges, checkpoint=False, iterations=2),
        "opic": opic(edges, checkpoint=False, iterations=2),
        "lpa": label_propagation(edges, checkpoint=False, iterations=2),
    }
    for name, df in frames.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"graph_{name}_iter_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote graph_{name}_iter_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
