"""Graph-scale measurement (BENCH §7): PageRank + connected components
on a 10^7-edge synthetic graph (10^6 nodes x out-degree 10), generated
JVM-side on executors — nothing graph-sized ever touches the driver.

Standalone (not part of bench.py's per-round line) so the driver bench
stays fast; run `python scripts/graph_bench.py` to reproduce.  Self
checks: rank mass sums to 1 (dangling mass conserved) and the random
10-regular graph is one giant component."""
import os, sys, time

os.environ.setdefault("SPARK_GRAFT_MASTER", "local[8]")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from lopez_spark.session import get_spark
from lopez_spark.graph.pagerank import pagerank
from lopez_spark.graph.concomp import (
    connected_components,
    connected_components_alternating,
)

NODES = 1_000_000
DEG = 10

spark = get_spark("graph-bench")
spark.sparkContext.setLogLevel("ERROR")

ids = spark.range(NODES).select(F.col("id").alias("src"))
edges = (
    ids.select("src", F.explode(F.sequence(F.lit(0), F.lit(DEG - 1))).alias("k"))
    .select("src", F.pmod(F.xxhash64("src", "k"), F.lit(NODES)).alias("dst"))
    .repartition(32, "src")
    .persist()
)
n_edges = edges.count()

t0 = time.monotonic()
ranks = pagerank(edges, src="src", dst="dst")
rank_sum, n_nodes = ranks.agg(F.sum("rank"), F.count(F.lit(1))).first()
pr_wall = time.monotonic() - t0

t1 = time.monotonic()
nodes = ids.select(F.col("src").alias("node"))
comp = connected_components_alternating(edges, nodes, src="src", dst="dst")
n_comp = comp.agg(F.countDistinct("comp")).first()[0]
cc_wall = time.monotonic() - t1

# min-label propagation kept for comparison (rounds = diameter; the
# alternating-star number above is the headline)
t2 = time.monotonic()
comp_ml = connected_components(edges, nodes, src="src", dst="dst")
n_comp_ml = comp_ml.agg(F.countDistinct("comp")).first()[0]
cc_ml_wall = time.monotonic() - t2
assert n_comp_ml == n_comp

print({"edges": n_edges, "nodes": n_nodes,
       "pagerank_wall_s": round(pr_wall, 1),
       "pagerank_edges_per_s": round(n_edges * 8 / pr_wall),
       "rank_sum": round(rank_sum, 9),
       "concomp_wall_s": round(cc_wall, 1),
       "concomp_minlabel_wall_s": round(cc_ml_wall, 1),
       "n_components": n_comp})
