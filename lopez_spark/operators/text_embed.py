"""Feature-hashing ("hashing trick") text embedder — Weinberger et al.
2009, *Feature Hashing for Large Scale Multitask Learning* §3: token t
contributes xi(t) ∈ {-1, +1} to component h(t) mod d, giving an
unbiased sparse projection whose inner products approximate the
bag-of-words kernel.  This is the CLIP-side text featurizer of the
`curation_clip_align` gate query (LAION-style image–text alignment
filtering) — the production swap-in is a real text encoder; the
hashing embedder is the deterministic, engine-checkable stand-in with
the same Spark plumbing (per-token explode → one keyed aggregate).

Everything is integer-exact and JVM-side:

* h(t)   = first 8 md5 hex digits of the token, as an int (the same
  md5-device used by the seen-set, LSH and k-means|| hashes — and
  reproducible verbatim in DuckDB via CAST('0x' || substr(md5(tk),1,8)
  AS BIGINT));
* bucket = h mod d,  sign = +1 if (h div d) is even else -1;
* weight w(doc, bucket) = SUM(sign) over the doc's tokens — an
  integer, so the aggregation is order-independent and the
  cross-engine value-hash is exact (no float summation anywhere).

Scale shape: one explode (linear in corpus tokens) feeding one
map-side-combinable groupBy((doc, bucket)) — the same one-shuffle
profile as word count; d stays a constant.

Reference: beyond-reference op (lopez has no embedder); spec is the
public hashing-trick construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIMS = 64  # matches the synthetic embeddings table's dimensionality


def hash_embed(
    docs: DataFrame,
    d: int = DIMS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) -> sparse integer embedding in long form
    (id, bucket, w) with 0 <= bucket < d and w = signed token count.
    Zero-weight buckets are kept iff tokens hashed there cancelled —
    identical in both engines, so the gate compares them too."""
    tok = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tk")
    ).filter(F.col("tk") != "")
    hashed = tok.select(
        id_col,
        F.conv(F.substring(F.md5("tk"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    return (
        hashed.select(
            id_col,
            (F.col("h") % d).alias("bucket"),
            F.when(F.expr(f"(h DIV {d}) % 2 = 0"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("s"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("s").alias("w"))
    )
