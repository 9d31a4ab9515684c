"""Freshness-driven recrawl scheduling (engine surface of the gated
``crawl_recrawl_priority`` analysis query).

The reference's wave model crawls each URL exactly once per crawl
(``lib-lopez/src/crawler`` has no revisit concept); production crawling
is a steady state of REVISITS prioritized by how often each page
actually changes.  The estimator here is the bias-corrected Poisson
change-rate of Cho & Garcia-Molina 2003 ("Estimating frequency of
change", ACM ToIT 3(3), eq. 4):

    r_hat = -ln((n - X + 0.5) / (n + 0.5))

with ``n`` observations of which ``X`` saw the page changed, scaled by
the observation frequency to a per-day rate.  The SQL text of the
estimator is shared VERBATIM between this module, the Spark plans
built here, and the DuckDB oracle of the gated query — one expression,
three consumers, zero drift.

Scale shape: ``change_rates`` is one groupBy(url_hash) over the fetch
history (the same key the frontier is partitioned by) followed by
whole-stage-codegen arithmetic; ``recrawl_seeds`` is a broadcast-free
keyed join of the frontier against the rate table and flips matching
rows back to ``open`` — the resumed engine then refetches exactly
those rows through the ordinary wave loop, seen-set dedup keeping
already-known links from re-entering the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# e6-quantized per-day change rate.  Shared verbatim with the gated
# query's oracle (plans/driver_queries.py imports these constants).
# Inputs: n_obs (BIGINT >= 2), n_changed (BIGINT), span_us (BIGINT > 0,
# max(ts) - min(ts) of the observations in microseconds); the
# (n_obs - 1) / span_us factor is the mean observation frequency over
# the n_obs - 1 inter-visit intervals.
LAMBDA_EXPR = (
    "CAST(ROUND(1000000.0 * (-LN((CAST(n_obs - n_changed AS DOUBLE) + 0.5)"
    " / (CAST(n_obs AS DOUBLE) + 0.5)))"
    " * CAST(n_obs - 1 AS DOUBLE) * 86400000000.0"
    " / CAST(span_us AS DOUBLE)) AS BIGINT)"
)

# revisit tiers over the e6 rate: 0 = hottest (revisit every cycle)
# ... 3 = coldest.  Thresholds are policy, not estimator: adjust per
# deployment crawl budget.
TIER_EXPR = (
    "CAST(CASE WHEN lambda_e6 >= 500000 THEN 0"
    " WHEN lambda_e6 >= 300000 THEN 1"
    " WHEN lambda_e6 >= 150000 THEN 2"
    " ELSE 3 END AS INTEGER)"
)


def change_rates(
    history: DataFrame,
    key_col: str = "url_hash",
    ts_us_col: str = "ts_us",
    changed_col: str = "changed",
) -> DataFrame:
    """Per-URL change-rate estimate from a fetch history of
    (key, observation timestamp in µs, changed-since-last-visit bool)
    rows → (key, n_obs, n_changed, span_us, lambda_e6, tier).

    URLs with fewer than 2 observations or a zero observation span
    carry no rate information and are dropped — a deployment treats
    absent keys as "never re-observed" and schedules them by a
    default-tier policy instead."""
    per = history.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.count(F.when(F.col(changed_col), 1)).alias("n_changed"),
        (F.max(ts_us_col) - F.min(ts_us_col)).alias("span_us"),
    )
    lam = per.where("n_obs >= 2 AND span_us > 0").withColumn(
        "lambda_e6", F.expr(LAMBDA_EXPR)
    )
    return lam.withColumn("tier", F.expr(TIER_EXPR))


def recrawl_seeds(
    frontier: DataFrame, rates: DataFrame, max_tier: int, key_col: str = "url_hash"
) -> DataFrame:
    """Re-open the frontier rows whose change-rate tier is at most
    ``max_tier`` (a budget knob: 0 = only the hottest pages).

    Input is a completed crawl's frontier (load_frontier); output is
    the same frontier with selected ``closed`` rows flipped back to
    ``open`` (http_status cleared) — feed it to a fresh wave store (or
    the same store's next crawl) and resume: the engine refetches
    exactly those rows, while the untouched rows keep acting as the
    seen set so stale links cannot re-enter.

    The join is keyed on the frontier's own partition key, and the
    rate table is aggregated (one row per URL) — at 10^10 URLs this is
    one co-partitioned shuffle, no broadcast of anything URL-sized."""
    sel = rates.where(F.col("tier") <= max_tier).select(
        F.col(key_col), F.lit(True).alias("_revisit")
    )
    out_cols = frontier.columns
    joined = frontier.join(sel, key_col, "left")
    # pin the predicate as a column FIRST: a when() referencing
    # `status` after the status update would read the flipped value
    revisit = joined.withColumn(
        "_do", F.col("_revisit").isNotNull() & (F.col("status") == "closed")
    )
    return (
        revisit.withColumn(
            "status", F.when(F.col("_do"), F.lit("open")).otherwise(F.col("status"))
        )
        .withColumn(
            "http_status",
            F.when(F.col("_do"), F.lit(None).cast("int")).otherwise(
                F.col("http_status")
            ),
        )
        .select(*out_cols)
    )
