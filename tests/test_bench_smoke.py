"""Smoke-guard for the benchmark harness: a tiny wave through
run_wave_bench must produce consistent counts — bench.py failures at
measurement time are expensive, so the harness is pytest-guarded."""

from lopez_spark.plans.bench_wave import run_wave_bench


def test_wave_bench_smoke(spark):
    r = run_wave_bench(
        spark,
        parallelism=4,
        frontier_rows=5_000,
        corpus_n=100_000,
        batch_size=4_000,
        partitions=8,
    )
    assert r["frontier_rows"] == 5_000
    assert r["urls_fetched"] == 4_000  # the full batch was processed
    assert r["new_urls_deduped"] > 0
    assert r["elapsed_s"] > 0 and r["urls_per_sec"] > 0


def test_wave_bench_bloom_off_same_counts(spark):
    """The bloom fast path must not change WHAT is discovered."""
    a = run_wave_bench(
        spark, parallelism=4, frontier_rows=5_000, corpus_n=100_000,
        batch_size=4_000, use_bloom=True, partitions=8,
    )
    b = run_wave_bench(
        spark, parallelism=4, frontier_rows=5_000, corpus_n=100_000,
        batch_size=4_000, use_bloom=False, partitions=8,
    )
    assert a["new_urls_deduped"] == b["new_urls_deduped"]
    assert a["urls_fetched"] == b["urls_fetched"]
