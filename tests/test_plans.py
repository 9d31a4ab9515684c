"""Physical-plan regression guards: column pruning, filter pushdown,
broadcast joins, and no accidental Python in the oracle queries'
plans (these properties are what make the queries viable at 100 TB)."""

import re

import pytest

from lopez_spark.plans.driver_queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def test_column_pruning(spark):
    # f2 needs 2 of events' 6 columns; dedup_exact 2 of documents' 5
    schemas = read_schemas(plan_of(spark, "f2_priority_batch"))
    assert any(s.count(":") == 2 and "event_id" in s and "user_id" in s for s in schemas)
    schemas = read_schemas(plan_of(spark, "dedup_exact"))
    assert any("doc_id" in s and "text" in s and "lang" not in s for s in schemas)


def test_column_pruning_text_queries(spark):
    # the token/shingle queries must scan only (doc_id, text) of
    # documents' 5 columns — a scan reading lang/source/n_chars for a
    # 2-column need is wrong at 100 TB
    for name in ("dedup_substring_spans", "dedup_winnowing"):
        schemas = read_schemas(plan_of(spark, name))
        assert any(
            "doc_id" in s and "text" in s and "lang" not in s and "source" not in s
            for s in schemas
        ), name


def test_filter_pushdown(spark):
    plan = plan_of(spark, "f4_seen_antijoin")
    assert "LessThan(c_acctbal,0.0)" in plan
    plan = plan_of(spark, "ann_cosine_topk")
    assert "LessThan(vec_id,5)" in plan


def test_broadcast_joins(spark):
    assert "BroadcastHashJoin" in plan_of(spark, "f4_seen_antijoin")
    assert "BroadcastHashJoin" in plan_of(spark, "bfs_wave2")
    p = plan_of(spark, "ann_ivf_topk")
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


# queries whose plans legitimately contain Python stages (Arrow-batched
# mapInPandas over binary payloads / iterative drivers with their own
# plan lifecycles) — everything else must be pure JVM
_PYTHON_OK = {
    "multimodal_decode_stats",
    "dedup_components",
    "image_caption_curation",
    # Arrow-batched band-cogroup probe (bloom bits are binary buffers;
    # the exact-verify join stays JVM-side)
    "f4_seen_banded",
    # iterative star-contraction clustering (same lifecycle as
    # dedup_components)
    "image_dedup_pipeline",
    # Arrow decode stage over JPEG payloads (binary codec work)
    "multimodal_jpeg_stats",
}


def test_no_python_in_oracle_query_plans(spark):
    """EVERY oracle-checked query must stay JVM-side (no
    ArrowEvalPython / BatchEvalPython nodes), except the documented
    binary-payload / iterative ones."""
    for name in QUERIES:
        if name in _PYTHON_OK:
            continue
        plan = plan_of(spark, name)
        assert "EvalPython" not in plan, name


def test_no_unbroadcast_cartesian_anywhere(spark):
    """No query may plan a CartesianProduct (a non-broadcast cross
    join) — the join strategy that cannot survive 100×.  Broadcast
    nested-loop joins of deliberately tiny sides (ANN query sets,
    1-row aggregates) are allowed and asserted separately."""
    for name in QUERIES:
        if name in _PYTHON_OK:
            continue
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name


def test_take_ordered_for_limits(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "f2_priority_batch")


def test_dedup_embedding_cosine_has_no_cartesian(spark):
    """The embedding near-dup must be LSH-bucket keyed joins end to end
    (the round-1 all-pairs a_id < b_id join was the one training-
    pipeline plan that could not survive 100×)."""
    plan = plan_of(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_model_side_broadcasts(spark):
    """decontamination's benchmark-gram table is small by construction,
    so it force-broadcasts.  The boilerplate-df and LM-bigram tables
    grow ~linearly with corpus size until vocabulary saturation — they
    must carry NO broadcast hint: Catalyst's size-estimate guard
    (autoBroadcastJoinThreshold) broadcasts them at test scale and
    degrades to a shuffle join at corpus scale, instead of a
    billions-of-rows forced broadcast killing the job."""
    assert "BroadcastHashJoin" in plan_of(spark, "decontamination")
    for name in ("dedup_boilerplate_ngrams", "lm_bigram_novelty"):
        df = QUERIES[name](spark, SF)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, name
        # still broadcast-planned while actually small (the guard, not
        # the hint, makes that call)
        assert "BroadcastHashJoin" in plan_of(spark, name), name


def test_dedup_minhash_single_aggregation(spark):
    """The 8 minhash streams are 8 aggregates of ONE groupBy(doc_id):
    exactly one HashAggregate pair over the shingle stream, and no
    8-way Generate/explode between shingling and signatures."""
    plan = plan_of(spark, "dedup_minhash_lsh")
    # one partial_min(...mh0-ish) aggregate appears; the k-explode
    # (sequence(0, 7)) of round 1 must be gone
    assert "sequence(0, 7" not in plan
    assert plan.count("Generate explode") <= 3  # shingles + band structs (a/b sides)


def test_gopher_rules_match_pure_python_oracle(spark):
    """The Gopher §A1.1 word/line stats on rule-triggering text
    (bullets, ellipses, symbols, stop-words, long/short words) must
    match a from-scratch pure-Python computation of the same rules."""
    import re as _re

    from pyspark.sql import functions as F

    from lopez_spark.plans.driver_queries import (
        _GOPHER_STOPS,
        _TOKENS_EXPR,
        gopher_word_line_stats,
    )

    docs = [
        ("d0", "the cat and the dog have fun with that ball of yarn"),
        ("d1", "- first bullet\n- second bullet\n* third one\nplain line"),
        ("d2", "to be continued...\nand then…\nnormal ending here"),
        ("d3", "### symbols ### everywhere ### #tag"),
        ("d4", "a b c d e f g h i j"),  # mean word length 1
        ("d5", "supercalifragilistic expialidocious pneumonoultramicroscopic"),
        ("d6", "1234 5678 90 42 77"),  # no alphabetic words
        ("d7", "Mixed CASE Words\n• unicode bullet line\nlast..."),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string").select(
        "doc_id", "text", F.expr(_TOKENS_EXPR).alias("tk")
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_word_line_stats(df).collect()}

    for doc_id, text in docs:
        words = [w for w in _re.split(r"\s+", text) if w]
        lines = text.split("\n")
        tk = _re.findall(r"[a-z0-9]+", text)
        n_sym = (
            text.count("#")
            + (len(text) - len(text.replace("...", ""))) // 3
            + text.count("…")
        )
        exp = {
            "nw": len(words),
            "sum_wl": sum(len(w) for w in words),
            "n_alpha": sum(1 for w in words if _re.search(r"[a-zA-Z]", w)),
            "n_lines": len(lines),
            "n_bullet": sum(
                1 for line in lines if _re.match(r"^\s*[-*•]", line)
            ),
            "n_ellip": sum(
                1 for line in lines if _re.search(r"(\.\.\.|…)\s*$", line)
            ),
            "n_sym": n_sym,
            "n_stop": sum(1 for s in _GOPHER_STOPS if s in tk),
        }
        for k, v in exp.items():
            assert got[doc_id][k] == v, (doc_id, k, got[doc_id][k], v)


def test_dsir_model_broadcast_and_ngram_shuffle_count(spark):
    """sample_dsir_weights: the 256-bucket model table must broadcast
    (the fixed-size feature space is the whole point — correct at any
    corpus size, not a size-estimate guess).
    quality_ngram_char_fractions: the 5 n-gram streams ride ONE
    explode — no per-n Generate chains."""
    plan = plan_of(spark, "sample_dsir_weights")
    assert "BroadcastHashJoin" in plan
    plan = plan_of(spark, "quality_ngram_char_fractions")
    assert len(re.findall(r"^\(\d+\) Generate", plan, re.M)) == 1
    # 2 KEYED data shuffles (doc_id,n,g count + doc_id aggregate) + 1
    # broadcast; the round-6 `_par` scan repartition adds round-robin
    # exchanges (one per consumer branch) that carry scan-sized rows,
    # not the exploded gram stream — count hash shuffles only
    assert len(re.findall(r"Arguments: hashpartitioning", plan)) <= 2
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 4


def test_bm25_plan_shape(spark):
    """text_bm25_topk: global top-k must be TakeOrdered (no full sort),
    the df/stats model tables broadcast, and the term filter reaches
    below the explode."""
    plan = plan_of(spark, "text_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_oracle_token_cap_covers_corpus():
    """Every DuckDB oracle enumerates per-document tokens/grams via
    range(2000) (a lateral-join cap) while the Spark side enumerates
    ALL tokens.  That is only sound while no document exceeds 2000
    tokens — guard the corpus invariant loudly at both gate scales so
    a corpus change can never silently diverge the two sides."""
    import duckdb

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        (mx,) = duckdb.sql(
            "SELECT MAX(len(regexp_extract_all(text, '[a-z0-9]+'))) "
            f"FROM read_parquet('{sf}/documents.parquet')"
        ).fetchone()
        assert mx < 2000, (sf, mx)


def test_pq_adc_plan_shape(spark):
    """The docstring's claims, made mechanical (round-4 VERDICT task
    #5): the md5-device ADC scan is ZERO-shuffle — per-row JVM
    expressions with the codebook as literals, the query's LUT joined
    as exactly one 1-row BroadcastExchange, and the top-10 as
    TakeOrderedAndProject (no global sort)."""
    plan = plan_of(spark, "ann_pq_adc")
    body = plan.split("\n\n===== Subqueries =====")[0]
    assert "Exchange hashpartitioning" not in body, "unexpected shuffle in ADC scan"
    n_bcast = len(re.findall(r"\(\d+\) BroadcastExchange", body))
    assert n_bcast == 1, n_bcast
    assert "TakeOrderedAndProject" in body


def test_ivfpq_plan_shape(spark):
    """IVF-PQ: the corpus is never globally re-sorted (window top-5
    per query partition), the LUTs and probe stages ride broadcasts,
    and the only hash shuffles are the window/aggregate stages over
    the PROBED candidates — never over raw embeddings joined to raw
    embeddings (cartesian-free)."""
    plan = plan_of(spark, "ann_ivfpq_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_trained_ivfpq_plan_shape(spark):
    """The trained residual IVFADC query (`ann_ivfpq_trained_topk`)
    keeps the untrained variant's invariants even though both Lloyd's
    fits run first: centroid/codebook/LUT tables join in as
    broadcasts, no cartesian, no Python in the final plan, top-5 via
    a per-query window (never a global sort of raw embeddings)."""
    plan = plan_of(spark, "ann_ivfpq_trained_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_trained_pq_rel_scan_plan(spark):
    """The relational trained-PQ scan (`_pq_adc_rel`): centroid table
    and LUT join in as broadcasts, no cartesian, no Python."""
    from lopez_spark.plans.driver_queries import _PQT_SHORT, _pq_adc_rel
    from lopez_spark.operators.kmeans import pq_kmeans_fit

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    book = pq_kmeans_fit(emb, m=4, k=4, iters=1)  # tiny fit, same plan
    df = _pq_adc_rel(emb, book, _PQT_SHORT)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_triangles_plan_shape(spark):
    """graph_triangles: the docstring's scale claims, mechanical —
    every join broadcasts or hash-partitions (no cartesian), and the
    wedge/closing joins stay JVM-side (no Python anywhere; the whole
    query is joins + aggregates)."""
    plan = plan_of(spark, "graph_triangles")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan


def test_lpa_and_hits_broadcast_score_vectors(spark):
    """graph/lpa.py + graph/hits.py: below the 10^6-node threshold the
    per-round score vector must ride a broadcast into the edge join
    (the partitioned-join fallback is for 10^10-edge graphs only), and
    nothing falls back to Python.  Built with checkpoint=False — the
    gated queries' eager localCheckpoint hides the iterative plan."""
    from pyspark.sql import functions as Fn

    from lopez_spark.graph.hits import hits
    from lopez_spark.graph.lpa import label_propagation

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    edges = orders.select(
        (Fn.col("o_custkey") % 200).alias("src"),
        (Fn.col("o_orderkey") % 200).alias("dst"),
    )
    for df in (
        label_propagation(edges, checkpoint=False),
        hits(edges.distinct(), checkpoint=False),
    ):
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan


def test_patchify_and_augment_single_arrow_pass(spark):
    """image_patchify / image_augment: exactly one Python stage beyond
    the fixture-corpus generator (itself a MapInPandas — hence 2
    total); everything after the decode pass is JVM.  patchify's only
    shuffle is the final per-image aggregate; augment has none."""
    plan = plan_of(spark, "image_patchify")
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2
    # corpus-generator repartition + the per-image aggregate, no more
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
    plan = plan_of(spark, "image_augment")
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2
    # only the corpus-generator repartition — the op itself is
    # shuffle-free
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1


def test_source_mix_single_pass_and_broadcast_totals(spark):
    """sample_source_mix: one data shuffle (the per-source aggregate);
    the grand totals ride 1-row broadcasts, never a re-shuffle of the
    corpus."""
    plan = plan_of(spark, "sample_source_mix")
    body = plan.split("\n\n===== Subqueries =====")[0]
    assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", body)) <= 1
    assert "Python" not in plan


def test_bpe_rounds_jvm_side(spark):
    """bpe_train_merges: 8 rounds of pair-count + fold with zero
    Python stages — the merge application is an aggregate() fold, not
    a UDF."""
    plan = plan_of(spark, "bpe_train_merges")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_clip_align_plan_shape(spark):
    """curation_clip_align: pure JVM (the hashing embedder is
    explode + md5 expressions, not a UDF), no cartesian, and the
    shuffles are the keyed aggregates/joins only — nothing re-sorts
    the corpus globally."""
    plan = plan_of(spark, "curation_clip_align")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # both table scans present with pushed column pruning
    assert len(read_schemas(plan)) >= 2


def test_sitemap_ingest_single_arrow_pass(spark):
    """crawl_sitemap_ingest: exactly one Python stage (the per-file
    parse), zero shuffles — a discovery sweep is embarrassingly
    parallel."""
    plan = plan_of(spark, "crawl_sitemap_ingest")
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "Exchange" not in plan


def test_leakage_split_adds_no_shuffle(spark):
    """sample_leakage_split: the split column is a per-row hash on top
    of text_dedup_pipeline's plan — same number of hash-partition
    exchanges as the base pipeline, no Python anywhere."""
    base = plan_of(spark, "text_dedup_pipeline")
    split = plan_of(spark, "sample_leakage_split")
    n = r"\(\d+\) Exchange hashpartitioning"
    assert len(re.findall(n, split)) == len(re.findall(n, base))
    assert "Python" not in split.replace("MapInPandas", "")  # no UDF stages


def test_trap_detect_single_shuffle_jvm_only(spark):
    """crawl_trap_detect: URL synthesis + template regexps are pure
    codegen expressions; the COUNT(DISTINCT) aggregate compiles to
    partial-aggregated exchanges on the (host, template) key only —
    no Python, no cartesian, no global sort."""
    plan = plan_of(spark, "crawl_trap_detect")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    # count-distinct rewrites to two keyed exchanges (partial + final),
    # never more — both on the grouping key, nothing row-global
    n = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert 1 <= len(n) <= 2, n
    assert "SinglePartition" not in plan


def test_recrawl_priority_single_shuffle_jvm_only(spark):
    """crawl_recrawl_priority: one groupBy(url_id) shuffle; the Cho &
    Garcia-Molina estimator and tier CASE are whole-stage-codegen JVM
    expressions (the SQL text is shared verbatim with the oracle)."""
    plan = plan_of(spark, "crawl_recrawl_priority")
    assert "Python" not in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "SinglePartition" not in plan
    # only the 3 needed columns reach the events scan
    (schema,) = read_schemas(plan)
    assert "event_id" in schema and "ts" in schema and "event_type" in schema
    assert "props" not in schema and "value" not in schema


def test_etld1_jvm_only_single_groupby(spark):
    """crawl_etld1_domains: the PSL longest-match compiles to pure
    codegen CASE/IN expressions (zero-shuffle extraction); the only
    exchanges are the count-distinct groupBy pair on the
    (public_suffix, etld1) key."""
    plan = plan_of(spark, "crawl_etld1_domains")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    n = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert 1 <= len(n) <= 2, n


def test_shard_assign_no_explosion_two_keyed_shuffles(spark):
    """crawl_shard_assign: the HRW 8-way arg-max is one per-row
    array_max(transform(...)) expression — NO Generate (explode)
    node, no Python; exactly the two keyed groupBy exchanges (host
    rollup, shard rollup)."""
    plan = plan_of(spark, "crawl_shard_assign")
    assert "Python" not in plan
    assert "Generate" not in plan  # no 8x row explosion
    assert "SinglePartition" not in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 2


def test_dust_rules_plan_shape(spark):
    """crawl_dust_rules: the mining is JVM-only and cartesian-free;
    the parse explode appears in exactly the two evidence branches
    (param rows + the per-host name list — the paramless-twin branch
    reads the thin input directly, no Generate), and the name list
    joins in as a broadcast."""
    plan = plan_of(spark, "crawl_dust_rules")
    assert "Python" not in plan
    assert len(re.findall(r"^\(\d+\) Generate", plan, re.M)) == 2
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_trustrank_iteration_broadcasts_rank_vector(spark):
    """The personalized-PageRank iteration keeps the ≤10^6-node
    broadcast strategy (rank/teleport vectors broadcast into the edge
    join, dangling mass a 1-row broadcast → one keyed shuffle per
    iteration, never a cartesian).  Checked on the un-truncated plan
    (checkpoint=False) because the gated query's eager localCheckpoint
    hides the iteration internals; the gated plan itself is pinned
    cartesian-free by the registry-wide guard above."""
    from pyspark.sql import functions as F

    from lopez_spark.graph.pagerank import pagerank

    edges = spark.range(0, 60).select(
        (F.col("id") % 20).alias("src"), ((F.col("id") * 7) % 20).alias("dst")
    )
    tele = spark.range(0, 3).select(
        (F.col("id") * 5).alias("node"), F.lit(1.0 / 3).alias("tele")
    )
    df = pagerank(edges, src="src", dst="dst", teleport=tele, checkpoint=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_opic_iteration_broadcasts_state_vector(spark):
    """The OPIC cash/history iteration inherits the PageRank join
    strategy: below 10^6 nodes the state vector broadcasts into the
    edge join (one keyed shuffle per step — the groupBy), dangling
    cash folds in as a 1-row broadcast, never a cartesian.  Checked on
    the un-truncated plan (checkpoint=False); the gated graph_opic
    plan is pinned Python- and cartesian-free by the registry-wide
    guards."""
    from pyspark.sql import functions as F

    from lopez_spark.graph.opic import opic

    edges = spark.range(0, 60).select(
        (F.col("id") % 20).alias("src"), ((F.col("id") * 7) % 20).alias("dst")
    )
    df = opic(edges, checkpoint=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_anchor_text_plan_shape(spark):
    """crawl_anchor_text: ONE bounded-slice explode (a single Generate
    — never an explode of whole documents), keyed joins only, and the
    documents scan pruned to (doc_id, text) of its 5 columns."""
    plan = plan_of(spark, "crawl_anchor_text")
    assert "Python" not in plan
    assert len(re.findall(r"^\(\d+\) Generate", plan, re.M)) == 1
    assert "CartesianProduct" not in plan
    schemas = read_schemas(plan)
    assert any(
        "doc_id" in s and "text" in s and "lang" not in s and "source" not in s
        for s in schemas
    )


def test_paragraph_dedup_plan_shape(spark):
    """dedup_paragraph: one Generate (the posexplode), then exactly the
    three keyed repartitions CCNet's distribution uses — segment
    assembly on (doc_id, seg), the global first-wins window on the
    segment hash h, and the per-doc re-aggregation — no cartesian, no
    Python."""
    plan = plan_of(spark, "dedup_paragraph")
    assert "Python" not in plan
    assert len(re.findall(r"^\(\d+\) Generate", plan, re.M)) == 1
    assert "CartesianProduct" not in plan
    assert re.search(r"hashpartitioning\(doc_id[^)]*, seg", plan)
    assert re.search(r"hashpartitioning\(h#", plan)


def test_cdc_chunks_plan_shape(spark):
    """dedup_cdc_chunks: the whole chunker (boundary scan, spans, chunk
    hashes) is ONE per-row array projection — exactly one Generate, no
    per-doc window shuffle before it, no Python, no cartesian; the only
    exchanges are the chunk-hash groupBy/join and the per-doc
    re-aggregation, and the documents scan is pruned to (doc_id,
    text)."""
    plan = plan_of(spark, "dedup_cdc_chunks")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"^\(\d+\) Generate", plan, re.M)) == 1
    assert "Window" not in plan  # chunking never shuffles per-doc rows
    assert re.search(r"hashpartitioning\(ch#", plan)
    assert re.search(r"hashpartitioning\(doc_id#", plan)
    schemas = read_schemas(plan)
    assert any(
        "doc_id" in s and "text" in s and "lang" not in s and "source" not in s
        for s in schemas
    )


def test_bpe_encode_plan_shape(spark):
    """bpe_encode_tokens: the encoded vocabulary broadcast-joins onto
    the document token stream (never a shuffle join on word, never a
    per-occurrence re-fold), no Python anywhere, and the final per-doc
    re-aggregation is keyed on doc_id."""
    plan = plan_of(spark, "bpe_encode_tokens")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert not re.search(r"hashpartitioning\(word#", plan)
    assert re.search(r"hashpartitioning\(doc_id#", plan)


def test_perceptron_plan_shape(spark):
    """quality_perceptron: the trained weight vector rides in the scoring
    plan as a LITERAL array (parameter-server-free — model broadcast by
    value, never a join), the persisted feature table is reused across
    rounds (InMemoryTableScan), the only exchange is the per-doc margin
    aggregate, and nothing drops to Python or a cartesian."""
    plan = plan_of(spark, "quality_perceptron")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # fy built once, scored from cache
    # The scoring tree sits above the cached feature build in the
    # formatted explain; everything before the InMemoryRelation is the
    # per-round margin pass and must be join-free with ONE exchange.
    scoring = plan.split("InMemoryRelation", 1)[0]
    assert "Join" not in scoring  # weights are a literal array, not a table
    assert scoring.count("Exchange") == 1
    assert len(re.findall(r"hashpartitioning\(doc_id#", plan)) >= 1


def test_hll_registers_plan_shape(spark):
    """crawl_hll_registers: the whole sketch rides two keyed aggregates
    over a two-column pruned event scan — rho/idx computed map-side
    (pure codegen md5/conv/bin), partial MAX before the (host, idx)
    shuffle, and no Python/cartesian anywhere."""
    plan = plan_of(spark, "crawl_hll_registers")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    schemas = read_schemas(plan)
    assert any(
        s.count(":") == 2 and "event_id" in s and "user_id" in s for s in schemas
    )
    assert re.search(r"hashpartitioning\(host#", plan)


def test_cms_hotset_plan_shape(spark):
    """crawl_cms_hotset: ONE aggregate touches the event scan (pruned to
    user_id alone); the cell expansion / sketch / min-join all run on
    the tiny per-host frame, with the 256-cell sketch broadcast."""
    plan = plan_of(spark, "crawl_cms_hotset")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # sketch side broadcast
    schemas = read_schemas(plan)
    assert any(s.count(":") == 1 and "user_id" in s for s in schemas)


def test_bloom_fpr_plan_shape(spark):
    """f4_seen_bloom_fpr: the bit-set is built map-side (4-way explode
    + distinct) and BROADCAST into the probe join — the broadcast-bloom
    tier's shape; the only cartesians are the 1-row scalar assembly
    (BroadcastNestedLoopJoin), never an unbroadcast CartesianProduct;
    the event scan is pruned to event_id alone."""
    plan = plan_of(spark, "f4_seen_bloom_fpr")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # probe bits x broadcast bit-set
    schemas = read_schemas(plan)
    assert any(s.count(":") == 1 and "event_id" in s for s in schemas)
    assert "PushedFilters: [IsNotNull(event_id)" in plan


def test_quantile_hist_plan_shape(spark):
    """quantile_hist_sketch: the sketch side is ONE keyed aggregate over
    a 1-column pruned scan into ~range/8 cells; the quantile probe is a
    broadcast join on the tiny cumulative frame; no Python; the only
    global sort is the instrument's truth column."""
    plan = plan_of(spark, "quantile_hist_sketch")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    schemas = read_schemas(plan)
    assert any(s.count(":") == 1 and "n_chars" in s for s in schemas)
    assert "BroadcastNestedLoopJoin" in plan  # non-equi quantile probes
