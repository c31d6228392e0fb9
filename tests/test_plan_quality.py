"""Plan-quality regression tests: the wrapper must not defeat Catalyst.

These assert on the *physical plan*, not results: filters and projections
must reach the Parquet scan through the TableFrame/system-column layer, and
dimension joins must broadcast.  If a wrapper change breaks one of these,
correctness tests stay green while 100 TB behavior regresses — this is the
canary.
"""

from __future__ import annotations

import pyspark.sql.functions as F

import tabsdata_spark as td


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    out = li.filter(td.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _plan(out.df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    out = li.select("l_orderkey", "l_quantity")
    plan = _plan(out.df)
    # ReadSchema must contain only the two referenced columns
    rs = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs and "l_shipdate" not in rs


def test_dimension_join_broadcasts(spark, sf_dir):
    li = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    pt = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/part.parquet"))
    j = li.join(pt, left_on="l_partkey", right_on="p_partkey")
    assert "BroadcastHashJoin" in _plan(j.df)


def test_aggregation_is_partial_final(spark, sf_dir):
    li = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    out = li.group_by("l_returnflag").agg(s=td.col("l_quantity").sum())
    plan = _plan(out.df)
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_limit_becomes_take_ordered(spark, sf_dir):
    od = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/orders.parquet"))
    out = od.sort("o_totalprice", descending=True).limit(5)
    # global sort + limit must fuse into TakeOrderedAndProject (no full sort)
    assert "TakeOrderedAndProject" in _plan(out.df)


def test_whole_stage_codegen_covers_expressions(spark, sf_dir):
    li = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    out = li.with_columns(
        charge=td.col("l_extendedprice") * (1 - td.col("l_discount"))
    ).filter(td.col("charge") > 100).select("l_orderkey", "charge")
    plan = _plan(out.df)
    # executedPlan toString marks codegen stages with "*(n)"
    assert "WholeStageCodegen" in plan or "*(1)" in plan


def test_q2_semi_join_prefilters_fact_scan(spark, sf_dir):
    """q2: the part filter must reach the part scan as pushed predicates and
    the supplier->nation->region dim chain must broadcast (no shuffle of the
    fact side against dims)."""
    from tabsdata_spark import queries as registry
    df = registry.queries()["q2_min_cost_supplier"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(r_name,EUROPE)" in plan          # dim filter at the scan
    assert "GreaterThanOrEqual(p_size,1)" in plan    # part filter at the scan
    assert "BroadcastHashJoin" in plan               # dim chain broadcasts
    assert "partial_min" in plan                     # map-side combine


def test_q21_status_filter_pushed_and_no_cartesian(spark, sf_dir):
    """q21's EXISTS/NOT-EXISTS rewrite must stay equi-join shaped: status
    filter at the orders scan, no nested-loop/cartesian product anywhere."""
    from tabsdata_spark import queries as registry
    df = registry.queries()["q21_waiting_suppliers"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(o_orderstatus,F)" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------- LLM ops
def _no_product(plan: str):
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_pipeline_is_bucket_join(spark, sf_dir):
    """MinHash-LSH candidates must come from an equi-join on (band, bsig)
    buckets — never an all-pairs product — at every banding setting."""
    from tabsdata_spark.llm import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(dedup.minhash_lsh_candidates(docs, num_hashes=16, bands=4))
    _no_product(plan)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_simhash_pipeline_is_bucket_join(spark, sf_dir):
    from tabsdata_spark.llm import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(dedup.simhash_candidates(docs, max_hamming=7, bands=8))
    _no_product(plan)


def test_blocked_near_dup_join_has_no_product(spark, sf_dir):
    """embedding_near_dup_pairs WITH block_col must plan an equi-join on
    the block; the unblocked crossJoin fallback is audit-only."""
    from tabsdata_spark.llm import dedup
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(dedup.embedding_near_dup_pairs(emb, block_col="label",
                                                threshold=0.5))
    _no_product(plan)


def test_lsh_topk_probes_via_bucket_join(spark, sf_dir):
    """Sign-LSH top-k: probe side must broadcast and join buckets on
    (table, bucket) — candidate generation must not be quadratic."""
    from tabsdata_spark.llm import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    plan = _plan(similarity.lsh_topk(emb, qs, k=3, bits=4, num_tables=4))
    _no_product(plan)
    assert "BroadcastHashJoin" in plan


def test_vocab_top_n_is_take_ordered(spark, sf_dir):
    """vocabulary(top=N) must compile the top-N to TakeOrderedAndProject
    (parallel partial top-k), not a single-task global window."""
    from tabsdata_spark.llm import corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(corpus.vocabulary(docs, top=20))
    assert "TakeOrderedAndProject" in plan


def test_decontamination_broadcasts_benchmark_grams(spark, sf_dir):
    """The benchmark n-gram set must broadcast: the corpus side's only
    exchange is the final per-doc partial agg, never a gram-keyed shuffle
    of the full corpus against the benchmark."""
    from tabsdata_spark.llm import decontam
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 29 == 1)
    plan = _plan(decontam.contamination(docs, bench, n=5))
    assert "BroadcastHashJoin" in plan
    _no_product(plan)
    assert "partial_count" in plan  # map-side combine on the doc-id agg


def test_vocab_overlap_joins_on_word(spark, sf_dir):
    from tabsdata_spark.llm import corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(corpus.source_vocab_overlap(docs))
    _no_product(plan)


def test_connected_components_rounds_are_checkpointed(spark):
    """Star-contraction CC truncates lineage each round: the returned
    frame's plan must read from checkpointed RDD scans, not replay the
    full iterative join chain."""
    from tabsdata_spark.llm import dedup
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long")
    out = dedup.connected_components_star(edges, max_iter=4)
    plan = _plan(out)
    assert "Scan ExistingRDD" in plan  # localCheckpoint truncated lineage
    comp = {r["node"]: r["component"] for r in out.collect()}
    assert comp[4] == 1 and comp[11] == 10


def test_gopher_rules_is_shuffle_free(spark, sf_dir):
    """Every Gopher metric folds over the token array in one projection —
    a 100 TB scan must stay a single exchange-free stage."""
    from tabsdata_spark.llm import textual as tx
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(tx.gopher_quality_rules(docs))
    assert "Exchange" not in plan


def test_unigram_surprisal_broadcasts_total(spark, sf_dir):
    """The corpus-total scalar joins via a 1-row broadcast, and both aggs
    partial-combine before their exchanges."""
    from tabsdata_spark.llm import corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(corpus.unigram_surprisal(docs))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_tfidf_df_side_not_force_broadcast(spark, sf_dir):
    """tf_idf's document-frequency table is |vocab|-sized (1e8-1e9 rows at
    web scale) — a user-supplied broadcast hint on it would pin a
    hundreds-of-GB build side past the 8 GB cap at 100x.  The ONLY hint
    allowed in the plan is the 1-row n_total scalar; the term join's
    strategy stays with the optimizer (AQE may still *choose* broadcast at
    bench scale — that's fine, it's measured, not pinned)."""
    from tabsdata_spark.llm import corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = corpus.tf_idf(docs)
    logical = scored._jdf.queryExecution().logical().toString()
    hints = logical.count("ResolvedHint")
    assert hints == 1, f"expected only the n_total scalar hint, got {hints}:\n{logical}"


def test_zipf_window_is_partitioned_by_stratum(spark, sf_dir):
    """Ranking must window per stratum — a global (unpartitioned) rank
    would funnel the whole vocabulary through one task."""
    from tabsdata_spark.llm import corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(corpus.zipf_slope(docs, strata_col="source"))
    assert "Exchange SinglePartition" not in plan
    assert "partitionspec" in plan.lower() or "hashpartitioning(stratum" in plan


def test_version_diff_shuffles_digests_not_payloads(spark, sf_dir):
    """table_diff must project each side to (key, xxhash64 digest) BEFORE
    the full-outer join: the exchanges carry 8-byte digests, never text
    payloads."""
    from tabsdata_spark.store.diff import table_diff
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(table_diff(docs, docs.limit(400), ["doc_id"]))
    _no_product(plan)
    assert "xxhash64" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            # exchange output schema is [key, digest] — no payload columns
            assert "text#" not in line and "lang#" not in line


def test_triangle_count_no_cartesian(spark, sf_dir):
    from tabsdata_spark.llm import dedup
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = dedup.embedding_near_dup_pairs(
        emb, id_col="vec_id", block_col="label", threshold=0.2)
    plan = _plan(dedup.triangle_count(pairs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_assignment_is_shuffle_free(spark, sf_dir):
    # the argmin-over-broadcast-centroids scoring pass must be a narrow
    # projection: no Exchange, no join — the model travels as literals
    from tabsdata_spark.llm import cluster
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cluster.kmeans(emb, k=4, iters=0)
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_cap_per_stratum_single_partitioned_window(spark, sf_dir):
    from tabsdata_spark.llm import corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus.cap_per_stratum(docs, "source", "n_chars", cap=5,
                                 tie_col="doc_id")
    plan = _plan(out)
    # exactly one exchange (hash by source) feeding a partitioned window —
    # no global-order funnel
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_incremental_dedup_joins_on_digest_only(spark, sf_dir):
    from tabsdata_spark.llm import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corp = docs.filter(F.col("doc_id") % 10 != 0)
    # project to the id only: column pruning must reach through the
    # operator — every scan reads (doc_id, text) for fingerprinting,
    # never the unreferenced payload columns
    plan = _plan(dedup.incremental_dedup(batch, corp).select("doc_id"))
    assert "LeftAnti" in plan
    for seg in plan.split("ReadSchema:")[1:]:
        rs = seg.splitlines()[0]
        assert "n_chars" not in rs and "lang" not in rs


def test_dsir_ratio_table_broadcasts(spark, sf_dir):
    """DSIR: the per-bucket log-ratio table must broadcast-join the
    exploded corpus features (corpus side shuffles only for the per-doc
    sum), and the top-k select must be a TakeOrderedAndProject."""
    from tabsdata_spark.llm import dsir
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.filter(F.col("doc_id") % 31 == 2)
    raw = docs.filter(F.col("doc_id") % 31 != 2)
    out = dsir.dsir_select(raw, target, k=50)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_grouping_sets_single_expand(spark, sf_dir):
    """GROUPING SETS must plan ONE Expand + one aggregate pass — not a
    union of per-level scans."""
    import tabsdata_spark.queries as Q
    out = Q.grouping_sets_revenue(spark, sf_dir)
    plan = _plan(out)
    assert plan.count("Expand") >= 1
    # exactly one scan of orders
    assert plan.count("orders.parquet") == 1


def test_approx_distinct_no_expand_shuffle(spark, sf_dir):
    """approx_count_distinct must stay a sketch merge: no second shuffle
    for a distinct expansion on the approx side."""
    from tabsdata_spark.queries import load_events
    ev = load_events(spark, sf_dir).df
    out = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("u"))
    plan = _plan(out)
    assert "partial_approx_count_distinct" in plan


def test_segment_dedup_windows_per_segment(spark, sf_dir):
    """The keep-first window must partition on the segment value — the
    one data-sized shuffle.  A global (SinglePartition) window or a
    cartesian pair-join would not survive 100 TB."""
    from tabsdata_spark.llm import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(dedup.segment_dedup(docs))
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bloom_contamination_corpus_side_is_join_free(spark, sf_dir):
    """The bloom probe must be a literal-bitset expression: zero joins in
    the whole plan, one exchange (the final per-doc agg)."""
    from tabsdata_spark.llm import decontam

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = decontam.bloom_contamination(
        docs.filter(F.col("doc_id") % 97 != 0), bench)
    plan = _plan(out)
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_bigram_lm_joins_left_to_optimizer(spark, sf_dir):
    """Neither LM join may carry a forced broadcast hint: the bigram vocab
    grows with the corpus.  The logical plan must be hint-free (AQE may
    still *choose* broadcast at runtime from measured sizes — that's the
    point)."""
    from tabsdata_spark.llm import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus.bigram_lm_score(docs)
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    # the only ResolvedHint allowed is the 1-row V broadcast
    assert logical.count("ResolvedHint") <= 1


def test_token_budget_histogram_window_is_bounded(spark, sf_dir):
    """The cumulative window runs over the <=bins-row histogram, AFTER the
    per-bin aggregate — never over the raw doc table."""
    from tabsdata_spark.llm import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus.token_budget_select(docs, 10_000)
    plan = _plan(out)
    w = plan.index("Window")
    agg = plan.index("HashAggregate")
    # a Window node exists and consumes an aggregate, not the scan
    assert "qbin" in plan[w:w + 400]
    assert agg > -1


def test_heavy_hitters_recount_is_take_ordered(spark, sf_dir):
    """Pass 2 must end in TakeOrderedAndProject (per-partition heaps), and
    pass 1 must be the Arrow candidate scan — never a full-vocabulary
    global sort."""
    from tabsdata_spark import stats
    from tabsdata_spark.llm.corpus import clean_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(clean_tokens(F.col("text"))).alias("term"))
    out = stats.heavy_hitters(toks, "term", k=10, budget=64)
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan
    assert "MapInPandas" in plan


def test_funnel_no_cartesian_and_user_keyed(spark, sf_dir):
    from tabsdata_spark.extensions import funnel
    from tabsdata_spark.queries import load_events

    ev = load_events(spark, sf_dir).df
    out = funnel(ev, "user_id", "ts", "event_type",
                 ["signup", "view", "purchase"], within="2 DAY")
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # stage mins are aggregates, not windows


def test_sparse_cosine_prunes_df_before_pair_join(spark, sf_dir):
    from tabsdata_spark.llm import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus.sparse_cosine_pairs(docs, min_sim=0.5, max_df=100)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    # the df cap must appear as a post-aggregation filter (HAVING df<=100)
    assert "(df" in plan.replace("#", " ") or "df <= 100" in plan \
        or "<= 100" in plan


def test_retention_no_full_table_window(spark, sf_dir):
    from tabsdata_spark.extensions import retention_cohorts
    from tabsdata_spark.queries import load_events

    ev = load_events(spark, sf_dir).df
    out = retention_cohorts(ev, "user_id", "ts", "week")
    plan = _plan(out)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_containment_pairs_joins_not_cartesian(spark, sf_dir):
    from tabsdata_spark.llm import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = docs.selectExpr("doc_id AS id_a", "doc_id + 1 AS id_b")
    plan = _plan(dd.containment_pairs(docs, pairs))
    assert "CartesianProduct" not in plan


def test_hard_negatives_blocked_join_no_cartesian(spark, sf_dir):
    from tabsdata_spark.llm import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.limit(8).select(emb.vec_id.alias("query_id"), "label", "embedding")
    plan = _plan(similarity.hard_negatives(emb, qs, block_col="label"))
    assert "CartesianProduct" not in plan
    # per-query top-k window must be hash-partitioned, not global
    assert "Window" in plan


def test_char_entropy_is_shuffle_free(spark, sf_dir):
    from tabsdata_spark.llm import textual as tx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(docs.select("doc_id", tx.char_entropy(F.col("text"))))
    assert "Exchange" not in plan


def test_weighted_sample_global_lowers_to_take_ordered(spark, sf_dir):
    from tabsdata_spark.llm import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus.weighted_sample(docs, "n_chars", "doc_id", 10)
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan   # no global sort


def test_weighted_sample_strata_window_partitioned(spark, sf_dir):
    from tabsdata_spark.llm import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus.weighted_sample(docs, "n_chars", "doc_id", 10,
                                 strata_col="source")
    plan = _plan(out)
    assert "Window" in plan
    assert "SinglePartition" not in plan   # per-stratum, never global


def test_bpe_encode_is_shuffle_free(spark, sf_dir):
    from tabsdata_spark.llm import bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(bpe.bpe_encode(docs, [("t", "h"), ("th", "e")]))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "BatchEvalPython" not in plan


def test_js_divergence_joins_on_term_no_product_blowup(spark, sf_dir):
    from tabsdata_spark.llm import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(corpus.js_divergence_sources(docs))
    # the corpus-sized join keys on term; the only product is the tiny
    # strata-pair grid (|strata|^2 rows)
    assert "partial_sum" in plan            # map-side combine on counts


def test_bloom_prefilter_probes_before_join(spark, sf_dir):
    from tabsdata_spark.scale import bloom_prefilter_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select(F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .filter(F.col("c_acctbal") > 9000).select("c_custkey")
    plan = _plan(bloom_prefilter_join(orders, cust, "c_custkey"))
    assert "bit_get" in plan          # scan-speed bitset probe on the big side
    _no_product(plan)


def test_rolling_zscore_window_is_partitioned(spark, sf_dir):
    from tabsdata_spark.extensions import rolling_zscore
    from tabsdata_spark.queries import load_events

    ev = load_events(spark, sf_dir).df
    plan = _plan(rolling_zscore(ev, "user_id", "ts", "value",
                                tie_cols=["event_id"]))
    # the rolling frame must partition on the key — never a global window
    assert "windowspecdefinition(user_id#" in plan
    _no_product(plan)
    assert plan.count("Exchange hashpartitioning") == 1   # ONE key shuffle


def test_cooccurrence_lift_joins_on_basket_and_broadcasts_marginals(
        spark, sf_dir):
    from tabsdata_spark.extensions import cooccurrence_lift
    from tabsdata_spark.queries import load_events

    ev = load_events(spark, sf_dir).df
    plan = _plan(cooccurrence_lift(ev, "user_id", "event_type"))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan        # marginals broadcast back


def test_vocab_coverage_has_no_global_window(spark, sf_dir):
    from tabsdata_spark.llm import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(corpus.vocab_coverage(docs, ks=[10, 100]))
    assert "TakeOrderedAndProject" in plan     # top-k heap, not a sort
    assert "windowspecdefinition" not in plan


def test_session_paths_topk_is_take_ordered(spark, sf_dir):
    from tabsdata_spark.extensions import session_paths
    from tabsdata_spark.queries import load_events

    ev = load_events(spark, sf_dir).df
    plan = _plan(session_paths(ev, "user_id", "ts", "event_type",
                               tie_cols=["event_id"]))
    assert "TakeOrderedAndProject" in plan
    _no_product(plan)


def test_cluster_quality_broadcasts_centroids(spark, sf_dir):
    from tabsdata_spark.llm import cluster

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(cluster.cluster_quality(emb, "label"))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan         # points x centroids


def _walk_executed(jnode):
    """Yield (node, simpleClassName) over the EXECUTED physical plan,
    descending through AQE wrappers and materialized query stages."""
    cls = jnode.getClass().getSimpleName()
    yield jnode, cls
    if cls == "AdaptiveSparkPlanExec":
        yield from _walk_executed(jnode.executedPlan())
        return
    if cls.endswith("QueryStageExec"):
        yield from _walk_executed(jnode.plan())
        return
    it = jnode.children().iterator()
    while it.hasNext():
        yield from _walk_executed(it.next())


def _rows_into(jnode):
    """Rows flowing OUT of this subtree = first descendant (inclusive)
    carrying a numOutputRows metric.  Safe because every node between a
    window and its nearest counted descendant (Sort, Project, Exchange
    read) is row-preserving."""
    for n, _cls in _walk_executed(jnode):
        m = n.metrics()
        if m.contains("numOutputRows"):
            return m.apply("numOutputRows").value()
    return None


def test_allowlisted_global_windows_are_bounded(spark, sf_dir):
    """Machine-check of tools/audit_plans.py's BOUNDED_WINDOW_ROWS
    allowlist: each allowlisted query claims its unpartitioned windows
    run over an aggregate of bounded cardinality, never data-sized
    rows.  Execute each query at sf0.01 and assert the ACTUAL row count
    entering every unpartitioned WindowExec (read from executed-plan
    metrics) is within the claimed bound — 'bounded by construction'
    enforced, not narrated."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tabsdata_spark.queries import queries
    from tools.audit_plans import BOUNDED_WINDOW_ROWS

    qs = queries()
    # derive the sf0.01 sibling from the session fixture instead of
    # hardcoding the machine layout (r6 advice)
    sf01 = str(Path(sf_dir).parent / "sf0.01")
    missing = [n for n in BOUNDED_WINDOW_ROWS if n not in qs]
    assert not missing, f"allowlisted but unregistered: {missing}"

    violations = []
    checked_windows = 0
    for name, bound in BOUNDED_WINDOW_ROWS.items():
        df = qs[name](spark, sf01)
        df.collect()
        top = df._jdf.queryExecution().executedPlan()
        for n, cls in _walk_executed(top):
            if cls == "WindowExec" and n.partitionSpec().isEmpty():
                rows = _rows_into(n.children().head())
                checked_windows += 1
                if rows is None or rows > bound:
                    violations.append((name, rows, bound))
    assert not violations, f"unbounded global windows: {violations}"
    # the allowlist exists because these queries DO have global windows;
    # if none were found the walker (or the allowlist) is stale
    assert checked_windows >= len(BOUNDED_WINDOW_ROWS) - 2, checked_windows


def _unwrap_exchange(jnode):
    """Descend through query-stage / reuse / codegen wrappers to the node
    that actually is (or is not) a BroadcastExchange."""
    cls = jnode.getClass().getSimpleName()
    if cls.endswith("QueryStageExec"):
        return _unwrap_exchange(jnode.plan())
    if cls == "ReusedExchangeExec":  # leaf referencing the original exchange
        return _unwrap_exchange(jnode.child())
    if cls in ("InputAdapter", "WholeStageCodegenExec"):
        return _unwrap_exchange(jnode.children().head())
    return jnode


# Default upper bound on rows a BroadcastNestedLoopJoin may broadcast.
# Every registered scalar combine ships an aggregate (1-row total), a
# fixed grid (days/bins/states, <= 366), or a query/centroid set
# (<= 200) — measured max across all 66 BNLJ queries at sf0.01 is 200.
# A query that legitimately needs a bigger bounded side gets a named
# entry here (none currently) — broadcasting a data-sized frame through
# a nested-loop join is never legitimate.
BNLJ_BUILD_ROWS_DEFAULT = 500
BNLJ_BUILD_ROWS = {}


def test_broadcast_scalar_combine_sides_are_bounded(spark, sf_dir):
    """Machine-check of the narrated crossJoin scalar-combine contract
    (the last plan contract that was documented but not enforced): every
    BroadcastNestedLoopJoin in every registered query must broadcast a
    BOUNDED side — a scalar aggregate, a fixed grid, a query set — never
    a data-sized frame.  Pass 1 compiles all registered plans (cheap, no
    execution) to find the queries that plan a BNLJ; pass 2 executes
    exactly those at sf0.01 and reads the ACTUAL build-side row count of
    each BNLJ (the child that unwraps to a BroadcastExchange) from
    executed-plan metrics.  At 100 TB an unbounded nested-loop broadcast
    is quadratic work plus an executor-OOM — this pins it structurally."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tabsdata_spark.queries import queries

    qs = queries()
    sf01 = str(Path(sf_dir).parent / "sf0.01")

    # Both passes are per-query independent — run them from a thread pool
    # (Spark schedules concurrent jobs; plan compilation releases the GIL
    # inside py4j).  Same queries, same assertions, overlapped waiting.
    from concurrent.futures import ThreadPoolExecutor

    def compile_one(item):
        name, fn = item
        plan = fn(spark, sf01)._jdf.queryExecution().executedPlan().toString()
        return name if "BroadcastNestedLoopJoin" in plan else None

    with ThreadPoolExecutor(max_workers=6) as ex:
        with_bnlj = [n for n in ex.map(compile_one, qs.items())
                     if n is not None]
    # the scalar-combine idiom is all over the repo; if the compile pass
    # finds none, the walker (or the plan shape) changed under us
    assert len(with_bnlj) >= 30, with_bnlj

    def check_one(name):
        df = qs[name](spark, sf01)
        df.collect()
        bound = BNLJ_BUILD_ROWS.get(name, BNLJ_BUILD_ROWS_DEFAULT)
        sides = 0
        bad = []
        for n, cls in _walk_executed(df._jdf.queryExecution().executedPlan()):
            if cls != "BroadcastNestedLoopJoinExec":
                continue
            it = n.children().iterator()
            while it.hasNext():
                c = _unwrap_exchange(it.next())
                if not c.getClass().getSimpleName().startswith(
                        "BroadcastExchange"):
                    continue
                m = c.metrics()
                rows = (m.apply("numOutputRows").value()
                        if m.contains("numOutputRows") else None)
                sides += 1
                if rows is None or rows > bound:
                    bad.append((name, rows, bound))
        return sides, bad

    violations = []
    checked_sides = 0
    with ThreadPoolExecutor(max_workers=6) as ex:
        for sides, bad in ex.map(check_one, with_bnlj):
            checked_sides += sides
            violations.extend(bad)
    assert not violations, f"unbounded BNLJ broadcast sides: {violations}"
    assert checked_sides >= len(with_bnlj), checked_sides
