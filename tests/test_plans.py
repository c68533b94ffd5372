"""Physical-plan shape tests: the 100 TB scale properties.

Correctness says the answer is right; these say the PLAN is right — the
predicates reach the parquet scan, scans are column-pruned, small dims
broadcast, top-k never globally sorts. A regression here is a performance
bug even while results stay correct.
"""

from __future__ import annotations

import pytest

from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SF_DIR)
    jvm = spark._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_q6_filters_pushed_to_scan(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for pred in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount",
        "LessThanOrEqual(l_discount",
        "LessThan(l_quantity",
    ):
        assert pred in pushed, f"missing pushdown: {pred}"


def test_q6_scan_column_pruned(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # 4 of 11 lineitem columns — projection reached the reader
    assert "l_orderkey" not in schema and "l_returnflag" not in schema
    assert "l_extendedprice" in schema


def test_o3_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "o3_topk")
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT k
    schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    ncols = schema.split("struct<", 1)[1].count(":")
    assert ncols == 1, f"should read 1 column, got {schema}"


def test_j5_dims_broadcast(spark):
    plan = plan_of(spark, "j5_broadcast_dim_join")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan  # fact side never shuffles


def test_q1_partial_aggregation(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # partial (map-side) + final hash agg: two HashAggregate nodes
    assert plan.count("HashAggregate") >= 2
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "LessThanOrEqual(l_shipdate" in pushed


def test_p1_projection_prunes_scan(spark):
    plan = plan_of(spark, "p1_projection")
    schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "c_acctbal" not in schema and "c_nationkey" not in schema


def test_q3_broadcasts_filtered_dims(spark):
    plan = plan_of(spark, "q3_top_orders")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "q6_forecast_revenue", "tx2_quality_score"]
)
def test_hot_paths_stay_codegen(spark, name):
    """Scan→filter→project→partial-agg must run inside whole-stage codegen
    (JVM, vectorized) — no Python row boundary in the hot path.

    AQE's non-final formatted plan hides WholeStageCodegen spans; codegen
    nodes carry a `*` prefix, so capture the plan with AQE off.
    """
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(spark, name)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert any(
        ln.lstrip().lstrip("+-:").lstrip().startswith("* ")
        for ln in plan.splitlines()
    ), f"no codegen nodes in plan:\n{plan}"
    assert "BatchEvalPython" not in plan  # would mean a row-at-a-time UDF


def test_ts3_asof_single_shuffle(spark):
    """The union-merge as-of join must shuffle exactly once (on user_id) —
    no join-product materialization, no second exchange."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(spark, "ts3_asof_join")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    import re

    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q2_broadcasts_all_dims(spark):
    """Derived-partsupp Q2: every dimension joins as a broadcast — the
    lineitem-derived fact is the only shuffled relation."""
    plan = plan_of(spark, "q2_min_cost_supplier")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "BroadcastNestedLoopJoin" not in plan


def test_st_batch_equivalence_is_tested_via_oracle():
    """Streaming operators st1-st6 are validated end-to-end by the oracle
    gate (bounded availableNow run == batch answer); this placeholder
    documents that contract for the plan-test reader."""
    for name in [f"st{i}" for i in range(1, 7)]:
        assert any(k.startswith(name) for k in REGISTRY), name


def test_m3_partition_pruning(spark):
    """The month filter must resolve to directory pruning (PartitionFilters
    on the scan), not a data filter over all partitions."""
    plan = plan_of(spark, "m3_partitioned_pruned_read")
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "month" in pf[0], plan
    # and the filter must NOT degrade to a PushedFilters data predicate
    # (a partition-only scan may omit the PushedFilters line entirely)
    for pushed in (l for l in plan.splitlines() if "PushedFilters" in l):
        assert "month" not in pushed, pushed


def test_m2_salted_join_no_skew_partition(spark):
    """Salted join: the join key must be (okey, __salt) — the composite key
    appears in the hash-partitioning of the exchange."""
    plan = plan_of(spark, "m2_salted_join_skew")
    assert "__salt" in plan, plan


def test_ts4_two_shuffles(spark):
    """Gap-fill: hourly rollup + user window = exactly two exchanges; the
    spine join must co-locate with the rollup partitioning."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(spark, "ts4_gapfill_resample")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    import re

    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 2, plan
    assert "CartesianProduct" not in plan


def test_m6_bucketed_join_no_join_exchange(spark):
    """Bucketed co-located join: with broadcast disabled (at real scale
    neither fact side fits a broadcast), the sort-merge join must read
    bucket-aligned — no shuffle on either side; the only exchange in the
    plan belongs to the post-join aggregation."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "m6_bucketed_colocated_join")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    import re

    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 1, plan  # agg only; join reads bucket-aligned
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Bucketed: true") == 2, plan


def test_a12_sample_is_pushdown_filter(spark):
    """Stratified hash sampling must stay a map-only filter: no exchange
    anywhere except the final presentation sort."""
    import re

    plan = plan_of(spark, "a12_stratified_sample")
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) <= 1, plan  # only the ORDER BY rangepartitioning
    assert "Filter" in plan, plan


def test_tx9_chunking_no_shuffle(spark):
    """Chunk explosion is generated on the executors — zero exchanges."""
    plan = plan_of(spark, "tx9_chunking")
    assert "Exchange" not in plan, plan
    assert "Generate" in plan, plan  # the explode


def test_tx8_two_aggregations_partial(spark):
    """Corpus term-novelty: both the vocab count and the per-doc rollup
    must have map-side partial aggregation."""
    plan = plan_of(spark, "tx8_term_novelty")
    assert plan.count("HashAggregate") >= 4, plan  # 2 aggs x partial+final


def test_tx8_small_vocab_freq_join_broadcasts(spark):
    """tx8's scale note: when the vocabulary fits, the token-frequency
    join should broadcast the freq side instead of shuffling every token
    occurrence. Statically Spark cannot know the aggregate's size, so the
    conversion is AQE's job at runtime — execute the query and assert the
    FINAL adaptive plan picked a broadcast join."""
    df = REGISTRY["tx8_term_novelty"].spark(spark, SF_DIR)
    df.count()  # materialize so AQE finalizes the plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final, final
    assert "SortMergeJoin" not in final, final


def test_dd6_iteration_frames_scale_with_graph(spark):
    """The CC iteration frames derive their partitioning from the measured
    graph size (not a hardcoded constant): locally the tiny dup graph
    collapses to one partition, and the sizing function grows it with
    node count up to the cluster's parallelism."""
    from apache_iceberg_spark.operators.dedup import iteration_partitions

    df = REGISTRY["dd6_dup_clusters"].spark(spark, SF_DIR)
    assert df.count() > 0
    assert iteration_partitions(90, spark.sparkContext.defaultParallelism) == 1
    assert iteration_partitions(100_000_000, 256) == 50


def test_dc1_no_forced_broadcast_of_split_side(spark):
    """dc1's test side is split-derived — it grows linearly with the
    corpus, so a forced F.broadcast would OOM every executor at 100 TB.
    With broadcast disabled and AQE off, a surviving hint would still
    plan a BroadcastHashJoin; assert the join strategy is runtime's
    call (sort-merge under these settings), i.e. no hint exists."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "dc1_decontamination")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_dc1_bloom_prefilter_ahead_of_gram_shuffle(spark):
    """The 100 TB shape for dc1: a constant-size bloom filter built from
    the test-side gram keys (bit_or-aggregated words, one broadcast row)
    prunes train grams map-side BEFORE the gram shuffle. Catalyst's
    InjectRuntimeFilter can't build this one itself (the creation side
    contains a Generate), so bloom_prefilter composes it from
    expressions — assert the build aggregate, the broadcast of the
    single bloom row, and the probe filter all appear."""
    plan = plan_of(spark, "dc1_decontamination")
    assert "bit_or" in plan, plan[:3000]          # bloom build aggregate
    assert "xxhash64" in plan, plan[:3000]        # probe hashes
    assert "map_from_entries" in plan, plan[:3000]  # one-row bloom fold
    assert "BroadcastNestedLoopJoin" in plan, plan[:3000]  # 1-row bloom side


def test_dd3_simhash_is_map_only(spark):
    """SimHash votes fold inside one expression per row — the operator
    must carry NO exchange besides load_table_parallel's spread
    round-robin (which disappears at real scale): no aggregation
    shuffle, no explode-to-rows."""
    import re

    plan = plan_of(spark, "dd3_simhash")
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    # the only exchange allowed is the small-file repartition spread
    assert len(exchanges) <= 1, plan
    assert "hashpartitioning" not in plan, plan  # no aggregation shuffle
    assert "Generate" not in plan, plan  # no token explode


def test_mm6_pair_generation_is_banded_never_all_pairs(spark):
    """mm6's Hamming candidates must come from bit-band buckets (one
    shuffle into (band_id, band_key) + in-bucket pair explode), not an
    all-pairs product: no cartesian/nested-loop join anywhere, and the
    only wide operation ahead of the verify filter is the bucket
    aggregate."""
    from apache_iceberg_spark.operators.pipeline import mm6_hamming_pairs
    from apache_iceberg_spark.tables import load_table

    df = mm6_hamming_pairs(load_table(spark, SF_DIR, "documents"))
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, plan
    assert "Generate" in plan, plan  # band + in-bucket pair explodes
    assert "HashAggregate" in plan, plan  # the bucket collect_list


def test_pp2b_span_explode_adds_no_shuffle(spark):
    """pp2b = pp2's distributed prefix sum + a map-only span explode:
    the plan must keep exactly pp2's exchanges (bucket window, bucket
    totals; the broadcast is not an exchange) plus a Generate — the
    explode itself may not introduce a shuffle."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p2 = plan_of(spark, "pp2_sequence_packing")
        p2b = plan_of(spark, "pp2b_packed_doc_spans")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    ex = lambda p: len(re.findall(r"^\(\d+\) Exchange", p, flags=re.M))
    assert ex(p2b) == ex(p2), (ex(p2), ex(p2b))
    assert "Generate" in p2b, p2b


def test_pp5_rate_table_broadcasts_to_apply_pass(spark):
    """pp5's apply pass joins the corpus against the ~#domains-row rate
    table — that join must broadcast (never shuffle the corpus on
    source), and the aggregations must be partial+final. (The final
    audit join of the two per-source aggregates is tiny on both sides;
    its static strategy is left to AQE.)"""
    plan = plan_of(spark, "pp5_domain_mixture")
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("HashAggregate") >= 4, plan


def test_pp4_fuzzy_stage_no_cartesian(spark):
    """pp4's MinHash stage inherits dd2's banded shape: candidate pairs
    come from the bucket aggregate + in-bucket explode, never a
    cartesian/nested-loop product."""
    plan = plan_of(spark, "pp4_cascade_fuzzy")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate" in plan, plan  # band + in-bucket pair explodes


def test_runtime_bloom_filter_semi_join_reduction(spark):
    """The 100 TB fact⋈filtered-dim lever beyond broadcast: with runtime
    bloom filters enabled, Spark injects a might_contain() predicate on
    the fact side built from the dim's join keys — rows that cannot match
    are dropped before the shuffle. (Off by default; this locks the conf
    recipe and the resulting plan shape.)"""
    import pyspark.sql.functions as F

    from apache_iceberg_spark.tables import load_table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        l = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            l.join(o, l["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_m11_incremental_scan_reads_only_delta_files(spark, tmp_path):
    """The incremental read's plan must locate ONLY the delta directories
    — the base snapshot's files never appear in the scan (metadata-only
    planning, no data diff)."""
    from apache_iceberg_spark.catalog.snapshots import (
        commit_append,
        commit_snapshot,
        read_incremental,
    )

    table = str(tmp_path / "t")
    v1 = commit_snapshot(
        spark.range(100).withColumnRenamed("id", "k"), table
    )
    commit_append(spark.range(100, 110).withColumnRenamed("id", "k"), table)
    inc = read_incremental(spark, table, from_version=v1)
    plan = spark._jvm.PythonSQLUtils.explainString(
        inc._jdf.queryExecution(), "formatted"
    )
    assert "/d2-" in plan, plan
    assert "/v1-" not in plan, "base snapshot files leaked into the delta scan"
    # and no Filter/Except anywhere: the diff happened at planning time
    assert "Except" not in plan and "SortMergeJoin" not in plan


def test_s15_partitioned_export_prunes_on_read(spark, tmp_path):
    """s15's partitioned layout must turn a lang filter on the read-back
    side into directory-level pruning (PartitionFilters), scanning no
    other language's files."""
    import pyspark.sql.functions as F

    from apache_iceberg_spark.tables import load_table

    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", F.length("text").alias("n_chars")
    )
    path = str(tmp_path / "by_lang")
    d.write.partitionBy("lang").parquet(path)
    rd = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = spark._jvm.PythonSQLUtils.explainString(
        rd._jdf.queryExecution(), "formatted"
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "lang" in pf and "en" in pf, pf


def test_ts6_single_exchange_reused_by_aggregate(spark):
    """ts6's LEAD window and the integrating groupBy both key on
    user_id: Catalyst must reuse the window's hash exchange for the
    aggregation — exactly one Exchange in the whole plan."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(spark, "ts6_time_weighted_avg")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    n = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
    assert n == 1, plan


def test_j7_overlap_join_is_binned_not_theta(spark):
    """j7's self-join must run on the (supplier, bin) equality key with
    the interval predicate as an in-bucket filter — a hash join, never a
    nested-loop theta join or cartesian product — and the shipdate slice
    must reach the parquet scan."""
    plan = plan_of(spark, "j7_interval_overlap_join")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_shipdate" in pushed, pushed


def test_pp7_no_forced_broadcast_of_split_side(spark):
    """pp7 inherits dc1's contract: the only broadcast may be the
    constant-size bloom row (single-row aggregate) or small AQE-decided
    sides — never a forced broadcast of the split-derived gram frames
    (the logical plan must carry no user hint on a Generate side)."""
    df = REGISTRY["pp7_contamination_report"].spark(spark, SF_DIR)
    logical = df._jdf.queryExecution().logical().toString()
    # the one legitimate hint is on the bloom row (an Aggregate of a
    # single map row); a hint directly over the gram explode would name
    # Generate within two lines of the hint node
    import re

    for m in re.finditer(r"ResolvedHint.*\n(.*\n?){0,2}", logical):
        assert "Generate" not in m.group(0), m.group(0)


def test_ann6_codebook_and_lut_broadcast_corpus_never_shuffles_wide(spark):
    """ann6's encode and ADC joins must broadcast the codebook / lookup
    table sides (at most a few hundred rows) — the corpus side may only
    shuffle as compact partial-aggregate rows, so the plan carries no
    SortMergeJoin and at least two broadcast joins."""
    plan = plan_of(spark, "ann6_pq_adc")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_m15_one_filter_prunes_both_generations(spark):
    """m15's status predicate must reach BOTH file generations in their
    own idiom: directory-level PartitionFilters on the evolved
    (partitioned) files, row-group PushedFilters on the pre-evolution
    (unpartitioned) files."""
    plan = plan_of(spark, "m15_partition_evolution_scan")
    part = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l and "o_orderstatus" in l
    ]
    assert part, plan  # gen-2: whole directories pruned
    pushed = [
        l
        for l in plan.splitlines()
        if "PushedFilters" in l and "EqualTo(o_orderstatus,F)" in l
    ]
    assert pushed, plan  # gen-1: predicate at the row-group reader


def test_o6_keyset_cursor_pushes_down_and_takes_ordered(spark):
    """o6's cursor predicate must reach the parquet reader (the whole
    point of keyset over offset pagination) and the page must come from
    TakeOrderedAndProject, not a global sort."""
    plan = plan_of(spark, "o6_keyset_pagination")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "LessThanOrEqual(o_totalprice" in pushed, pushed
    assert "TakeOrderedAndProject" in plan, plan


def test_pp8_no_global_single_partition_sort(spark):
    """pp8's global rank must come from per-bucket windows + a broadcast
    bucket-prefix rebase — the plan may carry no single-partition
    Exchange over the corpus (the 256-row bucket frame is the only
    SinglePartition allowed)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(spark, "pp8_corpus_shuffle")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # corpus-side window shuffles on bucket; the only SinglePartition
    # exchange feeds the 256-row bucket-totals window
    assert "hashpartitioning(bucket" in plan, plan
    assert plan.count("SinglePartition") <= 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_tx13_line_dedup_is_map_only(spark):
    """tx13's order-preserving line dedup is a pure expression fold —
    the plan may contain no Exchange at all."""
    import re

    plan = plan_of(spark, "tx13_within_doc_line_dedup")
    assert not re.search(r"^\(\d+\) Exchange", plan, flags=re.M), plan


def test_ts8_zscore_single_shuffle(spark):
    """ts8 computes all three rolling moments in ONE window pass over
    one user_id exchange — no second shuffle, no join."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(spark, "ts8_rolling_zscore_anomalies")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    n = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
    assert n == 1, plan
    assert plan.count("Window") >= 1, plan


def test_a18_histogram_partial_aggregation(spark):
    """a18's histogram must map-side combine into at most #buckets
    groups before its only shuffle (partial + final HashAggregate)."""
    plan = plan_of(spark, "a18_value_histogram")
    assert plan.count("HashAggregate") >= 2, plan


def test_g1_pagerank_no_cartesian_and_partial_aggs(spark):
    """g1's power steps are equi-joins on (kind, node) plus partial+final
    aggregates — never a cartesian/nested-loop product over the edge
    list."""
    plan = plan_of(spark, "g1_pagerank")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan


def test_m13_delete_application_is_anti_join(spark):
    """m13's merge-on-read reconciliation must be a LEFT ANTI equi-join
    of the base scan against the (much smaller) delete file — never a
    filter materialized from collected keys or a nested-loop shape."""
    plan = plan_of(spark, "m13_merge_on_read_scan")
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_m18_bitmap_counts_aggregate_partially(spark):
    """m18 runs two aggregation trees (exact distinct + bitmap build/
    merge); both must be partial+final — at least four aggregate nodes
    in the plan, and no shuffle of raw keys for the bitmap side beyond
    the grouped bitmap rows."""
    plan = plan_of(spark, "m18_bitmap_distinct")
    n_aggs = plan.count("HashAggregate") + plan.count("ObjectHashAggregate")
    assert n_aggs >= 4, plan


def test_p8_inlist_and_disjunction_push_to_scan(spark):
    """p8's IN-list and OR-of-equalities must BOTH reach the parquet
    reader as pushed filters."""
    plan = plan_of(spark, "p8_inlist_disjunction_filter")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "In(o_orderstatus" in pushed, pushed
    assert "Or(EqualTo(o_orderpriority" in pushed, pushed


def test_pp10_funnel_no_cartesian_no_forced_corpus_broadcast(spark):
    """pp10's funnel stage (gates -> URL -> exact -> LSH -> image
    near-dup -> sample -> split) must stay banded end-to-end: no
    cartesian/nested-loop product anywhere, candidates from bucket
    aggregates + in-bucket explodes, and no forced broadcast of a
    corpus-sized frame (the only .broadcast hints in the lineage are
    the constant-size bloom and the bucket-prefix frames, which appear
    downstream, not here)."""
    from apache_iceberg_spark.operators.pipeline import _pp1_curated_frame

    df = _pp1_curated_frame(
        spark, SF_DIR, fuzzy=True, image_dedup=True
    )
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate" in plan, plan  # LSH band + Hamming band explodes


def test_pp10_pack_stage_no_single_partition_corpus_sort(spark):
    """pp10's output stage (shuffle-ordered packing of the train split)
    must compute the global order via per-bucket windows + a broadcast
    prefix rebase (pp8/pp2's two-level shape): the only SinglePartition
    exchange allowed is the ~256-row bucket-totals window, and the span
    explode must be a Generate, not a join."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(spark, "pp10_pretraining_job")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    import re

    assert "CartesianProduct" not in plan, plan
    # The decontam stage's ONE nested-loop join is the 1-row bloom-
    # bitmap attach (bloom_prefilter's documented crossJoin); any other
    # BNLJ would be a real product over data-sized frames. Formatted
    # explain re-prints a cached relation's build plan under EACH
    # InMemoryTableScan section (pp10 caches the tiny tr frame), so the
    # bloom attach may appear more than once — assert the KIND, not the
    # count: every BNLJ's join condition must probe the __bloom bitmap.
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) BroadcastNestedLoopJoin", line):
            cond = next(
                (l for l in lines[i + 1 : i + 4] if "Join condition:" in l),
                "",
            )
            assert "__bloom" in cond, f"non-bloom BNLJ: {line}\n{cond}"
    assert "hashpartitioning(bucket" in plan, plan
    # Only two KINDS of tiny SinglePartition exchange are allowed: the
    # 1-row bloom-bitmap collect (input = the partial collect_list `buf`)
    # and the ~256-row bucket-totals window (input = [bucket, btot]).
    # Kind, not count: formatted explain inlines the cached tr relation's
    # build plan once per InMemoryTableScan, so the bloom exchange can
    # legitimately PRINT more than once while executing once.
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "SinglePartition, ENSURE_REQUIREMENTS" in line:
            ctx = " ".join(lines[max(0, i - 3) : i + 1])
            assert "buf#" in ctx or "btot#" in ctx, (
                f"corpus-sized SinglePartition exchange:\n{ctx}"
            )
    assert "Generate" in plan, plan


def test_dd14_edge_generation_is_banded_never_posting_join(spark):
    """dd14's cluster edges must come from dd2's banded candidate
    machinery — a bucket collect_list + in-bucket pair explode — never
    from a raw shingle-posting self-join (dd6's oracle-friendly shape):
    no join in the pair plan may key on an exploded gram/shingle
    column, and no cartesian anywhere."""
    from apache_iceberg_spark.operators.dedup import minhash_lsh_pairs
    from apache_iceberg_spark.tables import load_table

    pairs = minhash_lsh_pairs(load_table(spark, SF_DIR, "documents"))
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate" in plan, plan  # band + in-bucket pair explodes
    for line in plan.splitlines():
        if "Join" in line:
            assert "gram" not in line and "shingle" not in line, line


def test_dd15_probe_joins_index_on_band_key(spark):
    """dd15's candidate generation must be an equi-join of the batch's
    band rows onto the band index — no cartesian/nested-loop product
    over documents (the only nested-loop join allowed is the 1-row
    split-scalar broadcast), and the candidate join keys on band_key."""
    plan = plan_of(spark, "dd15_incremental_dedup")
    assert "CartesianProduct" not in plan, plan
    # Nested-loop joins in this plan may only be the 1-row split-scalar
    # attaches (crossJoin of an aggregate scalar onto the scan).
    import re

    bnlj = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, flags=re.M)
    assert len(bnlj) <= 2, plan
    assert "band_key" in plan, plan


def test_pp11_no_global_single_partition_sort(spark):
    """pp11's curriculum rank must come from per-(bucket, sub) windows +
    a broadcast prefix rebase — never a single-partition window over the
    corpus (ntile/global ROW_NUMBER shape). The only SinglePartition
    exchange allowed feeds the tiny unit-count frame."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(spark, "pp11_curriculum_order")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "hashpartitioning(quality_bucket" in plan, plan
    single = re.findall(r"SinglePartition, ENSURE_REQUIREMENTS", plan)
    assert len(single) <= 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_dd17_candidates_come_from_cell_equijoin(spark):
    """dd17's SemDeDup pair generation must be the CELL equi-join the
    docstring promises (sum(cell^2) candidates, cell_id-co-locatable at
    scale), never an all-pairs product: the only nested-loop joins in
    the plan are the broadcast 1-row centroid-array attaches (cents),
    and a hash/sort-merge join keyed on cell_id exists."""
    import re

    plan = plan_of(spark, "dd17_semantic_dedup")
    assert "CartesianProduct" not in plan, plan
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) BroadcastNestedLoopJoin", line):
            # 1-row cents attach: a Cross join whose only condition (if
            # Catalyst pushed one) references the broadcast centroid
            # array — anything conditioned on data-vs-data columns would
            # be a real product.
            ctx = " ".join(lines[i : i + 4])
            assert "Join condition: None" in ctx or "cents#" in ctx, ctx
    assert re.search(r"(SortMergeJoin|BroadcastHashJoin).*\n.*cell_id", plan) or (
        "cell_id" in plan and ("SortMergeJoin" in plan or "BroadcastHashJoin" in plan)
    ), plan


def test_ann14_probe_side_has_no_wide_join(spark):
    """ann14's batch probe must be map-only over the broadcast trained
    centroids: no shuffled join anywhere (the only joins are broadcast —
    the 1-row cents attach and the final tiny per-cell left join)."""
    plan = plan_of(spark, "ann14_incremental_index_update")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_tx15_has_no_python_udf_and_no_product(spark):
    """tx15's merge rounds run as expression folds over the vocab — no
    Python UDF in the plan (the rewrite is a SQL aggregate fold) and no
    cartesian product (the per-round top-1 pair attaches as a broadcast
    1-row frame)."""
    plan = plan_of(spark, "tx15_bpe_merges")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_st13_static_index_and_stream_probe_shapes(spark):
    """st13's STATIC side (the trained index) must assign the existing
    corpus map-only: same no-wide-join property as ann14 on the batch
    twin's plan (the streaming plan itself is exercised end-to-end by
    the equality test in test_round6_ops)."""
    plan = plan_of(spark, "ann14_incremental_index_update")
    assert "SortMergeJoin" not in plan, plan


# --- round-7 operator plan shapes -------------------------------------------


def test_mm9_is_map_only(spark):
    """mm9's frame features are pure expression folds over the scan: no
    shuffle (Exchange), no join, no Python UDF — the zero-shuffle claim
    in its docstring, pinned."""
    plan = plan_of(spark, "mm9_audio_frame_features")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_tx16_totals_attach_broadcast(spark):
    """tx16's corpus-total scalar and corpus-mean scalar must attach as
    broadcast 1-row frames (BroadcastNestedLoopJoin on a literal-true
    condition), never as a shuffled join; no cartesian product of
    data-sized frames."""
    plan = plan_of(spark, "tx16_rarity_filter")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ts11_no_wide_join_and_two_aggregation_levels(spark):
    """ts11 is two grouping levels (user x bucket, then user) with no
    join anywhere — the segmented fold must not smuggle in a self-join."""
    plan = plan_of(spark, "ts11_ewma_segmented")
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") \
        + plan.count("SortAggregate") >= 2


def test_g4_no_cartesian_and_anti_join_present(spark):
    """g4's wedge join is an equi-join on the shared neighbor and the
    non-adjacency filter is a LEFT ANTI join — no cartesian product of
    node-scale frames anywhere."""
    plan = plan_of(spark, "g4_link_prediction")
    assert "CartesianProduct" not in plan, plan
    assert "LeftAnti" in plan, plan


def test_ann14_report_join_is_broadcast_union(spark):
    """ann14's full-outer-semantics report join must stay broadcast
    (LEFT + LEFT-ANTI union) — a native full outer would re-introduce
    the SortMergeJoin the no-wide-join test bans."""
    plan = plan_of(spark, "ann14_incremental_index_update")
    assert "SortMergeJoin" not in plan, plan
    assert "Union" in plan, plan


def test_dynamic_partition_pruning_fires_on_partitioned_join(spark, tmp_path):
    """Dynamic partition pruning — the scan-time optimization static
    pruning (m3) can't do: when the partition filter only exists on the
    DIM side of a join, Spark must inject a DPP subquery so the FACT
    scan reads only the dim-selected partitions. At 100 TB this is the
    difference between scanning 3 months and scanning 7 years."""
    import pyspark.sql.functions as SF

    from apache_iceberg_spark.tables import load_table
    from tests.conftest import SF_DIR

    o = load_table(spark, SF_DIR, "orders").withColumn(
        "o_month", SF.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "orders_part")
    o.write.partitionBy("o_month").parquet(path)
    fact = spark.read.parquet(path)
    # dim side carries a real selective FILTER (DPP derives its pruning
    # subquery from dim-side predicates; a limit() does not qualify)
    dim = (
        o.select("o_month").distinct()
        .filter(SF.col("o_month") < "1993-01")
        .withColumn("flag", SF.lit(1))
    )
    q = (
        fact.join(dim, "o_month")
        .groupBy("o_month")
        .agg(SF.count("*").alias("n"))
    )
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), plan


def test_a21_is_single_aggregation_no_join(spark):
    """a21's exact-moment correlation is one partial+final aggregate
    over the scan — no join anywhere, and the moments merge map-side."""
    plan = plan_of(spark, "a21_correlation")
    assert "Join" not in plan, plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_a22_sketch_joins_stay_small(spark):
    """a22's estimate join must broadcast the 256-cell sketch (never a
    cartesian product); the corpus-side work is the two group-bys."""
    plan = plan_of(spark, "a22_countmin_heavy_hitters")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_m25_surviving_file_scan_is_shuffle_free(spark):
    """m25's post-delete read is a pure file scan + project: the
    metadata delete already did the work, so the query plan must
    contain no Exchange and no Join."""
    plan = plan_of(spark, "m25_partition_delete_scan")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


# --- round-8 operator plan shapes -------------------------------------------


def test_tx19_scoring_is_map_only(spark):
    """tx19's pinned-coefficient margin is a pure expression fold over the
    documents scan — no Exchange, no Join, no Python UDF, no MLlib: the
    'no MLlib at inference' requirement of VERDICT r7 ask #4, pinned."""
    plan = plan_of(spark, "tx19_quality_classifier")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_ts14_two_shuffles_no_wide_join(spark):
    """ts14's claim: profile agg + moments agg are the ONLY exchanges;
    both joins broadcast back to the event stream (never SMJ)."""
    import re

    plan = plan_of(spark, "ts14_seasonal_anomalies")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)) == 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_f14_w11_single_shuffle(spark):
    """f14's rollup and w11's window each shuffle exactly once on their
    key — constant per-key state, no second pass."""
    import re

    for name in ("f14_bitmask_rollup", "w11_rolling_median"):
        plan = plan_of(spark, name)
        n = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
        assert n == 1, (name, plan)


def test_pp15_cube_expands_cells_not_docs(spark):
    """pp15's CUBE claim: exactly one Expand, placed AFTER the fine-cell
    aggregation (the Expand's subtree must contain the cell HashAggregate,
    so the 8-way expansion multiplies cells, never document rows)."""
    plan = plan_of(spark, "pp15_curation_ablation_grid")
    assert plan.count(") Expand") == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_ann18_no_wide_join_anywhere(spark):
    """ann18's corpus-touched-once claim: every join in the MMR rounds is
    a broadcast (Q-row selected sets), never a sort-merge or cartesian."""
    plan = plan_of(spark, "ann18_mmr_diverse_topk")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_round8_no_cartesian(spark):
    """No round-8 operator may degenerate into a cartesian product."""
    for name in (
        "dd19_dup_span_fraction",
        "g6_katz_centrality",
        "tx20_bigram_surprisal",
        "a25_ks_drift",
        "a24_gini_diversity",
        "m26_clustering_depth_report",
    ):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, (name, plan)


def test_ts19_no_window_and_broadcast_lags(spark):
    """ts19's ACF must come from shifted-index equi-joins, never a
    SinglePartition window with lag() over the spine (the shape the
    docstring promises), and the lag/global frames must broadcast."""
    plan = plan_of(spark, "ts19_autocorrelation")
    assert "Window" not in plan, plan
    assert "BroadcastExchange" in plan
    # the spine self-join is an equi-join on the shifted index
    assert "t#" in plan or "Join" in plan


def test_g9_wedge_join_and_broadcast_degrees(spark):
    """g9 shares g2/g4's bounded wedge join and nothing goes cartesian
    (degree joins are adaptive — broadcast at this scale, shuffleable
    at web scale, never forced)."""
    plan = plan_of(spark, "g9_neighborhood_jaccard")
    assert "CartesianProduct" not in plan
    spark.catalog.clearCache()  # _knn_edges plan-cache


def test_a29_single_scan_with_windows_over_cells(spark):
    """a29's marginals are window sums over the 15-cell frame — orders
    must be scanned ONCE (one scan node), not re-aggregated per
    marginal."""
    plan = plan_of(spark, "a29_chi_square_independence")
    # tree nodes print as "Scan parquet  (N)"; the detail section
    # repeats the name once per node, so count the tree form
    assert plan.count("Scan parquet  (") == 1, plan
    assert plan.count("Window") >= 3  # the three marginal windows


# --- round 11 ----------------------------------------------------------------


def test_round11_no_cartesian(spark):
    for name in (
        "a34_kruskal_wallis",
        "a35_brown_forsythe",
        "w16_winsorized_mean",
        "ts23_seasonal_strength",
        "g11_local_clustering",
        "j9_tolerance_asof_join",
        "pp19_mixture_weights",
        "pp20_shard_planner",
        "mm11_aspect_bucket_report",
        "tx24_zipf_fit",
        "f16_try_functions",
    ):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, (name, plan)
    spark.catalog.clearCache()  # g11's _knn_edges plan-cache


def test_ts23_single_scan_no_window_no_join(spark):
    """ts23's decomposition is ONE map-side-combined pass: one scan,
    zero windows, zero joins — the scan-bandwidth shape the docstring
    promises."""
    plan = plan_of(spark, "ts23_seasonal_strength")
    assert plan.count("Scan parquet  (") == 1, plan
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_j9_single_user_shuffle_no_pair_explosion(spark):
    """j9 must be the union-merge (one user_id window over interleaved
    sides), never the equality-join + filter that materializes
    event x prior-order pairs."""
    plan = plan_of(spark, "j9_tolerance_asof_join")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "NestedLoopJoin"):
        assert j not in plan, (j, plan)
    assert plan.count(") Window") == 1, plan  # detail-header count


def test_pp20_windows_are_bucketed_not_global(spark):
    """pp20's prefix sum: the per-doc window partitions by bucket; the
    only unpartitioned window runs over the tiny bucket-totals frame
    (n_docs/128 rows), exactly pp2's scale shape."""
    plan = plan_of(spark, "pp20_shard_planner")
    # both windows present: one partitioned (bucket), one tiny global
    assert plan.count(") Window") == 2, plan  # detail-header count
    assert "BroadcastExchange" in plan  # the bucket-prefix broadcast


def test_mm11_is_map_only_plus_tiny_groupby(spark):
    plan = plan_of(spark, "mm11_aspect_bucket_report")
    assert plan.count("Scan parquet  (") == 1, plan
    assert "Join" not in plan and "Window" not in plan, plan


def test_w16_a35_windows_only_over_distinct_frames(spark):
    """w16/a35's cumsum windows run over the grouped DISTINCT-value
    frame: the window input must be a HashAggregate, never the raw
    fact scan."""
    for name in ("w16_winsorized_mean", "a35_brown_forsythe"):
        plan = plan_of(spark, name)
        assert "HashAggregate" in plan and "Window" in plan, (name, plan)
        # the raw frame is scanned once and persisted (plan-cache);
        # windows see aggregated inputs
        assert "InMemoryTableScan" in plan, (name, plan)
    spark.catalog.clearCache()


# --- round-12 operators: plan shapes ------------------------------------------


def n_distinct_scans(plan: str) -> int:
    """Distinct parquet-scan NODES in a formatted plan. A persisted
    frame's InMemoryRelation reprints its child scan under every
    InMemoryTableScan occurrence in the tree, but with the SAME node id
    — at runtime that scan executes once (cache materialization), so
    the honest count is distinct ids, not textual occurrences."""
    import re

    return len(set(re.findall(r"Scan parquet\s+\((\d+)\)", plan)))


def test_j10_anchors_broadcast_facts_stream(spark):
    """Both interpolation anchor slots are broadcast joins — the fact
    table never shuffles into a SortMergeJoin at any scale (the anchor
    table is calendar-bounded) — and events is scanned ONCE: probe side
    and anchor series both derive from the persisted projected pass."""
    plan = plan_of(spark, "j10_linear_interp_join")
    assert n_distinct_scans(plan) == 1, plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_ts25_single_fact_scan(spark):
    plan = plan_of(spark, "ts25_cusum_changepoint")
    assert n_distinct_scans(plan) == 1, plan


def test_w17_bounds_broadcast_back(spark):
    """Trimmed mean joins the per-group percentile bounds back to the
    facts as a broadcast (w16's shape) — the fact side never sort-merge
    shuffles for the 5-row bounds."""
    plan = plan_of(spark, "w17_trimmed_mean")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- round-12 second session: rank-stat family plan shapes --------------------


def test_a40_single_fact_scan(spark):
    """The fact table reaches the plan exactly once, and since the
    round-13 join-free rewrite the doubled mid-ranks attach per cell via
    range/tie windows — NO join operator of any kind survives in the
    plan (the r12 spelling shuffle-joined two marginal rank frames back
    onto the cells)."""
    plan = plan_of(spark, "a40_spearman_rho")
    assert n_distinct_scans(plan) == 1, plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan


def test_a41_single_fact_scan_and_grid_sized_joins(spark):
    """One lineitem scan; the only BroadcastNestedLoopJoins are the
    dense-grid cross join and the 1-row ties/n0 folds — every frame past
    the first groupBy is grid-sized, never fact-sized."""
    plan = plan_of(spark, "a41_kendall_tau_b")
    assert n_distinct_scans(plan) == 1, plan
    assert "SortMergeJoin" not in plan


def test_tx26_one_token_shuffle_then_vocab_sized(spark):
    """Documents are scanned once; the plan is explode -> one token
    count shuffle -> per-lang re-agg. No joins, no windows."""
    plan = plan_of(spark, "tx26_token_entropy")
    assert n_distinct_scans(plan) == 1, plan
    assert "Join" not in plan
    assert "Window" not in plan.replace("WindowGroupLimit", "")


# --- round-13 plan shapes ------------------------------------------------------


def test_a45_single_scan_broadcast_marginals(spark):
    """One events scan feeds the cell frame; the marginals and total
    come back as broadcasts — no sort-merge join anywhere."""
    plan = plan_of(spark, "a45_mutual_information")
    assert n_distinct_scans(plan) == 1, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_a47_single_scan_one_shuffle_histogram(spark):
    """The two-sided histogram rides ONE shuffle of the fact scan; the
    1-row total is a broadcast, never a join of two histograms."""
    plan = plan_of(spark, "a47_js_divergence")
    assert n_distinct_scans(plan) == 1, plan
    assert "SortMergeJoin" not in plan


def test_w18_windows_share_one_pass(spark):
    """Both extrema windows share partition AND sort order, so Catalyst
    plans a single Window node over one sort."""
    plan = plan_of(spark, "w18_rolling_extrema_channel")
    assert plan.count("(4) Window") + plan.count(" Window\n") >= 0  # parse ok
    # exactly one Window operator id in the formatted plan
    import re

    nodes = re.findall(r"\(\d+\) Window", plan)
    assert len(nodes) == 1, plan


def test_tx27_no_global_single_partition_rank(spark):
    """The ingestion rank is the distributed bucket+prefix form: the
    per-doc rank window is PARTITIONED by the value-range bucket (the
    only global-order window is the 64-row bucket-prefix cumsum over
    the tiny agg output, not the corpus). Two distinct scans are the
    honest shape: the prefix branch re-reads ONE column (doc_id) to
    count per-bucket totals — cheaper than persisting the token-array
    frame it would otherwise share."""
    plan = plan_of(spark, "tx27_heaps_law_fit")
    assert n_distinct_scans(plan) <= 2, plan
    # the corpus-scale rank window must carry the bucket partition key
    assert "windowspecdefinition(bucket" in plan, plan


def test_a49_no_fact_scale_after_replica_groupby(spark):
    """a43's shape holds for the paired variant: candidates never join
    back to facts — everything after the 100-row replica groupBy is
    replica-sized (no sort-merge join, one scan... the point estimate
    re-scans, so two scans total)."""
    plan = plan_of(spark, "a49_bootstrap_diff_ci")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# --- round-14 plan shapes ------------------------------------------------------


def test_a51_single_scan_broadcast_marginals(spark):
    """a45's audited plan shape holds for the G-test variant: one
    events scan to cells, broadcast marginals, no sort-merge join."""
    plan = plan_of(spark, "a51_g_test")
    assert n_distinct_scans(plan) == 1, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_a52_hll_fold_is_support_sized(spark):
    """The HLL estimate folds 64 registers — after the distinct-hash
    shuffle nothing fact-scale remains (no sort-merge join, no
    cartesian beyond the 1-row broadcast exact cross)."""
    plan = plan_of(spark, "a52_hyperloglog_distinct")
    assert "SortMergeJoin" not in plan, plan


def test_dd25_bloom_is_broadcast(spark):
    """The probe side joins the <=131-row word table as a BROADCAST —
    the whole point of a Bloom gate is that the filter ships to the
    data, never the reverse."""
    plan = plan_of(spark, "dd25_bloom_filter_gate")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ts33_single_scan_to_cells(spark):
    """One events scan feeds the (day, hour, type) cells; window
    finishes are support-sized aggregations, no joins at all."""
    plan = plan_of(spark, "ts33_windowed_entropy")
    assert n_distinct_scans(plan) == 1, plan
    assert "Join" not in plan, plan


def test_pp24_one_corpus_pass(spark):
    """The epoch schedule touches the corpus ONCE (per-domain token
    counts); the candidate frame and window cumsum are |domains|x4
    rows, and the budget row attaches as a broadcast."""
    plan = plan_of(spark, "pp24_epoch_schedule")
    assert n_distinct_scans(plan) <= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_g15_no_cartesian_thresholds_broadcast(spark):
    """The threshold sweep joins the 4-row k frame and the skinny rich
    memberships by broadcast; no all-pairs term anywhere."""
    plan = plan_of(spark, "g15_rich_club")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_j11_band_join_is_hash_join_not_nested_loop(spark):
    """The banded rewrite must plan as an equi hash/sort join on the
    bucket key — never BroadcastNestedLoopJoin or CartesianProduct,
    which is what the naive |a-b| <= tol condition degenerates to."""
    plan = plan_of(spark, "j11_band_join")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_a53_support_sized_after_one_fact_shuffle(spark):
    """Kendall's pair counting must stay on the cell grid: ONE fact
    scan feeding the cell groupBy; the densify crossJoin broadcasts
    the 24-row hour axis (support-sized), never a fact-scale
    cartesian; no sort-merge join anywhere (everything post-cells is
    windows + broadcasts)."""
    plan = plan_of(spark, "a53_kendall_tau")
    assert n_distinct_scans(plan) == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_ts34_single_fact_scan_per_branch(spark):
    """Mann-Kendall reuses the same cell machinery over the 30-row
    daily series: no cartesian, no sort-merge join; the only
    fact-scale work is the daily groupBy scans."""
    plan = plan_of(spark, "ts34_mann_kendall")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_g17_kcore_semi_joins_no_cartesian(spark):
    """Each peel round is two degree aggregations + two semi-joins on
    the shrinking edge frame — no cartesian, no nested loop, and the
    degree frames (left-semi keep lists) broadcast under AQE at this
    scale."""
    plan = plan_of(spark, "g17_kcore")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tx29_one_shuffle_to_frequency_table(spark):
    """The vocabulary profile is aggregates of ONE tokenize+groupBy;
    the top-k head is a support-sized TakeOrdered, never a global
    sort of the fact rows."""
    plan = plan_of(spark, "tx29_zipf_hapax")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_m60_partition_pruning_through_mor_anti_join(spark):
    """The month predicate must reach EVERY data scan as a
    PartitionFilter (Catalyst pushes it below the delete anti-join —
    it references only scan-side columns), and the skinny delete-key
    set must broadcast: a partitioned CDC table's single-month read
    touches one partition per data dir, never the table."""
    plan = plan_of(spark, "m60_partitioned_mor_scan")
    pf = [
        l for l in plan.splitlines()
        if "PartitionFilters" in l and "1995-03" in l
    ]
    assert len(pf) >= 2, plan  # seed dir AND merge delta both pruned
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dd26_single_pass_cascade(spark):
    """All four normalization levels' distinct counts come from ONE
    corpus scan (digests computed before the count-distinct expand;
    stack unfolds the single agg row — no per-level re-aggregation)."""
    plan = plan_of(spark, "dd26_normalization_cascade")
    assert n_distinct_scans(plan) == 1, plan
    assert "Join" not in plan, plan
