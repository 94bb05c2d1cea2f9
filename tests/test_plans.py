"""Plan-regression tests: the optimizer properties SCALE.md claims —
pushdown reaching the parquet scan, dims broadcast, top-k compiling to
TakeOrdered — asserted on the actual physical plans so a refactor that
silently loses them fails CI, not the 100 TB run."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


@pytest.fixture(scope="module")
def queries():
    from deftunes_spark.registry import QUERIES

    return QUERIES


def test_bi_view_broadcasts_dim(spark, queries):
    plan = _plan(queries["sales_per_artist"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_reaches_parquet_scan(spark, queries):
    fmt = _formatted(queries["filter_pushdown"](spark, SF))
    assert "PushedFilters: [" in fmt
    # The filter columns actually arrive at the scan, not post-scan.
    assert "GreaterThanOrEqual(l_shipdate" in fmt


def test_projection_prunes_scan_columns(spark, queries):
    fmt = _formatted(queries["sales_per_artist"](spark, SF))
    # lineitem has 16 columns; the scan must read only the 3 used
    # (ReadSchema renders struct<a:t,b:t,c:t> → ≤4 colons).
    line = next(ln for ln in fmt.splitlines() if "ReadSchema" in ln)
    assert line.count(":") <= 4


def test_topk_is_take_ordered_not_global_sort(spark, queries):
    plan = _plan(queries["order_limit"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_agg_is_partial_then_final(spark, queries):
    plan = _plan(queries["sales_per_country"](spark, SF))
    # Two HashAggregate nodes (partial map-side + final) around one
    # exchange: map-side combine is active.
    assert plan.count("HashAggregate") >= 2


def test_rollup_single_expand_no_extra_scans(spark, queries):
    plan = _plan(queries["rollup_agg"](spark, SF))
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan


def test_asof_join_uses_hash_join_not_nested_loop(spark, queries):
    plan = _plan(queries["asof_join_click_view"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_two_shuffle_rounds(spark):
    """The r2 rewrite replaced window+rejoin (3 shuffle rounds, and a
    2-branch reference to the id-tagged frame) with left-join +
    max_by aggregation: at most 3 Exchange nodes (left-by-keys,
    right-by-keys, by-row-id) and a single plan branch."""
    from pyspark.sql import functions as F

    from deftunes_spark.ext.joins import asof_join

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(100).select(
            (F.col("id") % 5).alias("k"),
            F.timestamp_seconds(F.col("id") * 60).alias("lt"),
        )
        right = spark.range(100).select(
            (F.col("id") % 5).alias("k"),
            F.timestamp_seconds(F.col("id") * 45).alias("rt"),
            F.col("id").alias("payload"),
        )
        plan = _plan(asof_join(left, right, ["k"], "lt", "rt"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plan.count("Exchange") <= 3, plan


def test_range_join_uses_equi_join(spark, queries):
    plan = _plan(queries["range_join_1h"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Runtime row-level filtering: a selective filter on the orders
    side should inject a bloom-filter semi-filter into the lineitem
    scan side of a shuffle join (Spark's runtime bloom filter — the
    row-group-level cousin of dynamic partition pruning). Thresholds
    are lowered to local-test scale; at cluster scale the defaults
    (10 GB application side) gate it to genuinely large scans."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt
        assert "might_contain" in opt
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_mapside_minhash_signatures_have_zero_exchange(spark):
    """The production MinHash signature stage must be shuffle-free:
    array_min-over-transform per row, no explode, no groupBy — the
    whole point of minhash_signatures_mapside at 100 TB. Any Exchange
    in its plan is a regression."""
    from deftunes_spark.ext.dedup import minhash_signatures_mapside

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sig = minhash_signatures_mapside(docs, "doc_id", "text", n=2,
                                     num_hashes=16)
    plan = _plan(sig)
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode either


def test_segment_dedup_payload_never_shuffles(spark):
    """segment_dedup's broadcast path: the returned plan (the payload
    pass — hot-set already collected) must contain NO Exchange: the
    document payload rides the scan, filtered per row. Both physical
    shapes (small literal array, large frozenset UDF) hold this."""
    from deftunes_spark.ext.curation import segment_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for lit_max in (256, 0):  # literal-array shape, then UDF shape
        out = segment_dedup(
            docs, "doc_id", "text", seg_tokens=3, max_doc_freq=2,
            literal_max=lit_max,
        )
        plan = _plan(out)
        assert "Exchange" not in plan, f"literal_max={lit_max}"


def test_gopher_rules_is_scan_speed_no_exchange(spark, queries):
    """The published quality-rule pass must stay a pure projection:
    one scan, zero shuffles, no UDF."""
    plan = _plan(queries["gopher_rules"](spark, SF))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_char_entropy_partial_aggregates(spark, queries):
    """Both aggs of the entropy pipeline map-side combine, so the
    shuffle carries alphabet-bounded partial counts, not characters."""
    fmt = _formatted(queries["text_char_entropy"](spark, SF))
    assert fmt.count("HashAggregate") >= 4  # partial+final × two aggs
    assert "partial_count" in fmt or "Partial" in fmt


def test_training_shuffle_single_exchange(spark, queries):
    """Export sharding = one hash Exchange on shard + in-partition
    sort; the key/shard derivations stay codegen projections."""
    plan = _plan(queries["training_shuffle"](spark, SF))
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan


def test_ivfpq_prunes_before_pq_and_takeordered(spark, queries):
    """IVF filter applies before ADC scoring; both top-k boundaries
    compile to TakeOrderedAndProject, never a global Sort."""
    plan = _plan(queries["ann_ivfpq_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    # No key shuffle anywhere — the only Exchange is _t_cpu's
    # round-robin input spread for compute parallelism.
    assert "hashpartitioning" not in plan.lower()


def test_partition_pruning_on_partitioned_table(spark, tmp_path):
    """Directory-level partition pruning: a date-partitioned write
    read back with a partition predicate must scan ONLY the matching
    partition directories (PartitionFilters at the scan, not a
    post-scan Filter over all files)."""
    import pyspark.sql.functions as F

    path = str(tmp_path / "pt")
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("day"),
    )
    df.write.partitionBy("day").mode("overwrite").parquet(path)
    q = spark.read.parquet(path).filter(F.col("day") == "3")
    fmt_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    fmt = q._jdf.queryExecution().explainString(fmt_mode)
    line = next(ln for ln in fmt.splitlines() if "PartitionFilters" in ln)
    assert "day" in line  # predicate reached the partition pruner
    # And the scan enumerates one partition's files only.
    assert q.rdd.getNumPartitions() <= 4
    assert q.count() == len([i for i in range(1000) if i % 7 == 3])


def test_bpe_decode_is_pure_projection_over_encode(spark, queries):
    """bpe_decode (r10) must add ZERO plan nodes beyond the encode
    stage it consumes: no Exchange (the inverse-id map is a literal),
    no extra Python boundary (decode is codegen, not a UDF) — the
    whole chain is scan -> one MapInPandas (the encode) -> project."""
    plan = _plan(queries["bpe_decode"](spark, SF))
    assert plan.count("MapInPandas") == 1      # the encode, only
    assert "BatchEvalPython" not in plan       # decode never Python
    assert "hashpartitioning" not in plan.lower()  # no key shuffle


def test_shard_manifest_single_partial_final_agg(spark, tmp_path):
    """The shard manifest over a read-back export: ONE hash aggregate
    pair (partial map-side, final after a single shard-key exchange),
    no UDF, no sort — the shape that holds at any shard count."""
    import pyspark.sql.functions as F

    from deftunes_spark.ext.export import shard_export, shard_manifest

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("text"),
    )
    path = str(tmp_path / "mshards")
    shard_export(docs, path, n_shards=4)
    plan = _plan(shard_manifest(spark.read.parquet(path)))
    low = plan.lower()
    assert low.count("exchange") == 1          # one shard-key shuffle
    assert "partial" in low                    # map-side combine
    assert "batchevalpython" not in low
    assert "mapinpandas" not in low
    assert "sort" not in low                   # agg, never a sort


def test_unigram_encode_rides_the_scan_zero_exchange(spark):
    """The corpus-scale unigram apply must be ONE Arrow mapInPandas
    stage over the scan — vocab tables travel in the closure, so any
    Exchange (or explode) in its plan is a regression (the bpe_encode
    contract, held for the second tokenizer family)."""
    from deftunes_spark.ext.tokenizer import unigram_encode

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = [("a", -1.0), ("b", -2.0), ("ab", -0.7)]
    for emit in ("units", "ids"):
        plan = _plan(unigram_encode(docs, vocab, emit=emit))
        assert "Exchange" not in plan, emit
        assert "MapInPandas" in plan, emit
        assert "Generate" not in plan, emit


def test_ngram_novelty_keyed_aggregate_then_join(spark, queries):
    """Novelty = shingle explode → map-side-combined doc-frequency agg
    → keyed join → doc rollup. Assert the join is a real equi-join
    (never nested-loop/cartesian) and both aggs partial-combine; a
    count-over-window rewrite (hot-shingle partition buffering) would
    drop the partial_count and is caught here."""
    fmt = _formatted(queries["ngram_novelty"](spark, SF))
    assert "CartesianProduct" not in fmt
    assert "BroadcastNestedLoopJoin" not in fmt
    assert "Window" not in fmt
    assert fmt.count("HashAggregate") >= 4  # partial+final × two aggs


def test_unigram_kl_sparse_decomposition_no_grid(spark, queries):
    """The KL plan must stay sparse: the observed-cells relation joins
    per-word q via a KEYED equi-join; only 1-row scalar aggregates may
    cross as broadcast nested loops (the audited class). A dense
    groups × vocab grid would surface as a non-scalar cartesian."""
    plan = _plan(queries["unigram_kl_divergence"](spark, SF))
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_unigram_decode_is_pure_projection_over_encode(spark, queries):
    """unigram_decode must add ZERO plan nodes beyond the encode stage
    it consumes — the bpe_decode contract held for the second
    tokenizer family: no Exchange (the inverse-id map is a literal),
    no extra Python boundary; scan -> one MapInPandas -> project."""
    plan = _plan(queries["unigram_decode"](spark, SF))
    assert plan.count("MapInPandas") == 1      # the encode, only
    assert "BatchEvalPython" not in plan       # decode never Python
    assert "hashpartitioning" not in plan.lower()  # no key shuffle
