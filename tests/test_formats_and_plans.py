"""Format round-trips + physical-plan quality audits.

The plan audits encode the 100 TB design contract mechanically:
filters reach the parquet scan, projections prune the read schema,
dimension joins broadcast, LSH pair generation never degrades to a
cartesian product.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    pushed_filters,
    scan_columns,
)
from nyc_taxi_data_warehouse_spark.queries import QUERIES
from nyc_taxi_data_warehouse_spark.sources import load_table
from nyc_taxi_data_warehouse_spark.sources.formats import read_any, write_any

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_format_round_trip(spark, tmp_path, fmt):
    src = load_table(spark, SF, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    write_any(src, path, fmt)
    back = read_any(spark, path, fmt, src.schema)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_filter_pushdown_reaches_scan(spark):
    li = load_table(spark, SF, "lineitem").where(F.col("l_quantity") < 5.0)
    filters = pushed_filters(li)
    assert any("l_quantity" in f for f in filters), filters


def test_projection_prunes_read_schema(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    cols = scan_columns(li)
    assert cols and set(cols[0]) == {"l_orderkey", "l_quantity"}, cols


def test_star_join_broadcasts_dims(spark):
    df = QUERIES["q05_local_supplier_volume"].spark(spark, SF)
    df.count()  # AQE finalizes the physical plan on execution
    assert_broadcast_join(df, n_expected=2)


def test_brand_join_broadcasts(spark):
    df = QUERIES["q07_brand_volume"].spark(spark, SF)
    df.count()
    assert_broadcast_join(df, n_expected=1)


def test_lsh_pair_generation_no_cartesian(spark):
    df = QUERIES["d03_minhash_lsh_pairs"].spark(spark, SF)
    assert_no_cartesian(df)


def test_range_join_no_cartesian(spark):
    df = QUERIES["a02_range_join_bursts"].spark(spark, SF)
    assert_no_cartesian(df)


def test_topk_uses_take_ordered(spark):
    df = QUERIES["q02_top_customers"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_salted_join_equals_plain_join(spark):
    from nyc_taxi_data_warehouse_spark.operators.skew import (
        explode_dim,
        key_skew_profile,
        salted_join,
    )

    li = load_table(spark, SF, "lineitem").withColumnRenamed("l_suppkey", "s_suppkey")
    s = load_table(spark, SF, "supplier")
    plain = li.join(s, "s_suppkey")
    salted = salted_join(li, s, on=["s_suppkey"], salt_from="l_orderkey", n_salts=8)
    assert salted.count() == plain.count()
    key = ["l_orderkey", "l_linenumber", "s_suppkey"]
    assert sorted(map(tuple, salted.select(*key).collect())) == sorted(
        map(tuple, plain.select(*key).collect())
    )
    # salt column must not leak, dim must be replicated exactly n_salts×
    assert "__salt" not in salted.columns
    assert explode_dim(s, 8).count() == s.count() * 8

    prof = key_skew_profile(li, "s_suppkey", top=3).collect()
    assert len(prof) == 3 and prof[0]["n"] >= prof[-1]["n"]


def test_pivot_has_no_extra_distinct_scan(spark):
    # explicit pivot values → exactly 2 parquet scans (orders, customer)
    # plus the broadcast nation scan; no values-discovery job.
    df = QUERIES["q31_pivot_status_by_nation"].spark(spark, SF)
    assert_broadcast_join(df, n_expected=1)
    assert_no_cartesian(df)


def test_exists_decorrelates_to_hash_joins(spark):
    df = QUERIES["q34_exists_subqueries"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert_no_cartesian(df)


def test_bucketed_join_has_no_shuffle(spark):
    """Co-bucketed tables joined on the bucket key: zero Exchange in the
    physical plan — the layout-level answer to fact-fact joins at scale."""
    from nyc_taxi_data_warehouse_spark.plans import assert_no_exchange
    from nyc_taxi_data_warehouse_spark.warehouse import file_stats, write_bucketed

    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    write_bucketed(orders.withColumnRenamed("o_custkey", "custkey"), "b_orders", "custkey", 4)
    write_bucketed(customer.withColumnRenamed("c_custkey", "custkey"), "b_customer", "custkey", 4)
    try:
        joined = (
            spark.table("b_orders")
            .hint("merge")
            .join(spark.table("b_customer"), "custkey")
            .groupBy("c_mktsegment")
            .count()
        )
        # grouping keys differ from bucket key → the agg may shuffle, but
        # the join itself must not: check the join subtree only
        j = spark.table("b_orders").hint("merge").join(spark.table("b_customer"), "custkey")
        assert_no_exchange(j)
        assert joined.count() == 5

        stats = file_stats(spark, "b_orders")
        assert stats["n_files"] >= 4 and stats["total_bytes"] > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_avro_gated_on_classpath(spark, tmp_path):
    """Avro is an external Spark module: it must appear in
    supported_formats (and round-trip) exactly when the jar is present,
    and be rejected up front with the remedy when it is not — the
    surface never advertises a capability the deployment lacks."""
    from nyc_taxi_data_warehouse_spark.sources.formats import (
        has_avro,
        supported_formats,
    )

    src = load_table(spark, SF, "orders")
    path = str(tmp_path / "orders_avro")
    if has_avro(spark):
        assert "avro" in supported_formats(spark)
        write_any(src, path, "avro")
        got = read_any(spark, path, "avro", src.schema)
        assert got.count() == src.count()
    else:
        assert "avro" not in supported_formats(spark)
        with pytest.raises(ValueError, match="spark-avro"):
            write_any(src, path, "avro")
        with pytest.raises(ValueError, match="spark-avro"):
            read_any(spark, path, "avro", src.schema)


def test_schema_evolution_merge(spark, tmp_path):
    """Files written under v1 (no column) and v2 (added column) must read
    as one frame, v1 rows null-filled, pinned to the target schema."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from nyc_taxi_data_warehouse_spark.sources.formats import read_evolving_parquet

    root = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string").write.parquet(
        root + "/v1"
    )
    spark.createDataFrame(
        [(3, "c", 1.5)], "id long, name string, score double"
    ).write.parquet(root + "/v2")

    target = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
            StructField("added_later", StringType()),  # in no file yet
        ]
    )
    got = read_evolving_parquet(spark, root + "/*", target)
    assert [f.name for f in got.schema.fields] == ["id", "name", "score", "added_later"]
    rows = {r["id"]: r for r in got.collect()}
    assert rows[1]["score"] is None and rows[3]["score"] == 1.5
    assert all(r["added_later"] is None for r in rows.values())


def test_kmeans_assignment_broadcasts_centroids(spark):
    """Every Lloyd's assignment round must be a broadcast join against
    the k x dim centroid table — the corpus side must never shuffle for
    assignment."""
    from nyc_taxi_data_warehouse_spark.plans.audit import (
        assert_broadcast_join,
        assert_no_cartesian,
    )

    df = QUERIES["k01_kmeans_clusters"].spark(spark, SF)
    assert_broadcast_join(df, n_expected=2)  # one per assignment round
    assert_no_cartesian(df)


def test_multiprobe_ann_broadcasts_queries(spark):
    """e08: the exploded (query x table x probe-mask) side broadcasts;
    the corpus index joins on (tbl, bucket) — no cartesian anywhere."""
    from nyc_taxi_data_warehouse_spark.plans.audit import (
        assert_broadcast_join,
        assert_no_cartesian,
    )

    df = QUERIES["e08_ann_multiprobe_topk"].spark(spark, SF)
    assert_broadcast_join(df, n_expected=1)
    assert_no_cartesian(df)


def test_decontamination_no_cartesian(spark):
    """p02 joins distinct grams hash-shuffled on the gram value — never
    a doc x doc comparison."""
    from nyc_taxi_data_warehouse_spark.plans.audit import assert_no_cartesian

    assert_no_cartesian(QUERIES["p02_decontamination"].spark(spark, SF))


def test_p02_broadcasts_eval_grams(spark):
    """The vocabulary-bounded eval gram set must broadcast so the train
    side never shuffles for the contamination join."""
    from nyc_taxi_data_warehouse_spark.plans.audit import assert_broadcast_join

    assert_broadcast_join(QUERIES["p02_decontamination"].spark(spark, SF))


def test_scd2_windows_share_one_exchange(spark):
    """q54's lag-then-lead window pair shares a single hashpartitioning
    Exchange on custkey (the trailing rangepartitioning is only the
    presentation orderBy)."""
    df = QUERIES["q54_scd2_order_status"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_repetition_stats_no_cartesian_and_prunes(spark):
    """t08 reads only (doc_id, text); its unigram/bigram mode passes are
    (doc_id, gram)-keyed aggregations, never an array O(n^2) scan."""
    from nyc_taxi_data_warehouse_spark.plans.audit import (
        assert_no_cartesian,
        scan_columns,
    )

    df = QUERIES["t08_repetition_stats"].spark(spark, SF)
    assert_no_cartesian(df)
    for cols in scan_columns(df):
        assert set(cols) <= {"doc_id", "text"}


def test_redaction_is_scan_then_agg(spark):
    """t07 is one scan + aggregate: the count_distinct plans the standard
    two-phase distinct aggregate (partial on (event_type, redacted), then
    final on event_type) — two hash Exchanges, both event_type-keyed, and
    the regex work stays in the scan stage (no join, no cartesian)."""
    from nyc_taxi_data_warehouse_spark.plans.audit import assert_no_cartesian

    df = QUERIES["t07_redaction"].spark(spark, SF)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_asof_directions_single_shuffle(spark):
    """a03 (forward) and a04 (nearest) keep the as-of guarantee: ONE
    hashpartitioning Exchange on the key — a04's backward and forward
    window frames share that partitioning (two sorts, one shuffle) — and
    no join operator at all (the trailing rangepartitioning is only the
    presentation orderBy)."""
    for q in ("a03_next_purchase_after_view", "a04_nearest_click_to_error"):
        plan = (
            QUERIES[q].spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1, q
        assert "Join" not in plan, q


def test_heavy_hitters_one_vocab_shuffle(spark):
    """t09: the exploded token groupBy is the only hashpartitioning
    Exchange (map-side partial combine absorbs the explode volume); the
    corpus total arrives as a scalar broadcast (BroadcastNestedLoopJoin
    on a 1-row side), never a cartesian on data."""
    from nyc_taxi_data_warehouse_spark.plans.audit import assert_no_cartesian

    df = QUERIES["t09_token_heavy_hitters"].spark(spark, SF)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_runtime_bloom_filter_injects_when_join_cannot_broadcast(spark):
    """Runtime row-level filtering, the 100 TB fact-fact join path: when
    the dim side is too big to broadcast (simulated by disabling
    broadcast), Spark must inject a bloom_filter_agg subquery on the
    selective side and a might_contain predicate on the fact scan — so
    the big side drops non-joining rows BEFORE the shuffle. Our conf
    stack keeps spark.sql.optimizer.runtime.bloomFilter.enabled (default
    true) unclobbered; with broadcast on (the engine default) the rule
    correctly stays out of the way — broadcast already prunes."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_warehouse_spark.sources import load_table

    l = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).groupBy("o_orderpriority").agg(
        F.sum("l_quantity").alias("qty")
    )
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        # default broadcast conf: rule stands down (broadcast prunes)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" not in plan

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # app-side scan threshold defaults to 10 GB — far above any local
        # fixture; drop it to exercise the rule at test scale
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        j2 = l.join(o, l["l_orderkey"] == o["o_orderkey"]).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_quantity").alias("qty"))
        plan2 = j2._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan2 and "might_contain" in plan2
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_ann_multi_broadcast_dial_flips_join_strategy(spark):
    """ann_topk_multi(broadcast_queries=...) must pick the join shape it
    documents: True broadcasts the probe set (interactive |Q|, corpus
    never shuffles); False shuffle-hash-joins on (tbl, bucket) so a
    batch |Q| ~ 10^7 never materializes on one node. Both shapes must
    return identical rows."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_warehouse_spark.operators.similarity import ann_topk_multi
    from nyc_taxi_data_warehouse_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 4)

    bcast = ann_topk_multi(q, emb, k=3, n_tables=2, probe_radius=1)
    plan_b = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b, plan_b[:2000]

    shuf = ann_topk_multi(
        q, emb, k=3, n_tables=2, probe_radius=1, broadcast_queries=False
    )
    plan_s = shuf._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan_s, plan_s[:2000]
    assert "BroadcastHashJoin" not in plan_s

    rows_b = sorted(map(tuple, bcast.collect()))
    rows_s = sorted(map(tuple, shuf.collect()))
    assert rows_b == rows_s and rows_b


def test_write_sorted_gives_disjoint_rowgroup_ranges(spark, tmp_path):
    """write_sorted must produce files whose parquet footer min/max key
    ranges are pairwise disjoint (the precondition that lets the pushed
    row-group filter skip everything but the matching file), and a range
    scan over the result must still push the predicate."""
    import os as _os

    import pyarrow.parquet as pq

    from nyc_taxi_data_warehouse_spark.plans.audit import pushed_filters
    from nyc_taxi_data_warehouse_spark.sources import load_table
    from nyc_taxi_data_warehouse_spark.warehouse.layout import write_sorted

    events = load_table(spark, SF, "events").select("event_id", "ts", "value")
    out = str(tmp_path / "events_sorted")
    write_sorted(events, out, "event_id", n_files=6)

    ranges = []
    for f in _os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(_os.path.join(out, f)).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "event_id"
            )
            ranges.append((col.statistics.min, col.statistics.max))
    assert len(ranges) >= 6
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping row-group ranges: {(lo1, hi1)} vs {(lo2, _hi2)}"

    scan = spark.read.parquet(out).where(F.col("event_id").between(100, 200))
    pushed = " ".join(pushed_filters(scan))
    assert "event_id" in pushed
    n_events = events.where(F.col("event_id").between(100, 200)).count()
    assert scan.count() == n_events


def test_write_sorted_range_scan_skips_row_groups_measured(spark, tmp_path):
    """The layout claim MEASURED, not inferred from footers: a selective
    range predicate over a write_sorted table must make the parquet
    reader skip non-intersecting row groups — the executed scan's
    numOutputRows equals the row count of just the row groups whose
    footer [min,max] intersects the predicate, a strict subset of the
    table."""
    import os as _os

    import pyarrow.parquet as pq

    from nyc_taxi_data_warehouse_spark.sources import load_table
    from nyc_taxi_data_warehouse_spark.warehouse.layout import write_sorted

    events = load_table(spark, SF, "events").select("event_id", "ts", "value")
    out = str(tmp_path / "events_sorted_skip")
    write_sorted(events, out, "event_id", n_files=6)

    lo, hi = 100, 200
    intersecting_rows = 0
    total_rows = 0
    for f in _os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(_os.path.join(out, f)).metadata
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            col = next(
                group.column(i)
                for i in range(group.num_columns)
                if group.column(i).path_in_schema == "event_id"
            )
            total_rows += group.num_rows
            if col.statistics.min <= hi and col.statistics.max >= lo:
                intersecting_rows += group.num_rows
    assert 0 < intersecting_rows < total_rows, "fixture not selective"

    df = spark.read.parquet(out).where(F.col("event_id").between(lo, hi))
    df.collect()  # materialize so the scan metrics are populated
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    scan_out = None
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "Scan" in node.nodeName():
            scan_out = node.metrics().apply("numOutputRows").value()
    assert scan_out == intersecting_rows
    assert scan_out < total_rows


def test_funnel_single_user_shuffle(spark):
    """q56: all three funnel stages chain over the same user-partitioned
    window — exactly ONE hashpartitioning Exchange, then the tiny global
    roll-up (SinglePartition) on per-user rows."""
    plan = (
        QUERIES["q56_funnel_stages"]
        .spark(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1


def test_export_training_shards_deterministic(spark, tmp_path):
    """Shard export: membership is a pure function of the id (re-export
    under a different input partitioning yields identical shards), every
    shard directory exists, and rows inside a shard come back sorted by
    the order column."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_warehouse_spark.sources import load_table
    from nyc_taxi_data_warehouse_spark.warehouse.layout import (
        export_training_shards,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    out1 = str(tmp_path / "shards1")
    out2 = str(tmp_path / "shards2")
    export_training_shards(docs, out1, "doc_id", n_shards=4)
    # same rows, adversarially different incoming partitioning
    export_training_shards(
        docs.repartition(13).sortWithinPartitions(F.desc("n_chars")),
        out2,
        "doc_id",
        n_shards=4,
    )

    r1 = spark.read.parquet(out1)
    r2 = spark.read.parquet(out2)
    a1 = {(r.doc_id, r.shard) for r in r1.collect()}
    a2 = {(r.doc_id, r.shard) for r in r2.collect()}
    assert a1 == a2 and len(a1) == docs.count()
    assert {r.shard for r in r1.select("shard").distinct().collect()} == {0, 1, 2, 3}
    for k in range(4):
        ids = [
            r.doc_id
            for r in spark.read.parquet(f"{out1}/shard={k}").collect()
        ]
        assert ids == sorted(ids), f"shard {k} not internally sorted"


def test_media_payloads_never_shuffle(spark):
    """m02/m03 contract at 100 TB: payload bytes are consumed by the
    Arrow decode (MapInPandas) inside the scan stage; every Exchange in
    the plan sits DOWNSTREAM of it, keyed on small decoded columns —
    media bytes never enter a shuffle. In the printed plan tree,
    children are BELOW parents, so downstream == smaller line index."""
    for q in ("m02_media_decode_features", "m03_frame_sampling_stats"):
        plan = (
            QUERIES[q].spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
        lines = plan.splitlines()
        map_idx = [i for i, ln in enumerate(lines) if "MapInPandas" in ln]
        assert map_idx, q
        exch_idx = [i for i, ln in enumerate(lines) if "Exchange" in ln]
        assert all(i < min(map_idx) for i in exch_idx), (q, plan[:2000])
        assert not any("payload" in lines[i] for i in exch_idx), q


def test_packing_shuffles_only_scalar_ints(spark):
    """p03 contract: the pack's applyInPandas grouping shuffle carries
    (grp, doc_id, seq_len) ints — document text is consumed in the scan
    stage, upstream of every Exchange. In the printed tree parents sit
    above children, so any post-shuffle operator referencing text would
    appear above an Exchange line."""
    plan = (
        QUERIES["p03_sequence_packing"]
        .spark(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    exch = [i for i, ln in enumerate(lines) if "Exchange" in ln]
    text_refs = [i for i, ln in enumerate(lines) if "text#" in ln]
    assert exch and text_refs
    assert max(exch) < min(text_refs), plan[:2000]


def test_ann_index_table_matches_inmemory_path(spark, tmp_path):
    """write_ann_index + ann_topk_from_index must return exactly the
    rows ann_topk_multi computes in-memory with the same dials, and the
    corpus side of the from-index plan must be a plain scan of
    precomputed buckets (no hyperplane math at query time: `bucket` sits
    in the scan's read schema)."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_warehouse_spark.operators.similarity import (
        ann_topk_from_index,
        ann_topk_multi,
        write_ann_index,
    )
    from nyc_taxi_data_warehouse_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 4)
    dials = dict(k=3, n_planes=8, dim=64, n_tables=2, probe_radius=1)

    path = str(tmp_path / "ann_idx")
    write_ann_index(emb, path, n_planes=8, dim=64, n_tables=2)
    from_idx = ann_topk_from_index(spark, path, q, **dials)
    in_mem = ann_topk_multi(q, emb, **dials)
    assert sorted(map(tuple, from_idx.collect())) == sorted(
        map(tuple, in_mem.collect())
    )

    # the index-side FileScan must read the precomputed bucket column —
    # identify it by its column list (cid/bucket), since the plan
    # printer truncates long tmp-dir Locations (and scan_columns'
    # ReadSchema regex stops at the first '>' inside array<double>)
    plan = from_idx._jdf.queryExecution().executedPlan().toString()
    idx_scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "cid#" in ln
    ]
    assert idx_scans and all("bucket#" in ln for ln in idx_scans), plan[:3000]


def test_ivf_index_table_prunes_to_probed_cells(spark, tmp_path):
    """write_ivf_index + ivf_topk_from_index: identical rows to the
    in-memory path, and the index scan must carry a dynamic-partition-
    pruning filter on cell — a probe reads only the probed cells'
    directories, never the whole corpus."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_warehouse_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_from_index,
        write_ivf_index,
    )
    from nyc_taxi_data_warehouse_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    cents = emb.where(F.col("vec_id") % 17 == 0).limit(8)
    q = emb.where(F.col("vec_id") < 4)

    path = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, cents, path)
    from_idx = ivf_topk_from_index(spark, path, q, cents, k=3, n_probe=2)
    in_mem = ivf_topk(q, emb, cents, k=3, n_probe=2)
    assert sorted(map(tuple, from_idx.collect())) == sorted(
        map(tuple, in_mem.collect())
    )

    # the index scan is the only FileScan carrying the cell partition
    # column (the raw embeddings scans have no cell); its
    # PartitionFilters must hold the DPP subquery
    plan = from_idx._jdf.queryExecution().executedPlan().toString()
    idx_scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "cell#" in ln
    ]
    assert idx_scans and all("dynamicpruning" in ln for ln in idx_scans), (
        idx_scans or plan[:3000]
    )


def _rowgroup_ranges(out_dir, column):
    """(min, max, num_rows) per row group for one column, via footers."""
    import os as _os

    import pyarrow.parquet as pq

    ranges = []
    for f in _os.listdir(out_dir):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(_os.path.join(out_dir, f)).metadata
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            col = next(
                group.column(i)
                for i in range(group.num_columns)
                if group.column(i).path_in_schema == column
            )
            ranges.append((col.statistics.min, col.statistics.max, group.num_rows))
    return ranges


def test_write_zordered_skips_on_every_dimension(spark, tmp_path):
    """Z-order earns its keep over a plain sort exactly here: after
    clustering events on (event_id, value), a selective range predicate
    on EITHER column must find most row groups non-intersecting by
    footer min/max — and the executed scan must read only the
    intersecting ones (numOutputRows == sum of intersecting groups'
    rows). A single-key sort gives this for its leader only; the second
    dimension would intersect everything."""
    from nyc_taxi_data_warehouse_spark.sources import load_table
    from nyc_taxi_data_warehouse_spark.warehouse.layout import write_zordered

    events = load_table(spark, SF, "events").select("event_id", "value")
    out = str(tmp_path / "events_z")
    write_zordered(events, out, ["event_id", "value"], n_files=16)

    # Predicates sized in RANK space (~6% of each column's mass):
    # z-order clusters by quantile bucket, so selectivity must be
    # measured against the distribution, not the value span — `value`
    # is right-skewed and a fixed 6%-of-span strip near the mode would
    # cover ~20% of rows.
    lo_v, hi_v = events.approxQuantile("value", [0.10, 0.16], 0.001)
    for column, lo, hi in [("event_id", 100, 160), ("value", lo_v, hi_v)]:
        intersecting = total = 0
        for mn, mx, n in _rowgroup_ranges(out, column):
            total += n
            if mn <= hi and mx >= lo:
                intersecting += n
        # the multi-dim clustering must prune a majority of rows on BOTH
        # dimensions (a plain sort prunes ~0% on its trailing column)
        assert intersecting < total / 2, (
            f"{column}: {intersecting}/{total} rows intersect — no clustering"
        )

        df = spark.read.parquet(out).where(F.col(column).between(lo, hi))
        df.collect()
        leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
        scan_out = None
        for i in range(leaves.size()):
            node = leaves.apply(i)
            if "Scan" in node.nodeName():
                scan_out = node.metrics().apply("numOutputRows").value()
        assert scan_out == intersecting


def test_write_zordered_preserves_rows(spark, tmp_path):
    """Clustering is a pure layout change: same rows, same values."""
    from nyc_taxi_data_warehouse_spark.sources import load_table
    from nyc_taxi_data_warehouse_spark.warehouse.layout import write_zordered

    events = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "events_z_rows")
    write_zordered(events, out, ["user_id", "value"], n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert back.columns == events.columns
    # decimal sums: exact and associative, so partition order cannot
    # perturb the comparison (the repo-wide determinism rule)
    dec = F.sum(F.col("value").cast("decimal(18,6)"))
    assert (
        back.agg(F.sum("event_id"), dec).collect()
        == events.agg(F.sum("event_id"), dec).collect()
    )


def test_write_zordered_timestamp_key(spark, tmp_path):
    """Timestamp keys cluster via their epoch-double image — the common
    (time, entity) two-dimension fact layout works out of the box."""
    from nyc_taxi_data_warehouse_spark.sources import load_table
    from nyc_taxi_data_warehouse_spark.warehouse.layout import write_zordered

    events = load_table(spark, SF, "events").select("ts", "user_id")
    out = str(tmp_path / "events_z_ts")
    write_zordered(events, out, ["ts", "user_id"], n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    lo, hi = events.approxQuantile("user_id", [0.10, 0.16], 0.001)
    intersecting = total = 0
    for mn, mx, n in _rowgroup_ranges(out, "user_id"):
        total += n
        if mn <= hi and mx >= lo:
            intersecting += n
    assert intersecting < total * 0.7, f"user_id: {intersecting}/{total}"


def test_write_zordered_degenerate_inputs(spark, tmp_path):
    """Empty and single-row inputs round-trip (quantile boundaries
    degenerate to an empty cut list — everything lands in bucket 0)."""
    from nyc_taxi_data_warehouse_spark.warehouse.layout import write_zordered

    empty = spark.createDataFrame([], "a long, b double")
    out = str(tmp_path / "z_empty")
    write_zordered(empty, out, ["a", "b"], n_files=4)
    assert spark.read.parquet(out).count() == 0

    one = spark.createDataFrame([(1, 2.0)], "a long, b double")
    out1 = str(tmp_path / "z_one")
    write_zordered(one, out1, ["a", "b"], n_files=4)
    assert [(r.a, r.b) for r in spark.read.parquet(out1).collect()] == [(1, 2.0)]


def test_analyze_column_stats_flip_join_to_broadcast(spark):
    """The CBO evidence behind warehouse.layout.analyze(): without
    column statistics Spark estimates a FILTERED dimension at its full
    scan size (filters don't shrink estimates) and plans a sort-merge
    join under a small broadcast threshold; after ANALYZE ... FOR
    COLUMNS, filter selectivity shrinks the estimate and the SAME query
    plans a broadcast join. At 100 TB this is the difference between a
    dimension shuffle and none — and it only exists if stats are
    actually collected."""
    from nyc_taxi_data_warehouse_spark.sources import load_table
    from nyc_taxi_data_warehouse_spark.warehouse.layout import analyze

    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_t")
    load_table(spark, SF, "customer").write.mode("overwrite").saveAsTable(
        "cbo_t.customer"
    )
    load_table(spark, SF, "orders").write.mode("overwrite").saveAsTable(
        "cbo_t.orders"
    )
    prior = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.cbo.enabled",
            "spark.sql.adaptive.enabled",
        )
    }

    def plan():
        dim = spark.table("cbo_t.customer").where("c_custkey < 20")
        q = spark.table("cbo_t.orders").join(
            dim, F.col("o_custkey") == F.col("c_custkey")
        )
        return q._jdf.queryExecution().executedPlan().toString()

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(4 * 1024))
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")  # static plan
        before = plan()
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before
        analyze(spark, "cbo_t.customer", columns=["c_custkey"])
        after = plan()
        assert "BroadcastHashJoin" in after and "SortMergeJoin" not in after
    finally:
        for k, v in prior.items():
            spark.conf.set(k, v)
        spark.sql("DROP DATABASE IF EXISTS cbo_t CASCADE")


def test_cli_zorder(spark, tmp_path):
    from nyc_taxi_data_warehouse_spark.__main__ import main

    cli = lambda *a: main(list(a), spark=spark)  # noqa: E731
    out = str(tmp_path / "zout")
    assert cli(
        "zorder", "--src", f"{SF}/events.parquet".replace(SF, SF),
        "--out", out, "--keys", "event_id,value", "--files", "8",
    ) == 0
    import pyarrow.parquet as pq  # noqa: F401

    from nyc_taxi_data_warehouse_spark.sources import load_table

    n = load_table(spark, SF, "events").count()
    assert spark.read.parquet(out).count() == n
