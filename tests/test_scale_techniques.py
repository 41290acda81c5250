"""Scale-technique verifications: bucketed co-located joins (no exchange),
staging partition pruning, HLL approximate distinct, salted aggregation
equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_from_multiple_directories_linux_spark.ingest.engine import IngestionEngine
from data_ingestion_from_multiple_directories_linux_spark.sources.bucketed import (
    drop_bucketed,
    read_bucketed,
    write_bucketed,
)
from tests.test_ingest_engine import patient, write_json
from tests.test_plans import plan_of


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key join WITHOUT any shuffle —
    the recurring-join shuffle eliminator."""
    a = spark.range(0, 10_000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 10_000, 2).withColumn("vb", F.col("id") + 1)
    write_bucketed(a, "bt_a", "id", 8)
    write_bucketed(b, "bt_b", "id", 8)
    # these test tables are broadcast-size, which would bypass bucketing;
    # disable auto-broadcast to exercise the co-located shuffle-join path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "bt_a").join(
            read_bucketed(spark, "bt_b"), "id"
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Bucketed: true" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketing not used"
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        drop_bucketed(spark, "bt_a")
        drop_bucketed(spark, "bt_b")


def test_unbucketed_join_needs_exchange(spark):
    """Control: the same join without bucketing shuffles both sides
    (proves the previous test is measuring bucketing, not join size)."""
    a = spark.range(0, 10_000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 10_000, 2).withColumn("vb", F.col("id") + 1)
    # disable auto-broadcast for the control so the join must shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(a.join(b, "id"))
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_staging_partition_pruning(spark, tmp_path):
    """The engine writes staging partitioned by facility; a per-facility
    read must prune to that partition (PartitionFilters on the scan)."""
    uploads = str(tmp_path / "up")
    eng = IngestionEngine(spark, str(tmp_path / "wh"), max_files_per_run=None)
    write_json(uploads, "FAC001", "patient_person_0_20250103141949.json",
               [patient(0)])
    write_json(uploads, "FAC002", "patient_person_0_20250103141950.json",
               [patient(1)])
    eng.run(uploads)
    df = eng.store.read("stg_patient_person").filter(
        F.col("stg_datim_id") == "FAC001"
    )
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    assert "stg_datim_id" in plan[plan.index("PartitionFilters"):].splitlines()[0]
    assert df.count() == 1


def test_approx_count_distinct_accuracy(spark):
    """HLL approximate distinct (the 100 TB alternative to exact
    countDistinct, SURVEY §2.5 A2 note) lands within its error bound."""
    from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.05)).collect()[0][0]
    assert abs(approx - exact) <= max(2, 0.1 * exact)


def test_profile_sketch_estimates_track_exact(spark):
    """table_profile_orders_sketch (the one-pass K-minimums profile —
    the 100 TB swap for the exact twin's COUNT(DISTINCT) expand) stays
    within its documented error band against the exact profile, at two
    SFs, for every column from n=3 to n=15k. Oracle parity checks the
    VALUES exactly; this pins that those values mean what the docstring
    claims. Measured band 0.62-1.50x; asserted at [0.4, 2.5]."""
    from data_ingestion_from_multiple_directories_linux_spark.operators.profiling import (
        table_profile_orders,
        table_profile_orders_sketch,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = {
            r["column_name"]: r["n_distinct"]
            for r in table_profile_orders(spark, sf).collect()
        }
        rows = table_profile_orders_sketch(spark, sf).collect()
        assert len(rows) == len(exact)
        for r in rows:
            c = r["column_name"]
            est = r["estimate_distinct"]
            assert est is not None
            ratio = est / max(exact[c], 1)
            assert 0.4 <= ratio <= 2.5, (sf, c, exact[c], est)
            # the non-sketch statistics are exact and shared
            assert r["n_rows"] >= r["n_nonnull"] >= exact[c]


def test_salted_agg_matches_plain(spark):
    """Two-stage salted aggregation ≡ plain groupBy (associative,
    quantized measures)."""
    from data_ingestion_from_multiple_directories_linux_spark.operators.relational import (
        salted_skew_counts,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in salted_skew_counts(spark, sf).collect()
    }
    from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table

    plain = {
        r["user_id"]: (r["n"], r["tv"])
        for r in load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
        )
        .collect()
    }
    assert got == plain


def test_ivf_nprobe_recall(spark):
    """nprobe>1 probes each vector's runner-up cells: candidate pairs
    can only GROW (the argmax cell is always among the top-nprobe), IVF
    never invents pairs (it only prunes the exact pair set), and recall
    vs the brute-force truth is monotone in nprobe."""
    from data_ingestion_from_multiple_directories_linux_spark.catalog import (
        load_table,
    )
    from data_ingestion_from_multiple_directories_linux_spark.operators.similarity import (
        NEAR_DUP_COSINE,
        cosine_q,
        dot_q,
        ivf_near_dup_pairs,
        norm_sq_q,
        to_double_array,
    )
    from tests.conftest import SF_SMALL

    # brute-force ground truth over the same corpus (base + synthesized
    # near-dups), same quantized cosine arithmetic
    e = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    mut = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: x + F.lit(0.02) * (i % 7 - 3).cast("double")
        ).alias("v"),
    )
    corpus = e.unionByName(mut).withColumn("nv", norm_sq_q("v"))
    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
                      F.col("nv").alias("na"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
                      F.col("nv").alias("nb"))
    cos = cosine_q(dot_q("va", "vb"), F.col("na"), F.col("nb"))
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("c"))
        .filter(F.col("c") >= NEAR_DUP_COSINE)
        .collect()
    }
    assert truth  # the synthesized dups guarantee a non-empty pair set

    p1 = {(r["id_a"], r["id_b"])
          for r in ivf_near_dup_pairs(spark, SF_SMALL, nprobe=1).collect()}
    p3 = {(r["id_a"], r["id_b"])
          for r in ivf_near_dup_pairs(spark, SF_SMALL, nprobe=3).collect()}

    assert p1 <= p3          # candidates only grow with probe width
    assert p3 <= truth       # blocking never invents pairs
    r1, r3 = len(p1) / len(truth), len(p3) / len(truth)
    assert 0 < r1 <= r3
    print(f"IVF recall: nprobe=1 {r1:.3f} -> nprobe=3 {r3:.3f} "
          f"({len(p1)}/{len(p3)}/{len(truth)} pairs)")


def test_minhash_band_index_bucketed_join_skips_index_shuffle(spark, tmp_path):
    """The incremental-dedup docstring's 100 TB claim, as a plan test:
    a band index STORED BUCKETED on (band, bucket) joins a new batch's
    bands without re-shuffling the historical index — only the (small)
    new side exchanges."""
    from data_ingestion_from_multiple_directories_linux_spark.operators.dedup import (
        _near_dup_corpus,
        minhash_band_index,
    )
    from tests.conftest import SF_SMALL

    corpus = _near_dup_corpus(spark, SF_SMALL)
    index_bands, _ = minhash_band_index(corpus.filter(F.col("doc_id") % 4 != 0), 3)
    new_bands, _ = minhash_band_index(corpus.filter(F.col("doc_id") % 4 == 0), 3)
    write_bucketed(index_bands, "bt_band_index", ["band", "bucket"], 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def join_against(idx):
            return new_bands.alias("a").join(
                idx.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )

        bucketed = join_against(read_bucketed(spark, "bt_band_index"))
        plan = plan_of(bucketed)
        assert "Bucketed: true" in plan
        # control: the same index MATERIALIZED but unbucketed (plain
        # parquet) — its scan must re-shuffle to meet the join, the one
        # exchange bucketing eliminates (the probe side's own
        # signature-agg exchanges are common to both plans)
        plain = str(tmp_path / "band_index_plain")
        index_bands.write.mode("overwrite").parquet(plain)
        control_plan = plan_of(join_against(spark.read.parquet(plain)))
        n_bucketed = plan.count("Exchange hashpartitioning")
        n_control = control_plan.count("Exchange hashpartitioning")
        assert n_bucketed == n_control - 1
        assert bucketed.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        drop_bucketed(spark, "bt_band_index")


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime bloom-filter join pruning: with the optimizer conf on, a
    selective dim filter is converted into a might_contain() predicate
    ON THE FACT SIDE — rows that cannot join are dropped at the scan,
    before the shuffle. The 100 TB effect: the fact shuffle carries
    only the ~matching fraction instead of the full table. (Spark only
    injects the filter when thresholds are met; the application-side
    scan threshold defaults to 10 GB, so the test pins it to 0 to
    exercise the rewrite on test-sized data.)"""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "bloom filter not injected"
        # and it lands on the FACT (lineitem) key
        assert "might_contain" in plan and "l_orderkey" in plan.split(
            "might_contain", 1
        )[1][:120]
        # result unchanged vs the un-filtered plan
        n = j.count()
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        n_plain = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n == n_plain
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_partition(spark):
    """The AUTOMATIC skew remedy (complement of salted_skew_counts'
    manual salting): with AQE skew-join on, a partition holding a hot
    key is split into advisory-sized sub-reads at runtime —
    SortMergeJoin(skew=true) + 'AQEShuffleRead … skewed' in the FINAL
    executed plan. Thresholds are pinned far below their production
    defaults (256 MB) so the optimization triggers on test-sized data;
    the plan must be read from the EXECUTED query (AQE decides from
    runtime shuffle statistics — the pre-execution plan never shows
    it)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        hot = spark.range(0, 200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        rest = spark.range(0, 2_000).select(
            (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
        )
        right = spark.range(0, 2_000).select(
            (F.col("id") % 51).alias("k"), (F.col("id") * 7).alias("w")
        )
        agg = hot.union(rest).join(right, "k").groupBy().count()
        [row] = agg.collect()
        # key 0 appears 40× on the right (2000 = 51·39+11 → keys ≤10 get
        # 40, others 39): 200k·40 + Σ_{k=1..50} 40·(40 or 39) = 8 078 400
        assert row["count"] == 8_078_400
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # the AQEShuffleRead split
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_strategy_hints_control_physical_plan(spark):
    """The optimizer-control surface: strategy hints must flip the
    physical join — BROADCAST forces BroadcastHashJoin, MERGE forces
    SortMergeJoin, SHUFFLE_HASH forces ShuffledHashJoin — on the same
    logical join. At 100 TB these are the manual overrides when stats
    mislead AQE (a 'small' side that explodes after filters, or a
    co-partitioned pair the planner can't see)."""
    from data_ingestion_from_multiple_directories_linux_spark.catalog import (
        load_table,
    )
    from tests.conftest import SF_SMALL

    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer")

    def plan(hint):
        df = o.join(c.hint(hint), o.o_custkey == c.c_custkey)
        return df._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in plan("broadcast")
    assert "SortMergeJoin" in plan("merge")
    assert "ShuffledHashJoin" in plan("shuffle_hash")


def test_native_hll_distinct_calibrated_vs_exact(spark):
    """Spark's built-in HyperLogLog++ (approx_count_distinct) audited
    against the exact count at two precisions — the native sketch the
    engine reaches for when the KMV/exact paths are too expensive
    (its estimate is engine-internal, hence pytest-calibrated rather
    than oracle-compared; the oracle-exact approximate-distinct is
    kmv_distinct_users)."""
    from pyspark.sql import functions as F

    from data_ingestion_from_multiple_directories_linux_spark.catalog import (
        load_table,
    )
    from tests.conftest import SF_SMALL

    o = load_table(spark, SF_SMALL, "orders")
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    for rsd, tol in ((0.05, 0.15), (0.01, 0.03)):
        est = o.select(
            F.approx_count_distinct("o_custkey", rsd=rsd)
        ).collect()[0][0]
        assert abs(est - exact) / exact <= tol, (rsd, est, exact)


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """AQE's runtime re-plan: a tiny groupBy shuffle declared at 200
    partitions must coalesce to a handful of post-shuffle reads (the
    companion evidence to the skew-split test — AQE shrinks AND splits
    based on actual shuffle stats)."""
    from data_ingestion_from_multiple_directories_linux_spark.catalog import (
        load_table,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        df = (
            load_table(spark, SF_SMALL, "orders")
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert len(df.collect()) == 3  # execute THIS frame: AQE finalizes
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead coalesced" in plan, plan[:500]
        assert df.rdd.getNumPartitions() < 10
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
