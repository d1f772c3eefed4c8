"""Scale-path operators: scalable n-gram Jaccard, salting, partitioned
events layout (each asserted equivalent to its reference formulation,
plus the plan property that makes it scale)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

# scale/property drives: slow tier by module (r11 duration profile)
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings, strategies as st

from ros_sql_spark.operators.dedup import ngram_jaccard_pairs
from ros_sql_spark.operators.skew import salted_aggregate, salted_broadcast_left_join
from ros_sql_spark.plans.queries import q32_ngram_jaccard
from ros_sql_spark.sources.io import (
    load_table,
    read_events_partitioned,
    write_events_partitioned,
)
from tests.conftest import SF_MEDIUM, SF_SMALL, prop_examples


def test_scalable_jaccard_equals_quadratic(spark):
    """The shingle-join Jaccard must produce exactly the quadratic
    cross-join's pairs for any threshold > 0."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").filter(
        F.col("doc_id") < 40
    )
    fast = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.001).collect()
    }
    slow = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in q32_ngram_jaccard(spark, SF_SMALL).collect()
        if r.jaccard >= 0.001
    }
    assert fast == slow


def test_jaccard_stop_shingle_guard(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").filter(
        F.col("doc_id") < 40
    )
    guarded = ngram_jaccard_pairs(docs, threshold=0.001, max_doc_freq=5)
    # still runs and yields a subset of the unguarded pair keys
    full = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.001).collect()
    }
    got = {(r.id_a, r.id_b) for r in guarded.collect()}
    assert got <= full


def test_salted_aggregate_equals_direct(spark):
    ev = load_table(spark, SF_SMALL, "events")
    direct = {
        (r.user_id, r.n, round(r.s, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("value").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        (r.user_id, r.n, round(r.s, 6))
        for r in salted_aggregate(
            ev,
            ["user_id"],
            {"n": ("count", "value"), "s": ("sum", "value")},
            salt_src="event_id",
        ).collect()
    }
    assert salted == direct


def test_salted_aggregate_rejects_key_salt(spark):
    ev = load_table(spark, SF_SMALL, "events")
    with pytest.raises(ValueError, match="salt_src"):
        salted_aggregate(
            ev, ["user_id"], {"n": ("count", "value")}, salt_src="user_id"
        )


def test_salted_join_equals_plain_join(spark):
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "value"
    )
    dim = spark.createDataFrame(
        [(i, f"u{i}") for i in range(15)], "user_id long, uname string"
    )
    plain = {tuple(r) for r in ev.join(dim, "user_id").collect()}
    salted = {
        tuple(r)
        for r in salted_broadcast_left_join(
            ev, dim, "user_id", salt_src="event_id"
        ).collect()
    }
    assert salted == plain


def test_partitioned_events_prune_partitions(spark, tmp_path):
    path = str(tmp_path / "events_part")
    ev = load_table(spark, SF_SMALL, "events")
    write_events_partitioned(ev, path)
    back = read_events_partitioned(spark, path)
    assert back.count() == 1000
    one_day = back.filter(F.col("event_date") == "2024-01-15")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_date" in plan.split(
        "PartitionFilters"
    )[1][:200]
    expect = ev.filter(F.to_date("ts") == "2024-01-15").count()
    assert one_day.count() == expect > 0


def test_asof_join_equals_naive(spark):
    """Window-based asof == naive per-left max(right.ts <= left.ts)."""
    from ros_sql_spark.operators.asof import asof_join

    ev = load_table(spark, SF_SMALL, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts_ns"
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_ns").alias("p_ts")
    )
    got = {
        (r.event_id, r.p_ts)
        for r in asof_join(
            clicks, purch, ["user_id"], "ts_ns", "p_ts", ["p_ts"]
        ).collect()
    }
    naive = (
        clicks.join(purch, "user_id", "left")
        .filter((F.col("p_ts") <= F.col("ts_ns")) | F.col("p_ts").isNull())
        .groupBy("event_id")
        .agg(F.max("p_ts").alias("p_ts"))
    )
    # clicks with no qualifying purchase drop out of the naive inner side;
    # re-add them as NULL matches
    naive_full = clicks.select("event_id").join(naive, "event_id", "left")
    expect = {(r.event_id, r.p_ts) for r in naive_full.collect()}
    assert got == expect


def test_interval_join_equals_naive_theta(spark):
    from ros_sql_spark.operators.asof import interval_join

    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_id", "ts_ns"
    )
    w = 3_600_000_000_000
    fast = {
        (r.event_id, r.r_event_id)
        for r in interval_join(ev, ev, ["user_id"], "ts_ns", "ts_ns", w)
        .filter(F.col("event_id") < F.col("r_event_id"))
        .collect()
    }
    b = ev.select(
        F.col("user_id"), F.col("event_id").alias("eb"), F.col("ts_ns").alias("tb")
    )
    naive = {
        (r.event_id, r.eb)
        for r in ev.join(b, "user_id")
        .filter(
            (F.col("event_id") < F.col("eb"))
            & (F.abs(F.col("ts_ns") - F.col("tb")) <= w)
        )
        .collect()
    }
    assert fast == naive


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """orders/lineitem bucketed on the join key -> SortMergeJoin with ZERO
    Exchange on either side (write-time co-location; the 100 TB join
    strategy)."""
    from ros_sql_spark.sources.bucketing import bucketed_table, write_bucketed

    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey")
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed(li, "b_lineitem", "l_orderkey", num_buckets=8)
    bo, bl = bucketed_table(spark, "b_orders"), bucketed_table(spark, "b_lineitem")
    # disable broadcast so the join strategy is genuinely SMJ-on-buckets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_layout_carries_aggregate_and_rejoin(spark):
    """Bucketing eliminates AGGREGATION shuffles too, not just join
    shuffles: the qx20 pattern (HAVING aggregate keyed by l_orderkey,
    survivors re-joined to orders on the same key) planned over
    orderkey-bucketed facts runs with ZERO Exchange end-to-end — the
    agg's grouping AND both join sides ride the write-time layout."""
    import pyspark.sql.functions as F

    from ros_sql_spark.sources.bucketing import bucketed_table, write_bucketed

    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "b2_orders", "o_orderkey", num_buckets=8)
    write_bucketed(li, "b2_lineitem", "l_orderkey", num_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = bucketed_table(spark, "b2_orders")
        bl = bucketed_table(spark, "b2_lineitem")
        big = (
            bl.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .filter(F.col("sum_qty") > 150.0)
        )
        joined = big.join(bo, big.l_orderkey == bo.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # ...and the result is the same as the plain-table pipeline
        want = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .filter(F.col("sum_qty") > 150.0)
            .count()
        )
        assert joined.count() == want > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b2_orders")
        spark.sql("DROP TABLE IF EXISTS b2_lineitem")


@settings(
    max_examples=prop_examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_shingle_hashes_equivalent_to_strings(spark, texts):
    """The de-stringed shingle hasher must agree with the string
    builder on every derived statistic the suite uses: per-doc shingle
    COUNT and per-doc DISTINCT count (q63's ratio), and cross-doc
    shared-shingle membership (q20's contamination probe) — on
    arbitrary texts including empties, repeated tokens, and docs
    shorter than k."""
    from ros_sql_spark.operators.dedup import (
        shingle_hashes,
        token_shingles,
        tokenize,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    hs = {
        r.doc_id: r.h
        for r in shingle_hashes(df, "doc_id", "text", 3)
        .select("doc_id", F.col("_hs").alias("h"))
        .collect()
    }
    ss = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", token_shingles(tokenize(F.col("text")), 3).alias("s")
        ).collect()
    }
    assert set(hs) == set(ss)
    str_to_hash = {}
    for d in ss:
        assert len(hs[d]) == len(ss[d])
        assert len(set(hs[d])) == len(set(ss[d]))
        # hashing must be a per-shingle FUNCTION of the string (same
        # string -> same hash everywhere) — exactly what makes
        # cross-doc membership (q20) agree with string membership
        for s, h in zip(ss[d], hs[d]):
            assert str_to_hash.setdefault(s, h) == h, (s, h, str_to_hash[s])


def test_dedup_pipeline_operator_scale(spark):
    """End-to-end near-dup pipeline at OPERATOR scale (VERDICT r2 #6):
    ngram_jaccard_pairs over the FULL sf0.01 corpus (the Σdf² scale
    formulation, stop-shingle-guarded) feeding connected_components —
    no gated subset anywhere.  Two assertions:

    1. restricted to the q15 subset universe (doc_id < 40), the
       full-corpus components induce the same PARTITION of that subset
       as q15_dup_components computes on the subset alone, for pairs
       whose both ends lie in the subset — full-corpus labels may merge
       subset docs through an outside path, so we compare q15's groups
       as a refinement: every q15 group must land inside one
       full-corpus component (label propagation only merges);
    2. the full run produces a sane partition: every doc labeled, every
       component labeled by its min member.
    """
    from ros_sql_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )
    from ros_sql_spark.plans.queries import QUERIES

    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, threshold=0.3, max_doc_freq=2000)
    comp = connected_components(
        pairs, nodes=docs.select("doc_id"), id_col="doc_id"
    )
    full = {r.doc_id: r.component for r in comp.collect()}

    n_docs = docs.count()
    assert len(full) == n_docs  # every doc labeled exactly once
    # each component's label is its minimum member id
    by_comp = {}
    for d, c in full.items():
        by_comp.setdefault(c, []).append(d)
    assert all(min(v) == c for c, v in by_comp.items())

    # refinement check vs the oracle-backed q15 subset
    sub = {
        r.doc_id: r.component
        for r in QUERIES["q15_dup_components"](spark, SF_MEDIUM).collect()
    }
    assert set(sub) == {d for d in full if d < 40}
    # q15's threshold (0.001) is looser than the 0.3 scale run, so its
    # groups need not survive verbatim; the invariant that must hold:
    # subset pairs at the SAME 0.3 threshold are connected in the full
    # labels (label propagation only ever merges).
    sub_pairs = [
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs.filter(F.col("doc_id") < 40), threshold=0.3
        ).collect()
    ]
    for a, b in sub_pairs:
        assert full[a] == full[b], (a, b)


def test_selective_join_is_runtime_bloom_eligible(spark):
    """Runtime bloom-filter semi-join reduction: with a selective
    predicate on the dim side, Spark injects might_contain(...) into
    the fact scan.  Locally the 10 GB application-side threshold (and
    broadcast joins) keep the rule dormant; at warehouse scale both
    gates open on their own.  This pins the ELIGIBILITY of the engine's
    canonical fact-dim join shape — if a refactor broke the equi-join /
    selective-filter structure the rule keys on, this fails."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = (
            load_table(spark, SF_SMALL, "orders")
            .filter(F.col("o_totalprice") > 400000)
            .select("o_orderkey")
        )
        li = load_table(spark, SF_SMALL, "lineitem")
        plan = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_skew_join_split_is_live(spark):
    """The 100 TB skew story depends on AQE splitting oversized join
    partitions at runtime (session.py pins skewJoin.enabled).  Verify
    the machinery actually fires in this session: a hot-key join under
    test thresholds must execute as SortMergeJoin(skew=true) with
    skewed AQEShuffleReads — if a session-config regression disabled
    AQE or skew handling, this fails."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.shuffle.partitions", "100")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "800"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "800")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(0, 1000, 1, 10).select(
            F.when(F.col("id") < 990, 0).otherwise(F.col("id")).alias("key1"),
            F.col("id").alias("value1"),
        )
        right = spark.range(0, 1000, 1, 10).select(
            F.when(F.col("id") < 990, 0).otherwise(F.col("id")).alias("key2"),
            F.col("id").alias("value2"),
        )
        j = left.join(right, left.key1 == right.key2)
        n = len(j.collect())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert n == 990 * 990 + 10
        assert "skew=true" in plan, plan
    finally:
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_split_skew_join_equals_plain_inner_and_left(spark):
    """Hot-key split join must be row-identical to the plain join for
    inner AND left-outer, including unmatched-left null extension."""
    from ros_sql_spark.operators.skew import split_skew_join

    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "value"
    )
    # right side misses some users -> left join exercises null extension
    other = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("user_id") % 3 != 1)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_right"))
    )
    hot = [0, 1, 2]
    for how in ("inner", "left"):
        plain = {tuple(r) for r in ev.join(other, "user_id", how).collect()}
        split = {
            tuple(r)
            for r in split_skew_join(
                ev, other, "user_id", hot_keys=hot, buckets=4, how=how
            ).collect()
        }
        assert split == plain, f"{how} join diverged"


def test_split_skew_join_spreads_hot_key(spark):
    """The hot path joins on (key, _salt): its left rows must occupy
    more than one salt bucket (the whole point of the split)."""
    from ros_sql_spark.operators.skew import split_skew_join

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id")
    n_buckets = (
        ev.filter(F.col("user_id") == 0)
        .select(
            F.pmod(
                F.xxhash64(F.col("event_id"), F.col("user_id")), F.lit(4)
            ).alias("b")
        )
        .distinct()
        .count()
    )
    assert n_buckets > 1


def test_split_skew_join_rejects_outer(spark):
    from ros_sql_spark.operators.skew import split_skew_join

    ev = load_table(spark, SF_SMALL, "events")
    with pytest.raises(ValueError, match="inner/left"):
        split_skew_join(ev, ev, "user_id", hot_keys=[1], how="full")


def test_detect_hot_keys_finds_planted_skew(spark):
    """A key holding ~40% of rows must surface at full-sample census."""
    from ros_sql_spark.operators.skew import detect_hot_keys

    base = spark.range(0, 3000).select(
        F.when(F.col("id") < 1200, F.lit(7))
        .otherwise(F.pmod(F.col("id"), F.lit(500)))
        .alias("k")
    )
    hot = detect_hot_keys(
        base, "k", sample_fraction=0.5, min_sampled_rows=200
    )
    assert hot == [7]


def test_detect_hot_keys_census_is_capped_and_ranked(spark):
    """The census is bounded: at most max_keys keys reach the driver,
    and they are the HOTTEST ones (top by sampled count), so a 100×
    key-cardinality corpus can never inflate the hot list."""
    from ros_sql_spark.operators.skew import detect_hot_keys

    # keys 0..9: key k holds (k+1)*100 rows — strictly increasing heat
    base = spark.range(0, 10).select(
        F.explode(
            F.sequence(F.lit(1), (F.col("id") + 1) * 100)
        ).alias("_"),
        F.col("id").alias("k"),
    ).select("k")
    hot = detect_hot_keys(
        base, "k", sample_fraction=1.0, min_sampled_rows=1, max_keys=3
    )
    assert sorted(hot) == [7, 8, 9]  # exactly the 3 hottest
    with pytest.raises(ValueError, match="bounded"):
        detect_hot_keys(base, "k", max_keys=0)


def test_detect_hot_keys_relative_threshold(spark):
    """min_sampled_fraction scales the threshold with the data: a key
    is hot by its SHARE of sampled rows, not an absolute count sized
    for one corpus size."""
    from ros_sql_spark.operators.skew import detect_hot_keys

    # key 7 holds 50% of rows; 500 cold keys hold ~0.1% each
    base = spark.range(0, 2000).select(
        F.when(F.col("id") < 1000, F.lit(7))
        .otherwise(F.pmod(F.col("id"), F.lit(500)))
        .alias("k")
    )
    hot = detect_hot_keys(
        base,
        "k",
        sample_fraction=1.0,
        min_sampled_rows=1,
        min_sampled_fraction=0.25,
    )
    assert hot == [7]
    # the same fraction still works when the corpus doubles
    hot2 = detect_hot_keys(
        base.union(base),
        "k",
        sample_fraction=1.0,
        min_sampled_rows=1,
        min_sampled_fraction=0.25,
    )
    assert hot2 == [7]


def test_split_skew_join_broadcast_membership_above_threshold(spark):
    """Past broadcast_membership_threshold hot keys, membership routing
    must be a broadcast semi/anti JOIN, never a plan-embedded
    isin(<thousands of literals>) — and the rows must still equal the
    plain join exactly (incl. the capped/bucketed salted path)."""
    from ros_sql_spark.operators.skew import split_skew_join

    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "value"
    )
    other = ev.groupBy("user_id").agg(F.count("*").alias("n_right"))
    hot = list(range(1500))  # > the 1024 default threshold
    out = split_skew_join(
        ev, other, "user_id", hot_keys=hot, buckets=4, how="inner"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "user_id#" in plan  # sanity: the key is in the plan
    # no giant literal membership list survived into the plan.  Assert
    # the structural ABSENCE of an In/INSET predicate on the key —
    # grepping for a literal key value ("1499") is order-dependent in a
    # long-lived session because auto-incrementing exprIds (user_id#14991)
    # can contain the same digits (round-7 ADVICE).
    assert "In(user_id" not in plan, "isin literal leaked into the plan"
    assert " INSET " not in plan, "INSET membership leaked into the plan"
    plain = {tuple(r) for r in ev.join(other, "user_id").collect()}
    split = {tuple(r) for r in out.collect()}
    assert split == plain


def test_incremental_minhash_equals_batch_minus_base_pairs(spark):
    """incremental(new, index(base)) must equal minhash_pairs(new ∪ base)
    with base-internal pairs removed — same estimates, same pairs."""
    from ros_sql_spark.operators.dedup import (
        minhash_index,
        minhash_pairs,
        minhash_pairs_incremental,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}

    thr = 0.2
    full = minhash_pairs(docs, threshold=thr)
    expect = {
        (r.id_a, r.id_b): r.jaccard_est
        for r in full.collect()
        if not (r.id_a in base_ids and r.id_b in base_ids)
    }
    full._rosql_cached.unpersist()

    inc = minhash_pairs_incremental(new, minhash_index(base), threshold=thr)
    got = {(r.id_a, r.id_b): r.jaccard_est for r in inc.collect()}
    inc._rosql_cached.unpersist()
    assert got == expect


def test_incremental_minhash_base_never_self_pairs(spark):
    """Even when the base is full of internal near-dups, the incremental
    probe must emit no base-base pair (the cost contract)."""
    from ros_sql_spark.operators.dedup import minhash_index, minhash_pairs_incremental

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    # base duplicated content: every base doc has an exact twin
    base = docs.filter(F.col("doc_id") < 100).union(
        docs.filter(F.col("doc_id") < 100).withColumn(
            "doc_id", F.col("doc_id") + 10000
        )
    )
    new = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    inc = minhash_pairs_incremental(new, minhash_index(base), threshold=0.2)
    rows = inc.collect()
    inc._rosql_cached.unpersist()
    assert all(
        not (r.id_a in base_ids and r.id_b in base_ids) for r in rows
    )


def test_split_skew_join_null_keys_survive_left_join(spark):
    """NULL join keys can't equi-match, but a left join must still
    null-extend them — isin()'s three-valued logic must not drop them
    from both split paths."""
    from ros_sql_spark.operators.skew import split_skew_join

    left = spark.createDataFrame(
        [(1, 10), (2, 20), (None, 30), (None, 40)], "k long, v long"
    )
    right = spark.createDataFrame([(1, 100), (2, 200)], "k long, w long")
    for how in ("inner", "left"):
        plain = {tuple(r) for r in left.join(right, "k", how).collect()}
        split = {
            tuple(r)
            for r in split_skew_join(
                left, right, "k", hot_keys=[1], buckets=3, how=how
            ).collect()
        }
        assert split == plain, f"{how}: null-key rows diverged"


def test_incremental_exact_dedup_equals_batch_on_union(spark):
    """Incremental survivors = batch exact-dedup survivors of the union
    restricted to the increment (base docs always win their digest)."""
    from ros_sql_spark.operators.dedup import (
        exact_dedup,
        exact_dedup_incremental,
        exact_digests,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    # make some increment docs exact duplicates of base content
    dup = base.limit(10).withColumn("doc_id", F.col("doc_id") + 100000)
    new = docs.filter(F.col("doc_id") % 3 == 0).unionByName(dup)

    got = {
        r.doc_id
        for r in exact_dedup_incremental(new, exact_digests(base)).collect()
    }
    # expectation: batch survivors of base ∪ new that belong to new
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    union_survivors = {
        r.doc_id
        for r in exact_dedup(base.unionByName(new), "doc_id", "text").collect()
    }
    assert got == (union_survivors & new_ids)
    # none of the planted duplicates survive
    assert not any(d >= 100000 for d in got)


def test_remove_boilerplate_strips_shared_header(spark):
    """A 10-token header shared by 3 docs is stripped at max_doc_freq=2;
    unique content and a clean doc survive verbatim (modulo the
    lowercase/whitespace canonicalization of reassembly)."""
    from ros_sql_spark.operators.dedup import remove_boilerplate

    hdr = "nav home about contact one two three four five six"
    rows = [
        (1, f"{hdr} unique words for doc one here now ok"),
        (2, f"{hdr} totally different content in this doc x"),
        (3, f"{hdr} another body of text entirely here yes"),
        (4, "clean document with no shared header at all in it"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in remove_boilerplate(df, passage_tokens=10, max_doc_freq=2).collect()
    }
    assert got[1] == "unique words for doc one here now ok"
    assert got[2] == "totally different content in this doc x"
    assert got[3] == "another body of text entirely here yes"
    assert got[4] == "clean document with no shared header at all in it"


def test_incremental_setsim_equals_batch_minus_base_pairs(spark):
    """setsim_join_incremental(new, setsim_index(base)) must equal
    setsim_join(new ∪ base) with base-internal pairs removed — same
    pairs, same EXACT jaccard values (the verify step is exact, so the
    frozen-base-rank prefix heuristic may not change the answer)."""
    from ros_sql_spark.operators.dedup import (
        setsim_index,
        setsim_join,
        setsim_join_incremental,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    base = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}

    for thr in (0.2, 0.5):
        full = setsim_join(docs, "doc_id", "text", thr, 5)
        expect = {
            (r.id_a, r.id_b): r.jaccard
            for r in full.collect()
            if not (r.id_a in base_ids and r.id_b in base_ids)
        }
        inc = setsim_join_incremental(
            new, setsim_index(base, threshold=thr), threshold=thr
        )
        got = {(r.id_a, r.id_b): r.jaccard for r in inc.collect()}
        assert got == expect, f"threshold {thr}"


def test_incremental_setsim_base_never_self_pairs(spark):
    """Even a base full of internal exact twins must emit no base-base
    pair from the incremental probe (the cost contract: base-internal
    similarity was settled when the base was indexed)."""
    from ros_sql_spark.operators.dedup import (
        setsim_index,
        setsim_join_incremental,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    base = docs.filter(F.col("doc_id") < 80).union(
        docs.filter(F.col("doc_id") < 80).withColumn(
            "doc_id", F.col("doc_id") + 10000
        )
    )
    new = docs.filter((F.col("doc_id") >= 80) & (F.col("doc_id") < 100))
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    rows = setsim_join_incremental(
        new, setsim_index(base, threshold=0.3), threshold=0.3
    ).collect()
    assert all(
        not (r.id_a in base_ids and r.id_b in base_ids) for r in rows
    )
    # the increment itself contains near-dups of base docs — the probe
    # must actually find cross pairs, not vacuously pass
    assert any(
        (r.id_a in base_ids) != (r.id_b in base_ids) for r in rows
    ) or not rows


def test_setsim_index_snapshot_roundtrip(spark, tmp_path):
    """The index frames persist through a snapshot table and serve an
    identical incremental join — the hashed-once-ever contract: the
    stored (sets, prefix, freq) projections ARE the index, no
    recomputation on read."""
    from ros_sql_spark.operators.dedup import (
        setsim_index,
        setsim_join_incremental,
    )
    from ros_sql_spark.sources.snapshot import snapshot_commit, snapshot_read

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    base = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    thr = 0.3
    live = setsim_index(base, threshold=thr)
    names = ("sets", "prefix", "freq")
    for frame, name in zip(live, names):
        snapshot_commit(frame, str(tmp_path / f"ssidx_{name}"))
    stored = tuple(
        snapshot_read(spark, str(tmp_path / f"ssidx_{name}"))
        for name in names
    )
    expect = sorted(
        map(tuple, setsim_join_incremental(new, live, threshold=thr).collect())
    )
    got = sorted(
        map(
            tuple,
            setsim_join_incremental(new, stored, threshold=thr).collect(),
        )
    )
    assert got == expect and expect


@settings(
    max_examples=prop_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("ab cd"), min_size=0, max_size=50),
        min_size=2,
        max_size=14,
    ),
    thr=st.sampled_from([0.2, 0.5, 0.8]),
    split_mod=st.sampled_from([2, 3]),
)
def test_incremental_setsim_property(spark, texts, thr, split_mod):
    """Property form of the incremental equivalence: on ARBITRARY tiny
    corpora (empties, docs shorter than k, exact twins, near-twins) and
    thresholds, setsim_join_incremental(new, index(base)) must equal
    setsim_join(all) minus base-internal pairs — pair set AND exact
    jaccard values."""
    from ros_sql_spark.operators.dedup import (
        setsim_index,
        setsim_join,
        setsim_join_incremental,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    base = docs.filter(F.col("doc_id") % split_mod != 0)
    new = docs.filter(F.col("doc_id") % split_mod == 0)
    base_ids = set(range(len(texts))) - set(
        range(0, len(texts), split_mod)
    )
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in setsim_join(docs, threshold=thr, k=3).collect()
        if not (r.id_a in base_ids and r.id_b in base_ids)
    }
    inc = {
        (r.id_a, r.id_b): r.jaccard
        for r in setsim_join_incremental(
            new, setsim_index(base, threshold=thr, k=3),
            threshold=thr, k=3,
        ).collect()
    }
    assert inc == full


@settings(
    max_examples=prop_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=0,
        max_size=20,
    ),
    split=st.integers(0, 20),
)
def test_incremental_components_property(spark, edges, split):
    """Property form of the contraction equivalence: ANY random edge
    set split at ANY point (self-loops, duplicate edges, fresh-node
    chains, empty halves) must give incremental == full recompute."""
    from ros_sql_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
    )

    edges = [(a, b) for a, b in edges if a != b]
    base_e, inc_e = edges[:split], edges[split:]
    nodes = sorted({n for e in edges for n in e} | {99})
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id long")
    base_nodes = sorted({n for e in base_e for n in e} | {99})

    def df_of(es):
        return spark.createDataFrame(
            es or [], "id_a long, id_b long"
        )

    base = connected_components(
        df_of(base_e),
        nodes=spark.createDataFrame([(n,) for n in base_nodes], "id long"),
    )
    got = {
        (r.id, r.component)
        for r in connected_components_incremental(
            df_of(inc_e), base, new_nodes=nodes_df
        ).collect()
    }
    want = {
        (r.id, r.component)
        for r in connected_components(df_of(edges), nodes=nodes_df).collect()
    }
    assert got == want


@settings(
    max_examples=prop_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=0,
        max_size=20,
    ),
    split=st.integers(0, 20),
)
def test_incremental_components_delta_property(spark, edges, split):
    """Property form for the changed-rows variant: on ANY random edge
    split, base ∪ delta (upsert) == full recompute, and the delta
    carries ONLY fresh ids or base ids whose component moved — the
    increment-sized-write guarantee streaming label maintenance rests
    on."""
    from ros_sql_spark.operators.dedup import (
        connected_components,
        connected_components_incremental_delta,
    )

    edges = [(a, b) for a, b in edges if a != b]
    base_e, inc_e = edges[:split], edges[split:]
    nodes = sorted({n for e in edges for n in e} | {99})
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id long")
    base_nodes = sorted({n for e in base_e for n in e} | {99})

    def df_of(es):
        return spark.createDataFrame(es or [], "id_a long, id_b long")

    base = connected_components(
        df_of(base_e),
        nodes=spark.createDataFrame([(n,) for n in base_nodes], "id long"),
    )
    base_map = {r.id: r.component for r in base.collect()}
    delta = {
        r.id: r.component
        for r in connected_components_incremental_delta(
            df_of(inc_e), base, new_nodes=nodes_df
        ).collect()
    }
    want = {
        r.id: r.component
        for r in connected_components(
            df_of(edges), nodes=nodes_df
        ).collect()
    }
    upserted = dict(base_map)
    upserted.update(delta)
    assert upserted == want
    for i, c in delta.items():
        assert i not in base_map or base_map[i] != c, (i, c)


@settings(
    max_examples=prop_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0,
        max_size=18,
    )
)
def test_star_components_equal_propagation(spark, edges):
    """Large-star/small-star must compute the same components as
    min-label propagation on arbitrary graphs (self-loops, duplicate
    edges, empty sets)."""
    from ros_sql_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    e = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b] or [],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(n,) for n in range(13)], "id long")
    got = {
        (r.id, r.component)
        for r in connected_components_star(e, nodes=nodes).collect()
    }
    want = {
        (r.id, r.component)
        for r in connected_components(e, nodes=nodes).collect()
    }
    assert got == want


def test_star_components_long_chain_beyond_propagation_budget(spark):
    """The named reason the star variant exists: a diameter-60 chain
    converges in O(log) double-rounds where propagation at the same
    max_iter budget raises its non-convergence error."""
    import pytest

    from ros_sql_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    got = {
        (r.id, r.component)
        for r in connected_components_star(chain, max_iter=20).collect()
    }
    assert got == {(i, 0) for i in range(61)}
    # the propagation LOOP still fails loudly past its hop budget —
    # force past the round-14 small-graph fast path (which solves any
    # sub-threshold chain in one union-find task, so the budget only
    # bites on graphs too big for the finisher)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=20, small_graph_edges=0)
    got_fast = {
        (r.id, r.component)
        for r in connected_components(chain, max_iter=20).collect()
    }
    assert got_fast == {(i, 0) for i in range(61)}


def test_asof_join_null_right_ts_never_matches(spark):
    """Round-10 audit: a right row with NULL ts must never be carried —
    Spark's nulls-first window ordering previously made it sort
    EARLIEST, so its payload leaked into every left row before the
    first real right event.  A NULL-ts LEFT row gets a NULL payload."""
    from ros_sql_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "l1"), (1, 200, "l2"), (1, None, "l0")],
        "k bigint, lts bigint, tag string",
    )
    right = spark.createDataFrame(
        [(1, None, "poison"), (1, 150, "ok")],
        "k bigint, rts bigint, pay string",
    )
    got = {
        (r.tag, r.pay)
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["pay"]
        ).collect()
    }
    # l1 (ts=100): no right row at or before 100 -> NULL, NOT "poison"
    assert got == {("l1", None), ("l2", "ok"), ("l0", None)}


def test_interval_join_negative_timestamps_complete(spark):
    """The 2-probe bucketization must stay COMPLETE for negative and
    zero-crossing timestamps (integer `div` truncates toward zero, so
    bucket boundaries shift around 0 — monotonicity still bounds the
    ±w interval to two buckets).  Equality vs the naive theta join."""
    from ros_sql_spark.operators.asof import interval_join

    import itertools

    lrows = [(1, t) for t in range(-25, 26, 3)]
    rrows = [(1, t) for t in range(-24, 25, 5)]
    left = spark.createDataFrame(lrows, "k bigint, lts bigint")
    right = spark.createDataFrame(rrows, "k bigint, rts bigint")
    w = 7
    got = {
        (r.lts, r.rts)
        for r in interval_join(left, right, ["k"], "lts", "rts", w).collect()
    }
    want = {
        (lt, rt)
        for (_, lt), (_, rt) in itertools.product(lrows, rrows)
        if abs(lt - rt) <= w
    }
    assert got == want and len(want) > 20


def test_token_budget_mix_order_ties_deterministic(spark):
    """Round-10 audit: a caller order with ties (equal quality score)
    must still produce ONE deterministic selection — the operator
    appends the id tiebreak, so which doc crosses the budget boundary
    cannot depend on partition order."""
    from ros_sql_spark.operators.sampling import token_budget_mix

    rows = [(i, "s", 10, 5.0) for i in range(20)]  # all-tied quality
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, n_tok bigint, q double"
    )
    picks = set()
    for shuffle_parts in (1, 7):
        out = token_budget_mix(
            df.repartition(shuffle_parts),
            {"s": 35},
            token_col="n_tok",
            order_by=[F.desc("q")],
        )
        picks.add(tuple(sorted(r.doc_id for r in out.collect())))
    # budget 35 at 10 tokens/doc -> 4 docs (boundary doc admitted);
    # id ascending breaks the all-tied order
    assert picks == {(0, 1, 2, 3)}
