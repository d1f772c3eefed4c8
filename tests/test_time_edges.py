"""Same-µs collision edges for the time discipline (CLAUDE.md invariant:
cross-engine-visible ordering and as-of comparison run on µs-floored
keys, because DuckDB truncates TIMESTAMP(NANOS) parquet to µs on read).

sf0.01 happens to contain no same-µs collisions, so the declared-suite
parity can't exercise this class — these synthetic cases pin the
semantics the round-1 ADVICE flagged as latent."""

from __future__ import annotations

import pyspark.sql.functions as F

from ros_sql_spark.functions.parity import tus
from ros_sql_spark.operators.asof import asof_join

US = 1_000  # ns per µs


def test_asof_matches_purchase_later_in_same_microsecond(spark):
    """A purchase AFTER the click at ns resolution but inside the same µs
    must still match (DuckDB's ASOF sees both at the same µs and its
    `>=` admits the tie).  Comparing raw ns would silently miss it."""
    clicks = spark.createDataFrame(
        [(1, 100, 5_000_000 * US + 500)],  # user, event, ns (µs = 5_000_000)
        "user_id long, event_id long, ts_ns long",
    ).select("user_id", "event_id", tus("ts_ns").alias("us"))
    purchases = spark.createDataFrame(
        # same µs as the click, later ns — and a decoy in the next µs
        [(1, 5_000_000 * US + 900), (1, 5_000_001 * US + 100)],
        "user_id long, ts_ns long",
    ).select("user_id", tus("ts_ns").alias("prev_purchase_us"))
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="us",
        right_ts="prev_purchase_us",
        right_payload=["prev_purchase_us"],
    ).collect()
    assert len(out) == 1
    assert out[0]["prev_purchase_us"] == 5_000_000  # same-µs tie matched
    # cross-check the exact same scenario on DuckDB's native ASOF at µs
    import duckdb

    got = duckdb.connect().execute(
        """
        WITH c AS (SELECT 1 AS user_id, make_timestamp(5000000) AS ts),
             p AS (SELECT 1 AS user_id, make_timestamp(5000000) AS ts
                   UNION ALL SELECT 1, make_timestamp(5000001))
        SELECT epoch_us(p.ts) FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        """
    ).fetchone()[0]
    assert got == out[0]["prev_purchase_us"]


def test_same_us_ordering_breaks_ties_on_event_id_not_ns(spark):
    """Within one µs, (tus, event_id) must order by event_id even when
    the ns order is the reverse — the oracle cannot see ns, so event_id
    is the only cross-engine tiebreak."""
    ev = spark.createDataFrame(
        # event 2 is EARLIER in ns than event 1, same µs
        [(1, 7_000_000 * US + 900), (2, 7_000_000 * US + 100), (3, 6_999_999 * US)],
        "event_id long, ts_ns long",
    )
    got = [
        r.event_id
        for r in ev.select("event_id", tus("ts_ns").alias("t"))
        .orderBy("t", "event_id")
        .collect()
    ]
    assert got == [3, 1, 2]  # µs first; then id, NOT ns order (3, 2, 1)
