"""Round-2 capability extensions (ROUND_NOTES.md "known margins"):
SCD2 snapshot maintenance, sessionized funnel analysis, multi-probe LSH
similarity search, and a Kafka-wire-format streaming source.

Scale posture mirrors the rest of the engine: SCD2 is ONE left join on
the business key (bucketable to zero shuffles, scale.py); sessionization
is one shuffle on user_id with all window passes sharing that
partitioning; multi-probe explodes a probe into a handful of bucket keys
(candidate work stays bucket-bounded, never corpus×probes); the Kafka
source round-trips the exact kafka wire schema so swapping the file
fallback for a real broker is a one-line reader change.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from un_datapipeline_spark.registry import register
from un_datapipeline_spark.tables import load_table

# ---------------------------------------------------------------------------
# SCD2 snapshot maintenance
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH updates AS (
  SELECT c_custkey AS u_key, 'PROMOTED' AS u_seg, c_acctbal + 50.0 AS u_bal
  FROM customer WHERE c_custkey % 10 = 0
), j AS (
  SELECT c.c_custkey AS key, c.c_mktsegment AS seg, c.c_acctbal AS bal,
         u.u_key, u.u_seg, u.u_bal
  FROM customer c LEFT JOIN updates u ON c.c_custkey = u.u_key
)
SELECT key, seg AS segment, ROUND(bal, 2) AS bal,
       '2024-01-01' AS valid_from,
       CASE WHEN u_key IS NOT NULL THEN '2024-06-01' END AS valid_to,
       CASE WHEN u_key IS NULL THEN 1 ELSE 0 END AS is_current
FROM j
UNION ALL
SELECT key, u_seg AS segment, ROUND(u_bal, 2) AS bal,
       '2024-06-01' AS valid_from, NULL AS valid_to, 1 AS is_current
FROM j WHERE u_key IS NOT NULL
"""


@register("etl_scd2_snapshot", oracle=_SCD2_ORACLE, tier="T2")
def etl_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 maintenance: apply a change batch
    to a dimension snapshot, closing the superseded version (valid_to set)
    and opening the new current one.

    The change batch is derived deterministically (every 10th customer is
    re-segmented to PROMOTED with +50 balance) so both engines merge
    identical inputs.  Plan shape: ONE left join on the business key,
    then a conditional 1-or-2-row explode per key — the standard SCD2
    MERGE plan; at 100 TB both sides shuffle once on c_custkey (or zero
    times if the dimension is bucketed on it, see scale.py)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("u_key"),
        F.lit("PROMOTED").alias("u_seg"),
        (F.col("c_acctbal") + 50.0).alias("u_bal"),
    )
    j = c.join(updates, c.c_custkey == updates.u_key, "left_outer")
    matched = F.col("u_key").isNotNull()

    def version(segment, bal, valid_from, valid_to, is_current):
        return F.struct(
            segment.alias("segment"),
            F.round(bal, 2).alias("bal"),
            valid_from.alias("valid_from"),
            valid_to.alias("valid_to"),
            is_current.alias("is_current"),
        )

    old_open = version(
        F.col("c_mktsegment"), F.col("c_acctbal"),
        F.lit("2024-01-01"), F.lit(None).cast("string"), F.lit(1),
    )
    old_closed = version(
        F.col("c_mktsegment"), F.col("c_acctbal"),
        F.lit("2024-01-01"), F.lit("2024-06-01"), F.lit(0),
    )
    new_open = version(
        F.col("u_seg"), F.col("u_bal"),
        F.lit("2024-06-01"), F.lit(None).cast("string"), F.lit(1),
    )
    versions = F.when(matched, F.array(old_closed, new_open)).otherwise(
        F.array(old_open)
    )
    return j.select(
        F.col("c_custkey").alias("key"), F.explode(versions).alias("v")
    ).select("key", "v.segment", "v.bal", "v.valid_from", "v.valid_to", "v.is_current")


# ---------------------------------------------------------------------------
# Sessionized funnel analysis
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         CASE WHEN CAST(ts AS TIMESTAMP)
                   - lag(CAST(ts AS TIMESTAMP))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sessions AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
  FROM flagged
), s1 AS (
  SELECT user_id, sess,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM sessions GROUP BY user_id, sess
), s2 AS (
  SELECT s.user_id, s.sess, s1.t_view,
         min(CASE WHEN s.event_type = 'click' AND s.ts >= s1.t_view
                  THEN s.ts END) AS t_click
  FROM sessions s JOIN s1 USING (user_id, sess)
  GROUP BY s.user_id, s.sess, s1.t_view
), s3 AS (
  SELECT s.user_id, s.sess, s2.t_view, s2.t_click,
         min(CASE WHEN s.event_type = 'purchase' AND s.ts >= s2.t_click
                  THEN s.ts END) AS t_purchase
  FROM sessions s JOIN s2 USING (user_id, sess)
  GROUP BY s.user_id, s.sess, s2.t_view, s2.t_click
)
SELECT count(*) AS n_sessions,
       count(t_view) AS reached_view,
       count(t_click) AS reached_click,
       count(t_purchase) AS reached_purchase
FROM s3
"""


@register("llm_sessionize_funnel", oracle=_FUNNEL_ORACLE, tier="T3")
def llm_sessionize_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap, gaps-and-islands) followed
    by an ORDERED funnel: view → click-after-view → purchase-after-click
    within each session.

    Plan shape: one shuffle on user_id; the lag/running-sum windows and
    all three per-session stage minima share that partitioning, so
    Catalyst keeps them in one exchange.  The staged minima are computed
    as successive window columns (each stage conditions on the previous
    stage's column — expressible only sequentially), never a self-join.
    Output is the 1-row funnel summary."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(order)
    sessions = e.withColumn(
        "new_sess", F.when(gap > 1800, 1).otherwise(0)
    ).withColumn(
        "sess",
        F.sum("new_sess").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = Window.partitionBy("user_id", "sess")
    staged = (
        sessions.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(per_sess),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("t_view")),
                    F.col("ts"),
                )
            ).over(per_sess),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t_click")),
                    F.col("ts"),
                )
            ).over(per_sess),
        )
    )
    per_session = staged.groupBy("user_id", "sess").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("t_view").alias("reached_view"),
        F.count("t_click").alias("reached_click"),
        F.count("t_purchase").alias("reached_purchase"),
    )


# ---------------------------------------------------------------------------
# Multi-probe LSH similarity search
# ---------------------------------------------------------------------------


@register("llm_simsearch_multiprobe", oracle=None, tier="T3")
def llm_simsearch_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-random-projection LSH: each probe searches its
    own bucket PLUS the n_planes buckets at Hamming distance 1 (one sign
    bit flipped) — the standard recall-recovery trick that lets bucket
    count grow (occupancy stay bounded) without the recall cliff of
    single-probe LSH.

    Candidate work per probe is (1 + n_planes) bucket joins' worth — still
    bucket-bounded, never corpus-sized.  Rows-only for the same reason as
    llm_simsearch_lsh (float-sign bucket membership is approximate by
    design); the recall ≥ single-probe invariant is pytest-asserted."""
    from un_datapipeline_spark.operators.dedup_extras import hyperplane_buckets

    N_PLANES = 8
    em = load_table(spark, sf_dir, "embeddings")
    b = hyperplane_buckets(em, n_planes=N_PLANES)
    # probe buckets: own + each single-bit flip
    probe_buckets = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)]
    )
    probes = (
        b.filter(F.col("vec_id") < 100)
        .select(
            F.col("vec_id").alias("a_id"),
            F.col("embedding").alias("a_emb"),
            F.explode(probe_buckets).alias("bucket"),
        )
    )
    cands = b.select(F.col("vec_id").alias("nn_id"), "embedding", "bucket")
    dot = F.aggregate(
        F.zip_with("a_emb", "embedding", lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    pairs = (
        F.broadcast(probes)
        .join(cands, "bucket")
        .filter(F.col("a_id") != F.col("nn_id"))
        .select("a_id", "nn_id", (dot / (nrm("a_emb") * nrm("embedding"))).alias("sim"))
        .groupBy("a_id", "nn_id")
        .agg(F.max("sim").alias("sim"))  # same pair may surface via 2 buckets
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("sim"), F.asc("nn_id"))
    return (
        pairs.withColumn("n_cands", F.count(F.lit(1)).over(Window.partitionBy("a_id")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("a_id", "n_cands", "nn_id", F.round("sim", 6).alias("sim"))
        .orderBy("a_id")
    )


# ---------------------------------------------------------------------------
# Kafka-wire-format streaming source
# ---------------------------------------------------------------------------

_KAFKA_ORACLE = """
SELECT event_type, count(*) AS n, ROUND(sum(value), 4) AS total
FROM events
GROUP BY event_type
"""


def read_events_kafka_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A streaming DataFrame with the EXACT Kafka source wire schema
    (key/value binary, topic, partition, offset, timestamp).

    With SPARK_GRAFT_KAFKA_BOOTSTRAP set (and the spark-sql-kafka package
    on the classpath), reads the real broker.  Otherwise — this container
    has no broker — the file stream is serialized INTO the kafka wire
    shape: key = user_id bytes, value = JSON-encoded event bytes.  Either
    way downstream code sees the same schema, so swapping in a real
    broker changes nothing but this reader."""
    import os

    from un_datapipeline_spark.operators.streaming import read_events_stream

    bootstrap = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if bootstrap:  # pragma: no cover - no broker in this container
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", "events")
            .option("startingOffsets", "earliest")
            .load()
        )
    s = read_events_stream(spark, sf_dir)
    payload = F.to_json(F.struct("event_id", "user_id", "event_type", "value", "props"))
    return s.select(
        F.encode(F.col("user_id").cast("string"), "utf-8").alias("key"),
        F.encode(payload, "utf-8").alias("value"),
        F.lit("events").alias("topic"),
        F.pmod("user_id", F.lit(8)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
    )


@register("stream_kafka_source", oracle=_KAFKA_ORACLE, tier="T4")
def stream_kafka_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-source consume path: take the kafka wire schema, decode
    value bytes, parse the JSON payload against an explicit schema, and
    aggregate — the canonical broker-ingest topology.  The full
    serialize → wire → deserialize round trip is hash-matched against
    the batch oracle, proving the plumbing loses nothing."""
    from un_datapipeline_spark.operators.streaming import run_to_memory

    wire = read_events_kafka_shaped(spark, sf_dir)
    payload_schema = "event_id long, user_id long, event_type string, value double, props string"
    parsed = wire.select(
        F.from_json(F.decode("value", "utf-8"), payload_schema).alias("e")
    ).select("e.*")
    agg = parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total")
    )
    return run_to_memory(agg)


# ---------------------------------------------------------------------------
# Hypertable-style multi-resolution rollup
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT '15min' AS grain,
       date_trunc('hour', ts) + INTERVAL 15 MINUTE
         * CAST(floor(minute(ts) / 15) AS INT) AS bucket,
       event_type, count(*) AS n,
       ROUND(sum(cents) / 100.0, 2) AS total
FROM base GROUP BY bucket, event_type
UNION ALL
SELECT '1hour', date_trunc('hour', ts), event_type, count(*),
       ROUND(sum(cents) / 100.0, 2)
FROM base GROUP BY 2, 3
UNION ALL
SELECT '1day', date_trunc('day', ts), event_type, count(*),
       ROUND(sum(cents) / 100.0, 2)
FROM base GROUP BY 2, 3
"""


@register("ts_multires_rollup", oracle=_ROLLUP_ORACLE, tier="T3")
def ts_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: 15-min, 1-hour and
    1-day grains in ONE pass.  The finest grain is aggregated from raw
    events; the coarser grains re-aggregate the 15-min partials
    (hour/day boundaries are exact supersets of 15-min buckets), so raw
    data is scanned exactly once and the coarse rollups run on the tiny
    intermediate — the cascade that keeps a 100 TB hypertable refresh
    O(finest-grain cardinality), not O(events), above the first level.
    Money sums ride the exact integer-cent lane (ROUND_NOTES.md)."""
    e = load_table(spark, sf_dir, "events")
    fine = (
        e.select(
            F.col("ts"),
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy(
            (
                F.date_trunc("hour", "ts")
                + F.make_interval(mins=(F.floor(F.minute("ts") / 15) * 15).cast("int"))
            ).alias("bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
    )
    hour = fine.groupBy(
        F.date_trunc("hour", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    day = fine.groupBy(
        F.date_trunc("day", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))

    def finish(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket",
            "event_type",
            "n",
            F.round(F.col("cents") / 100.0, 2).alias("total"),
        )

    return (
        finish(fine, "15min")
        .unionByName(finish(hour, "1hour"))
        .unionByName(finish(day, "1day"))
    )
