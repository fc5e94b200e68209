package graft.queries

import graft.functions.{FunctionContext, PFunction, PFunctions}
import graft.model.{EventLog, MessageEnvelope}
import graft.operators.TimeWindows
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The Pulsar Functions surface (SURVEY §2.6) as oracle-checked queries:
 * scalar UDF with null-filter semantics (U1), side outputs (U3),
 * composition (U4), keyed counters (A6) and byte state (A7), and the
 * count-window-with-watermark (W5) — each the batch twin of the
 * streaming operators in graft.streaming.StreamingOps.
 */
object FunctionQueries extends QueryGroup {

  private def env(s: SparkSession, dir: String): DataFrame = EventLog.topic(s, dir)
  private val E = EventLog.oracleCte

  /** U1 — drop markers/tombstones, emit (key, 2×value); null = filter
   * (Function.java:40). */
  private object DoubleValueFn extends PFunction[MessageEnvelope, (String, Double)] {
    override def process(m: MessageEnvelope, ctx: FunctionContext): (String, Double) =
      if (m.marker_type.isDefined || m.tombstone) null else (m.key, m.value * 2)
  }

  private val u1 = QueryDef(
    (s, d) => {
      import s.implicits._
      PFunctions.transform(env(s, d).as[MessageEnvelope], DoubleValueFn)
        .toDF("key", "doubled")
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"), round(sum(col("doubled")), 2).as("sum_doubled"))
        .orderBy(col("key"))
    },
    Some(s"""$E
      |SELECT key, count(*) AS n, round(sum(value * 2), 2) AS sum_doubled
      |FROM env WHERE marker_type IS NULL AND NOT tombstone
      |GROUP BY key ORDER BY key""".stripMargin))

  private val u3 = QueryDef(
    (s, d) => {
      import s.implicits._
      PFunctions.sideOutputs[MessageEnvelope, Double](env(s, d).as[MessageEnvelope],
        m => Seq("main" -> m.value) ++
          (if (m.txn_group.isDefined) Seq("audit" -> m.value) else Nil) ++
          (if (m.tombstone) Seq("errors" -> m.value) else Nil))
        .toDF("out_topic", "payload")
        .groupBy(col("out_topic")).agg(count(lit(1)).as("n"))
        .orderBy(col("out_topic"))
    },
    Some(s"""$E
      |SELECT * FROM (
      |  SELECT 'audit' AS out_topic, count(*) AS n FROM env WHERE txn_group IS NOT NULL
      |  UNION ALL
      |  SELECT 'errors', count(*) FROM env WHERE tombstone
      |  UNION ALL
      |  SELECT 'main', count(*) FROM env)
      |ORDER BY out_topic""".stripMargin))

  /** U4 — f: drop markers, scale ×10; g: drop below 5 (each stage has
   * null-filter semantics; composed in one instance). */
  private object ScaleFn extends PFunction[MessageEnvelope, (String, Double)] {
    override def process(m: MessageEnvelope, ctx: FunctionContext): (String, Double) =
      if (m.marker_type.isDefined) null else (m.topic, m.value * 10)
  }
  private object ThresholdFn extends PFunction[(String, Double), (String, Double)] {
    override def process(x: (String, Double), ctx: FunctionContext): (String, Double) =
      if (x._2 < 5) null else x
  }

  private val u4 = QueryDef(
    (s, d) => {
      import s.implicits._
      PFunctions.transform(env(s, d).as[MessageEnvelope],
        PFunctions.compose(ScaleFn, ThresholdFn))
        .toDF("topic", "scaled")
        .groupBy(col("topic"))
        .agg(count(lit(1)).as("n"), round(sum(col("scaled")), 2).as("sum_scaled"))
        .orderBy(col("topic"))
    },
    Some(s"""$E
      |SELECT topic, count(*) AS n, round(sum(value * 10), 2) AS sum_scaled
      |FROM env WHERE marker_type IS NULL AND value * 10 >= 5
      |GROUP BY topic ORDER BY topic""".stripMargin))

  private val a6 = QueryDef(
    // A6 batch twin of StreamingOps.keyedCounters: counter per producer of
    // processed (non-marker) records.
    (s, d) => env(s, d).filter(col("marker_type").isNull)
      .groupBy(col("producer_name").as("counter_key"))
      .agg(count(lit(1)).as("counter_value"))
      .orderBy(col("counter_key")),
    Some(s"""$E
      |SELECT producer_name AS counter_key, count(*) AS counter_value
      |FROM env WHERE marker_type IS NULL
      |GROUP BY producer_name ORDER BY counter_key""".stripMargin))

  private val a7 = QueryDef(
    // A7 batch twin of StreamingOps.byteState: final state per key is the
    // 8-byte big-endian max sequence id, shown hex-encoded.
    (s, d) => env(s, d).groupBy(col("key"))
      .agg(max(col("sequence_id")).as("_max_seq"), count(lit(1)).as("updates"))
      .select(col("key"),
        lpad(lower(hex(col("_max_seq"))), 16, "0").as("state_hex"),
        col("updates"))
      .orderBy(col("key")),
    Some(s"""$E
      |SELECT key, lpad(lower(to_hex(max(sequence_id))), 16, '0') AS state_hex,
      |       count(*) AS updates
      |FROM env GROUP BY key ORDER BY key""".stripMargin))

  private val w5 = QueryDef(
    // W5 — count windows triggered under the watermark: only records at or
    // below (max event time − lag) participate, and only complete windows
    // of 5 emit; the streaming twin is StreamingOps.countWindowStream.
    (s, d) => {
      val e = env(s, d)
      val wm = e.agg((max(col("event_ms")) - 60000L).as("_wm"))
      val eligible = e.crossJoin(wm).filter(col("event_ms") <= col("_wm"))
      TimeWindows.countTumblingPerKey(eligible, 5,
        Seq(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v")))
        .filter(col("n") === 5)
        .orderBy(col("key"), col("window_id"))
    },
    Some(s"""$E, wm AS (SELECT max(event_ms) - 60000 AS w FROM env),
      |el AS (SELECT key, value, msg_offset FROM env, wm WHERE event_ms <= w),
      |win AS (
      |  SELECT key, value,
      |         (row_number() OVER (PARTITION BY key ORDER BY msg_offset) - 1) // 5 AS window_id
      |  FROM el)
      |SELECT key, window_id, count(*) AS n, round(sum(value), 2) AS sum_v
      |FROM win GROUP BY key, window_id HAVING count(*) = 5
      |ORDER BY key, window_id""".stripMargin))

  override val defs: Map[String, QueryDef] = Map(
    "u1_scalar_fn" -> u1,
    "u3_side_outputs" -> u3,
    "u4_composition" -> u4,
    "a6_counters" -> a6,
    "a7_byte_state" -> a7,
    "w5_count_watermark" -> w5
  )
}
