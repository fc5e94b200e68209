package graft.queries

import graft.functions.{Exact, FunctionContext, PFunction, PFunctions}
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
        .agg(count(lit(1)).as("n"), Exact.sumE(col("doubled"), 2).as("sum_doubled"))
        .orderBy(col("key"))
    },
    Some(s"""$E
      |SELECT key, count(*) AS n, ${Exact.sqlSumE("value * 2", 2)} AS sum_doubled
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
        .agg(count(lit(1)).as("n"), Exact.sumE(col("scaled"), 2).as("sum_scaled"))
        .orderBy(col("topic"))
    },
    Some(s"""$E
      |SELECT topic, count(*) AS n, ${Exact.sqlSumE("value * 10", 2)} AS sum_scaled
      |FROM env WHERE marker_type IS NULL AND value * 10 >= 5
      |GROUP BY topic ORDER BY topic""".stripMargin))

  private val u5 = QueryDef(
    // U5 — the three guarantee levels over ONE replayed-slice fixture:
    // the crash leaves [200, 300) processed-but-unacked. The sink stats
    // make the user-visible distinction concrete: ATLEAST shows the
    // duplicates (n_sink > n_msgs), ATMOST loses the interrupted half
    // (n_sink < base count), EFFECTIVELY dedups back to exactly the base.
    // sum_out is the published-payload checksum — ATLEAST's includes the
    // double-published slice.
    (s, d) => {
      val base = env(s, d).filter(col("msg_offset") < 500)
      val stats = Seq("ATLEAST_ONCE", "ATMOST_ONCE", "EFFECTIVELY_ONCE").map { g =>
        PFunctions.guaranteeSink(base, g, 200L, 300L)
          .agg(count(lit(1)).as("n_sink"),
            countDistinct(col("topic"), col("partition_id"), col("msg_offset"))
              .as("n_msgs"),
            Exact.sumE(col("value") * 2, 2).as("sum_out"))
          .select(lit(g).as("guarantee"), col("n_sink"), col("n_msgs"), col("sum_out"))
      }
      stats.reduce(_ unionAll _).orderBy(col("guarantee"))
    },
    Some(s"""$E, base AS (SELECT * FROM env WHERE msg_offset < 500),
      |crash AS (SELECT * FROM base WHERE msg_offset >= 200 AND msg_offset < 300),
      |amo AS (SELECT * FROM base
      |        WHERE msg_offset < 200 OR msg_offset >= 300 OR msg_offset % 2 = 0),
      |alo AS (SELECT * FROM base UNION ALL SELECT * FROM crash)
      |SELECT * FROM (
      |  SELECT 'ATLEAST_ONCE' AS guarantee, count(*) AS n_sink,
      |         count(DISTINCT msg_offset) AS n_msgs,
      |         ${Exact.sqlSumE("value * 2", 2)} AS sum_out FROM alo
      |  UNION ALL
      |  SELECT 'ATMOST_ONCE', count(*), count(DISTINCT msg_offset),
      |         ${Exact.sqlSumE("value * 2", 2)} FROM amo
      |  UNION ALL
      |  SELECT 'EFFECTIVELY_ONCE', count(*), count(DISTINCT msg_offset),
      |         ${Exact.sqlSumE("value * 2", 2)} FROM base)
      |ORDER BY guarantee""".stripMargin))

  private val u6 = QueryDef(
    // U6 — retainKeyOrdering: the probe's observation ordinal (assigned by
    // the function instance AS ROWS ARRIVE) must advance in msg_offset
    // order per key. violations pins the monotone flag to zero;
    // order_checksum = sum(ordinal × value) differs from the oracle's
    // row_number()-over-msg_offset version for ANY other observation order.
    (s, d) => {
      import s.implicits._
      val in = env(s, d).filter(col("key").cast("long") < 15)
        .select(col("key"), col("msg_offset"), col("value"))
        .as[(String, Long, Double)]
      PFunctions.keyOrderedProbe(in)
        .toDF("key", "msg_offset", "value", "obs_seq", "monotone")
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"),
          sum(when(!col("monotone"), 1L).otherwise(0L)).as("violations"),
          Exact.sumE(col("obs_seq") * col("value"), 2).as("order_checksum"))
        .orderBy(col("key"))
    },
    Some(s"""$E, r AS (
      |  SELECT key, value,
      |         row_number() OVER (PARTITION BY key ORDER BY msg_offset) AS seq
      |  FROM env WHERE CAST(key AS BIGINT) < 15)
      |SELECT key, count(*) AS n, CAST(0 AS BIGINT) AS violations,
      |       ${Exact.sqlSumE("seq * value", 2)} AS order_checksum
      |FROM r GROUP BY key ORDER BY key""".stripMargin))

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
        Seq(count(lit(1)).as("n"), Exact.sumE(col("value"), 2).as("sum_v")))
        .filter(col("n") === 5)
        .orderBy(col("key"), col("window_id"))
    },
    Some(s"""$E, wm AS (SELECT max(event_ms) - 60000 AS w FROM env),
      |el AS (SELECT key, value, msg_offset FROM env, wm WHERE event_ms <= w),
      |win AS (
      |  SELECT key, value,
      |         (row_number() OVER (PARTITION BY key ORDER BY msg_offset) - 1) // 5 AS window_id
      |  FROM el)
      |SELECT key, window_id, count(*) AS n, ${Exact.sqlSumE("value", 2)} AS sum_v
      |FROM win GROUP BY key, window_id HAVING count(*) = 5
      |ORDER BY key, window_id""".stripMargin))

  private val u11 = QueryDef(
    // U11 — BatchSource discovery→trigger→ingest cycles: daily cron
    // fires discover every event since the last ACCEPTED fire; a fire
    // inside the previous discovery's busy window (400 s per task) is
    // dropped (BatchSourceExecutor's discoverInProgress guard), so
    // backlogs cascade into wider windows; discovered tasks spread
    // round-robin over 3 instances (the shared-subscription stand-in).
    // The oracle replays the trigger fold with a recursive CTE and the
    // task routing + digest relationally — rule replay, not pinned
    // constants, so it holds at every SF.
    (s, d) => graft.operators.BatchSourceCycles.cycles(
      graft.model.EventLog.raw(s, d)
        .select(col("event_id"), expr("ts div 1000000").as("ms")),
      "event_id", "ms", periodMs = 86400000L, perTaskMs = 400000L,
      instances = 3)
      .orderBy(col("cycle")),
    Some("""WITH RECURSIVE
      |b AS (SELECT epoch_ms(min(ts)) AS t0, count(*) AS total FROM events),
      |ev AS (SELECT event_id, epoch_ms(ts) AS ms FROM events),
      |sl AS (SELECT ((ms - t0 - 1) // 86400000) + 1 AS k, count(*) AS c
      |       FROM ev, b GROUP BY 1),
      |step(k, la, busy, drops, ing, emit, la_emit, drops_emit) AS (
      |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |         CAST(-4611686018427387904 AS BIGINT), CAST(0 AS BIGINT),
      |         CAST(0 AS BIGINT), FALSE,
      |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
      |  UNION ALL
      |  SELECT s.k + 1,
      |         CASE WHEN b.t0 + (s.k+1)*86400000 >= s.busy AND
      |                   (SELECT coalesce(sum(c),0) FROM sl
      |                    WHERE sl.k > s.la AND sl.k <= s.k+1) > 0
      |              THEN s.k + 1 ELSE s.la END,
      |         CASE WHEN b.t0 + (s.k+1)*86400000 >= s.busy AND
      |                   (SELECT coalesce(sum(c),0) FROM sl
      |                    WHERE sl.k > s.la AND sl.k <= s.k+1) > 0
      |              THEN b.t0 + (s.k+1)*86400000 + 400000 *
      |                   (SELECT coalesce(sum(c),0) FROM sl
      |                    WHERE sl.k > s.la AND sl.k <= s.k+1)
      |              ELSE s.busy END,
      |         CASE WHEN b.t0 + (s.k+1)*86400000 < s.busy THEN s.drops + 1
      |              WHEN (SELECT coalesce(sum(c),0) FROM sl
      |                    WHERE sl.k > s.la AND sl.k <= s.k+1) > 0 THEN 0
      |              ELSE s.drops END,
      |         s.ing + CASE WHEN b.t0 + (s.k+1)*86400000 >= s.busy
      |                 THEN (SELECT coalesce(sum(c),0) FROM sl
      |                       WHERE sl.k > s.la AND sl.k <= s.k+1)
      |                 ELSE 0 END,
      |         b.t0 + (s.k+1)*86400000 >= s.busy AND
      |           (SELECT coalesce(sum(c),0) FROM sl
      |            WHERE sl.k > s.la AND sl.k <= s.k+1) > 0,
      |         s.la, s.drops
      |  FROM step s, b
      |  WHERE s.ing < b.total),
      |cyc AS (
      |  SELECT CAST(row_number() OVER (ORDER BY k) AS INT) AS cycle,
      |         k AS k_hi, la_emit AS k_lo,
      |         (SELECT t0 FROM b) + k * 86400000 AS fire_ms,
      |         drops_emit AS n_dropped
      |  FROM step WHERE emit),
      |tk AS (
      |  SELECT c.cycle, e.event_id,
      |         row_number() OVER (PARTITION BY c.cycle
      |           ORDER BY e.event_id) AS rn
      |  FROM (SELECT event_id, ((ms - t0 - 1) // 86400000) + 1 AS k
      |        FROM ev, b) e
      |  JOIN cyc c ON e.k > c.k_lo AND e.k <= c.k_hi),
      |g AS (
      |  SELECT cycle, count(*) AS n_tasks,
      |    CAST(sum(CASE WHEN (rn-1) % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_i0,
      |    CAST(sum(CASE WHEN (rn-1) % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_i1,
      |    CAST(sum(CASE WHEN (rn-1) % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_i2,
      |    md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id))
      |      AS tasks_md5
      |  FROM tk GROUP BY cycle)
      |SELECT c.cycle, c.fire_ms, c.n_dropped, g.n_tasks,
      |       g.n_i0, g.n_i1, g.n_i2, g.tasks_md5
      |FROM cyc c JOIN g USING (cycle) ORDER BY cycle""".stripMargin))

  override val defs: Map[String, QueryDef] = Map(
    "u1_scalar_fn" -> u1,
    "u3_side_outputs" -> u3,
    "u4_composition" -> u4,
    "u5_guarantees" -> u5,
    "u6_key_ordering" -> u6,
    "u11_batch_cycles" -> u11,
    "a6_counters" -> a6,
    "a7_byte_state" -> a7,
    "w5_count_watermark" -> w5
  )
}
