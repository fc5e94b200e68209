package graft.queries

import graft.functions.Exact
import graft.model.{EventLog, MessageEnvelope}
import graft.operators._
import graft.sources.{DataGeneratorSource, GraftIO}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The remaining SURVEY §2 surface rows as oracle-checked queries: raw
 * reader (S6), Source SPI + data generator (S9/S11), shadow topics (S15),
 * per-partition MessageId order (O1), bucketed delayed tracker (F4),
 * negative-ack backoff (F7), ack-timeout redelivery (F8), entry filters
 * (F12), interceptors (F17), payload processor (F18), timestamp
 * extractor (W8) and window context metadata (W9).
 */
object SurfaceQueries extends QueryGroup {

  private def env(s: SparkSession, dir: String): DataFrame = EventLog.topic(s, dir)
  private val E = EventLog.oracleCte
  private val H6_MS = 21600000L
  private def midPublish = "(SELECT (min(publish_ms) + max(publish_ms)) // 2 FROM env)"

  private val s6 = QueryDef(
    // S6 — raw entry scan, no envelope decode (compaction's input path).
    (s, d) => EventLog.raw(s, d)
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_id"),
        max(col("event_id")).as("last_id")),
    Some("""SELECT count(*) AS n, min(event_id) AS first_id, max(event_id) AS last_id
      |FROM events""".stripMargin))

  private val s10 = QueryDef(
    // S10 — the Sink SPI driven end to end: the envelope drains through
    // a per-partition LineFileSink (open/write/flush/close against the
    // local FS as the "external system"), and the RESULT is read back
    // from what the sink actually wrote — count, offset sum, and
    // producer spread must survive the full connector contract. The
    // oracle computes the same aggregates from the source table.
    (s, d) => {
      import s.implicits._
      val dir = graft.Scratch.freshDirFor("s10-sink", d)
      val lines = env(s, d)
        .select(concat_ws(",", col("msg_offset"), col("producer_name"))
          .as("line")).as[String]
      GraftIO.toSink(lines, new graft.sources.LineFileSink(dir))
      s.read.text(dir)
        .select(split(col("value"), ",").as("f"))
        .select(col("f").getItem(0).cast("long").as("off"),
          col("f").getItem(1).as("producer"))
        .agg(count(lit(1)).as("n"), sum(col("off")).as("sum_off"),
          countDistinct(col("producer")).as("producers"))
    },
    Some(s"""$E
      |SELECT count(*) AS n, CAST(sum(msg_offset) AS BIGINT) AS sum_off,
      |       count(DISTINCT producer_name) AS producers
      |FROM env""".stripMargin))

  private val s11 = QueryDef(
    // S9+S11 — the data-generator connector through the Source SPI:
    // open/read/close per partition, 4 partitions × 250 records.
    (s, _) => GraftIO.fromSource(s, new DataGeneratorSource(250L, 4))(
      org.apache.spark.sql.Encoders.product[graft.sources.GenRecord]).toDF()
      .agg(count(lit(1)).as("n"), countDistinct(col("name")).as("names"),
        Exact.sumE(col("score"), 2).as("sum_score"),
        sum(when(col("flag"), 1L).otherwise(0L)).as("n_flagged")),
    Some(s"""WITH g AS (SELECT unnest(range(0, 1000)) AS id)
      |SELECT count(*) AS n,
      |       count(DISTINCT 'name-' || CAST(id % 7 AS VARCHAR)) AS names,
      |       ${Exact.sqlSumE("(id % 100) / 10.0", 2)} AS sum_score,
      |       CAST(sum(CASE WHEN id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
      |FROM g""".stripMargin))

  private val s15 = QueryDef(
    // S15 — shadow topic: a read-only renamed view of the source topic.
    (s, d) => env(s, d).filter(col("topic") === "events-0")
      .withColumn("topic", concat(col("topic"), lit("-shadow")))
      .groupBy(col("topic"))
      .agg(count(lit(1)).as("n"), max(col("msg_offset")).as("head_offset")),
    Some(s"""$E
      |SELECT topic || '-shadow' AS topic, count(*) AS n,
      |       max(msg_offset) AS head_offset
      |FROM env WHERE topic = 'events-0' GROUP BY topic""".stripMargin))

  private val s16 = QueryDef(
    // S16 — bucketed topic storage: the topic and its per-key head-offset
    // dim persisted hash-bucketed by key, then consumed through an
    // EXCHANGE-FREE co-located join + key aggregation (the 100 TB read
    // layout; zero-shuffle property asserted in BucketedTopicSpec). The
    // oracle only checks the answer — same as the direct formulation.
    (s, d) => {
      val dir = graft.Scratch.clearDirFor("s16", d)
      val e = env(s, d).select(col("key"), col("msg_offset"), col("value"))
      GraftIO.writeBucketedTopic(e, "graft_s16_log", s"$dir/log",
        Seq("key"), 8, sortCols = Seq("key"))
      GraftIO.writeBucketedTopic(
        e.groupBy(col("key")).agg(max(col("msg_offset")).as("head_offset")),
        "graft_s16_heads", s"$dir/heads", Seq("key"), 8, sortCols = Seq("key"))
      s.table("graft_s16_log").join(s.table("graft_s16_heads"), "key")
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"), Exact.sumE(col("value"), 2).as("sum_v"),
          max(col("head_offset")).as("head_offset"))
        .orderBy(col("key"))
    },
    Some(s"""$E
      |SELECT key, count(*) AS n, ${Exact.sqlSumE("value", 2)} AS sum_v,
      |       max(msg_offset) AS head_offset
      |FROM env GROUP BY key ORDER BY key""".stripMargin))

  private val m10 = QueryDef(
    // M10 — the SQL surface: the engine's custom expressions registered as
    // SQL functions (GraftSql.register / spark.sql.extensions=
    // graft.GraftExtensions) and exercised through pure `spark.sql` text
    // over a topic view — routing hash, ring bucket, cosine kernel, and a
    // zlib roundtrip guard (any codec corruption turns payload_bytes
    // negative). The oracle re-derives the hashes from the spec-pinned
    // Murmur3x86 and the cosine from the same-order double fold.
    (s, d) => {
      graft.GraftSql.register(s)
      env(s, d).createOrReplaceTempView("graft_topic")
      s.sql(s"""
        SELECT key, key_shared_bucket(key) AS bucket,
               CAST(murmur3_32_positive(key, 0) % 6 AS INT) AS route_partition,
               count(*) AS n,
               ${Exact.sqlSumE("cosine_sim(array(value, 1.0D), array(1.0D, 1.0D))", 6)} AS sum_cos,
               sum(CASE WHEN zlib_inflate(zlib_deflate(value_bin)) = value_bin
                        THEN octet_length(value_bin) ELSE -1000000 END) AS payload_bytes
        FROM graft_topic
        WHERE CAST(key AS BIGINT) < 15
        GROUP BY key ORDER BY key""")
    },
    Some {
      val values = (0 to 14).map { k =>
        val h = graft.functions.Murmur3x86.positive(k.toString.getBytes("UTF-8"), 0)
        s"('$k', ${h % 65536}, ${h % 6})"
      }.mkString(", ")
      s"""$E, m(key, bucket, pt) AS (SELECT * FROM (VALUES $values)),
        |cnt AS (
        |  SELECT key, count(*) AS n,
        |    ${Exact.sqlSumE("(value + 1.0) / (sqrt(value * value + 1.0) * sqrt(2.0))", 6)} AS sum_cos,
        |    CAST(sum(octet_length(value_bin)) AS BIGINT) AS payload_bytes
        |  FROM env WHERE CAST(key AS BIGINT) < 15 GROUP BY key)
        |SELECT cnt.key AS key, CAST(m.bucket AS INT) AS bucket,
        |       CAST(m.pt AS INT) AS route_partition, cnt.n AS n,
        |       cnt.sum_cos AS sum_cos, cnt.payload_bytes AS payload_bytes
        |FROM cnt JOIN m ON cnt.key = m.key ORDER BY key""".stripMargin
    })

  private val o1 = QueryDef(
    // O1 — per-partition total order: MessageId (ledger, entry) must be
    // consistent with the offset order; violations = 0.
    (s, d) => env(s, d).groupBy(col("partition_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ledger_id") * 100 + col("entry_id") =!= col("msg_offset"), 1L)
          .otherwise(0L)).as("order_violations"))
      .orderBy(col("partition_id")),
    Some(s"""$E
      |SELECT partition_id, count(*) AS n,
      |       CAST(sum(CASE WHEN ledger_id * 100 + entry_id <> msg_offset
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS order_violations
      |FROM env GROUP BY partition_id ORDER BY partition_id""".stripMargin))

  private val f4 = QueryDef(
    // F4 — bucketed delayed index: hour buckets; a bucket whose upper
    // bound passed the as-of dispatches wholesale (partition pruning).
    (s, d) => {
      val e = env(s, d)
      val asOf = e.agg(((min(col("publish_ms")) + max(col("publish_ms"))) / 2)
        .cast("long").as("_asof"))
      Redelivery.delayedBuckets(e, 3600000L).crossJoin(asOf)
        .groupBy(col("delay_bucket"))
        .agg(count(lit(1)).as("n"),
          max(when((col("delay_bucket") + 1) * 3600000L - 1 <= col("_asof"), 1)
            .otherwise(0)).as("fully_due"))
        .orderBy(col("delay_bucket"))
    },
    Some(s"""$E
      |SELECT deliver_at_ms // 3600000 AS delay_bucket, count(*) AS n,
      |       max(CASE WHEN (deliver_at_ms // 3600000 + 1) * 3600000 - 1 <= $midPublish
      |                THEN 1 ELSE 0 END) AS fully_due
      |FROM env GROUP BY 1 ORDER BY 1""".stripMargin))

  private val f7 = QueryDef(
    // F7 — multiplier backoff schedule per attempt count.
    (s, d) => Redelivery.negativeAckSchedule(env(s, d), 1000L, 2.0, 60000L)
      .groupBy(col("attempts"))
      .agg(count(lit(1)).as("n"),
        max(col("redeliver_at_ms") - col("publish_ms")).as("backoff_ms"))
      .orderBy(col("attempts")),
    Some(s"""$E
      |SELECT attempts, count(*) AS n,
      |       CAST(least(1000 * power(2.0, attempts), 60000) AS BIGINT) AS backoff_ms
      |FROM env GROUP BY attempts ORDER BY attempts""".stripMargin))

  private val f8 = QueryDef(
    // F8 — ack-timeout: unacked messages past the 6h timeout at mid-log.
    (s, d) => {
      val e = env(s, d)
      val acked = e.filter(col("msg_offset") % 3 === 0).select(col("msg_offset"))
      val asOf = e.agg(((min(col("publish_ms")) + max(col("publish_ms"))) / 2)
        .cast("long").as("_asof"))
      Redelivery.ackTimeoutRedelivery(e.crossJoin(asOf), acked, H6_MS, col("_asof"))
        .groupBy(col("topic"))
        .agg(count(lit(1)).as("redeliver_count"), min(col("msg_offset")).as("first_redelivery"))
        .orderBy(col("topic"))
    },
    Some(s"""$E
      |SELECT topic, count(*) AS redeliver_count, min(msg_offset) AS first_redelivery
      |FROM env
      |WHERE msg_offset % 3 <> 0 AND publish_ms + $H6_MS <= $midPublish
      |GROUP BY topic ORDER BY topic""".stripMargin))

  private val f12 = QueryDef(
    // F12 — entry-filter chain: all predicates must accept.
    (s, d) => Extensions.entryFilters(env(s, d), Seq(
      col("marker_type").isNull,
      get_json_object(col("properties"), "$.k").cast("long") < 50))
      .groupBy(col("topic")).agg(count(lit(1)).as("n"))
      .orderBy(col("topic")),
    Some(s"""$E
      |SELECT topic, count(*) AS n FROM env
      |WHERE marker_type IS NULL
      |  AND CAST(regexp_extract(properties, '"k": ([0-9]+)', 1) AS BIGINT) < 50
      |GROUP BY topic ORDER BY topic""".stripMargin))

  private val f17 = QueryDef(
    // F17 — producer interceptor tags on send; consumer interceptor
    // filters on receive; chained with transform composition.
    (s, d) => Extensions.intercept(env(s, d), Seq(
      df => df.withColumn("send_tag", concat(col("topic"), lit("#sent"))),
      df => df.filter(col("value") > 0.5)))
      .groupBy(col("send_tag"))
      .agg(count(lit(1)).as("n"), Exact.sumE(col("value"), 2).as("sum_v"))
      .orderBy(col("send_tag")),
    Some(s"""$E
      |SELECT topic || '#sent' AS send_tag, count(*) AS n,
      |       ${Exact.sqlSumE("value", 2)} AS sum_v
      |FROM env WHERE value > 0.5 GROUP BY topic ORDER BY send_tag""".stripMargin))

  private val f18 = QueryDef(
    // F18 — payload processor: one stored message → N decoded units.
    (s, d) => {
      import s.implicits._
      Extensions.processPayload(env(s, d).as[MessageEnvelope], { m =>
        val k = "\"k\": ([0-9]+)".r.findFirstMatchIn(m.properties)
          .map(_.group(1).toLong).getOrElse(0L)
        (0L to k % 3).map(u => (m.topic, u))
      }).toDF("topic", "unit")
        .groupBy(col("topic")).agg(count(lit(1)).as("units"))
        .orderBy(col("topic"))
    },
    Some(s"""$E
      |SELECT topic,
      |       CAST(sum(CAST(regexp_extract(properties, '"k": ([0-9]+)', 1) AS BIGINT) % 3 + 1) AS BIGINT) AS units
      |FROM env GROUP BY topic ORDER BY topic""".stripMargin))

  private val w8 = QueryDef(
    // W8 — TimestampExtractor: windows over a caller-chosen time column
    // (publish time here) instead of the default event time.
    (s, d) => env(s, d)
      .groupBy(((col("publish_ms") / H6_MS).cast("long") * H6_MS).as("window_start_ms"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("window_start_ms")),
    Some(s"""$E
      |SELECT (publish_ms // $H6_MS) * $H6_MS AS window_start_ms, count(*) AS n
      |FROM env GROUP BY 1 ORDER BY 1""".stripMargin))

  private val w9 = QueryDef(
    // W9 — WindowContext: window metadata (id, bounds, record positions)
    // available to the windowed function.
    (s, d) => TimeWindows.tumbling(env(s, d), H6_MS,
      Seq(count(lit(1)).as("record_count"), min(col("msg_offset")).as("first_offset"),
        max(col("msg_offset")).as("last_offset")))
      .withColumn("window_id", (col("window_start_ms") / H6_MS).cast("long"))
      .withColumn("window_end_ms", col("window_start_ms") + H6_MS)
      .select(col("window_id"), col("window_start_ms"), col("window_end_ms"),
        col("record_count"), col("first_offset"), col("last_offset"))
      .orderBy(col("window_id")),
    Some(s"""$E
      |SELECT (event_ms // $H6_MS) AS window_id,
      |       (event_ms // $H6_MS) * $H6_MS AS window_start_ms,
      |       (event_ms // $H6_MS) * $H6_MS + $H6_MS AS window_end_ms,
      |       count(*) AS record_count, min(msg_offset) AS first_offset,
      |       max(msg_offset) AS last_offset
      |FROM env GROUP BY 1 ORDER BY 1""".stripMargin))

  private val w10 = QueryDef(
    // W10 — SESSION windows (the gap-based member of the window family,
    // beside tumbling/sliding/count): per key, events within 30 min of
    // the previous event share a session; the session ends 30 min after
    // its last event. The engine uses Spark's native session_window
    // (merging-interval state); the oracle sessionizes the classic SQL
    // way — lag + break flag + running sum — so parity checks two
    // entirely different algorithms. Pure integer math, no floats.
    (s, d) => env(s, d)
      .select(col("key"), timestamp_millis(col("publish_ms")).as("ts"))
      .groupBy(col("key"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("key"),
        unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"))
      .orderBy(col("key"), col("session_start_ms")),
    Some(s"""$E,
      |x AS (SELECT key, publish_ms,
      |        CASE WHEN publish_ms - lag(publish_ms) OVER
      |               (PARTITION BY key ORDER BY publish_ms) >= 1800000
      |             THEN 1 ELSE 0 END AS brk
      |      FROM env),
      |g AS (SELECT key, publish_ms,
      |        sum(brk) OVER (PARTITION BY key ORDER BY publish_ms
      |          ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM x)
      |SELECT key, min(publish_ms) AS session_start_ms,
      |       max(publish_ms) + 1800000 AS session_end_ms,
      |       count(*) AS n_events
      |FROM g GROUP BY key, sid
      |ORDER BY key, session_start_ms""".stripMargin))

  override val defs: Map[String, QueryDef] = Map(
    "s6_raw_reader" -> s6,
    "w10_session_windows" -> w10,
    "s10_sink_roundtrip" -> s10,
    "s11_datagen_source" -> s11,
    "s15_shadow_topic" -> s15,
    "m10_sql_surface" -> m10,
    "s16_bucketed_topic" -> s16,
    "o1_message_id_order" -> o1,
    "f4_delayed_buckets" -> f4,
    "f7_negative_ack_backoff" -> f7,
    "f8_ack_timeout" -> f8,
    "f12_entry_filters" -> f12,
    "f17_interceptors" -> f17,
    "f18_payload_processor" -> f18,
    "w8_timestamp_extractor" -> w8,
    "w9_window_context" -> w9
  )
}
