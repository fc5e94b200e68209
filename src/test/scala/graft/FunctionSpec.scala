package graft

import graft.functions.{FunctionContext, PFunction, PFunctions}
import graft.model.MessageEnvelope
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Functions-surface semantics: null-filter, lifecycle bracketing,
 * composition short-circuit, and the streaming keyed-state operators
 * converging to their batch twins. */
class FunctionSpec extends AnyFunSuite {
  import TestSpark._

  private val rows = Seq(
    (0L, "p0", 0L, "a", 1.0, 100L, false, None),
    (1L, "p0", 1L, "b", -2.0, 200L, false, None),
    (2L, "p0", 2L, "a", 3.0, 300L, false, Some(1)), // marker
    (3L, "p1", 3L, "b", 4.0, 400L, false, None),
    (4L, "p1", 4L, "a", 5.0, 500L, false, None),
    (5L, "p1", 5L, "a", 6.0, 600L, false, None)
  )
  private lazy val log = env(rows)

  test("null process result drops the record (U1)") {
    import spark.implicits._
    val fn = new PFunction[MessageEnvelope, java.lang.Double] {
      override def process(m: MessageEnvelope, ctx: FunctionContext): java.lang.Double =
        if (m.value < 0 || m.marker_type.isDefined) null else Double.box(m.value)
    }
    val out = PFunctions.transform(log.as[MessageEnvelope], fn)
      .collect().map(_.doubleValue).sorted
    assert(out.toSeq === Seq(1.0, 4.0, 5.0, 6.0))
  }

  test("composition short-circuits on null and fuses both stages (U4)") {
    val f = new PFunction[Int, Integer] {
      override def process(x: Int, ctx: FunctionContext): Integer =
        if (x % 2 == 0) null else Int.box(x * 10)
    }
    val g = new PFunction[Integer, Integer] {
      override def process(x: Integer, ctx: FunctionContext): Integer =
        if (x > 40) null else Int.box(x + 1)
    }
    val fg = PFunctions.compose(f, g)
    val ctx = new FunctionContext()
    assert(fg.process(1, ctx) === 11)
    assert(fg.process(2, ctx) === null) // f filtered
    assert(fg.process(5, ctx) === null) // g filtered
  }

  test("streaming keyed counters converge to the batch counts (A6)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = MemoryStream[MessageEnvelope]
    val q = StreamingOps.keyedCounters(s.toDS(), _.producer_name).toDF("k", "n")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("fn_counters")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString).start()
    val envelopes = log.as[MessageEnvelope].collect().sortBy(_.msg_offset)
    envelopes.grouped(2).foreach { c => s.addData(c.toSeq); q.processAllAvailable() }
    q.stop()
    // final counter value per key = last update emitted
    val finalCounts = spark.table("fn_counters").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(finalCounts === Map("p0" -> 3L, "p1" -> 3L))
  }

  test("streaming count windows emit exactly the complete windows (W5)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = MemoryStream[MessageEnvelope]
    val q = StreamingOps.countWindowStream(s.toDS(), 2).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("fn_windows")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString).start()
    val envelopes = log.as[MessageEnvelope].collect().sortBy(_.msg_offset)
    envelopes.grouped(3).foreach { c => s.addData(c.toSeq); q.processAllAvailable() }
    q.stop()
    val wins = spark.table("fn_windows")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).sorted
    // key a: values 1,3,5,6 in offset order (incl. marker row) → windows (1+3),(5+6)
    // key b: values -2,4 → one window
    assert(wins.toSeq === Seq(("a", 0L, 4.0), ("a", 1L, 11.0), ("b", 0L, 2.0)))
  }
}
