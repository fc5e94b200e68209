package graft

import graft.model.MessageEnvelope
import graft.operators.{Compaction, Dedup}
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming operators converge to their batch twins on a replayed log
 * (the M4 contract; StreamingSmoke runs the same checks on the fixture). */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ckpt() = Files.createTempDirectory("graft-test-ckpt-").toString

  //            off producer seq  key  value  event tomb marker
  private val rows = Seq(
    (0L, "p0", 0L, "a", 1.0, 100L, false, None),
    (1L, "p0", 1L, "b", 2.0, 200L, false, None),
    (2L, "p0", 1L, "a", 3.0, 300L, false, None), // replay seq 1
    (3L, "p0", 3L, "a", 4.0, 400L, false, None),
    (4L, "p1", 0L, "b", 5.0, 500L, true, None),  // tombstone b
    (5L, "p1", 0L, "c", 6.0, 600L, false, None)  // replay seq 0
  )
  private lazy val log = env(rows)

  test("streaming tableView converges to the batch view across batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = MemoryStream[MessageEnvelope]
    val (q, view) = StreamingOps.tableViewStream(s.toDF(), ckpt())
    val envelopes = log.as[MessageEnvelope].collect().sortBy(_.msg_offset)
    envelopes.grouped(2).foreach { c => s.addData(c.toSeq); q.processAllAvailable() }
    q.stop()
    val batch = Compaction.tableView(log).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(view.snapshot.view.mapValues(_.value).toMap === batch)
    assert(view.get("b").isEmpty) // tombstoned
  }

  test("streaming keyed-state dedup converges to batch dropReplays") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = MemoryStream[MessageEnvelope]
    val q = StreamingOps.dropReplaysStream(s.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("spec_dedup")
      .option("checkpointLocation", ckpt()).start()
    val envelopes = log.as[MessageEnvelope].collect().sortBy(_.msg_offset)
    envelopes.grouped(2).foreach { c => s.addData(c.toSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("spec_dedup").select("msg_offset")
      .collect().map(_.getLong(0)).sorted.toSeq
    val batch = Dedup.dropReplays(log).select("msg_offset")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed === batch)
  }

  test("tableViewStream REFUSES past the documented key-cardinality ceiling") {
    // the silent-driver-OOM edge fails by NAME: a topic whose key space
    // exceeds maxKeys kills the query with the contract message instead
    // of growing the client map without bound (the scaledPlanes
    // discipline; past the ceiling the operator is compactedTableStream)
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = MemoryStream[MessageEnvelope]
    val (q, _) = StreamingOps.tableViewStream(s.toDF(), ckpt(), maxKeys = 4)
    val proto = log.as[MessageEnvelope].head()
    val sixKeys = (0 until 6).map { i =>
      proto.copy(msg_offset = i.toLong, key = s"k$i", tombstone = false)
    }
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      s.addData(sixKeys); q.processAllAvailable()
    }
    q.stop()
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      c.getMessage != null && c.getMessage.contains("exceeds maxKeys=4")), ex)
  }

  test("urlCensusStream REFUSES past the documented per-host URL ceiling") {
    // the one stateful twin whose PER-KEY state is not O(1) (the host's
    // distinct-URL histogram lives in ONE state-store entry): a host
    // exceeding maxUrlsPerHost kills the query with the contract message
    // instead of growing an executor-resident map without bound — the
    // tableViewStream maxKeys discipline applied to a state store.
    // Repeats of KNOWN urls stay legal at the ceiling (they grow counts,
    // not the histogram).
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = MemoryStream[graft.streaming.UrlIngest]
    val q = StreamingOps.urlCensusStream(s.toDS(), maxUrlsPerHost = 2)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("spec_url_census_refuse")
      .option("checkpointLocation", ckpt()).start()
    s.addData(
      graft.streaming.UrlIngest(1L, "h", "http://h/a", 10L),
      graft.streaming.UrlIngest(2L, "h", "http://h/b", 10L),
      graft.streaming.UrlIngest(3L, "h", "http://h/a", 10L)) // repeat: legal
    q.processAllAvailable()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      s.addData(graft.streaming.UrlIngest(4L, "h", "http://h/c", 10L))
      q.processAllAvailable()
    }
    q.stop()
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("exceeds maxUrlsPerHost=2")), ex)
  }

  test("TableView listeners fire on upsert and delete") {
    val view = new graft.streaming.TableView
    var events = List.empty[(String, Boolean)]
    view.forEachAndListen((k, v) => events ::= (k, v.isDefined))
    view.upsert("x", graft.streaming.TableViewEntry(1.0, 0L, 0L))
    view.remove("x")
    assert(events.reverse === List(("x", true), ("x", false)))
  }
}
