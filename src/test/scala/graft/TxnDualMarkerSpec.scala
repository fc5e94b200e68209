package graft

import graft.model.MessageEnvelope
import graft.operators.Transactions
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/**
 * Batch/stream agreement on the ADVERSARIAL dual-terminal-marker log —
 * the input the coordinator makes impossible (a second END_TXN on an
 * ended txn is rejected with InvalidTxnStatusException), pinned anyway
 * so the two visibility engines can never drift on it: both implement
 * FIRST-terminal-marker-by-offset wins — [[Transactions
 * .statusFromMarkers]] via min_by(marker_type, msg_offset), [[
 * StreamingOps.txnBufferStream]] via idempotent terminal markers. Found
 * by the round-17 review pass: the previous batch fold took
 * any-commit-wins, so an abort-then-commit log showed every txn row in
 * batch while the stream swallowed the pre-commit ones.
 */
class TxnDualMarkerSpec extends AnyFunSuite {
  import TestSpark._

  private def mk(off: Long, txn: Option[Long],
      marker: Option[Int]): MessageEnvelope =
    MessageEnvelope(
      topic = "t-0", partition_id = 0, ledger_id = off / 100,
      entry_id = off % 100, batch_index = 0, msg_offset = off,
      producer_name = "p0", sequence_id = off,
      publish_ms = 1000000L + off * 1000, event_ms = 1000000L + off * 1000,
      key = s"k-$off", value = off.toDouble, value_bin = Array.emptyByteArray,
      properties = "{}", schema_version = 0L,
      deliver_at_ms = 1000000L + off * 1000, marker_type = marker,
      replicated_from = None, txn_group = txn, attempts = 0,
      uuid_group = off, chunk_id = 0, tombstone = false,
      ordering_key = None, uuid = s"u-$off", num_chunks = 1,
      compacted_out = false)

  /** txn-7 data rows straddling both markers, plus non-txn bystanders. */
  private def log(m1: (Long, Int), m2: (Long, Int)): Seq[MessageEnvelope] =
    Seq(
      mk(1, Some(7L), None), mk(2, Some(7L), None),
      mk(3, None, None), // non-txn: always visible
      mk(m1._1, Some(7L), Some(m1._2)),
      mk(6, Some(7L), None), // between the two terminal markers
      mk(m2._1, Some(7L), Some(m2._2)),
      mk(8, Some(7L), None), mk(10, Some(7L), None))

  private def streamVisible(rows: Seq[MessageEnvelope]): Set[Long] = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = MemoryStream[MessageEnvelope]
    val name = s"txn_dual_${rows.hashCode.abs}"
    val q = StreamingOps.txnBufferStream(s.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-txn-dual-").toString)
      .start()
    rows.sortBy(_.msg_offset).grouped(2)
      .foreach { c => s.addData(c); q.processAllAvailable() }
    q.stop()
    spark.table(name).select("msg_offset").collect().map(_.getLong(0)).toSet
  }

  private def batchVisible(rows: Seq[MessageEnvelope]): Set[Long] = {
    import spark.implicits._
    Transactions.visibleCommitted(rows.toDF())
      .select("msg_offset").collect().map(_.getLong(0)).toSet
  }

  private def status(rows: Seq[MessageEnvelope]): String = {
    import spark.implicits._
    Transactions.statusFromMarkers(rows.toDF())
      .select("status").head().getString(0)
  }

  test("abort-then-commit: first marker wins in BOTH engines (all hidden)") {
    val rows = log((4L, Transactions.TxnAbortMarker),
      (7L, Transactions.TxnCommitMarker))
    assert(status(rows) === "ABORTED")
    val batch = batchVisible(rows)
    assert(batch === Set(3L)) // only the non-txn bystander
    assert(streamVisible(rows) === batch)
  }

  test("commit-then-abort: first marker wins in BOTH engines (all visible)") {
    val rows = log((4L, Transactions.TxnCommitMarker),
      (7L, Transactions.TxnAbortMarker))
    assert(status(rows) === "COMMITTED")
    val batch = batchVisible(rows)
    assert(batch === Set(1L, 2L, 3L, 6L, 8L, 10L))
    assert(streamVisible(rows) === batch)
  }

  test("contract violation — lower-offset terminal marker in a LATER batch refuses by name") {
    // the one case where first-ARRIVAL cannot equal first-by-offset: the
    // feed delivers the offset-7 commit in batch 1 (rows dispatch) and
    // the offset-4 abort in batch 2. Batch recovery (min_by) would call
    // the txn ABORTED; the stream has already dispatched and cannot
    // retract in append mode — so it must FAIL, not silently diverge.
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = MemoryStream[MessageEnvelope]
    val q = StreamingOps.txnBufferStream(s.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("txn_dual_violation")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-txn-dual-").toString)
      .start()
    s.addData(Seq(mk(1, Some(7L), None),
      mk(7, Some(7L), Some(Transactions.TxnCommitMarker))))
    q.processAllAvailable()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      s.addData(Seq(mk(4, Some(7L), Some(Transactions.TxnAbortMarker))))
      q.processAllAvailable()
    }
    q.stop()
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("offset-ordered dispatch contract violated")), ex)
  }

  test("single-marker logs are unchanged by the first-wins rule") {
    val commit = Seq(mk(1, Some(7L), None), mk(3, None, None),
      mk(4, Some(7L), Some(Transactions.TxnCommitMarker)),
      mk(6, Some(7L), None))
    assert(status(commit) === "COMMITTED")
    assert(batchVisible(commit) === Set(1L, 3L, 6L))
    assert(streamVisible(commit) === Set(1L, 3L, 6L))
    val abort = Seq(mk(1, Some(7L), None), mk(3, None, None),
      mk(4, Some(7L), Some(Transactions.TxnAbortMarker)),
      mk(6, Some(7L), None))
    assert(status(abort) === "ABORTED")
    assert(batchVisible(abort) === Set(3L))
    assert(streamVisible(abort) === Set(3L))
  }
}
