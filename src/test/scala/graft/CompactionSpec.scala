package graft

import graft.operators.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Semantic ports of the reference's compaction scenarios
 * (pulsar-broker/src/test/java/org/apache/pulsar/compaction/CompactionTest
 * .java): after compaction a reader sees exactly the latest value per key,
 * tombstones delete keys, markers never survive, and the event-time variant
 * orders by event time instead of publish order
 * (EventTimeOrderCompactor.java:67-72).
 */
class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  //           off  producer seq  key   value  eventMs  tomb  marker
  private val log = env(Seq(
    (0L, "p0", 0L, "a", 1.0, 100L, false, None),
    (1L, "p0", 1L, "b", 2.0, 200L, false, None),
    (2L, "p0", 2L, "a", 3.0, 150L, false, None), // newer offset, older event time
    (3L, "p0", 3L, "c", 4.0, 300L, false, None),
    (4L, "p0", 4L, "b", 5.0, 400L, true, None),  // tombstone deletes b
    (5L, "p0", 5L, "d", 6.0, 500L, false, Some(1)), // marker: excluded
    (6L, "p0", 6L, "a", 7.0, 120L, false, None)  // latest a by offset, oldest by event
  ))

  test("publish-order compaction keeps the latest message per key") {
    val out = Compaction.publishOrder(log)
      .select("key", "msg_offset", "value").orderBy("key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // b was tombstoned; d only appeared as a marker
    assert(out.toSeq === Seq(("a", 6L, 7.0), ("c", 3L, 4.0)))
  }

  test("event-time compaction retains the newest event time, not offset") {
    val out = Compaction.eventTimeOrder(log)
      .select("key", "msg_offset").orderBy("key")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // for a: event times are 100, 150, 120 → offset 2 wins
    assert(out.toSeq === Seq(("a", 2L), ("c", 3L)))
  }

  test("tableView is the key → latest-value map") {
    val m = Compaction.tableView(log)
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("latest_value")).toMap
    assert(m === Map("a" -> 7.0, "c" -> 4.0))
  }

  test("readCompacted = compacted head + raw tail past the horizon") {
    val out = Compaction.readCompacted(log, horizonOffset = 3L)
      .select("key", "msg_offset").orderBy("msg_offset")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // head (<=3) compacts to a@2, b@1, c@3; tail keeps 4 and 6, drops marker 5
    assert(out.toSeq === Seq(("b", 1L), ("a", 2L), ("c", 3L), ("b", 4L), ("a", 6L)))
  }

  test("strategic compaction applies the user merge function") {
    import TestSpark.spark.implicits._
    val ds = log.as[graft.model.MessageEnvelope]
    // keep the message with the HIGHEST value per key (not latest offset)
    val merged = Compaction.strategic[graft.model.MessageEnvelope](
      ds, _.key, (a, b) => if (a.value >= b.value) a else b)
      .collect().map { case (k, m) => k -> m.value }.toMap
    assert(merged === Map("a" -> 7.0, "b" -> 5.0, "c" -> 4.0, "d" -> 6.0))
  }

  test("compaction shuffles |keys|, not |messages| (partial agg, one exchange)") {
    // max_by over a struct buffer plans as SortAggregate (structs aren't
    // hash-aggregable) — the scale property is the map-side partial before
    // a single key-sized Exchange, and no Window (which would sort the
    // whole log in one pass).
    val plan = Compaction.publishOrder(log).queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by"), s"expected map-side partial agg in:\n$plan")
    assert("Exchange".r.findAllIn(plan).size === 1, s"expected exactly one shuffle in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window operator in:\n$plan")
  }
}
