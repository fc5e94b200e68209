package graft

import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.ConcurrentLinkedQueue

/** Source/Sink SPI lifecycle (S9/S10): partition-parallel open/read/close
 * and a sink roundtrip preserving every record. */
class IOSpec extends AnyFunSuite {
  import TestSpark._

  test("DataGeneratorSource produces partitioned deterministic records") {
    import spark.implicits._
    val ds = GraftIO.fromSource(spark, new DataGeneratorSource(10L, 3))
    val rows = ds.collect().sortBy(_.record_id)
    assert(rows.length === 30)
    assert(rows.map(_.record_id).toSeq === (0L until 30L))
    assert(rows.head === GenRecord(0L, "name-0", 0.0, flag = true))
  }

  test("sink roundtrip drains every record through open/write/flush") {
    import spark.implicits._
    val ds = GraftIO.fromSource(spark, new DataGeneratorSource(25L, 4))
    IOSpec.collected.clear()
    // the static holder is the "external system" — task-side sink
    // instances write into it; local[n] shares the JVM so the test can
    // observe it (a real sink writes to its remote endpoint here)
    GraftIO.toSink[GenRecord](ds, new GraftSink[GenRecord] {
      override def write(r: GenRecord): Unit = IOSpec.collected.add(r.record_id)
    })
    assert(IOSpec.collected.size === 100)
    import scala.jdk.CollectionConverters._
    assert(IOSpec.collected.asScala.toSeq.sorted === (0L until 100L))
  }
}

object IOSpec {
  val collected = new ConcurrentLinkedQueue[Long]()
}
