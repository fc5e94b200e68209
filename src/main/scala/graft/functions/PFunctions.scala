package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/**
 * The Pulsar Functions runtime surface (SURVEY §2.6) as typed Dataset
 * transforms.
 *
 * Reference semantics: `Function<X,T>.process(input, context)` is invoked
 * per record; a null return acks-and-drops the record (filter semantics —
 * pulsar-functions/api-java/.../Function.java:40, result handling
 * JavaInstanceRunnable.java:440); `initialize`/`close` bracket the
 * instance lifetime (Function.java:49); side outputs go through
 * `context.publish(topic, value)` (Context.java:134-145); functions
 * compose via topics (FunctionConfig.java:65-88).
 *
 * Spark mapping: one function instance per partition (`mapPartitions` —
 * initialize once, stream records through, close at exhaustion), which is
 * exactly U7's parallelism model; SerDe (U8) is the Encoder. Processing
 * guarantees (U5): the batch path is deterministic-idempotent; the
 * streaming path inherits exactly-once from checkpointed micro-batches
 * (see graft.streaming), at-least-once when the sink is not idempotent,
 * effectively-once with dedup-on-write (Produce.appendDedup).
 */
trait PFunction[X, T] extends Serializable {
  /** Return null to drop the record (ack-and-skip). */
  def process(input: X, context: FunctionContext): T
  def initialize(context: FunctionContext): Unit = {}
  def close(): Unit = {}
}

/** Per-instance context: user config + a local counter map (the scalar-path
 * view; durable keyed counters are the A6 keyed-state operator). */
final class FunctionContext(val userConfig: Map[String, String] = Map.empty)
    extends Serializable {
  private val counters = scala.collection.mutable.Map.empty[String, Long]
  def incrCounter(key: String, amount: Long = 1L): Unit =
    counters.update(key, counters.getOrElse(key, 0L) + amount)
  def getCounter(key: String): Long = counters.getOrElse(key, 0L)
}

object PFunctions {

  /** U1/U2 — apply a function instance per partition; null results filter.
   * close() is bracketed via the task-completion listener, so it fires
   * exactly once even when the consumer abandons the iterator early
   * (limit/take) or the task fails — the reference's instance teardown. */
  def transform[X, T: Encoder](ds: Dataset[X], fn: PFunction[X, T],
      config: Map[String, String] = Map.empty): Dataset[T] =
    ds.mapPartitions { it =>
      val ctx = new FunctionContext(config)
      fn.initialize(ctx)
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; fn.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      new Iterator[T] {
        private var nextVal: Option[T] = None
        private def advance(): Unit = {
          nextVal = None
          while (nextVal.isEmpty && it.hasNext)
            nextVal = Option(fn.process(it.next(), ctx))
          if (nextVal.isEmpty) closeOnce()
        }
        override def hasNext: Boolean = {
          if (nextVal.isEmpty) advance(); nextVal.isDefined
        }
        override def next(): T = {
          if (nextVal.isEmpty) advance(); val v = nextVal.get; nextVal = None; v
        }
      }
    }

  /** U2 — bare-lambda form. */
  def map[X, T: Encoder](ds: Dataset[X], f: X => T): Dataset[T] =
    transform(ds, new PFunction[X, T] {
      override def process(input: X, context: FunctionContext): T = f(input)
    })

  /** U4 — composition: g after f, fused in one instance (the in-process
   * equivalent of chaining through an intermediate topic). */
  def compose[X, Y, T](f: PFunction[X, Y], g: PFunction[Y, T]): PFunction[X, T] =
    new PFunction[X, T] {
      override def initialize(ctx: FunctionContext): Unit = {
        f.initialize(ctx); g.initialize(ctx)
      }
      override def process(input: X, ctx: FunctionContext): T = {
        val mid = f.process(input, ctx)
        if (mid == null) null.asInstanceOf[T] else g.process(mid, ctx)
      }
      override def close(): Unit = { f.close(); g.close() }
    }

  /** U3 — side outputs: each record fans out to zero or more
   * (topic, payload) publishes; downstream sinks filter their topic. */
  def sideOutputs[X, T: Encoder](ds: Dataset[X],
      route: X => Seq[(String, T)]): Dataset[(String, T)] = {
    implicit val enc: Encoder[(String, T)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING, implicitly[Encoder[T]])
    ds.flatMap(route)
  }

  /**
   * U5 — processing guarantees: what the SINK holds after a crash that
   * left the slice [crashLo, crashHi) processed-but-unacked, per
   * FunctionConfig.ProcessingGuarantees (FunctionConfig.java:42-45) and
   * the ack ordering in JavaInstanceRunnable (:341 sendOutputMessage, ack
   * handling :440-474):
   *
   *  - ATLEAST_ONCE acks AFTER process+publish — the crashed slice is
   *    redelivered and published AGAIN: duplicates are visible at the sink.
   *  - ATMOST_ONCE acks at RECEIVE, before process — no redelivery, so
   *    records of the slice the crash interrupted mid-flight (modeled as
   *    the odd offsets in the slice) are LOST.
   *  - EFFECTIVELY_ONCE is at-least-once delivery plus idempotent publish
   *    keyed by the source message id (the Produce.appendDedup mechanism):
   *    the redelivered slice is rejected at the sink — each message lands
   *    exactly once.
   *
   * The redelivered stream is the same for ATLEAST/EFFECTIVELY (delivery
   * is identical; only the sink differs) — exactly the distinction a user
   * choosing a guarantee level observes.
   */
  def guaranteeSink(env: DataFrame, guarantee: String,
      crashLo: Long, crashHi: Long): DataFrame = {
    val crashed = col("msg_offset") >= crashLo && col("msg_offset") < crashHi
    val redelivered = env.unionAll(env.filter(crashed))
    guarantee match {
      case "ATLEAST_ONCE" => redelivered
      case "ATMOST_ONCE" =>
        env.filter(!crashed || col("msg_offset") % 2 === 0)
      case "EFFECTIVELY_ONCE" =>
        // sink-side idempotence on the source message id; the duplicate
        // rows are byte-identical so which copy survives is immaterial
        redelivered.dropDuplicates("topic", "partition_id", "msg_offset")
      case other => throw new IllegalArgumentException(s"unknown guarantee: $other")
    }
  }

  /**
   * U6 — retainKeyOrdering (FunctionConfig.java:94-96): each key's records
   * reach its function instance in publish order. Spark mapping: hash-
   * repartition on key (a key never splits across instances) +
   * sortWithinPartitions on (key, order) BEFORE the instance runs. The
   * probe tags every record with its OBSERVATION ordinal within the key as
   * the instance actually sees it, plus a monotonicity flag against the
   * previously observed offset — so downstream queries can assert the
   * contract on the mechanism itself rather than on a re-sorted view.
   */
  def keyOrderedProbe(ds: Dataset[(String, Long, Double)]): Dataset[(String, Long, Double, Long, Boolean)] = {
    import ds.sparkSession.implicits._
    // normalize column names: a Dataset[(…)] built via .as[] keeps its
    // source names, so address the tuple slots positionally
    ds.toDF("_1", "_2", "_3").as[(String, Long, Double)]
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"))
      .mapPartitions { it =>
        val seen = scala.collection.mutable.Map.empty[String, (Long, Long)] // key → (count, lastOffset)
        it.map { case (k, off, v) =>
          val (n, last) = seen.getOrElse(k, (0L, Long.MinValue))
          seen(k) = (n + 1, off)
          (k, off, v, n + 1, off > last)
        }
      }
  }
}
