package graft.functions

import org.apache.spark.sql.{Dataset, Encoder}

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
}
