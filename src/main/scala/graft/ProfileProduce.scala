package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the produce-path queries (not part of the
 * engine; driver never runs it). */
object ProfileProduce {
  private val jobs = new java.util.concurrent.atomic.AtomicInteger
  private val stages = new java.util.concurrent.atomic.AtomicInteger
  private val tasks = new java.util.concurrent.atomic.AtomicInteger

  private def t[A](tag: String)(f: => A): A = {
    val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
    val t0 = System.nanoTime()
    val r = f
    println(f"PHASE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  " +
      f"jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - k0}")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prepare(spark)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); tasks.addAndGet(e.stageInfo.numTasks); () }
    })
    spark.read.parquet(s"$sfDir/events.parquet").count()

    def produceInput(s: SparkSession, d: String): DataFrame =
      graft.model.EventLog.raw(s, d)
        .filter(col("event_id") < 3000 && col("user_id") < 15)
        .select(col("event_id"), col("user_id").cast("string").as("key"), col("value"))

    def freshDir(tag: String): String = Scratch.freshDir(s"prof-$tag")

    (1 to 3).foreach { round =>
      if (round == 3) {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        println("=== AQE OFF ===")
      }
      println(s"--- round $round ---")
      val msgs = t("build")(Produce.build(produceInput(spark, sfDir), "produced", "w0",
        numPartitions = 6, orderCol = "event_id", nowMs = 0L, allKeyed = true).persist())
      t("build.count")(msgs.count())
      val dir = freshDir("produce")
      t("appendDedup#1")(Produce.appendDedup(spark, msgs, dir))
      println(s"  files after #1: ${new java.io.File(dir).listFiles().length}")
      t("appendDedup#2")(Produce.appendDedup(spark, msgs, dir))
      t("readback-agg")(spark.read.parquet(dir)
        .groupBy(col("partition_id"))
        .agg(count(lit(1)).as("n")).collect())
      msgs.unpersist()
      CacheScope.releaseAll()
    }
    spark.stop()
  }
}
