package graft

import graft.pipeline.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the exact containment prefix join (p134's
 * operator) at a caller-chosen threshold — used for the 100× rehearsal row
 * at a threshold ABOVE the ScaleGen replica containment (~0.78, the
 * 2J/(1+J) artifact), where qualifying output stays corpus-shaped instead
 * of growing ∝ replicas². Not part of the engine; the driver never runs
 * it. Usage: runMain graft.ProfileContain <sfDir> <tPpm> */
object ProfileContain {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tPpm = args.lift(1).map(_.toLong).getOrElse(850000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prepare(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val n = DedupOps.containmentPrefixJoin(docs, "doc_id", "text", 3, tPpm)
      .count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"CONTAIN sf=$sfDir tPpm=$tPpm pairs=$n wall=$wall%.1f s")
    graft.CacheScope.releaseRun()
    spark.stop()
  }
}
