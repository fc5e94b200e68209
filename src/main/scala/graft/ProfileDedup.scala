package graft

import graft.pipeline.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the LSH-pair + cluster-decision path (not
 * part of the engine; driver never runs it). */
object ProfileDedup {

  private def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PHASE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = t("derive-pairs") {
      val p = DedupOps.minhashLshVerifiedPairs(
        docs, "doc_id", "text", n = 3, k = 64, bands = 32, threshold = 0.5)
        .persist()
      println(s"  pairs=${p.count()} partitions=${p.rdd.getNumPartitions}")
      p
    }
    t("cluster-run1") {
      println("  rows=" + DedupOps.dupClusters(pairs).count())
    }
    CacheScope.releaseAll()
    t("cluster-run2") {
      println("  rows=" + DedupOps.dupClusters(pairs).count())
    }
    CacheScope.releaseAll()
    spark.stop()
  }
}
