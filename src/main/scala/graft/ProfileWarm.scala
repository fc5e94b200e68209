package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling harness: per-component cost of the bench's
 * `_warmup_shared` derivations (not part of the engine; driver never
 * runs it). */
object ProfileWarm {
  private def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PHASE $tag%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s")
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
    t("envelope") {
      graft.model.EventLog.topic(spark, sfDir).groupBy("topic").count().collect()
    }
    t("lsh-pairs") { graft.queries.PipelineQueries.warmShared(spark, sfDir) }
    t("lm-scored") { graft.queries.CorpusQueries.warmShared(spark, sfDir) }
    t("bpe") { graft.queries.CorpusQueries.warmSharedBpe(spark, sfDir) }
    t("graph") { graft.queries.PipelineQueries.warmSharedGraph(spark, sfDir) }
    t("bm25") { graft.queries.CorpusQueries.warmSharedBm25(spark, sfDir) }
    t("cov") { graft.queries.PipelineQueries.warmSharedCov(spark, sfDir) }
    t("dhash") { graft.queries.PipelineQueries.warmSharedDhash(spark, sfDir) }
    spark.stop()
  }
}
