package graft
import graft.model.EventLog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileF2 {
  private def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PHASE $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prepare(spark)
    val env = EventLog.topic(spark, sfDir)
    t("warm-envelope") { env.count() }
    t("f2-run1") { println("  rows=" + operators.LogOps.retainBySize(env, 2000L).count()) }
    CacheScope.releaseAll()
    t("f2-run2") { println("  rows=" + operators.LogOps.retainBySize(env, 2000L).count()) }
    CacheScope.releaseAll()
    val sized = env.withColumn("_rowval", octet_length(col("properties")) + lit(8))
    t("blocks-agg") { println("  blocks=" + sized.groupBy(col("topic"), col("ledger_id")).agg(sum(col("_rowval")).as("_val")).count()) }
    spark.stop()
  }
}
