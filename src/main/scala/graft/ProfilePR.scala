package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfilePR {
  def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[pr] $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prepare(spark)
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val cents = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cembedding"))
    val edges = t("edges-derive+collect") {
      val x = graft.pipeline.Similarity.mutualKnnEdges(e, cents, 3, 0.2)
      val p = graft.CacheScope.track(x); p.count(); p
    }
    t("pagerank-3") {
      graft.pipeline.GraphOps.pageRank(edges, "a", "b", 3)
        .write.mode("overwrite").format("noop").save()
    }
    t("pagerank-3-again") {
      graft.pipeline.GraphOps.pageRank(edges, "a", "b", 3)
        .write.mode("overwrite").format("noop").save()
    }
    t("pagerank-1") {
      graft.pipeline.GraphOps.pageRank(edges, "a", "b", 1)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
