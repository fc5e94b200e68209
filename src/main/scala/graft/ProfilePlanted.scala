package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

object ProfilePlanted {
  private def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PHASE $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prepare(spark)
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val pl = t("planted-materialize") {
      val p = Similarity.plantedEmbeddings(e).persist()
      println(s"  rows=${p.count()}")
      p
    }
    val cents = pl.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cembedding"))
    val rv = t("ivfResiduals") { val r = Similarity.ivfResiduals(pl, cents); println(s"  rv=${r.count()}"); r }
    val books = t("pqTrain") { val b = Similarity.booksFromTrain(
      Similarity.pqTrain(rv, Similarity.pqInitBooks(rv), dsub = 16,
        iterations = 2)); println(s"  books=${b.count()}"); b }
    val out = t("ivfpqRecall") {
      Similarity.ivfpqRecall(pl.filter(expr("vec_id % 50 = 3 AND vec_id < 500")), pl,
        cents, books, dsub = 16, k = 60, nprobe = 2).collect()
    }
    println(s"rows=${out.length}")
    spark.stop()
  }
}
