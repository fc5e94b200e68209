package graft

import org.apache.spark.sql.SparkSession

/** Scratch harness: run one declared query against a fixture dir and
 * print its output row count — the rehearsal-scale "is the result set
 * degenerate?" probe (the bench's noop sink deliberately discards rows,
 * so it can't answer that). Not part of the engine; driver never runs
 * it. Usage: runMain graft.RunCount <queryName> <sfDir> */
object RunCount {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunCount <queryName> <sfDir>")
    val Array(name, sfDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prepare(spark)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(f"RUNCOUNT $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    CacheScope.releaseAll()
    spark.stop()
  }
}
