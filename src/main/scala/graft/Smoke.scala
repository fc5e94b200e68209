package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: build a plain session (none of the
  * engine's config knobs pre-set) and check `SparkEntry.entry` returns rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n ${if (n > 0) "OK" else "EMPTY — FAIL"}")
    spark.stop()
    if (n == 0) sys.exit(1)
  }
}
