package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted two-phase aggregation and salted joins must equal their direct
 * formulations (the point is the shuffle shape, not the answer). */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("salted aggregation equals direct aggregation") {
    import spark.implicits._
    // one hot key: 9000 of 10000 rows share key "hot"
    val df = spark.range(10000)
      .select(when(col("id") % 10 === 0, concat(lit("cold-"), col("id") % 97))
        .otherwise("hot").as("k"), col("id").as("v"))
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(df, Seq("k"), 8,
      Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      Seq(sum("pn").as("n"), sum("ps").as("s")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("salted join equals direct join") {
    import spark.implicits._
    val fact = spark.range(5000)
      .select(when(col("id") % 5 === 0, "a").otherwise("b").as("k"), col("id").as("v"))
    val dim = Seq(("a", 10), ("b", 20)).toDF("k", "mult")
    val direct = fact.join(dim, "k").agg(sum(col("v") * col("mult"))).head().getLong(0)
    val salted = Skew.saltedJoin(fact, dim, "k", 4)
      .agg(sum(col("v") * col("mult"))).head().getLong(0)
    assert(salted === direct)
  }
}
