package graft

import graft.functions.GraftFunctions.cosineSim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd cosine kernel must be BIT-identical to the interpreted
 * HOF fold it replaced (left-to-right double accumulation) — the ANN
 * oracles compare hashes of rounded values, so even 1-ulp drift breaks
 * them. Also pins the null contract: null input, length mismatch, null
 * element → null. */
class VectorOpsSpec extends AnyFunSuite {
  import TestSpark._

  /** The original HOF formulation, kept here as the executable spec. */
  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def d(c: org.apache.spark.sql.Column) = transform(c, x => x.cast("double"))
    val da = d(a); val db = d(b)
    val dot = aggregate(zip_with(da, db, (x, y) => x * y), lit(0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(da, lit(0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(db, lit(0d), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  test("kernel is bit-identical to the HOF fold on float vectors") {
    import spark.implicits._
    // deterministic pseudo-random vectors incl. negatives and tiny values
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * (if (i % 7 == 0) 1e-4f else 2f)))
    }
    val df = rows.toDF("id", "v")
    val pairs = df.as("a").join(df.as("b"), col("a.id") < col("b.id") && col("b.id") < 20)
    val diff = pairs.select(
      cosineSim(col("a.v"), col("b.v")).as("k"),
      hofCosine(col("a.v"), col("b.v")).as("h"))
      .filter(col("k") =!= col("h")) // exact comparison: any ulp drift surfaces
      .count()
    assert(diff === 0L)
  }

  test("null contract: length mismatch and null input yield null") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 2f), Array(1f, 2f, 3f)),
      (null.asInstanceOf[Array[Float]], Array(1f, 2f, 3f))
    ).toDF("a", "b")
    val out = df.select(cosineSim(col("a"), col("b"))).collect().map(r => r.isNullAt(0))
    assert(out.toSeq === Seq(false, true, true))
  }

  test("double-element arrays are supported") {
    import spark.implicits._
    val df = Seq((Array(1d, 0d), Array(1d, 0d)), (Array(1d, 0d), Array(0d, 1d)))
      .toDF("a", "b")
    val out = df.select(round(cosineSim(col("a"), col("b")), 6)).collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(1d, 0d))
  }

  test("l2SqLong matches an independent HOF long fold exactly") {
    import graft.functions.GraftFunctions.l2SqLong
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextInt(20001).toLong - 10000L))
    }
    val df = rows.toDF("id", "v")
    val pairs = df.as("a").join(df.as("b"), col("a.id") < col("b.id") && col("b.id") < 10)
    val hof = aggregate(
      zip_with(col("a.v"), col("b.v"), (x, y) => x - y),
      lit(0L), (acc, d) => acc + d * d)
    val diff = pairs.select(l2SqLong(col("a.v"), col("b.v")).as("k"), hof.as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(diff === 0L)
  }

  test("l2SqLong null contract: mismatch, null element, null input") {
    import graft.functions.GraftFunctions.l2SqLong
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L)),
      (Seq[java.lang.Long](1L), Seq[java.lang.Long](1L, 2L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)),
      (null.asInstanceOf[Seq[java.lang.Long]], Seq[java.lang.Long](1L, 2L))
    ).toDF("a", "b")
    val out = df.select(l2SqLong(col("a"), col("b"))).collect().map(_.isNullAt(0))
    assert(out.toSeq === Seq(false, true, true, true))
  }

  test("l2SqLong rejects non-BIGINT arrays at analysis") {
    import graft.functions.GraftFunctions.l2SqLong
    import spark.implicits._
    val df = Seq((Array(1f, 2f), Array(1f, 2f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(l2SqLong(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("l2_sq_long"))
  }

  test("l2SqLong hard-fails on overflow instead of wrapping") {
    import graft.functions.GraftFunctions.l2SqLong
    import spark.implicits._
    val big = 1L << 32
    val df = Seq((Array(big), Array(-big))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(l2SqLong(col("a"), col("b"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(_.isInstanceOf[ArithmeticException]))
  }

  test("dotLong matches an independent HOF long fold exactly") {
    import graft.functions.GraftFunctions.dotLong
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextInt(20001).toLong - 10000L))
    }
    val df = rows.toDF("id", "v")
    val pairs = df.as("a").join(df.as("b"), col("a.id") < col("b.id") && col("b.id") < 10)
    val hof = aggregate(
      zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
      lit(0L), (acc, p) => acc + p)
    val diff = pairs.select(dotLong(col("a.v"), col("b.v")).as("k"), hof.as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(diff === 0L)
  }

  test("dotLong null contract and overflow hard-fail") {
    import graft.functions.GraftFunctions.dotLong
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Long](3L, 4L), Seq[java.lang.Long](5L, 6L)),
      (Seq[java.lang.Long](1L), Seq[java.lang.Long](1L, 2L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)),
      (null.asInstanceOf[Seq[java.lang.Long]], Seq[java.lang.Long](1L, 2L))
    ).toDF("a", "b")
    val out = df.select(dotLong(col("a"), col("b"))).collect()
    assert(out(0).getLong(0) === 39L)
    assert(Seq(1, 2, 3).forall(i => out(i).isNullAt(0)))
    val big = 1L << 32
    val ex = intercept[Exception] {
      Seq((Array(big, big), Array(big, big))).toDF("a", "b")
        .select(dotLong(col("a"), col("b"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(_.isInstanceOf[ArithmeticException]))
  }
}
