package graft

import graft.pipeline.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The single-pass word-n-gram kernel must agree exactly with the
 * composed array_distinct∘transform∘sequence formulation it replaced —
 * including normalization, ordering, and degenerate inputs. */
class NGramSpec extends AnyFunSuite {
  import TestSpark._

  /** The previous expression-composed formulation, kept as the test
   * reference. One deliberate difference: for word-less text at n=1 the
   * composed form emitted a phantom "" shingle (split of an empty
   * normalized string is [""]); the kernel emits no shingles, which is
   * the correct reading — so the reference filters that degenerate case. */
  private def composed(text: org.apache.spark.sql.Column, n: Int) = {
    val ws = TextOps.words(text)
    when(size(ws) >= n && length(TextOps.normalized(text)) > 0,
      array_distinct(transform(sequence(lit(0), size(ws) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  test("kernel equals the composed formulation on adversarial strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alphabet = "ab1 .,#\tZé世 -"
    val cases = Seq("", " ", "a", "a b", "a b c", "A.B,C", "  a   b  ",
      "café au lait", "世界 hello world", "a-b-c d", "1 2 3 4",
      "same same same") ++
      (1 to 300).map(_ => (0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (n <- Seq(1, 2, 3, 5)) {
      val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select(col("id"), col("t"),
          TextOps.wordNGrams(col("t"), n).as("fast"),
          composed(col("t"), n).as("ref"))
      val bad = df.filter(not(col("fast") <=> col("ref")))
        .select("t", "fast", "ref").collect()
      assert(bad.isEmpty, s"n=$n mismatches: ${bad.take(3).mkString("; ")}")
    }
  }

  test("kernel equals the composed formulation on the corpus fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(3, 5)) {
      val bad = docs.select(
          TextOps.wordNGrams(col("text"), n).as("fast"),
          composed(col("text"), n).as("ref"))
        .filter(not(col("fast") <=> col("ref"))).count()
      assert(bad === 0L, s"n=$n")
    }
  }

  test("pure-JVM kernel matches a naive Scala reference on random input") {
    import org.apache.spark.unsafe.types.UTF8String
    def naive(s: String, n: Int): Seq[String] = {
      val ws = s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq
      if (ws.length < n) Seq.empty
      else ws.sliding(n).map(_.mkString(" ")).toSeq.distinct
    }
    val rnd = new scala.util.Random(23)
    val alphabet = "abc01 ,.-\t"
    for (_ <- 1 to 500; n <- Seq(1, 2, 4)) {
      val s = (0 until rnd.nextInt(60))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val fast = {
        val a = graft.functions.NGramOps
          .wordNGrams(UTF8String.fromString(s), n)
        (0 until a.numElements()).map(i =>
          a.getUTF8String(i).toString)
      }
      assert(fast === naive(s, n), s"input '$s' n=$n")
    }
  }

  test("null text yields an empty gram array") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, "a b c")).toDF("id", "t")
    val out = df.select(col("id"), TextOps.wordNGrams(col("t"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq.empty)
    assert(out(2L) === Seq("a b", "b c"))
  }
}
