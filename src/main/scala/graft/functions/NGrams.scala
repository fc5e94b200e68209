package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass distinct word n-grams — the shingle kernel under every
 * n-gram dedup/decontamination/novelty operator.
 *
 * Replaces the expression-composed formulation
 * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
 * element_at(ws, i), ...)))` over `split(normalize(text))`, whose nested
 * higher-order functions evaluate INTERPRETED (per-element `Invoke`
 * overhead, repeated array materialization) and sit outside whole-stage
 * codegen. This kernel tokenizes the lowercased byte stream once, builds
 * each n-gram with one array copy, and dedupes with an insertion-ordered
 * set — O(total bytes) per document, inside codegen via a static call.
 *
 * Semantics are IDENTICAL to the composed form (the correctness oracles
 * pin this): lowercase → maximal `[a-z0-9]` byte runs as words (any
 * non-alphanumeric run, including multi-byte UTF-8, is a separator —
 * byte-run and char-run separators collapse identically) → n-grams
 * joined with one space → first-occurrence-ordered distinct; fewer than
 * n words ⇒ empty array.
 */
object NGramOps {

  private def alnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  def wordNGrams(s: UTF8String, n: Int): ArrayData = {
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val bytes = s.toLowerCase.getBytes
    val len = bytes.length
    // token runs: starts(i), ends(i) exclusive
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    var nTok = 0
    var i = 0
    while (i < len) {
      if (alnum(bytes(i))) {
        starts(nTok) = i
        while (i < len && alnum(bytes(i))) i += 1
        ends(nTok) = i
        nTok += 1
      } else i += 1
    }
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.LinkedHashSet[UTF8String]()
    var g = 0
    while (g <= nTok - n) {
      var size = n - 1 // separating spaces
      var j = 0
      while (j < n) { size += ends(g + j) - starts(g + j); j += 1 }
      val buf = new Array[Byte](size)
      var o = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(o) = ' '; o += 1 }
        val l = ends(g + j) - starts(g + j)
        System.arraycopy(bytes, starts(g + j), buf, o, l)
        o += l
        j += 1
      }
      out.add(UTF8String.fromBytes(buf))
      g += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = it.next(); o += 1 }
    new GenericArrayData(arr)
  }
}

/** Codegen'd `word_ngrams(text, n)` — STRING → ARRAY<STRING> (distinct,
 * first-occurrence order, normalized words joined by one space). */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams needs STRING input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    NGramOps.wordNGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramOps.wordNGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}
