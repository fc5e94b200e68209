package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Winnowing document fingerprints (Schleimer, Wilkinson, Aiken —
 * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03;
 * the MOSS primitive): hash every k-gram of the (already-normalized,
 * ASCII) text with a base-131 polynomial, then keep the minimum hash of
 * each w-length window of consecutive grams. Any match of length
 * ≥ w + k − 1 between two documents shares at least one fingerprint.
 *
 * Implemented as ONE streaming pass per document — rolling polynomial
 * update (O(1) per gram) + monotonic-deque window minima (amortized O(1)
 * per gram) — instead of array-expression composition: `substr`-per-gram
 * formulations re-scan the string per access and go quadratic in document
 * length, which is exactly what a 100 TB corpus cannot afford. O(len)
 * time, O(len) transient space, no shuffle; the polynomial is exact in
 * 64-bit for k = 8 (max 122·Σ131^j ≈ 8.2e16), so an engine-independent
 * oracle reproduces identical values.
 */
object WinnowOps {

  /** Distinct window-minimum fingerprints of `s` (first-seen order). */
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val g = n - k + 1
    if (g < w) return new GenericArrayData(Array.empty[Long])
    // rolling base-131 polynomial: h(i) = Σ_j c(i+j)·131^(k-1-j)
    val h = new Array[Long](g)
    var top = 1L // 131^(k-1)
    var j = 1
    while (j < k) { top *= 131L; j += 1 }
    var acc = 0L
    j = 0
    while (j < k) { acc = acc * 131L + (b(j) & 0xffL); j += 1 }
    h(0) = acc
    var i = 1
    while (i < g) {
      acc = (acc - (b(i - 1) & 0xffL) * top) * 131L + (b(i + k - 1) & 0xffL)
      h(i) = acc
      i += 1
    }
    // monotonic deque: the head is the minimum of the current w-window
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](g)
    var head = 0
    var tail = 0
    var x = 0
    while (x < g) {
      while (tail > head && h(dq(tail - 1)) >= h(x)) tail -= 1
      dq(tail) = x
      tail += 1
      if (dq(head) <= x - w) head += 1
      if (x >= w - 1) out.add(h(dq(head)))
      x += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = it.next(); o += 1 }
    new GenericArrayData(arr)
  }
}

/** Codegen'd `winnow_fingerprints(norm)` — STRING → ARRAY<BIGINT>. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints needs STRING input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowOps.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowOps.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
