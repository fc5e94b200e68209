package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Tight-loop vector kernels for the embedding operators.
 *
 * The similarity family (ANN top-k / threshold / IVF / near-dup pairs) is
 * dominated by cosine evaluations: |corpus| × |queries or centroids| calls
 * of a 64-element dot product. The array higher-order functions
 * (`aggregate`/`zip_with`/`transform`) evaluate INTERPRETED — one Catalyst
 * eval tree walk plus boxing per element — which at the 10× scale
 * rehearsal made IVF assignment 60× slower than sf0.1 instead of ~10×.
 * This kernel is one static call per row inside whole-stage codegen.
 *
 * The fold order is EXACTLY the HOF formulation it replaces (left-to-right
 * double accumulation, `dot / (sqrt(na) * sqrt(nb))`), so results are
 * bit-identical and the DuckDB oracles (`list_sum(list_transform(...))`,
 * same order) keep matching.
 */
object VectorMath {

  /** Cosine over array<float> inputs, accumulated in double. Returns null
   * (mirroring the zip_with null-propagation semantics) on length mismatch
   * or a null element. */
  def cosineFloat(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Squared Euclidean distance over array<float>, accumulated in double
   * (left-to-right, matching the HOF/oracle fold). Null on length
   * mismatch or null element. The PQ assignment kernel. */
  def l2sqFloat(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  /** array<double> variant of [[l2sqFloat]]. */
  def l2sqDouble(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** EXACT integer squared-L2 over two array<long> inputs (the e3/e6
   * pre-quantized embedding columns): Σ(aᵢ−bᵢ)² accumulated in long —
   * no float anywhere, so any engine reproduces it bit for bit. Null on
   * length mismatch or null element (the family contract). For e3-coded
   * 64-dim unit-ish embeddings the sum is ≤ ~10⁹ — far inside LONG;
   * inputs outside the coded domain hard-fail via
   * Math.subtractExact/multiplyExact/addExact (ArithmeticException)
   * rather than silently wrapping, so the "bit for bit" guarantee can
   * never be quietly violated. */
  def l2sqLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = Math.subtractExact(a.getLong(i), b.getLong(i))
      acc = Math.addExact(acc, Math.multiplyExact(d, d))
      i += 1
    }
    acc
  }

  /** EXACT integer dot product over two array<long> inputs (the e3
   * pre-quantized embedding codes): Σ aᵢ·bᵢ accumulated in long. Same
   * null contract and same overflow hard-fail discipline as
   * [[l2sqLong]]. This is the pair-stage kernel of the integer-cosine
   * discipline: with each vector's norm² hoisted out of the pair join
   * (dotLong(codes, codes) computed ONCE per vector), a candidate pair
   * costs one 64-element integer multiply-add instead of the 3-fold
   * float cosine kernel — and the sum is order-independent, so neither
   * engine/partition order can move it. */
  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    acc
  }

  /** ±1 coefficient of seeded hyperplane `bit` at dimension `d`: the
   * fixed-seed Knuth multiplicative mix whose 17th bit decides the sign
   * (the [[graft.pipeline.Similarity.planeCoef]] formula — THE single
   * definition; Similarity delegates here so the kernel, the Column
   * form, the spec replay and any SQL-oracle generator can never
   * drift). Pure integer arithmetic, no RNG state. */
  def planeCoef(bit: Int, d: Int): Int = {
    val x = (bit.toLong * 1000003L + d.toLong * 7919L + 982451653L) *
      2654435761L
    if (((x >>> 17) & 1L) == 0L) 1 else -1
  }

  /** Sign-LSH bucket from `bits` seeded hyperplanes over the first `dim`
   * elements of an e3 long-code array — the tight-loop kernel behind
   * [[graft.pipeline.Similarity.signBucketHyperplanes]]. Exact
   * replication of the unrolled Column form's semantics:
   *   - codes shorter than `dim`  → NULL bucket (drops out of the
   *     bucket equi-join — the family's malformed-row contract);
   *   - any NULL element among the first `dim` → every plane's dot is
   *     NULL, the `when(dot >= 0)` of every bit falls to its otherwise
   *     branch, bucket = 0 (NOT null — same as the unrolled form);
   *   - else bucket = Σ_{i<bits} [dot_i ≥ 0]·2^i with
   *     dot_i = Σ_{d<dim} planeCoef(i,d)·codes[d], exact long adds.
   * The unrolled form was bits·dim (= 1088 at the 17-bit width)
   * Catalyst nodes — a whole-stage-codegen method past janino's limits
   * (observed: codegen compile ERROR + interpreted fallback, where
   * projection collapse re-evaluates the interpreted q3 HOF per TERM).
   * One static call per row replaces all of it. */
  def signBucketPlanes(a: ArrayData, bits: Int, dim: Int): java.lang.Long = {
    if (a.numElements() < dim) return null
    var d = 0
    while (d < dim) {
      if (a.isNullAt(d)) return 0L
      d += 1
    }
    var packed = 0L
    var i = 0
    while (i < bits) {
      var dot = 0L
      d = 0
      while (d < dim) {
        val q = a.getLong(d)
        dot += (if (planeCoef(i, d) > 0) q else -q)
        d += 1
      }
      if (dot >= 0L) packed += (1L << i)
      i += 1
    }
    packed
  }

  /** array<double> variant of [[cosineFloat]]. */
  def cosineDouble(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/**
 * Codegen'd cosine similarity over two array<float> / array<double>
 * columns (both sides must share the element type). Null inputs, length
 * mismatches, and null elements yield null — the same contract as the
 * HOF formulation it replaces.
 */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim needs two arrays of FLOAT or of DOUBLE, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  // resolved once per expression instance: interpreted-mode eval calls
  // this per row, and the point of the kernel is zero per-row overhead
  private lazy val isFloat: Boolean = elemType(left).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r =
      if (isFloat) VectorMath.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      else VectorMath.cosineDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "cosineFloat" else "cosineDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VectorMath.$fn($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared-L2 distance over two float/double arrays — same
 * contract and fold order as [[CosineSim]]; the PQ assignment kernel. */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"l2_sq needs two arrays of FLOAT or of DOUBLE, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq"

  private lazy val isFloat: Boolean = elemType(left).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r =
      if (isFloat) VectorMath.l2sqFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      else VectorMath.l2sqDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "l2sqFloat" else "l2sqDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VectorMath.$fn($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd EXACT integer squared-L2 over two array<long> columns (the
 * pre-quantized embedding codes) — all-long arithmetic, LONG result, the
 * same null contract as the float kernels. The graph-ANN ranking kernel:
 * p123 quantizes each embedding ONCE to an e3 long array and every
 * build/search superstep ranks by this kernel instead of re-quantizing
 * per pair inside an interpreted HOF. */
case class L2SqLong(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_sq_long needs two arrays of BIGINT, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorMath.l2sqLong(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.VectorMath.l2sqLong($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqLong =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd EXACT integer dot product over two array<long> columns (the
 * pre-quantized embedding codes) — all-long arithmetic, LONG result, the
 * family null contract. The integer-cosine pair kernel: with norm² =
 * dot_long(codes, codes) hoisted per vector, cosine of a candidate pair
 * is dot / sqrt(na·nb) — ONE final deterministic IEEE expression over
 * three exact integers, so both engines reproduce it bit for bit. */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_long needs two arrays of BIGINT, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorMath.dotLong(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.VectorMath.dotLong($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd sign-LSH bucket from `bits` seeded hyperplanes over the
 * first `dim` elements of an array<long> e3 code column — semantics and
 * rationale in [[VectorMath.signBucketPlanes]]. NULL input → NULL
 * bucket; short array → NULL bucket; null element → bucket 0 (the
 * unrolled form's exact contract). */
case class SignBucketPlanes(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_bucket_planes needs an array of BIGINT, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sign_bucket_planes"

  override def nullSafeEval(a: Any): Any = {
    val r = VectorMath.signBucketPlanes(a.asInstanceOf[ArrayData], bits, dim)
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |java.lang.Long ${ev.value}_r =
         |  graft.functions.VectorMath.signBucketPlanes($a, $bits, $dim);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignBucketPlanes = copy(child = newChild)
}
