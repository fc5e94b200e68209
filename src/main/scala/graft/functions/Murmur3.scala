package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * MurmurHash3 x86_32 with caller-chosen seed.
 *
 * The reference routes keyed messages and Key_Shared dispatch through
 * Murmur3-32 with seed 0 (reference: pulsar-client/src/main/java/org/apache/
 * pulsar/client/impl/Murmur3Hash32.java:44, used by
 * StickyKeyConsumerSelectorUtils.java:42). Spark's built-in `hash()` is
 * Murmur3 with seed 42 and a different block mix for strings, so exact
 * routing parity needs this expression. Implemented from the public
 * MurmurHash3 reference algorithm (Austin Appleby, public domain).
 */
object Murmur3x86 {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def hashBytes(data: Array[Byte], seed: Int): Int = {
    val len = data.length
    var h1 = seed
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val b = i << 2
      var k1 = (data(b) & 0xff) | ((data(b + 1) & 0xff) << 8) |
        ((data(b + 2) & 0xff) << 16) | ((data(b + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks << 2
    var k1 = 0
    val rem = len & 3
    if (rem == 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  def hashUtf8(s: UTF8String, seed: Int): Int = hashBytes(s.getBytes, seed)

  /** Non-negative variant used for `hash % n` partition routing. */
  def positive(data: Array[Byte], seed: Int): Int = hashBytes(data, seed) & Int.MaxValue
  def positiveUtf8(s: UTF8String, seed: Int): Int = hashUtf8(s, seed) & Int.MaxValue
}

/**
 * Codegen'd scalar expression: murmur3_32(col, seed) over STRING or BINARY,
 * masked to non-negative (matching the reference router's `hash & MAX_VALUE`
 * before the modulo).
 */
case class Murmur3Positive(child: Expression, seed: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"murmur3_32_positive needs STRING or BINARY input, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "murmur3_32_positive"

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String  => Murmur3x86.positiveUtf8(s, seed)
    case b: Array[Byte] => Murmur3x86.positive(b, seed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Murmur3x86.positiveUtf8($c, $seed)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Murmur3x86.positive($c, $seed)")
    }

  override protected def withNewChildInternal(newChild: Expression): Murmur3Positive =
    copy(child = newChild)
}
