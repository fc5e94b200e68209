package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Bounded top-k-smallest aggregate over (dist: LONG, dst: LONG) struct
 * rows, ordered by (dist, dst) ascending — the MAP-SIDE-COMBINE answer
 * to "rank per group, keep k" that a window cannot give: a window must
 * shuffle and sort EVERY candidate row (the p123 level-0 graph build
 * ships ~N^1.5 pair rows through one exchange at 100×), while this
 * aggregate's partial buffers are k-bounded, so each map task ships at
 * most k pairs per group and the sort disappears entirely
 * (ObjectHashAggregate, the percentile_approx execution class).
 *
 * Exactly equivalent to `row_number() OVER (PARTITION BY g ORDER BY
 * dist, dst) <= k` followed by collecting the k rows in rank order —
 * ties break on dst, the repo's ranking convention. Nulls (null struct
 * or null field) are skipped, like ranking over a null-free projection.
 *
 * The buffer is a flat long array of 2k slots kept sorted by
 * (dist, dst) — insertion into a ≤k-element sorted array beats a heap
 * at the k ≤ 64 sizes this serves.
 *
 * `dedup = true` is the SET form: exact duplicate (dist, dst) pairs
 * collapse inside the buffer, so the result equals `.distinct()` on the
 * input followed by the plain aggregate — with the distinct's own
 * corpus-scale exchange deleted (the input is consumed pre-shuffle by
 * the k-bounded partials). Dropping a duplicate is safe at any buffer
 * state: a pair can only be evicted when k strictly-smaller pairs fill
 * the buffer, and then the full-buffer bound check already rejects any
 * later copy — so "already present" and "already evicted" cover every
 * duplicate, at every partial/merge interleaving.
 */
case class MinKPairs(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0,
    dedup: Boolean = false)
    extends TypedImperativeAggregate[MinKBuffer] {

  require(k > 0, s"need k > 0, got $k")

  private def okType: Boolean = child.dataType match {
    case StructType(Array(a, b)) =>
      a.dataType == LongType && b.dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_k_pairs needs struct<BIGINT, BIGINT>, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(new StructType()
    .add("dist", LongType, nullable = false)
    .add("dst", LongType, nullable = false), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String =
    if (dedup) "min_k_pairs_distinct" else "min_k_pairs"

  override def createAggregationBuffer(): MinKBuffer =
    new MinKBuffer(k, dedup)

  override def update(buf: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        buf.insert(row.getLong(0), row.getLong(1))
    }
    buf
  }

  override def merge(a: MinKBuffer, b: MinKBuffer): MinKBuffer = {
    var i = 0
    while (i < b.size) { a.insert(b.dist(i), b.dst(i)); i += 1 }
    a
  }

  override def eval(buf: MinKBuffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = InternalRow(buf.dist(i), buf.dst(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: MinKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.dist(i)); bb.putLong(buf.dst(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MinKBuffer(k, dedup)
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKPairs =
    copy(child = newChildren.head)
}

/** Sorted-by-(dist, dst) bounded buffer: parallel long arrays, binary
 * search + shift insertion (k is small; cache-friendly). With `dedup`,
 * an insert equal to a resident pair is a no-op (see [[MinKPairs]] for
 * why a previously-evicted duplicate needs no extra state). */
final class MinKBuffer(k: Int, dedup: Boolean = false) {
  private val ds = new Array[Long](k)
  private val ts = new Array[Long](k)
  var size: Int = 0

  def dist(i: Int): Long = ds(i)
  def dst(i: Int): Long = ts(i)

  def insert(d: Long, t: Long): Unit = {
    if (size == k && (d > ds(k - 1) || (d == ds(k - 1) && t >= ts(k - 1))))
      return
    // find insertion point (first slot strictly greater by (dist, dst)).
    // Invariant past the early return: when the buffer is full the last
    // slot is strictly greater than (d, t), so the search lands at
    // lo <= k - 1; when not full, lo <= size <= k - 1. Either way
    // lo < k and the write below is always in bounds.
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ds(mid) < d || (ds(mid) == d && ts(mid) < t)) lo = mid + 1
      else hi = mid
    }
    if (dedup && lo < size && ds(lo) == d && ts(lo) == t) return
    // shift start: the last slot when full (dropping the old maximum),
    // one past the end otherwise
    var i = math.min(size, k - 1)
    while (i > lo) { ds(i) = ds(i - 1); ts(i) = ts(i - 1); i -= 1 }
    ds(lo) = d; ts(lo) = t
    if (size < k) size += 1
  }
}
