package graft

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Expression, ExpressionInfo, Literal, Pmod}
import org.apache.spark.sql.types.IntegerType

/**
 * The engine's SQL surface: every custom Catalyst expression registered as
 * a SQL function, so `spark.sql("SELECT cosine_sim(a, b) …")` works — the
 * engine-side analog of the reference's SQL layer (Pulsar SQL exposes
 * topics to a SQL engine via a connector; here the topics already ARE
 * tables, and these functions complete the vocabulary).
 *
 * Two installation paths, same registrations:
 *  - config `spark.sql.extensions=graft.GraftExtensions` at session build
 *    (the [[org.apache.spark.sql.SparkSessionExtensions]] route —
 *    `injectFunction`), for users who own the session; or
 *  - [[GraftSql.register]] on a live session (runtime FunctionRegistry),
 *    for library callers handed an existing one.
 */
object GraftSql {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) for every engine SQL function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    reg("murmur3_32_positive", classOf[Murmur3Positive],
      "_FUNC_(expr[, seed]) - non-negative murmur3-32 of a STRING/BINARY (the reference routing hash)") {
      case Seq(e) => Murmur3Positive(e, 0)
      case Seq(e, s) => Murmur3Positive(e, intArg(s, "seed"))
    },
    // composed expression (Cast∘Pmod∘Murmur3Positive): report the registrar
    // as the implementing class — naming any single expression would
    // mislead DESCRIBE FUNCTION
    reg("key_shared_bucket", GraftSql.getClass,
      "_FUNC_(key) - 16-bit Key_Shared ring bucket: murmur3(key) mod 65536") {
      case Seq(e) => Cast(Pmod(Murmur3Positive(e, 0), Literal(65536)), IntegerType)
    },
    reg("cosine_sim", classOf[CosineSim],
      "_FUNC_(a, b) - cosine similarity of two float/double arrays (codegen'd kernel)") {
      case Seq(a, b) => CosineSim(a, b)
    },
    reg("l2_sq", classOf[L2Sq],
      "_FUNC_(a, b) - squared L2 distance of two float/double arrays (codegen'd kernel)") {
      case Seq(a, b) => L2Sq(a, b)
    },
    reg("l2_sq_long", classOf[L2SqLong],
      "_FUNC_(a, b) - EXACT integer squared L2 of two bigint arrays (pre-quantized codes; codegen'd kernel)") {
      case Seq(a, b) => L2SqLong(a, b)
    },
    reg("min_k_pairs", classOf[MinKPairs],
      "_FUNC_(struct(dist, dst), k) - aggregate: the k smallest (dist, dst) pairs by (dist, dst) asc, k-bounded map-side partials") {
      case Seq(e, kk) => MinKPairs(e, intArg(kk, "k")).toAggregateExpression()
    },
    reg("winnow_fingerprints", classOf[WinnowFingerprints],
      "_FUNC_(text, k, w) - winnowing fingerprint set (k-gram hashes, window minima)") {
      case Seq(t, k, w) => WinnowFingerprints(t, intArg(k, "k"), intArg(w, "w"))
    },
    reg("word_ngrams", classOf[WordNGrams],
      "_FUNC_(text, n) - distinct word n-grams of the normalized text (single-pass shingle kernel); NULL text yields an empty array") {
      // NULL coalesced to '' so the SQL surface agrees with
      // TextOps.wordNGrams (empty array, not NULL, for NULL input)
      case Seq(t, n) => WordNGrams(Coalesce(Seq(t, Literal(""))), intArg(n, "n"))
    },
    reg("zlib_deflate", classOf[ZlibDeflate],
      "_FUNC_(bin[, level]) - zlib-compress a BINARY payload") {
      case Seq(e) => ZlibDeflate(e)
      case Seq(e, l) => ZlibDeflate(e, intArg(l, "level"))
    },
    reg("zlib_inflate", classOf[ZlibInflate],
      "_FUNC_(bin) - zlib-decompress a BINARY payload") {
      case Seq(e) => ZlibInflate(e)
    },
    reg("payload_compress", classOf[PayloadCompress],
      "_FUNC_(bin, codec) - compress with a per-row codec name (NONE/ZLIB/LZ4/ZSTD/SNAPPY)") {
      case Seq(p, c) => PayloadCompress(p, c)
    },
    reg("payload_decompress", classOf[PayloadDecompress],
      "_FUNC_(bin, codec, size) - decompress; malformed payloads degrade to NULL") {
      case Seq(p, c, s) => PayloadDecompress(p, c, s)
    })

  private def reg(name: String, cls: Class[_], usage: String)(
      pf: PartialFunction[Seq[Expression], Expression])
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder: Seq[Expression] => Expression = args =>
      pf.applyOrElse(args, (as: Seq[Expression]) =>
        throw new IllegalArgumentException(
          s"$name: unsupported argument list of ${as.size}"))
    // 2-arg ExpressionInfo: the richer ctors validate usage/example
    // formatting that library functions don't need; usage reaches users
    // through this scaladoc and DESCRIBE FUNCTION's class name instead
    (FunctionIdentifier(name), new ExpressionInfo(cls.getCanonicalName, name), builder)
  }

  /** Install every engine function into a LIVE session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/**
 * `spark.sql.extensions=graft.GraftExtensions` — the
 * SparkSessionExtensions installer (the brief's preferred registration
 * mechanism): injects the same function set at session build time.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSql.functions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}
