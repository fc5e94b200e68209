package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalable as-of (temporal point-lookup) join.
 *
 * The reference's time surface is one-sided: a consumer seeks a SINGLE
 * timestamp and the broker binary-searches the ledger for the matching
 * position (reference: Consumer.seek(timestamp);
 * managed-ledger/src/main/java/org/apache/bookkeeper/mledger/impl/
 * OpFindNewest.java — O2/O3 in SURVEY §2.7). The as-of join is the
 * set-at-once generalization a relational engine needs: for EVERY left
 * row, the latest right row with `right.ts <= left.ts` under the same key
 * (backward), or the earliest with `right.ts >= left.ts` (forward) —
 * the standard event-log enrichment ("state of X as of this event").
 *
 * Shape at 100 TB: both sides are tagged and unioned, then ONE hash
 * shuffle on the key plus ONE within-partition sort lets a running
 * window frame carry the nearest right row to every left row. No
 * broadcast, no range self-join, no per-key collect — the cost of a
 * single sort-based aggregation over the combined log, which is the
 * floor for this operator on unsorted inputs. A hot key is the usual
 * skew story (salting / AQE); pre-bucketed sides can skip the exchange
 * entirely (see GraftIO.writeBucketedTopic).
 */
object AsofJoin {

  /**
   * For each left row, attach the payload of the single nearest right row
   * under the same `keys`:
   *   - backward (default): latest right with `right(rightTs) <= left(leftTs)`
   *   - forward: earliest right with `right(rightTs) >= left(leftTs)`
   *
   * `leftTs` / `rightTs` must be orderable, non-null columns in the same
   * unit (long epoch micros recommended — keep full precision; truncate
   * only at output). Right payload = every right column not in
   * `keys`/`rightTs`; payload names must not collide with left columns.
   * The right side must be unique per (keys, ts) — pre-aggregate if not,
   * or the "latest" row at a tied instant is undefined.
   *
   * Output: all left columns + payload columns + `asof_ts` (the matched
   * right timestamp; all NULL when no match). `tolerance` (same unit as
   * the ts columns) drops matches farther than the bound.
   */
  /** Shared tag-and-union normalization: keys ++ __ts ++ __side ++
   * leftOwn ++ payload, left rows with null payload and vice versa.
   * Returns (unioned, leftOwn, payload). */
  private def normalize(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): (DataFrame, Seq[String], Seq[String]) = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"right payload columns collide with left: $collisions")
    require(!left.columns.contains("asof_ts"), "left already has an asof_ts column")

    val leftOwn = left.columns.filterNot(keys.contains).toSeq
    // Left rows carry null payload, right rows null leftOwn; the matched
    // right row travels as ONE struct so genuinely-null payload values
    // survive (ignoreNulls skips null STRUCTS, never null fields).
    val lNorm = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(
        keys.map(col) ++ Seq(col("__ts"), col("__side")) ++
          leftOwn.map(col) ++
          payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val rNorm = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(
        keys.map(col) ++ Seq(col("__ts"), col("__side")) ++
          leftOwn.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(col): _*)
    (lNorm.unionByName(rNorm), leftOwn, payload)
  }

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      forward: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    val (unioned, leftOwn, payload) =
      normalize(left, right, keys, leftTs, rightTs)

    // At a tied instant the right row must be inside the frame: backward
    // frames look up the partition (right sorts before left), forward
    // frames look down (right sorts after left).
    val ord =
      if (forward) Seq(col("__ts").asc, col("__side").desc)
      else Seq(col("__ts").asc, col("__side").asc)
    val w0 = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val w =
      if (forward) w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val rightStruct = when(col("__side") === 0,
      struct(col("__ts").as("asof_ts") +: payload.map(col): _*))
    val picked =
      if (forward) first(rightStruct, ignoreNulls = true).over(w)
      else last(rightStruct, ignoreNulls = true).over(w)

    val gapOk = tolerance match {
      case None => col("__m").isNotNull
      case Some(t) =>
        val gap =
          if (forward) col("__m.asof_ts") - col("__ts")
          else col("__ts") - col("__m.asof_ts")
        col("__m").isNotNull && gap <= t
    }

    unioned
      .withColumn("__m", picked)
      .filter(col("__side") === 1)
      .withColumn("__m", when(gapOk, col("__m")))
      .select(
        keys.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          leftOwn.filterNot(_ == leftTs).map(col) ++
          Seq(col("__m.asof_ts").as("asof_ts")) ++
          payload.map(p => col(s"__m.$p").as(p)): _*)
  }

  /**
   * Nearest-in-EITHER-direction as-of join: for each left row, the right
   * row minimizing |right.ts − left.ts| under the same keys — ties (equal
   * gaps both ways) resolve to the BACKWARD (earlier) match, and with a
   * `tolerance` the nearest VALID candidate wins (a backward match past
   * the bound never shadows an in-bound forward one). Neither DuckDB's
   * ASOF JOIN nor pandas' default merge_asof offers both-direction
   * nearest with this tie rule natively — it is the "closest state
   * snapshot to this event" enrichment.
   *
   * Same scale shape as [[asofJoin]]: one hash exchange on the keys; the
   * backward and forward candidates ride two window frames over that one
   * exchange (two in-partition sorts, zero extra shuffles).
   */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Option[Long] = None): DataFrame = {
    val (unioned, leftOwn, payload) =
      normalize(left, right, keys, leftTs, rightTs)

    val part = keys.map(col)
    val wB = Window.partitionBy(part: _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(part: _*)
      .orderBy(col("__ts").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rightStruct = when(col("__side") === 0,
      struct(col("__ts").as("asof_ts") +: payload.map(col): _*))

    val gapB = col("__ts") - col("__b.asof_ts")
    val gapF = col("__f.asof_ts") - col("__ts")
    val bOk = tolerance.foldLeft(col("__b").isNotNull)((c, t) => c && gapB <= t)
    val fOk = tolerance.foldLeft(col("__f").isNotNull)((c, t) => c && gapF <= t)

    unioned
      .withColumn("__b", last(rightStruct, ignoreNulls = true).over(wB))
      .withColumn("__f", first(rightStruct, ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
      .withColumn("__m",
        when(bOk && (!fOk || gapB <= gapF), col("__b"))
          .otherwise(when(fOk, col("__f"))))
      .select(
        keys.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          leftOwn.filterNot(_ == leftTs).map(col) ++
          Seq(col("__m.asof_ts").as("asof_ts")) ++
          payload.map(p => col(s"__m.$p").as(p)): _*)
  }
}
