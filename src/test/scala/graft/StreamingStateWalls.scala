package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Scale rehearsal for the STREAMING-STATE half of the scale story —
 * the stateful families' first measured rows (state-store size,
 * per-batch wall) beyond the sf0.001 smoke gate, the way every batch
 * headliner has 10×/100× rows in PLAN_AUDIT:
 *
 *  - gap sessionizer (check 24 / q34's twin): per-key state is 4 longs,
 *    so state ROWS track the USER dimension, not the event stream —
 *    the telemetry must show numRowsTotal flat at |users| while input
 *    rows scale 10×/100×.
 *  - crawl-frontier census (check 31 / p127's twin): per-key state is
 *    the host's distinct-URL histogram — the one NON-O(1) per-key
 *    family, REFUSE-bounded by maxUrlsPerHost since r19; telemetry
 *    shows state bytes tracking the distinct-URL space.
 *  - LSH ingest (check 32's deployed shape): state is the parquet index
 *    TABLE, not a state store — telemetry is per-batch append wall and
 *    index growth, plus the one-shot batch wall for comparison.
 *
 * The streaming legs run REAL streaming queries over a file source
 * (time-range-sliced parquet so the sessionizer's per-user order
 * contract holds across micro-batches; FileStreamSource drains staged
 * files in (timestamp, path) order and the slice files are written in
 * ascending range order), with convergence against the batch twin
 * checked DISTRIBUTED (outer-join mismatch counts — never a corpus
 * collect at rehearsal scale).
 *
 * Bench-grade session, NOT TestSpark's local[4] (the r18 walls-on-
 * local[4] lesson). Run:
 *   sbt 'Test/runMain graft.StreamingStateWalls <scaledDir> [legs]'
 * with legs ⊆ {sess,url,lsh} (default all); corpus from
 *   runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/scaleN N
 */
object StreamingStateWalls {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Per-batch progress rows from a finished query, newest last. */
  private def telemetry(q: org.apache.spark.sql.streaming.StreamingQuery,
      label: String): Unit =
    q.recentProgress.toSeq.filter(_.numInputRows > 0).foreach { p =>
      val so = p.stateOperators.headOption
      println(f"[swalls] $label%-10s batch=${p.batchId}%3d " +
        f"in=${p.numInputRows}%9d " +
        f"stateRows=${so.map(_.numRowsTotal).getOrElse(-1L)}%9d " +
        f"stateMB=${so.map(_.memoryUsedBytes).getOrElse(-1L) / 1e6}%8.1f " +
        f"wall=${p.durationMs.getOrDefault("triggerExecution", -1L) / 1e3}%7.2f s")
    }

  /** Stage df as `slices` ascending-range parquet files and stream them
   * back one file per trigger. Range slicing keeps the global
   * (orderCols) order across micro-batches — the sessionizer's arrival
   * contract; for order-free consumers it is merely a deterministic
   * split. */
  private def fileStream(spark: SparkSession, df: DataFrame,
      slices: Int, orderCols: Seq[String]): (DataFrame, String) = {
    val dir = tmp("graft-swalls-src-")
    df.repartitionByRange(slices, orderCols.map(col): _*)
      .write.mode("overwrite").parquet(dir)
    // FileStreamSource sorts pending files by TIMESTAMP (path is not a
    // tie-break): give the range files strictly ascending mtimes in
    // part-file order, so the drain order IS the range order and the
    // sessionizer's cross-batch arrival contract holds deterministically
    val base = System.currentTimeMillis() - 1000000L
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(base + i * 2000L): Unit
      }
    val src = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    (src, dir)
  }

  /** Distributed MULTISET equality of two relations: each side reduces
   * to (row tuple → multiplicity) first, so duplicate rows on one side
   * can't silently match a single row on the other (both callers today
   * are per-key aggregates, but the helper must not be trust-me on
   * that), then a full-outer join on the tuple compares the counts —
   * never a driver collect. 0 = converged. */
  private def mismatches(a: DataFrame, b: DataFrame): Long = {
    val cols = a.columns.toSeq
    def counted(df: DataFrame, n: String): DataFrame =
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as(n))
    counted(a, "_na").hint("merge")
      .join(counted(b, "_nb").hint("merge"), cols, "full_outer")
      .filter(col("_na").isNull || col("_nb").isNull ||
        col("_na") =!= col("_nb")).count()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val legs = args.lift(1).map(_.split(',').toSet)
      .getOrElse(Set("sess", "url", "lsh"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-streaming-state-walls")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prepare(spark)
    import spark.implicits._

    // ---------------- gap sessionizer (check 24 / q34) ----------------
    if (legs("sess")) {
      val events = graft.model.EventLog.raw(spark, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000").as("ms"))
      println(s"[swalls] sess corpus=$dir events=${events.count()} " +
        s"users=${events.select(col("user_id")).distinct().count()}")
      val (src, srcDir) = fileStream(spark, events, slices = 10,
        orderCols = Seq("ms", "event_id"))
      val out = tmp("graft-swalls-sess-out-")
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingOps
        .sessionStream(src.as[graft.streaming.SessEvent], 1800000L)
        .writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", out)
        .option("checkpointLocation", tmp("graft-swalls-sess-ck-"))
        .start()
      q.processAllAvailable(); q.stop()
      telemetry(q, "sess")
      println(f"[swalls] sess stream total ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val streamed = spark.read.parquet(out)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(max(col("n_events")).as("n_events"),
          min(col("start_ms")).as("start_ms"), max(col("end_ms")).as("end_ms"))
      val tb = System.nanoTime()
      val batch = graft.operators.Sessionize.sessions(events, gapMs = 1800000L)
        .select(col("user_id"), col("session_idx"), col("n_events"),
          col("start_ms"), col("end_ms"))
      val bad = mismatches(streamed, batch)
      println(f"[swalls] sess converged mismatches=$bad " +
        f"batchTwinWall=${(System.nanoTime() - tb) / 1e9}%.1f s")
      require(bad == 0L, s"sessionizer diverged: $bad mismatching rows")
      Scratch.rm(srcDir); Scratch.rm(out)
    }

    // ------------- crawl-frontier census (check 31 / p127) ------------
    if (legs("url")) {
      val urlBase = graft.pipeline.UrlOps.frontierBase(
          spark.read.parquet(s"$dir/documents.parquet"),
          expr(graft.queries.PipelineQueries.rawUrlSql))
        .select(col("doc_id"), col("host"), col("url"), col("chars"))
      println(s"[swalls] url corpus=$dir rows=${urlBase.count()} " +
        s"hosts=${urlBase.select(col("host")).distinct().count()}")
      val (src, srcDir) = fileStream(spark, urlBase, slices = 10,
        orderCols = Seq("doc_id")) // no order contract — deterministic split
      val out = tmp("graft-swalls-url-out-")
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingOps
        .urlCensusStream(src.as[graft.streaming.UrlIngest])
        .toDF()
        .writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", out)
        .option("checkpointLocation", tmp("graft-swalls-url-ck-"))
        .start()
      q.processAllAvailable(); q.stop()
      telemetry(q, "url")
      println(f"[swalls] url stream total ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val streamed = spark.read.parquet(out)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("host"))
            .orderBy(col("version").desc)))
        .filter(col("rk") === 1)
        .select(col("host"), col("n_docs"), col("n_urls"),
          col("n_dup_docs"), col("max_url_docs"), col("text_chars"))
      val tb = System.nanoTime()
      val batch = graft.pipeline.UrlOps.hostCensus(urlBase)
        .select(col("host"), col("n_docs"), col("n_urls"),
          col("n_dup_docs"), col("max_url_docs"), col("text_chars"))
      val bad = mismatches(streamed, batch)
      println(f"[swalls] url converged mismatches=$bad " +
        f"batchTwinWall=${(System.nanoTime() - tb) / 1e9}%.1f s")
      require(bad == 0L, s"frontier census diverged: $bad mismatching rows")
      Scratch.rm(srcDir); Scratch.rm(out)
    }

    // ------------- LSH ingest, deployed table shape (check 32) ---------
    if (legs("lsh")) {
      val allDocs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      val isBatch = col("doc_id") % 10 === 5
      println(s"[swalls] lsh corpus=$dir docs=${allDocs.count()} " +
        s"batchDocs=${allDocs.filter(isBatch).count()}")
      val idxDir = tmp("graft-swalls-lsh-idx-")
      val verdictsOut = tmp("graft-swalls-lsh-out-")
      val t0 = System.nanoTime()
      val base = graft.pipeline.DedupOps.lshIndexOf(
        allDocs.filter(!isBatch), "doc_id", "text", isBase = true)
      base.banded.write.mode("overwrite").parquet(s"$idxDir/banded")
      base.sets.write.mode("overwrite").parquet(s"$idxDir/sets")
      graft.CacheScope.releaseAll()
      println(f"[swalls] lsh base index built+written " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"banded=${spark.read.parquet(s"$idxDir/banded").count()} " +
        f"sets=${spark.read.parquet(s"$idxDir/sets").count()}")
      // ordered arrival (the check-30/32 contract): doc_id-range slices
      // via a DISTRIBUTED range repartition (an ntile over a global
      // window would serialize the batch corpus through one task — the
      // class this repo pins; r19 review finding), read back one range
      // file per batch in name order
      val sliceDir = tmp("graft-swalls-lsh-src-")
      allDocs.filter(isBatch)
        .repartitionByRange(5, col("doc_id"))
        .write.mode("overwrite").parquet(sliceDir)
      val sliceFiles = new java.io.File(sliceDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
      sliceFiles.zipWithIndex.foreach { case (sf, i0) =>
        val i = i0 + 1
        val tB = System.nanoTime()
        val b = spark.read.parquet(sf)
          .select(col("doc_id"), col("text"))
        val idx = graft.pipeline.DedupOps.LshIndex(
          spark.read.parquet(s"$idxDir/banded"),
          spark.read.parquet(s"$idxDir/sets"))
        val (verdicts, _) = graft.pipeline.DedupOps
          .minhashAppendStep(idx, b, "doc_id", "text")
        verdicts.write.mode("append").parquet(verdictsOut)
        // append exactly THIS batch's increment rows, re-derived
        // BATCH-scale (lshIndexOf is deterministic — the check-32
        // convention; a left_anti of the grown index against the
        // accumulated table would put O(index) harness work inside the
        // timed per-batch wall, corrupting the very trend this
        // rehearsal measures — r19 review finding)
        val inc = graft.pipeline.DedupOps.lshIndexOf(
          b, "doc_id", "text", isBase = false)
        inc.banded.write.mode("append").parquet(s"$idxDir/banded")
        inc.sets.write.mode("append").parquet(s"$idxDir/sets")
        graft.CacheScope.releaseAll()
        println(f"[swalls] lsh batch=$i in=${b.count()}%8d " +
          f"bandedRows=${spark.read.parquet(s"$idxDir/banded").count()}%10d " +
          f"wall=${(System.nanoTime() - tB) / 1e9}%7.2f s")
      }
      val gotN = spark.read.parquet(verdictsOut).count()
      val tb = System.nanoTime()
      val want = graft.pipeline.DedupOps.minhashAppendVerdicts(
        allDocs, "doc_id", "text", batch = isBatch)
      // coalesce the nullable verdict columns: a full-outer equality
      // join never matches NULL keys, so bare dup_of/max_jaccard would
      // report every non-duplicate row as a mismatch
      def cmpCols(df: DataFrame): DataFrame = df.select(col("doc_id"),
        col("n_base_dups"), col("n_prior_batch_dups"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        coalesce(col("max_jaccard"), lit(-1.0)).as("max_jaccard"),
        col("dropped"))
      val bad = mismatches(cmpCols(spark.read.parquet(verdictsOut)),
        cmpCols(want))
      println(f"[swalls] lsh verdicts=$gotN mismatches=$bad " +
        f"oneShotBatchWall=${(System.nanoTime() - tb) / 1e9}%.1f s")
      graft.CacheScope.releaseAll()
      require(bad == 0L, s"lsh ingest diverged: $bad mismatching rows")
      Seq(idxDir, verdictsOut, sliceDir).foreach(Scratch.rm)
    }

    CacheScope.releaseRun()
    println("[swalls] done")
  }
}
