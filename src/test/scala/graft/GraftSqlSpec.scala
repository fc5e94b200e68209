package graft

import graft.functions.Murmur3x86
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: the same function set must work through BOTH install
 * paths — `spark.sql.extensions=graft.GraftExtensions` at session build
 * and `GraftSql.register` on a live session — and the SQL results must
 * match the spec-pinned Scala implementations. */
class GraftSqlSpec extends AnyFunSuite {
  import TestSpark._

  test("runtime registration: functions resolve and match the Scala impls") {
    GraftSql.register(spark)
    val r = spark.sql(
      """SELECT murmur3_32_positive('7', 0) AS h,
        |       key_shared_bucket('7') AS b,
        |       round(cosine_sim(array(1.0D, 2.0D), array(1.0D, 2.0D)), 9) AS c,
        |       CAST(zlib_inflate(zlib_deflate(encode('payload', 'UTF-8'))) AS STRING) AS z,
        |       octet_length(payload_decompress(
        |         payload_compress(encode('xyz', 'UTF-8'), 'ZLIB'), 'ZLIB', 3)) AS p
        |""".stripMargin).head()
    assert(r.getInt(0) === Murmur3x86.positive("7".getBytes("UTF-8"), 0))
    assert(r.getInt(1) === Murmur3x86.positive("7".getBytes("UTF-8"), 0) % 65536)
    assert(r.getDouble(2) === 1.0)
    assert(r.getString(3) === "payload")
    assert(r.getInt(4) === 3)
  }

  test("winnow_fingerprints via SQL matches the Column API") {
    GraftSql.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
    df.createOrReplaceTempView("wtest")
    val viaSql = spark.sql(
      s"SELECT winnow_fingerprints(t, ${graft.pipeline.TextOps.winnowK}, " +
        s"${graft.pipeline.TextOps.winnowW}) AS f FROM wtest")
      .select(explode(col("f"))).as[Long].collect().sorted
    val viaCol = df.select(explode(
      graft.pipeline.TextOps.winnowFingerprints(col("t")))).as[Long].collect().sorted
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("build-time injection (GraftExtensions) works on a fresh session") {
    // a second session over the SAME SparkContext, built with the
    // extensions installer. (`spark.sql.extensions=graft.GraftExtensions`
    // is the config spelling of the same path, but it is a STATIC conf —
    // only honored when the JVM's first context is built, so the shared
    // test context can't exercise it; withExtensions applies the
    // identical installer programmatically.)
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      val h = s2.sql("SELECT murmur3_32_positive('route-me') AS h").head().getInt(0)
      assert(h === Murmur3x86.positive("route-me".getBytes("UTF-8"), 0))
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}
