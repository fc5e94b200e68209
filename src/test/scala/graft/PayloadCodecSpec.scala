package graft

import graft.schema.PayloadCodec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KEY_VALUE framing and typed decode over payloads the fixture can't
 * reach: empty keys, >255-byte values (multi-byte length prefixes),
 * non-ASCII key bytes (KeyValue.java encode/decode parity). */
class PayloadCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KEY_VALUE INLINE roundtrips keys/values of awkward sizes") {
    val rows = Seq(
      ("", "v"),
      ("k", ""),
      ("key-1", "small"),
      ("ключ", "значение-" + ("x" * 300)), // >255-byte value, non-ASCII key
      ("k" * 260, "v" * 70000)) // >255-byte key, >65535-byte value
    val df = rows.toDF("k", "v")
      .withColumn("kv", PayloadCodec.kvEncodeInline(
        encode(col("k"), "UTF-8"), encode(col("v"), "UTF-8")))
      .withColumn("dec", PayloadCodec.kvDecodeInline(col("kv")))
      .select(col("k"), col("v"),
        col("dec.key").cast("string").as("dk"),
        col("dec.value").cast("string").as("dv"))
    df.collect().foreach { r =>
      assert(r.getString(2) === r.getString(0), "decoded key mismatch")
      assert(r.getString(3) === r.getString(1), "decoded value mismatch")
    }
  }

  test("KEY_VALUE INLINE frame layout is length-prefixed big-endian") {
    val frame = Seq(("ab", "xyz")).toDF("k", "v")
      .select(PayloadCodec.kvEncodeInline(
        encode(col("k"), "UTF-8"), encode(col("v"), "UTF-8")).as("kv"))
      .head().getAs[Array[Byte]]("kv")
    assert(frame.toSeq === Seq[Byte](
      0, 0, 0, 2, 'a', 'b', 0, 0, 0, 3, 'x', 'y', 'z'))
  }

  test("KEY_VALUE SEPARATED carries key bytes via base64 transport") {
    val df = Seq(("user-7", "payload")).toDF("k", "v")
      .withColumn("transport", PayloadCodec.kvKeySeparated(encode(col("k"), "UTF-8")))
      .withColumn("dec", PayloadCodec.kvDecodeSeparated(
        col("transport"), encode(col("v"), "UTF-8")))
    val r = df.select(col("transport"),
      col("dec.key").cast("string"), col("dec.value").cast("string")).head()
    assert(r.getString(0) === java.util.Base64.getEncoder
      .encodeToString("user-7".getBytes("UTF-8")))
    assert(r.getString(1) === "user-7")
    assert(r.getString(2) === "payload")
  }

  test("typed decode selects the writer schema by schema_version") {
    val df = Seq(
      (0L, """{"amount_c":120,"origin":"p1"}"""),
      (1L, """{"amount_c":340,"origin":"p2","attempts":3}"""))
      .toDF("schema_version", "txt")
      .withColumn("value_bin", encode(col("txt"), "UTF-8"))
    val out = PayloadCodec.decodeTyped(df)
      .select(col("schema_version"), col("amount_c"), col("origin"), col("rec_attempts"))
      .orderBy(col("schema_version")).collect()
    assert(out(0).getLong(1) === 120L && out(0).getString(2) === "p1" && out(0).isNullAt(3))
    assert(out(1).getLong(1) === 340L && out(1).getString(2) === "p2" && out(1).getLong(3) === 3L)
  }

  test("AUTO_CONSUME exposes fields without a reader schema") {
    val df = Seq("""{"amount_c":7,"origin":"p0","attempts":4}""").toDF("txt")
      .withColumn("value_bin", encode(col("txt"), "UTF-8"))
    val m = PayloadCodec.autoConsume(df)
      .select(col("record_map")).head().getMap[String, String](0)
    assert(m("origin") === "p0" && m("amount_c") === "7" && m("attempts") === "4")
  }

  test("AUTO_PRODUCE_BYTES verdicts per payload shape") {
    import org.apache.spark.sql.types._
    val current = StructType(Seq(
      StructField("amount_c", LongType, nullable = false),
      StructField("origin", StringType, nullable = false),
      StructField("attempts", LongType, nullable = true)))
    val cases = Seq(
      ("""{"amount_c":7,"origin":"p0","attempts":4}""", true), // full record
      ("""{"amount_c":7,"origin":"p0"}""", true), // nullable add absent
      ("""{"amount_c":7,"origin":"p0","zz":1}""", true), // unknown ignored
      ("""{"amount_c":7}""", false), // required missing
      ("""{"amount_c":"oops","origin":"p0"}""", false), // wrong type
      ("""{"amount_c":7,"origin"""", false), // truncated
      ("""not json at all""", false))
    val got = cases.map(_._1).toDF("txt")
      .withColumn("value_bin", encode(col("txt"), "UTF-8"))
      .select(col("txt"),
        PayloadCodec.autoProduceOk(col("value_bin"), current).as("ok"),
        PayloadCodec.autoProduceReason(col("value_bin"), current).as("why"))
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getString(2))).toMap
    cases.foreach { case (txt, expect) =>
      assert(got(txt)._1 === expect, s"payload $txt")
      if (expect) assert(got(txt)._2 === null, s"payload $txt reason")
      else assert(got(txt)._2 !== null, s"payload $txt reason")
    }
  }
}
