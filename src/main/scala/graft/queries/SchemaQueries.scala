package graft.queries

import graft.functions.Exact
import graft.model.EventLog
import graft.schema.{AvroWire, CompatibilityStrategy, PayloadCodec, ProtoCompat, ProtoWire, SchemaCompat}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Schema-registry queries (M1): the compatibility checker evaluated over
 * the evolution scenarios of the reference's compatibility test suites
 * (pulsar-broker/src/test/java/.../schema/BaseAvroSchemaCompatibilityTest
 * .java and friends), and version-keyed decode driven by the envelope's
 * schema_version column. The m1 oracle is a hand-derived truth table —
 * the expected outcomes under Avro reader/writer rules — so the checker
 * is pinned to independent ground truth, not to itself.
 */
object SchemaQueries extends QueryGroup {

  private def req(n: String, t: DataType) = StructField(n, t, nullable = false)
  private def opt(n: String, t: DataType) = StructField(n, t, nullable = true)

  /** (name, existing versions, candidate) — each is one reference test
   * scenario; the last exercises transitive-vs-latest divergence. */
  private val scenarios: Seq[(String, Seq[StructType], StructType)] = {
    val base = StructType(Seq(req("id", LongType), opt("name", StringType)))
    Seq(
      ("identical", Seq(base), base),
      ("add_nullable_field", Seq(base),
        StructType(base.fields :+ opt("tag", StringType))),
      ("add_required_field", Seq(base),
        StructType(base.fields :+ req("tag", StringType))),
      ("delete_nullable_field", Seq(base), StructType(Seq(req("id", LongType)))),
      ("delete_required_field",
        Seq(StructType(Seq(req("id", LongType), req("tag", StringType)))),
        StructType(Seq(req("id", LongType)))),
      ("widen_int_to_long", Seq(StructType(Seq(req("n", IntegerType)))),
        StructType(Seq(req("n", LongType)))),
      ("narrow_long_to_int", Seq(StructType(Seq(req("n", LongType)))),
        StructType(Seq(req("n", IntegerType)))),
      ("rename_required_field", Seq(StructType(Seq(req("a", LongType)))),
        StructType(Seq(req("b", LongType)))),
      ("transitive_narrowed",
        Seq(StructType(Seq(req("n", LongType))), StructType(Seq(req("n", IntegerType)))),
        StructType(Seq(req("n", IntegerType))))
    )
  }

  /** PROTOBUF_NATIVE scenarios: the reference checker only pins the root
   * message name (ProtobufNativeSchemaCompatibilityCheck.java:67-75), so
   * field evolution under the same root passes every directional strategy
   * while a root rename fails them all. */
  private val protoScenarios: Seq[(String, Seq[ProtoCompat.ProtoDescriptor], ProtoCompat.ProtoDescriptor)] = {
    import ProtoCompat.ProtoDescriptor
    val v0 = ProtoDescriptor("graft.Msg", Set(1, 2, 3))
    Seq(
      ("proto_identical", Seq(v0), v0),
      ("proto_field_evolution", Seq(v0), ProtoDescriptor("graft.Msg", Set(1, 2, 3, 4))),
      ("proto_renamed_root", Seq(v0), ProtoDescriptor("graft.MsgV2", Set(1, 2, 3))))
  }

  private val m1 = QueryDef(
    (s, _) => {
      import s.implicits._
      // checker evaluation is a control-plane (driver-side) operation, like
      // the reference's registry service
      val avroRows = scenarios.flatMap { case (name, existing, candidate) =>
        CompatibilityStrategy.all.map { strat =>
          (name, strat.name, SchemaCompat.isCompatible(existing, candidate, strat))
        }
      }
      val protoRows = protoScenarios.flatMap { case (name, existing, candidate) =>
        CompatibilityStrategy.all.map { strat =>
          (name, strat.name, ProtoCompat.isCompatible(existing, candidate, strat))
        }
      }
      (avroRows ++ protoRows).toDF("scenario", "strategy", "compatible")
        .orderBy(col("scenario"), col("strategy"))
    },
    Some {
      // expected truth table under Avro reader/writer rules:
      // per scenario (B = candidate reads old, F = old reads candidate)
      val bf = Map(
        "identical" -> (true, true), "add_nullable_field" -> (true, true),
        "add_required_field" -> (false, true),
        "delete_nullable_field" -> (true, true),
        "delete_required_field" -> (true, false),
        "widen_int_to_long" -> (true, false),
        "narrow_long_to_int" -> (false, true),
        "rename_required_field" -> (false, false))
      val rows = bf.toSeq.flatMap { case (sc, (b, f)) =>
        Seq(
          (sc, "ALWAYS_COMPATIBLE", true), (sc, "ALWAYS_INCOMPATIBLE", false),
          (sc, "BACKWARD", b), (sc, "FORWARD", f), (sc, "FULL", b && f),
          (sc, "BACKWARD_TRANSITIVE", b), (sc, "FORWARD_TRANSITIVE", f),
          (sc, "FULL_TRANSITIVE", b && f))
      } ++ Seq( // latest accepts, transitive rejects vs the long v0
        ("transitive_narrowed", "ALWAYS_COMPATIBLE", true),
        ("transitive_narrowed", "ALWAYS_INCOMPATIBLE", false),
        ("transitive_narrowed", "BACKWARD", true),
        ("transitive_narrowed", "FORWARD", true),
        ("transitive_narrowed", "FULL", true),
        ("transitive_narrowed", "BACKWARD_TRANSITIVE", false),
        ("transitive_narrowed", "FORWARD_TRANSITIVE", true),
        ("transitive_narrowed", "FULL_TRANSITIVE", false)) ++ {
        // PROTOBUF_NATIVE: root-name pin only — same-root scenarios pass
        // every directional strategy, a root rename fails them all
        def protoRow(sc: String, directional: Boolean) = Seq(
          (sc, "ALWAYS_COMPATIBLE", true), (sc, "ALWAYS_INCOMPATIBLE", false),
          (sc, "BACKWARD", directional), (sc, "FORWARD", directional),
          (sc, "FULL", directional), (sc, "BACKWARD_TRANSITIVE", directional),
          (sc, "FORWARD_TRANSITIVE", directional), (sc, "FULL_TRANSITIVE", directional))
        protoRow("proto_identical", directional = true) ++
          protoRow("proto_field_evolution", directional = true) ++
          protoRow("proto_renamed_root", directional = false)
      }
      val values = rows.map { case (sc, st, ok) => s"('$sc', '$st', $ok)" }.mkString(", ")
      s"""SELECT scenario, strategy, compatible
        |FROM (VALUES $values) AS t(scenario, strategy, compatible)
        |ORDER BY scenario, strategy""".stripMargin
    })

  /** Version-keyed decode: schema v0 reads props.k as LONG, v1 as DOUBLE
   * (a BACKWARD-compatible widening) — the `schema_version` column picks
   * the decoder per row, SURVEY §1.3's `from_json(value, schema_for(v))`. */
  private val m2KSql =
    """CAST(regexp_extract(properties, '"k": ([0-9]+)', 1) AS DOUBLE)"""
  private val m2 = QueryDef(
    (s, d) => {
      val v0 = StructType(Seq(StructField("k", LongType)))
      val v1 = StructType(Seq(StructField("k", DoubleType)))
      EventLog.topic(s, d)
        .withColumn("decoded_k",
          when(col("schema_version") === 0,
            from_json(col("properties"), v0).getField("k").cast("double"))
            .otherwise(from_json(col("properties"), v1).getField("k")))
        .groupBy(col("schema_version"))
        .agg(count(lit(1)).as("n"), Exact.sumE(col("decoded_k"), 0).as("sum_k"),
          max(col("decoded_k")).as("max_k"))
        .orderBy(col("schema_version"))
    },
    Some(s"""${EventLog.oracleCte}
      |SELECT schema_version, count(*) AS n,
      |       ${Exact.sqlSumE(m2KSql, 0)} AS sum_k,
      |       max(CAST(regexp_extract(properties, '"k": ([0-9]+)', 1) AS DOUBLE)) AS max_k
      |FROM env GROUP BY schema_version ORDER BY schema_version""".stripMargin))

  /** M3 — typed struct decode of the BINARY wire payload, writer schema
   * selected per row by schema_version (SchemaType.JSON; the v0→v1
   * evolution is the registry's add_nullable_field scenario). The oracle
   * re-derives the decoded fields from the base columns independently, so
   * a failed/misaligned parse cannot agree with it. */
  private val m3 = QueryDef(
    (s, d) => PayloadCodec.decodeTyped(EventLog.topic(s, d))
      .groupBy(col("origin"))
      .agg(count(lit(1)).as("n"), sum(col("amount_c")).as("sum_cents"),
        sum(col("rec_attempts")).as("sum_attempts"))
      .orderBy(col("origin")),
    Some(s"""${EventLog.oracleCte}
      |SELECT producer_name AS origin, count(*) AS n,
      |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       CAST(sum(CASE WHEN schema_version = 1 THEN attempts END) AS BIGINT) AS sum_attempts
      |FROM env GROUP BY producer_name ORDER BY origin""".stripMargin))

  /** M4 — KEY_VALUE INLINE: build the reference's length-prefixed frame
   * ([keyLen][key][valLen][value], KeyValue.java) and decode it back with
   * binary intrinsics. Group keys and sums only come out right if the
   * frame arithmetic is byte-exact. */
  private val m4 = QueryDef(
    (s, d) => {
      val kv = PayloadCodec.kvEncodeInline(
        encode(col("key"), "UTF-8"), col("value_bin"))
      val dec = PayloadCodec.kvDecodeInline(col("kv"))
      EventLog.topic(s, d)
        .withColumn("kv", kv)
        .select(col("kv"),
          dec.getField("key").cast("string").as("kv_key"),
          dec.getField("value").cast("string").as("kv_json"))
        .groupBy(col("kv_key"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("kv"))).as("frame_bytes"),
          sum(get_json_object(col("kv_json"), "$.amount_c").cast("long")).as("sum_cents"))
        .orderBy(col("kv_key"))
    },
    Some(s"""${EventLog.oracleCte}
      |SELECT key AS kv_key, count(*) AS n,
      |       CAST(sum(8 + octet_length(encode(key)) + octet_length(value_bin)) AS BIGINT) AS frame_bytes,
      |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM env GROUP BY key ORDER BY kv_key""".stripMargin))

  /** M5 — AUTO_CONSUME: schema-less generic-record view (field→text map);
   * field inventory per version + a field access without a reader schema. */
  private val m5 = QueryDef(
    // getField-shaped generic access (streaming JSON functions) — the
    // map-materializing autoConsume view stays available for whole-record
    // consumers and is pinned by PayloadCodecSpec; using the accessors
    // here keeps the hot path at one cheap parse per expression instead
    // of re-materializing the full map per reference (r4 bench flag).
    (s, d) => EventLog.topic(s, d)
      .select(col("schema_version"),
        array_join(array_sort(
          PayloadCodec.genericFieldNames(col("value_bin"))), ",").as("fields"),
        PayloadCodec.genericField(col("value_bin"), "origin").as("origin"))
      .groupBy(col("schema_version"), col("fields"))
      .agg(count(lit(1)).as("n"), max(col("origin")).as("max_origin"))
      .orderBy(col("schema_version")),
    Some(s"""${EventLog.oracleCte}
      |SELECT schema_version,
      |       CASE WHEN schema_version = 0 THEN 'amount_c,origin'
      |            ELSE 'amount_c,attempts,origin' END AS fields,
      |       count(*) AS n, max(producer_name) AS max_origin
      |FROM env GROUP BY 1, 2 ORDER BY schema_version""".stripMargin))

  /** M6 — KEY_VALUE SEPARATED: key bytes ride the message-key slot
   * base64-coded, payload keeps the value schema; decode recovers both. */
  private val m6 = QueryDef(
    (s, d) => {
      val dec = PayloadCodec.kvDecodeSeparated(col("transport_key"), col("value_bin"))
      EventLog.topic(s, d)
        .withColumn("transport_key",
          PayloadCodec.kvKeySeparated(encode(col("key"), "UTF-8")))
        .select(dec.getField("key").cast("string").as("kv_key"),
          col("transport_key"),
          length(dec.getField("value")).as("payload_bytes"))
        .groupBy(col("kv_key"), col("transport_key"))
        .agg(count(lit(1)).as("n"), sum(col("payload_bytes")).as("payload_total"))
        .orderBy(col("kv_key"))
    },
    Some(s"""${EventLog.oracleCte}
      |SELECT key AS kv_key, base64(encode(key)) AS transport_key, count(*) AS n,
      |       CAST(sum(octet_length(value_bin)) AS BIGINT) AS payload_total
      |FROM env GROUP BY 1, 2 ORDER BY kv_key""".stripMargin))

  /** M7 — SchemaType.AVRO: real Avro binary encode on the producer side,
   * decode through reader/writer schema RESOLUTION (reader is one
   * evolution ahead; its added `region` field materializes from the
   * default). The oracle independently prices every record's exact Avro
   * binary size — union branch byte + length-varint + UTF-8 bytes for the
   * key, 8 bytes for the double, zigzag-varint for the long — so a codec
   * that isn't bit-for-bit Avro can't match `avro_bytes`, and the field
   * sums pin the decoded values to the originals. One Codec per
   * partition via mapPartitions (serde instance lifecycle). */
  private val m7 = QueryDef(
    (s, d) => {
      import s.implicits._
      val rows = EventLog.topic(s, d)
        .select(col("key"), col("value"), col("msg_offset"))
        .as[(String, Double, Long)]
      val round = rows.mapPartitions { it =>
        val codec = new AvroWire.Codec
        it.map { case (k, v, off) =>
          val bytes = codec.encode(k, v, off)
          val rec = codec.decode(bytes)
          val dk = Option(rec.get("k")).map(_.toString).orNull
          val dv = rec.get("v").asInstanceOf[Double]
          val doff = rec.get("off").asInstanceOf[Long]
          val region = rec.get("region").toString
          val ok = dk == k && doff == off &&
            java.lang.Double.doubleToLongBits(dv) == java.lang.Double.doubleToLongBits(v)
          (dv, doff, region, ok, bytes.length)
        }
      }.toDF("v", "off", "region", "ok", "nbytes")
      round.groupBy(col("region"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_roundtrip"),
          sum(col("off")).as("sum_off"),
          sum(floor(col("v") * 100).cast("long")).as("sum_cents"),
          sum(col("nbytes").cast("long")).as("avro_bytes"))
        .orderBy(col("region"))
    },
    Some(s"""${EventLog.oracleCte}
      |SELECT 'unset' AS region, count(*) AS n, count(*) AS n_roundtrip,
      |       CAST(sum(msg_offset) AS BIGINT) AS sum_off,
      |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       CAST(sum(2 + octet_length(encode(key)) + 8 +
      |         CASE WHEN msg_offset * 2 < 128 THEN 1
      |              WHEN msg_offset * 2 < 16384 THEN 2
      |              WHEN msg_offset * 2 < 2097152 THEN 3
      |              WHEN msg_offset * 2 < 268435456 THEN 4
      |              ELSE 5 END) AS BIGINT) AS avro_bytes
      |FROM env GROUP BY 1 ORDER BY region""".stripMargin))

  /** M8 — SchemaType.PROTOBUF_NATIVE: real protobuf wire-format encode
   * (tag varints, length-delimited UTF-8, fixed64 LE double, zigzag
   * sint64) and tag-walking decode through the v1 reader. Even offsets are
   * written by the v0 writer (fields 1-3); odd offsets by a NEWER writer
   * that also stamps unknown field 5, which the reader must SKIP by wire
   * type — the proto forward-compat contract. The reader's evolution field
   * `region` (4) materializes its default, mirroring m7's Avro resolution.
   * The oracle independently prices every record's exact wire size —
   * 1-byte tags (numbers < 16), length-varint + UTF-8 for the key, 8-byte
   * double, zigzag-varint for the offset, plus the skipped field's tag +
   * varint on odd rows — so a codec that isn't bit-for-bit protobuf can't
   * match `proto_bytes`, and `n_skipped` pins the unknown-field walk. */
  private val m8 = QueryDef(
    (s, d) => {
      import s.implicits._
      val rows = EventLog.topic(s, d)
        .select(col("key"), col("value"), col("msg_offset"))
        .as[(String, Double, Long)]
      val round = rows.mapPartitions { it =>
        val codec = new ProtoWire.Codec
        it.map { case (k, v, off) =>
          val bytes =
            if (off % 2 == 1) codec.encodeNewer(k, v, off, extra = off)
            else codec.encode(k, v, off)
          val dec = codec.decode(bytes)
          val ok = dec.k == k && dec.off == off && dec.region == "unset" &&
            java.lang.Double.doubleToLongBits(dec.v) ==
              java.lang.Double.doubleToLongBits(v) &&
            dec.skipped == (if (off % 2 == 1) 1 else 0)
          (dec.v, dec.off, dec.region, ok, dec.skipped, bytes.length)
        }
      }.toDF("v", "off", "region", "ok", "skipped", "nbytes")
      round.groupBy(col("region"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_roundtrip"),
          sum(col("off")).as("sum_off"),
          sum(floor(col("v") * 100).cast("long")).as("sum_cents"),
          sum(col("skipped").cast("long")).as("n_skipped"),
          sum(col("nbytes").cast("long")).as("proto_bytes"))
        .orderBy(col("region"))
    },
    Some {
      // varint length of zigzag(off) = 2*off for off >= 0 (same pricing
      // CASE as m7's Avro long, which zigzags identically)
      val vlen =
        """CASE WHEN msg_offset * 2 < 128 THEN 1
          |            WHEN msg_offset * 2 < 16384 THEN 2
          |            WHEN msg_offset * 2 < 2097152 THEN 3
          |            WHEN msg_offset * 2 < 268435456 THEN 4
          |            ELSE 5 END""".stripMargin
      s"""${EventLog.oracleCte}
        |SELECT 'unset' AS region, count(*) AS n, count(*) AS n_roundtrip,
        |       CAST(sum(msg_offset) AS BIGINT) AS sum_off,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |       CAST(sum(CASE WHEN msg_offset % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
        |       CAST(sum(12 + octet_length(encode(key)) + $vlen +
        |         CASE WHEN msg_offset % 2 = 1 THEN 1 + $vlen ELSE 0 END) AS BIGINT) AS proto_bytes
        |FROM env GROUP BY 1 ORDER BY region""".stripMargin
    })

  /** M9 — PERSISTED schema registry: an evolution script runs against a
   * parquet-backed registry, the registry is then REOPENED (a second
   * instance on the same path — the "broker restart") and evolved again,
   * and the result is what actually survived on disk: the catalog of
   * admitted versions plus the append-only audit ledger. The rejected
   * incompatible write appears in the audit trail but never in the
   * catalog, and version numbering is contiguous across the reopen —
   * the SchemaRegistryServiceImpl durability contract (:182, :311).
   * Oracle = the hand-derived expected catalog + ledger. */
  private val m9 = QueryDef(
    (s, d) => {
      // fixture-scoped scratch path, wiped on entry (same pattern as the
      // produce-path queries) so repeated and CONCURRENT runs are
      // deterministic
      val path = graft.Scratch.freshDirFor("m9-registry", d)

      val base = StructType(Seq(req("id", LongType), opt("name", StringType)))
      val v1 = StructType(base.fields :+ opt("tag", StringType))
      val bad = StructType(v1.fields :+ req("amount", LongType))
      val v2 = StructType(v1.fields :+ opt("note", StringType))
      val auditT = StructType(Seq(req("k", StringType)))

      import graft.schema.{CompatibilityStrategy => CS}
      val reg = new graft.schema.PersistedSchemaRegistry(s, path)
      reg.putSchemaIfAbsent("orders-t", base, CS.Backward)  // admitted v0
      reg.putSchemaIfAbsent("orders-t", v1, CS.Backward)    // admitted v1
      reg.putSchemaIfAbsent("orders-t", bad, CS.Backward)   // rejected (required add)
      reg.putSchemaIfAbsent("orders-t", base, CS.Backward)  // idempotent → v0
      reg.putSchemaIfAbsent("audit-t", auditT, CS.AlwaysIncompatible) // admitted v0
      reg.putSchemaIfAbsent("audit-t",                      // rejected (strategy)
        StructType(auditT.fields :+ opt("extra", StringType)), CS.AlwaysIncompatible)

      // reopen from disk: persisted v1 must drive the compat check
      val reopened = new graft.schema.PersistedSchemaRegistry(s, path)
      reopened.putSchemaIfAbsent("orders-t", v2, CS.Backward) // admitted v2

      reopened.catalog()
        .select(lit("catalog").as("kind"), col("topic"),
          col("version").as("seq"), col("fields").as("detail"))
        .unionAll(reopened.audit()
          .select(lit("attempt").as("kind"), col("topic"),
            col("attempt").as("seq"), col("outcome").as("detail")))
        .orderBy(col("kind"), col("topic"), col("seq"))
    },
    Some {
      val rows = Seq(
        ("attempt", "audit-t", 0, "admitted version 0"),
        ("attempt", "audit-t", 1, "rejected: incompatible with ALWAYS_INCOMPATIBLE at version 1"),
        ("attempt", "orders-t", 0, "admitted version 0"),
        ("attempt", "orders-t", 1, "admitted version 1"),
        ("attempt", "orders-t", 2, "rejected: incompatible with BACKWARD at version 2"),
        ("attempt", "orders-t", 3, "idempotent version 0"),
        ("attempt", "orders-t", 4, "admitted version 2"),
        ("catalog", "audit-t", 0, "k"),
        ("catalog", "orders-t", 0, "id,name"),
        ("catalog", "orders-t", 1, "id,name,tag"),
        ("catalog", "orders-t", 2, "id,name,tag,note"))
      val values = rows.map { case (k, t, q, dt) => s"('$k', '$t', $q, '$dt')" }
        .mkString(", ")
      s"""SELECT kind, topic, CAST(seq AS INT) AS seq, detail
        |FROM (VALUES $values) AS t(kind, topic, seq, detail)
        |ORDER BY kind, topic, seq""".stripMargin
    })

  /** M11 — AUTO_PRODUCE_BYTES write-side enforcement
   * (Schema.java:450-462): a producer of raw bytes is validated against
   * the topic's CURRENT registered schema before publish. The batch
   * carries six deterministic wire classes — full v1 record, v0 core
   * (nullable add absent), unknown-extra-field (ignored, like Avro
   * writer projection) all accepted; required-field-missing,
   * required-field-wrong-type, truncated JSON all rejected. The result
   * reads the topic BACK from disk, proving rejected classes never
   * reached the log. */
  private val m11 = QueryDef(
    (s, d) => {
      import graft.operators.Produce
      import graft.schema.{CompatibilityStrategy => CS}
      val reg = new graft.schema.SchemaRegistry
      val v0 = StructType(Seq(req("amount_c", LongType), req("origin", StringType)))
      val v1 = StructType(v0.fields :+ opt("attempts", LongType))
      require(reg.putSchemaIfAbsent("produced", v0, CS.Backward).isRight)
      require(reg.putSchemaIfAbsent("produced", v1, CS.Backward).isRight)
      val current = reg.latest("produced").get._2

      val cls = col("event_id") % 7
      val amount = floor(col("value") * 100).cast(LongType).cast(StringType)
      val origin = concat(lit("\"p"), (col("user_id") % 5).cast(StringType), lit("\""))
      val attempts = (col("event_id") % 5).cast(StringType)
      val payload =
        when(cls === 3, concat(lit("{\"amount_c\":"), amount, lit("}")))
          .when(cls === 4, concat(lit("{\"amount_c\":\"oops\",\"origin\":"),
            origin, lit("}")))
          .when(cls === 5, concat(lit("{\"amount_c\":"), amount)) // truncated
          .when(cls === 6, concat(lit("{\"amount_c\":"), amount,
            lit(",\"origin\":"), origin, lit(",\"extra\":1}")))
          .when(cls === 1, concat(lit("{\"amount_c\":"), amount,
            lit(",\"origin\":"), origin, lit(",\"attempts\":"), attempts, lit("}")))
          .otherwise(concat(lit("{\"amount_c\":"), amount,
            lit(",\"origin\":"), origin, lit("}")))
      val wireClass =
        when(cls === 3, "missing_required").when(cls === 4, "wrong_type")
          .when(cls === 5, "malformed").when(cls === 6, "extra_field")
          .when(cls === 1, "v1_full").otherwise("v0_core")
      val msgs = graft.CacheScope.track(
        EventLog.raw(s, d).filter(col("event_id") < 3000)
          .select(col("event_id").as("msg_offset"),
            (col("event_id") / 1000).cast(LongType).as("ledger_id"),
            lit("w0").as("producer_name"),
            col("event_id").as("sequence_id"),
            encode(payload, "UTF-8").as("value_bin"),
            wireClass.as("wire_class")))

      val dir = graft.Scratch.freshDirFor("auto-produce", d)
      val (acc, rej) = Produce.appendAutoProduce(s, msgs, dir, current)
      val persisted = s.read.parquet(dir).groupBy(col("wire_class"))
        .agg(count(lit(1)).as("n_persisted"))
      msgs.groupBy(col("wire_class")).agg(count(lit(1)).as("n_sent"))
        .join(persisted, Seq("wire_class"), "left")
        .na.fill(0L, Seq("n_persisted"))
        .withColumn("accepted", col("n_persisted") === col("n_sent"))
        .withColumn("n_appended_total", lit(acc))
        .withColumn("n_rejected_total", lit(rej))
        .orderBy(col("wire_class"))
    },
    Some("""WITH inp AS (
      |  SELECT event_id % 7 AS cls FROM events WHERE event_id < 3000),
      |c AS (SELECT CASE WHEN cls = 3 THEN 'missing_required'
      |             WHEN cls = 4 THEN 'wrong_type'
      |             WHEN cls = 5 THEN 'malformed'
      |             WHEN cls = 6 THEN 'extra_field'
      |             WHEN cls = 1 THEN 'v1_full'
      |             ELSE 'v0_core' END AS wire_class,
      |        CASE WHEN cls IN (3, 4, 5) THEN 0 ELSE 1 END AS ok
      |      FROM inp),
      |g AS (SELECT wire_class, count(*) AS n_sent,
      |        CAST(CASE WHEN max(ok) = 1 THEN count(*) ELSE 0 END AS BIGINT)
      |          AS n_persisted,
      |        max(ok) = 1 AS accepted
      |      FROM c GROUP BY wire_class),
      |t AS (SELECT CAST(sum(n_persisted) AS BIGINT) AS acc,
      |             CAST(sum(n_sent - n_persisted) AS BIGINT) AS rej FROM g)
      |SELECT wire_class, n_sent, n_persisted, accepted,
      |       (SELECT acc FROM t) AS n_appended_total,
      |       (SELECT rej FROM t) AS n_rejected_total
      |FROM g ORDER BY wire_class""".stripMargin))

  /** M12 — EXTERNAL schema (SchemaType.java:155): the schema lives
   * outside the registry, the engine never decodes. The topic carries
   * opaque bytes (asserted: zero registry versions), engine-side stats
   * see only byte lengths, and the record content is reachable solely
   * through the user's decoder hook — whose sums the oracle reproduces
   * from the source column the payload was built from, proving the hook
   * (and nothing in the engine) owns interpretation. */
  private val m12 = QueryDef(
    (s, d) => {
      val env = EventLog.topic(s, d)
      val reg = new graft.schema.SchemaRegistry
      require(reg.versions("events-external").isEmpty) // nothing registered
      PayloadCodec.externalDecode(env,
          bin => get_json_object(bin.cast("string"), "$.amount_c").cast("long"),
          as = "user_amount")
        .groupBy(col("topic"))
        .agg(count(lit(1)).as("n_msgs"),
          sum(octet_length(col("value_bin"))).as("payload_bytes"),
          sum(col("user_amount")).as("user_sum_cents"))
        .orderBy(col("topic"))
    },
    Some(s"""${EventLog.oracleCte}
      |SELECT topic, count(*) AS n_msgs,
      |       CAST(sum(octet_length(value_bin)) AS BIGINT) AS payload_bytes,
      |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
      |         AS user_sum_cents
      |FROM env GROUP BY topic ORDER BY topic""".stripMargin))

  override val defs: Map[String, QueryDef] = Map(
    "m1_schema_compat" -> m1,
    "m11_auto_produce" -> m11,
    "m12_external_schema" -> m12,
    "m9_registry_persist" -> m9,
    "m2_versioned_decode" -> m2,
    "m3_typed_decode" -> m3,
    "m4_keyvalue_inline" -> m4,
    "m5_auto_consume" -> m5,
    "m6_keyvalue_separated" -> m6,
    "m7_avro_roundtrip" -> m7,
    "m8_protobuf_decode" -> m8
  )
}
