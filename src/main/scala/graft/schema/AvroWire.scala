package graft.schema

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}

/**
 * SchemaType.AVRO — the real Avro single-record wire format (reference:
 * pulsar-client-api/.../common/schema/SchemaType.java AVRO,
 * pulsar-client/.../schema/AvroSchema.java): binary-encoded records with
 * no container framing, decoded through Avro reader/writer schema
 * resolution. The reader schema here is one evolution step ahead of the
 * writer (an added field with a default — the registry's
 * `add_nullable_field`-style BACKWARD scenario), so decode exercises the
 * same resolution path a consumer with a newer schema version uses.
 *
 * One Codec per partition (see the m7 query): DatumWriter/Reader and the
 * encoder/decoder buffers are reused across the partition's rows, the
 * per-instance serde lifecycle the reference's schema implementations
 * have.
 */
object AvroWire {

  val writerJson: String =
    """{"type":"record","name":"Msg","namespace":"graft","fields":[
      |{"name":"k","type":["null","string"],"default":null},
      |{"name":"v","type":"double"},
      |{"name":"off","type":"long"}]}""".stripMargin

  /** Reader = writer + `region` with a default: Avro schema resolution
   * fills it for records written before the field existed. */
  val readerJson: String =
    """{"type":"record","name":"Msg","namespace":"graft","fields":[
      |{"name":"k","type":["null","string"],"default":null},
      |{"name":"v","type":"double"},
      |{"name":"off","type":"long"},
      |{"name":"region","type":"string","default":"unset"}]}""".stripMargin

  final class Codec {
    private val wSchema = new Schema.Parser().parse(writerJson)
    private val rSchema = new Schema.Parser().parse(readerJson)
    private val writer = new GenericDatumWriter[GenericRecord](wSchema)
    private val reader = new GenericDatumReader[GenericRecord](wSchema, rSchema)
    private val out = new java.io.ByteArrayOutputStream(64)
    private var enc: BinaryEncoder = _
    private var dec: BinaryDecoder = _

    def encode(k: String, v: Double, off: Long): Array[Byte] = {
      val rec = new GenericData.Record(wSchema)
      rec.put("k", k)
      rec.put("v", v)
      rec.put("off", off)
      out.reset()
      enc = EncoderFactory.get().binaryEncoder(out, enc)
      writer.write(rec, enc)
      enc.flush()
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): GenericRecord = {
      dec = DecoderFactory.get().binaryDecoder(bytes, dec)
      reader.read(null, dec)
    }
  }
}
