package graft

import graft.schema.AvroWire
import org.scalatest.funsuite.AnyFunSuite

/**
 * SchemaType.AVRO wire format: roundtrip identity, reader-schema
 * resolution (added field materializes from its default), and exact
 * binary sizes against hand-computed Avro encoding rules (union branch
 * varint + length varint + UTF-8, 8-byte double, zigzag-varint long).
 */
class AvroSpec extends AnyFunSuite {

  private def roundtrip(k: String, v: Double, off: Long) = {
    val c = new AvroWire.Codec
    val bytes = c.encode(k, v, off)
    (bytes, c.decode(bytes))
  }

  test("roundtrip preserves fields; reader default fills the added field") {
    val (_, rec) = roundtrip("user-42", 12.75, 1234L)
    assert(rec.get("k").toString === "user-42")
    assert(rec.get("v").asInstanceOf[Double] === 12.75)
    assert(rec.get("off").asInstanceOf[Long] === 1234L)
    assert(rec.get("region").toString === "unset") // not on the wire
  }

  test("null key takes the union null branch") {
    val (bytes, rec) = roundtrip(null, 1.0, 0L)
    assert(rec.get("k") == null)
    // branch 0 (1 byte) + double (8) + zigzag(0) (1 byte)
    assert(bytes.length === 10)
  }

  test("binary size matches hand-computed Avro encoding") {
    // branch 1 = zigzag(1) = 1 byte; len 3 = 1 byte; "abc" = 3;
    // double = 8; zigzag(300) = 600 -> 2 bytes
    val (bytes, _) = roundtrip("abc", 0.0, 300L)
    assert(bytes.length === 1 + 1 + 3 + 8 + 2)
  }

  test("codec instance is reusable across many records") {
    val c = new AvroWire.Codec
    val sizes = (0 until 1000).map { i =>
      val b = c.encode(s"k$i", i * 0.5, i.toLong)
      val r = c.decode(b)
      assert(r.get("off").asInstanceOf[Long] === i.toLong)
      b.length
    }
    assert(sizes.distinct.size > 1) // varint sizes actually vary
  }
}
