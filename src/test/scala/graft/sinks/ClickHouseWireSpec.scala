package graft.sinks

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property round-trips for the hand-written native-protocol codec —
  * a binary codec with no schema layer gets its encode/decode symmetry
  * proven by generation, not by the three values a golden test uses.
  */
object ClickHouseWirePropertySpec extends Properties("ClickHouseWire") {
  import ClickHouseWire._

  private def roundTripVarint(v: Long): Long = {
    val out = new ByteArrayOutputStream()
    writeVarint(out, v)
    readVarint(new ByteArrayInputStream(out.toByteArray))
  }

  property("varint round-trips over the full unsigned-64 range") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { v =>
      roundTripVarint(v) == v
    }

  property("strings round-trip") = forAll(Gen.asciiPrintableStr) { s =>
    val out = new ByteArrayOutputStream()
    writeString(out, s)
    readString(new ByteArrayInputStream(out.toByteArray)) == s
  }

  private def roundTripBlock(b: Block): Block = {
    val out = new ByteArrayOutputStream()
    writeBlock(out, b)
    readBlock(new ByteArrayInputStream(out.toByteArray))
  }

  private val byteArrayGen: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)

  property("String/Int64/Float64 column vectors round-trip in a block") =
    forAll(Gen.listOfN(5, byteArrayGen),
           Gen.listOfN(5, Gen.chooseNum(Long.MinValue, Long.MaxValue)),
           Gen.listOfN(5, Gen.chooseNum(-1e12, 1e12))) { (bs, ls, ds) =>
      val block = Block(
        Seq("s" -> "String", "l" -> "Int64", "d" -> "Float64"),
        Seq(bs.toIndexedSeq, ls.toIndexedSeq, ds.toIndexedSeq))
      val back = roundTripBlock(block)
      back.columns == block.columns &&
        back.data(0).map(_.asInstanceOf[Array[Byte]].toSeq) ==
          bs.map(_.toSeq) &&
        back.data(1) == ls.toIndexedSeq &&
        back.data(2) == ds.toIndexedSeq
    }
}

/** Fixed-value edges of the same codec: type widths, signedness,
  * Nullable masks, the empty terminator block, multi-byte UTF-8.
  */
class ClickHouseWireSpec extends AnyFunSuite {
  import ClickHouseWire._

  private def roundTripBlock(b: Block): Block = {
    val out = new ByteArrayOutputStream()
    writeBlock(out, b)
    readBlock(new ByteArrayInputStream(out.toByteArray))
  }

  test("multi-byte UTF-8 strings round-trip") {
    val s = "naïve — 日本語 🚀"
    val out = new ByteArrayOutputStream()
    writeString(out, s)
    assert(readString(new ByteArrayInputStream(out.toByteArray)) === s)
  }

  test("DateTime (u32 epoch seconds), Date (u16 days), Bool, Float32, " +
    "and the small ints round-trip with correct signedness") {
    val block = Block(
      Seq("dt" -> "DateTime", "d" -> "Date", "b" -> "Bool",
        "f" -> "Float32", "i32" -> "Int32", "i16" -> "Int16",
        "u8" -> "UInt8"),
      Seq(IndexedSeq(0L, 1578256260L, 4294967295L),
        IndexedSeq(0, 18266, 65535),
        IndexedSeq(true, false, true),
        IndexedSeq(0.0f, -1.5f, 3.25f),
        IndexedSeq(Int.MinValue, 0, Int.MaxValue),
        IndexedSeq(-32768, 0, 32767),
        IndexedSeq(0, 128, 255)))
    val back = roundTripBlock(block)
    assert(back.data(0) === IndexedSeq(0L, 1578256260L, 4294967295L))
    assert(back.data(1) === IndexedSeq(0, 18266, 65535))
    assert(back.data(2) === IndexedSeq(true, false, true))
    assert(back.data(3) === IndexedSeq(0.0f, -1.5f, 3.25f))
    assert(back.data(4) === IndexedSeq(Int.MinValue, 0, Int.MaxValue))
    // Int16 sign-extends on decode: -32768 comes back as -32768
    assert(back.data(5) === IndexedSeq(-32768, 0, 32767))
    assert(back.data(6) === IndexedSeq(0, 128, 255))
  }

  test("Int8 sign-extends; UInt32 decodes unsigned into a Long") {
    val block = Block(
      Seq("i8" -> "Int8", "u32" -> "UInt32"),
      Seq(IndexedSeq(-128, -1, 127), IndexedSeq(0L, 4294967295L, 7L)))
    val back = roundTripBlock(block)
    assert(back.data(0) === IndexedSeq(-128, -1, 127))
    assert(back.data(1) === IndexedSeq(0L, 4294967295L, 7L))
  }

  test("Nullable columns carry the mask and restore nulls") {
    val block = Block(
      Seq("s" -> "Nullable(String)", "l" -> "Nullable(Int64)"),
      Seq(IndexedSeq("a", null, "c"), IndexedSeq(null, 2L, null)))
    val back = roundTripBlock(block)
    assert(back.data(0).map(v =>
      if (v == null) null else asString(v)) === IndexedSeq("a", null, "c"))
    assert(back.data(1) === IndexedSeq(null, 2L, null))
  }

  test("an empty block (the protocol terminator) round-trips") {
    val back = roundTripBlock(EmptyBlock)
    assert(back.columns.isEmpty)
    assert(back.rows === 0)
  }
}
