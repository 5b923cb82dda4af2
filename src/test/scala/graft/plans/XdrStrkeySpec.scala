package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** XDR field extraction + strkey codec: known CRC vectors, an
  * INDEPENDENT base32/CRC reimplementation against the codec, exhaustive
  * single-char tamper rejection, and the codegen path through real
  * plans.
  */
class XdrStrkeySpec extends SparkSpec {

  import spark.implicits._
  GraftFunctions.register(spark)

  private def utf8(s: String) = UTF8String.fromString(s)

  // ---- independent reimplementations (different formulation from the
  // codec: table-driven CRC, BigInt-based base32) ----

  private def crcRef(data: Array[Byte]): Int = {
    // bitwise-per-byte table formulation of CRC16/XMODEM
    val table = Array.tabulate(256) { n =>
      var c = n << 8
      var k = 0
      while (k < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x1021) & 0xffff
            else (c << 1) & 0xffff
        k += 1
      }
      c
    }
    data.foldLeft(0)((crc, b) =>
      ((crc << 8) & 0xffff) ^ table(((crc >> 8) ^ (b & 0xff)) & 0xff))
  }

  private val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  private def base32Ref(bytes: Array[Byte]): String = {
    // BigInt bit-shift formulation, zero-padded to ceil(8n/5) digits
    val nChars = (bytes.length * 8 + 4) / 5
    val shifted = BigInt(1, bytes) << (nChars * 5 - bytes.length * 8)
    (0 until nChars).map { i =>
      alpha((shifted >> ((nChars - 1 - i) * 5) & 31).toInt)
    }.mkString
  }

  private def strkeyRef(version: Int, payload: Array[Byte]): String = {
    val body = version.toByte +: payload
    val crc = crcRef(body)
    base32Ref(body :+ (crc & 0xff).toByte :+ ((crc >> 8) & 0xff).toByte)
  }

  test("CRC16-XModem: the published check value and the table-driven " +
      "reimplementation agree everywhere") {
    // the standard check input "123456789" -> 0x31C3 (CRC-16/XMODEM)
    val check = "123456789".getBytes("US-ASCII")
    assert(StrkeyCodec.crc16(check, check.length) == 0x31c3)
    assert(crcRef(check) == 0x31c3)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val b = Array.fill(rnd.nextInt(40) + 1)(rnd.nextInt().toByte)
      assert(StrkeyCodec.crc16(b, b.length) == crcRef(b))
    }
  }

  test("strkey encode matches the independent reimplementation and " +
      "round-trips; version byte is recoverable") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 30) {
      val payload = Array.fill(32)(rnd.nextInt().toByte)
      val enc = StrkeyCodec.encode(48, payload).toString
      assert(enc == strkeyRef(48, payload), "codec vs independent base32")
      assert(enc.length == 56, "32-byte payloads canonically encode to 56 chars")
      assert(StrkeyCodec.decodePayload(utf8(enc)).toSeq == payload.toSeq)
      assert(StrkeyCodec.version(utf8(enc)) == 48)
    }
    // other version bytes round-trip too (seed-style 144, muxed 96)
    for (v <- Seq(0, 96, 144, 255)) {
      val p = Array.tabulate(32)(i => (i * 7 + v).toByte)
      assert(StrkeyCodec.decodePayload(utf8(StrkeyCodec.encode(v, p).toString))
        .toSeq == p.toSeq)
      assert(StrkeyCodec.version(utf8(StrkeyCodec.encode(v, p).toString)) == v)
    }
  }

  test("strkey decode rejects EVERY single-character substitution " +
      "(CRC16 catches all <=16-bit bursts), plus structural garbage") {
    val payload = Array.tabulate(32)(i => (i * 31 + 5).toByte)
    val enc = StrkeyCodec.encode(48, payload).toString
    for (pos <- enc.indices; sub <- alpha if sub != enc(pos)) {
      val tampered = enc.updated(pos, sub)
      assert(StrkeyCodec.decodePayload(utf8(tampered)) == null,
        s"tamper at $pos -> $sub must be rejected")
    }
    assert(StrkeyCodec.decodePayload(utf8("")) == null)
    assert(StrkeyCodec.decodePayload(utf8("GA1")) == null, "invalid char + length")
    assert(StrkeyCodec.decodePayload(utf8(enc.dropRight(1))) == null,
      "non-canonical length")
    assert(StrkeyCodec.decodePayload(utf8(enc.toLowerCase)) == null,
      "strkey base32 is uppercase-only")
    assert(StrkeyCodec.decodePayload(null) == null)
  }

  test("XDR extraction: hand-built big-endian buffer decodes " +
      "field-for-field; short buffers yield null; u64 top bit is two's " +
      "complement") {
    val buf = Array[Byte](
      0, 0, 0, 37, // u32 @0 = 37
      0xde.toByte, 0xad.toByte, 0xbe.toByte, 0xef.toByte, // bytes @4
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, // u32 @8 = 2^32-1
      0x80.toByte, 0, 0, 0, 0, 0, 0, 1) // u64 @12 = Long.MinValue + 1
    val one = org.apache.spark.sql.catalyst.expressions.Literal(1)
    assert(XdrU32(one, 0).nullSafeEval(buf) == 37L)
    assert(XdrU32(one, 8).nullSafeEval(buf) == 4294967295L)
    assert(XdrBytes(one, 4, 4).nullSafeEval(buf)
      .asInstanceOf[Array[Byte]].toSeq ==
      Seq(0xde.toByte, 0xad.toByte, 0xbe.toByte, 0xef.toByte))
    assert(XdrU64(one, 12).nullSafeEval(buf) == Long.MinValue + 1)
    assert(XdrU32(one, 17).nullSafeEval(buf) == null, "OOB u32")
    assert(XdrU64(one, 13).nullSafeEval(buf) == null, "OOB u64")
    assert(XdrBytes(one, 16, 8).nullSafeEval(buf) == null, "OOB bytes")
    // near-Int.MaxValue offsets: the bounds check is long arithmetic, so
    // offset + len cannot wrap negative and sneak past the guard — the
    // quarantine NULL holds instead of a mid-scan exception
    assert(XdrU32(one, Int.MaxValue - 1).nullSafeEval(buf) == null)
    assert(XdrU64(one, Int.MaxValue - 1).nullSafeEval(buf) == null)
    assert(XdrBytes(one, Int.MaxValue - 2, 8).nullSafeEval(buf) == null)
  }

  test("codegen path: the registered functions run inside a real plan " +
      "and agree with the interpreted codec on every row") {
    val df = (1L to 200L).toDF("k")
      .withColumn("payload", unhex(concat(md5(col("k").cast("string")),
        md5(concat(col("k").cast("string"), lit("z"))))))
      .withColumn("addr",
        call_function("graft_strkey_encode", col("payload"), lit(48)))
      .withColumn("back", call_function("graft_strkey_decode", col("addr")))
      .withColumn("xdr", concat(col("payload"),
        unhex(lpad(hex(col("k") * 1000003L), 16, "0"))))
      .select(col("k"), col("payload"), col("addr"), col("back"),
        call_function("graft_xdr_u64", col("xdr"), lit(32)).as("tail64"),
        call_function("graft_xdr_bytes", col("xdr"), lit(0), lit(32)).as("head"))
    val rows = df.collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      assert(r.getAs[String]("addr") == strkeyRef(48, payload))
      assert(r.getAs[Array[Byte]]("back").toSeq == payload.toSeq)
      assert(r.getAs[Long]("tail64") == r.getAs[Long]("k") * 1000003L)
      assert(r.getAs[Array[Byte]]("head").toSeq == payload.toSeq)
    }
  }
}
