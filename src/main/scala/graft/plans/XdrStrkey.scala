package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** XDR field extraction + strkey codec as native expressions — the
  * interior of the reference's export boundary (SURVEY §2.1/§2.10: the
  * reference decodes ledger XDR in its Go export binary,
  * reference dags/stellar_etl_airflow/build_export_task.py:94-161, and
  * every address in its warehouse is a strkey string). The engine's
  * declared ingest boundary is NDJSON; this pack closes the one data-path
  * segment with no engine analog, so a payload that arrives as raw
  * base64 XDR (an archive row, an embedded extension blob) can be field-
  * extracted — and strkey addresses validated/derived — without leaving
  * the engine.
  *
  * Formats are public standards: XDR is RFC 4506 (big-endian, 4-byte
  * alignment); strkey is Stellar SEP-23 — RFC 4648 base32 (uppercase, no
  * padding) over `version_byte || payload || CRC16-XModem(version_byte
  * || payload)` with the 2-byte checksum appended LITTLE-endian.
  *
  * Decode failure semantics are quarantine-shaped: malformed input
  * (short buffer, bad base32 char, wrong checksum, non-canonical
  * length) yields NULL, never an exception — the S11 convention, so an
  * ingest filter can route bad rows instead of dying mid-scan. All
  * expressions evaluate inside WholeStageCodegen (offsets/lengths are
  * plan-time literals; the strkey codec is one static call per row).
  */
object StrkeyCodec {

  private val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  // 127-sized reverse lookup, -1 = invalid char
  private val rev: Array[Byte] = {
    val a = Array.fill[Byte](128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c) = i.toByte }
    a
  }

  /** CRC16-XModem (poly 0x1021, init 0x0000) — the strkey checksum. */
  def crc16(data: Array[Byte], len: Int): Int = {
    var crc = 0
    var i = 0
    while (i < len) {
      crc ^= (data(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x1021) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** Strict base32 decode (RFC 4648 upper alphabet, no padding): null on
    * any invalid char, on a length whose bit count has a non-whole
    * trailing byte group that base32 cannot canonically produce, or on
    * nonzero leftover bits (a non-canonical encoding). */
  private def base32Decode(s: String): Array[Byte] = {
    val nBits = s.length * 5
    val nBytes = nBits / 8
    // canonical base32 lengths mod 8 are {0, 2, 4, 5, 7}
    val rem = s.length % 8
    if (rem == 1 || rem == 3 || rem == 6) return null
    val out = new Array[Byte](nBytes)
    var acc = 0L
    var bits = 0
    var oi = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 128 || rev(c) < 0) return null
      acc = (acc << 5) | rev(c)
      bits += 5
      if (bits >= 8) {
        bits -= 8
        out(oi) = ((acc >> bits) & 0xff).toByte
        oi += 1
      }
      i += 1
    }
    // leftover bits must be zero or the string is not a canonical encode
    if (bits > 0 && (acc & ((1L << bits) - 1)) != 0) return null
    out
  }

  /** Decode + verify a strkey: returns `version_byte || payload` with the
    * checksum VERIFIED and stripped, or null on any structural or
    * checksum failure. The caller splits version/payload (cheap byte
    * ops) or uses [[StrkeyDecode]], which returns payload only. */
  def decodeVerified(s: UTF8String): Array[Byte] = {
    if (s == null) return null
    val raw = base32Decode(s.toString)
    if (raw == null || raw.length < 3) return null
    val bodyLen = raw.length - 2
    val crc = crc16(raw, bodyLen)
    val stored = (raw(bodyLen) & 0xff) | ((raw(bodyLen + 1) & 0xff) << 8)
    if (crc != stored) return null
    java.util.Arrays.copyOf(raw, bodyLen)
  }

  /** Payload-only decode (version byte stripped); null on invalid. */
  def decodePayload(s: UTF8String): Array[Byte] = {
    val body = decodeVerified(s)
    if (body == null || body.length < 2) null
    else java.util.Arrays.copyOfRange(body, 1, body.length)
  }

  /** Version byte of a VALID strkey (checksum verified), or -1. */
  def version(s: UTF8String): Int = {
    val body = decodeVerified(s)
    if (body == null) -1 else body(0) & 0xff
  }

  /** Encode `version_byte || payload || crc16` as unpadded base32. */
  def encode(versionByte: Int, payload: Array[Byte]): UTF8String = {
    if (payload == null) return null
    val body = new Array[Byte](payload.length + 3)
    body(0) = versionByte.toByte
    System.arraycopy(payload, 0, body, 1, payload.length)
    val crc = crc16(body, payload.length + 1)
    body(payload.length + 1) = (crc & 0xff).toByte
    body(payload.length + 2) = ((crc >> 8) & 0xff).toByte
    val sb = new java.lang.StringBuilder((body.length * 8 + 4) / 5)
    var acc = 0L
    var bits = 0
    var i = 0
    while (i < body.length) {
      acc = (acc << 8) | (body(i) & 0xff)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(alphabet.charAt(((acc >> bits) & 31).toInt))
      }
      i += 1
    }
    if (bits > 0)
      sb.append(alphabet.charAt(((acc << (5 - bits)) & 31).toInt))
    UTF8String.fromString(sb.toString)
  }
}

/** `graft_strkey_decode(addr)`: checksum-verified strkey payload as
  * binary (version byte stripped), NULL on malformed/tampered input. */
case class StrkeyDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_strkey_decode requires a string arg, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  // invalid input decodes to null even when the input is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "graft_strkey_decode"

  override def nullSafeEval(input: Any): Any =
    StrkeyCodec.decodePayload(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.StrkeyCodec.decodePayload($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StrkeyDecode =
    copy(child = newChild)
}

/** `graft_strkey_encode(payload, version)`: strkey string for a binary
  * payload under an integer-literal version byte. */
case class StrkeyEncode(child: Expression, versionByte: Int)
  extends UnaryExpression {

  require(versionByte >= 0 && versionByte <= 255,
    s"strkey version byte must be in [0,255], got $versionByte")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_strkey_encode requires a binary arg, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strkey_encode"

  override def nullSafeEval(input: Any): Any =
    StrkeyCodec.encode(versionByte, input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.StrkeyCodec.encode($versionByte, $c);")

  override protected def withNewChildInternal(newChild: Expression): StrkeyEncode =
    copy(child = newChild)
}

/** `graft_xdr_u32(bin, offset)`: big-endian unsigned 32-bit field at a
  * literal byte offset, as bigint; NULL if the buffer is too short. */
case class XdrU32(child: Expression, offset: Int) extends UnaryExpression {

  require(offset >= 0, s"xdr offset must be >= 0, got $offset")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_xdr_u32 requires a binary arg, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xdr_u32"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length.toLong < offset.toLong + 4L) null
    else ((b(offset) & 0xffL) << 24) | ((b(offset + 1) & 0xffL) << 16) |
      ((b(offset + 2) & 0xffL) << 8) | (b(offset + 3) & 0xffL)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if (((long) $c.length) < ${offset}L + 4L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (($c[$offset] & 0xffL) << 24)
         |    | (($c[$offset + 1] & 0xffL) << 16)
         |    | (($c[$offset + 2] & 0xffL) << 8)
         |    | ($c[$offset + 3] & 0xffL);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XdrU32 =
    copy(child = newChild)
}

/** `graft_xdr_u64(bin, offset)`: big-endian 64-bit field at a literal
  * byte offset as bigint (two's complement past 2^63-1, the usual SQL
  * posture); NULL if the buffer is too short. */
case class XdrU64(child: Expression, offset: Int) extends UnaryExpression {

  require(offset >= 0, s"xdr offset must be >= 0, got $offset")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_xdr_u64 requires a binary arg, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xdr_u64"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length.toLong < offset.toLong + 8L) null
    else {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (b(offset + i) & 0xffL); i += 1 }
      v
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("xv")
      val i = ctx.freshName("xi")
      s"""
         |if (((long) $c.length) < ${offset}L + 8L) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $v = 0L;
         |  for (int $i = 0; $i < 8; $i++) {
         |    $v = ($v << 8) | ($c[$offset + $i] & 0xffL);
         |  }
         |  ${ev.value} = $v;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XdrU64 =
    copy(child = newChild)
}

/** `graft_xdr_bytes(bin, offset, len)`: fixed-length byte slice (an XDR
  * opaque/hash field) at literal offset/len; NULL if too short. */
case class XdrBytes(child: Expression, offset: Int, len: Int)
  extends UnaryExpression {

  require(offset >= 0 && len >= 0,
    s"xdr offset/len must be >= 0, got $offset/$len")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_xdr_bytes requires a binary arg, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xdr_bytes"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length.toLong < offset.toLong + len.toLong) null
    else java.util.Arrays.copyOfRange(b, offset, offset + len)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if (((long) $c.length) < ${offset}L + ${len}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = java.util.Arrays.copyOfRange(
         |    $c, $offset, $offset + $len);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XdrBytes =
    copy(child = newChild)
}
