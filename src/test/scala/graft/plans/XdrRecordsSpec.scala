package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Whole-record LedgerHeader decode: an independent test-side encoder
  * (straight RFC 4506 writes, no shared code with the parser) builds
  * headers across every interior-shape combination; the native decode
  * must invert each one field-for-field, and EVERY structural
  * corruption — any strict prefix, trailing bytes, over-limit vectors,
  * nonzero padding, unknown discriminants — must quarantine to NULL.
  */
class XdrRecordsSpec extends SparkSpec {

  import spark.implicits._

  private def hash(seed: Int): Array[Byte] =
    Array.tabulate[Byte](32)(i => ((seed * 31 + i * 7 + 3) & 0xff).toByte)

  /** Independent encoder for the exact layout the parser walks. */
  private def encode(ledgerVersion: Long, closeTime: Long,
                     upgrades: Seq[Array[Byte]], signedExt: Boolean,
                     ledgerSeq: Long, totalCoins: Long,
                     flagsExt: Option[Long], sigLen: Int = 40): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      bb.write(((v >> 24) & 0xff).toInt); bb.write(((v >> 16) & 0xff).toInt)
      bb.write(((v >> 8) & 0xff).toInt); bb.write((v & 0xff).toInt)
    }
    def w64(v: Long): Unit = { w32((v >>> 32) & 0xffffffffL); w32(v & 0xffffffffL) }
    def wVar(bytes: Array[Byte]): Unit = {
      w32(bytes.length.toLong)
      bb.write(bytes, 0, bytes.length)
      var pad = (4 - bytes.length % 4) % 4
      while (pad > 0) { bb.write(0); pad -= 1 }
    }
    w32(ledgerVersion)
    bb.write(hash(1), 0, 32) // previousLedgerHash
    bb.write(hash(2), 0, 32) // scp.txSetHash
    w64(closeTime)
    w32(upgrades.length.toLong)
    upgrades.foreach(wVar)
    if (signedExt) {
      w32(1L); w32(0L); bb.write(hash(3), 0, 32)
      wVar(Array.tabulate[Byte](sigLen)(i => (i + 1).toByte))
    } else w32(0L)
    bb.write(hash(4), 0, 32) // txSetResultHash
    bb.write(hash(5), 0, 32) // bucketListHash
    w32(ledgerSeq); w64(totalCoins); w64(777L); w32(9L); w64(123456L)
    w32(100L); w32(5000000L); w32(1000L)
    (6 to 9).foreach(s => bb.write(hash(s), 0, 32)) // skipList[4]
    flagsExt match {
      case Some(fl) => w32(1L); w32(fl); w32(0L)
      case None     => w32(0L)
    }
    bb.toByteArray
  }

  private val shapes: Seq[Array[Byte]] = for {
    nUp <- 0 to 3
    signedExt <- Seq(false, true)
    flags <- Seq(None, Some(5L))
  } yield encode(23L, 1700000099L,
    (0 until nUp).map(i => Array.tabulate[Byte](i * 3 + 1)(j => (j + i).toByte)),
    signedExt, 424242L, 1000000007L, flags)

  test("decode inverts the independent encoder across every " +
      "upgrades/signed/flags shape combination") {
    for {
      nUp <- 0 to 3
      signedExt <- Seq(false, true)
      flags <- Seq(None, Some(5L))
    } {
      val buf = encode(23L, 1700000099L,
        (0 until nUp).map(i => Array.tabulate[Byte](i * 3 + 1)(j => (j + i).toByte)),
        signedExt, 424242L, 1000000007L, flags)
      val r = XdrRecords.decodeLedgerHeader(buf)
      assert(r != null, s"shape nUp=$nUp signed=$signedExt flags=$flags")
      assert(r.getLong(0) == 23L)
      assert(r.getBinary(1).toSeq == hash(1).toSeq)
      assert(r.getBinary(2).toSeq == hash(2).toSeq)
      assert(r.getLong(3) == 1700000099L)
      assert(r.getLong(4) == nUp.toLong)
      assert(r.getBoolean(5) == signedExt)
      assert(r.getBinary(6).toSeq == hash(4).toSeq)
      assert(r.getBinary(7).toSeq == hash(5).toSeq)
      assert(r.getLong(8) == 424242L)
      assert(r.getLong(9) == 1000000007L)
      assert(r.getLong(10) == 777L && r.getLong(11) == 9L)
      assert(r.getLong(12) == 123456L)
      assert(r.getLong(13) == 100L && r.getLong(14) == 5000000L)
      assert(r.getLong(15) == 1000L)
      assert(r.getLong(16) == flags.getOrElse(0L))
    }
  }

  test("quarantine sweep: EVERY strict prefix and every one-byte " +
      "extension of a valid header decodes to null — no partial records") {
    shapes.foreach { buf =>
      (0 until buf.length).foreach { n =>
        assert(XdrRecords.decodeLedgerHeader(buf.take(n)) == null,
          s"prefix of $n/${buf.length} bytes must not decode")
      }
      assert(XdrRecords.decodeLedgerHeader(buf :+ 0.toByte) == null,
        "trailing garbage must not decode")
      assert(XdrRecords.decodeLedgerHeader(buf) != null, "the full record does")
    }
  }

  test("quarantine: over-limit vectors, nonzero padding, unknown " +
      "discriminants all reject") {
    // upgrade count 7 exceeds upgrades<6>
    val sevenUp = encode(1L, 1L, (0 until 7).map(_ => Array[Byte](1)),
      signedExt = false, 1L, 1L, None)
    assert(XdrRecords.decodeLedgerHeader(sevenUp) == null)
    // a signature longer than opaque<64>
    val longSig = encode(1L, 1L, Nil, signedExt = true, 1L, 1L, None, sigLen = 65)
    assert(XdrRecords.decodeLedgerHeader(longSig) == null)
    // nonzero XDR padding byte inside an upgrade element
    val padded = encode(1L, 1L, Seq(Array[Byte](9)), signedExt = false, 1L, 1L, None)
    val padIdx = 4 + 32 + 32 + 8 + 4 + 4 + 1 // first pad byte of the upgrade
    assert(padded(padIdx) == 0, "layout self-check")
    val corrupt = padded.clone(); corrupt(padIdx) = 1
    assert(XdrRecords.decodeLedgerHeader(corrupt) == null)
    // unknown scp ext discriminant (2): flip the BASIC marker
    val basic = encode(1L, 1L, Nil, signedExt = false, 1L, 1L, None)
    val extIdx = 4 + 32 + 32 + 8 + 4 // scp ext u32 starts here (0 upgrades)
    val badExt = basic.clone(); badExt(extIdx + 3) = 2
    assert(XdrRecords.decodeLedgerHeader(badExt) == null)
    // unknown node key type (1) under a SIGNED ext
    val signedBuf = encode(1L, 1L, Nil, signedExt = true, 1L, 1L, None)
    val badKey = signedBuf.clone(); badKey(extIdx + 7) = 1
    assert(XdrRecords.decodeLedgerHeader(badKey) == null)
  }

  /** Independent AccountEntry encoder (Stellar-ledger-entries.x). */
  private def encodeAccount(balance: Long, seqNum: Long,
                            inflation: Boolean, homeDomain: String,
                            signerTypes: Seq[Int], liabilities: Option[(Long, Long)])
  : Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      bb.write(((v >> 24) & 0xff).toInt); bb.write(((v >> 16) & 0xff).toInt)
      bb.write(((v >> 8) & 0xff).toInt); bb.write((v & 0xff).toInt)
    }
    def w64(v: Long): Unit = { w32((v >>> 32) & 0xffffffffL); w32(v & 0xffffffffL) }
    def wVar(bytes: Array[Byte]): Unit = {
      w32(bytes.length.toLong); bb.write(bytes, 0, bytes.length)
      var pad = (4 - bytes.length % 4) % 4
      while (pad > 0) { bb.write(0); pad -= 1 }
    }
    w32(0L); bb.write(hash(10), 0, 32) // accountID: ed25519 PublicKey
    w64(balance); w64(seqNum); w32(7L) // numSubEntries
    if (inflation) { w32(1L); w32(0L); bb.write(hash(11), 0, 32) } else w32(0L)
    w32(5L) // flags
    wVar(homeDomain.getBytes("UTF-8"))
    bb.write(Array[Byte](3, 1, 2, 4), 0, 4) // thresholds
    w32(signerTypes.length.toLong)
    signerTypes.foreach { t =>
      w32(t.toLong); bb.write(hash(12 + t), 0, 32)
      if (t == 3) wVar(Array.tabulate[Byte](19)(_.toByte)) // signed payload
      w32(200L + t)
    }
    liabilities match {
      case Some((buy, sell)) => w32(1L); w64(buy); w64(sell); w32(0L)
      case None              => w32(0L)
    }
    bb.toByteArray
  }

  private val accountShapes: Seq[Array[Byte]] = for {
    inflation <- Seq(false, true)
    domain <- Seq("", "a", "stellar.org") // 0, 1 (pad 3), 11 (pad 1) bytes
    signers <- Seq(Seq.empty[Int], Seq(0), Seq(0, 1, 2, 3))
    liab <- Seq(None, Some((42L, 77L)))
  } yield encodeAccount(999L, 1L << 40, inflation, domain, signers, liab)

  test("AccountEntry decode inverts the independent encoder across " +
      "inflation/domain/signers(incl. type-3)/liabilities shapes, and " +
      "the account id surfaces as the checksum-valid strkey G-address " +
      "of the raw key") {
    for {
      inflation <- Seq(false, true)
      domain <- Seq("", "a", "stellar.org")
      signers <- Seq(Seq.empty[Int], Seq(0), Seq(0, 1, 2, 3))
      liab <- Seq(None, Some((42L, 77L)))
    } {
      val buf = encodeAccount(999L, 1L << 40, inflation, domain, signers, liab)
      val r = XdrAccountEntry.decode(buf)
      assert(r != null, s"shape $inflation/$domain/$signers/$liab")
      val addr = r.getUTF8String(0).toString
      assert(addr.length == 56 && addr.startsWith("G"))
      // strkey composition: the independent codec must round-trip the
      // address back to the raw key bytes the encoder wrote
      assert(StrkeyCodec.decodePayload(
        org.apache.spark.unsafe.types.UTF8String.fromString(addr))
        .toSeq == hash(10).toSeq)
      assert(r.getLong(1) == 999L && r.getLong(2) == (1L << 40))
      assert(r.getLong(3) == 7L)
      if (inflation)
        assert(StrkeyCodec.decodePayload(r.getUTF8String(4)).toSeq == hash(11).toSeq)
      else assert(r.isNullAt(4))
      assert(r.getLong(5) == 5L)
      assert(r.getUTF8String(6).toString == domain)
      assert((r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10)) ==
        ((3L, 1L, 2L, 4L)))
      assert(r.getLong(11) == signers.length.toLong)
      assert(r.getLong(12) == liab.map(_._1).getOrElse(0L))
      assert(r.getLong(13) == liab.map(_._2).getOrElse(0L))
    }
  }

  test("AccountEntry quarantine: every strict prefix and one-byte " +
      "extension rejects; so do over-limit domains/signer vectors and " +
      "unknown discriminants") {
    accountShapes.foreach { buf =>
      (0 until buf.length).foreach { n =>
        assert(XdrAccountEntry.decode(buf.take(n)) == null,
          s"prefix $n/${buf.length}")
      }
      assert(XdrAccountEntry.decode(buf :+ 0.toByte) == null)
      assert(XdrAccountEntry.decode(buf) != null)
    }
    // home domain longer than string32
    assert(XdrAccountEntry.decode(
      encodeAccount(1L, 1L, inflation = false, "x" * 33, Nil, None)) == null)
    // 21 signers exceeds signers<20>
    assert(XdrAccountEntry.decode(
      encodeAccount(1L, 1L, inflation = false, "", Seq.fill(21)(0), None)) == null)
    // unknown signer key type (4)
    assert(XdrAccountEntry.decode(
      encodeAccount(1L, 1L, inflation = false, "", Seq(4), None)) == null)
    // non-ed25519 account key type: flip the leading discriminant
    val bad = accountShapes.head.clone(); bad(3) = 1
    assert(XdrAccountEntry.decode(bad) == null)
  }

  test("codegen path: the registered function decodes inside a real " +
      "plan and agrees with the interpreted parser on every row") {
    val rows = shapes.zipWithIndex.map { case (b, i) => (i.toLong, b) }
    val df = rows.toDF("i", "bin")
      .withColumn("h", call_function("graft_xdr_ledger_header", col("bin")))
      .select(col("i"), col("h.ledger_seq"), col("h.upgrade_count"),
        col("h.signed"), col("h.flags"),
        lower(hex(col("h.previous_ledger_hash"))).as("ph"))
    val got = df.collect().sortBy(_.getLong(0))
    assert(got.length == shapes.length)
    got.foreach { r =>
      val interp = XdrRecords.decodeLedgerHeader(shapes(r.getLong(0).toInt))
      assert(r.getLong(1) == interp.getLong(8))
      assert(r.getLong(2) == interp.getLong(4))
      assert(r.getBoolean(3) == interp.getBoolean(5))
      assert(r.getLong(4) == interp.getLong(16))
      assert(r.getString(5) ==
        interp.getBinary(1).map("%02x".format(_)).mkString)
    }
  }
}
