package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Whole-record XDR decode: a raw Stellar `LedgerHeader` (RFC 4506
  * encoding of the struct in stellar-core's Stellar-ledger.x) → one
  * typed struct with every scalar/hash column the reference's
  * `history_ledgers` table carries (reference
  * dags/stellar_etl_airflow/build_export_task.py:94-161 delegates this
  * decode to its Go export binary; the field list mirrors that table's
  * schema). This composes the [[XdrStrkey]] field primitives into the
  * full record: unlike those literal-offset extractors, a LedgerHeader
  * has a VARIABLE-length interior — the SCP value's `upgrades<6>`
  * vector (count-prefixed, each element length-prefixed and padded to
  * the XDR 4-byte boundary) and its BASIC/SIGNED ext union — so the
  * decode is a sequential cursor, not a set of static offsets.
  *
  * Layout walked (all big-endian, 4-byte aligned):
  * {{{
  *   uint32 ledgerVersion
  *   Hash   previousLedgerHash            // opaque[32]
  *   StellarValue scpValue:
  *     Hash      txSetHash                // opaque[32]
  *     TimePoint closeTime                // uint64
  *     UpgradeType upgrades<6>            // count, then per element:
  *                                        //   len, bytes, pad to 4
  *     ext: uint32 0 (BASIC) | 1 (SIGNED) // SIGNED adds
  *       NodeID    = uint32 keyType + opaque[32]
  *       Signature = opaque<64>: len, bytes, pad to 4
  *   Hash   txSetResultHash               // opaque[32]
  *   Hash   bucketListHash                // opaque[32]
  *   uint32 ledgerSeq
  *   int64  totalCoins
  *   int64  feePool
  *   uint32 inflationSeq
  *   uint64 idPool
  *   uint32 baseFee
  *   uint32 baseReserve
  *   uint32 maxTxSetSize
  *   Hash   skipList[4]                   // opaque[128]
  *   ext: uint32 0 | 1 (v1 adds uint32 flags + uint32 inner ext 0)
  * }}}
  *
  * Failure semantics are the pack's quarantine convention: any
  * structural violation — short buffer, upgrade count > 6, an element
  * length past the buffer, an unknown union discriminant, nonzero
  * padding bytes, trailing garbage (the record must consume the buffer
  * EXACTLY) — decodes to NULL, never an exception, so an ingest filter
  * routes bad rows instead of dying mid-scan. The expression itself
  * stays inside WholeStageCodegen: one static parser call per row.
  */
object XdrRecords {

  /** Result schema — history_ledgers-shaped; hashes stay binary (the
    * query hex()es them into the reference's string spelling). */
  val ledgerHeaderType: StructType = StructType(Seq(
    StructField("ledger_version", LongType),
    StructField("previous_ledger_hash", BinaryType),
    StructField("tx_set_hash", BinaryType),
    StructField("close_time", LongType),
    StructField("upgrade_count", LongType),
    StructField("signed", BooleanType),
    StructField("tx_set_result_hash", BinaryType),
    StructField("bucket_list_hash", BinaryType),
    StructField("ledger_seq", LongType),
    StructField("total_coins", LongType),
    StructField("fee_pool", LongType),
    StructField("inflation_seq", LongType),
    StructField("id_pool", LongType),
    StructField("base_fee", LongType),
    StructField("base_reserve", LongType),
    StructField("max_tx_set_size", LongType),
    StructField("flags", LongType)))

  /** Cursor parse; null on ANY structural violation (see object doc). */
  def decodeLedgerHeader(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    var p = 0
    def has(n: Int): Boolean = n >= 0 && b.length - p >= n
    def u32(): Long = {
      val v = ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
      p += 4; v
    }
    def u64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      p += 8; v
    }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(b, p, p + n); p += n; out
    }
    // variable opaque<max>: len-prefixed, zero-padded to the 4 boundary;
    // returns false on violation (short, over max, nonzero pad byte)
    def skipVarOpaque(max: Long): Boolean = {
      if (!has(4)) return false
      val len = u32()
      if (len > max) return false
      val pad = ((4L - len % 4L) % 4L).toInt
      if (!has((len + pad).toInt) || len + pad > Int.MaxValue) return false
      p += len.toInt
      var i = 0
      while (i < pad) { if (b(p + i) != 0) return false; i += 1 }
      p += pad
      true
    }

    if (!has(4)) return null
    val ledgerVersion = u32()
    if (!has(32)) return null
    val prevHash = bytes(32)
    if (!has(32)) return null
    val txSetHash = bytes(32)
    if (!has(8)) return null
    val closeTime = u64()
    if (!has(4)) return null
    val nUpgrades = u32()
    if (nUpgrades > 6) return null // UpgradeType upgrades<6>
    var u = 0L
    while (u < nUpgrades) {
      if (!skipVarOpaque(128)) return null // UpgradeType = opaque<128>
      u += 1
    }
    if (!has(4)) return null
    val scpExt = u32()
    val signed = scpExt match {
      case 0L => false
      case 1L => // LedgerCloseValueSignature: NodeID + Signature
        if (!has(4)) return null
        val keyType = u32()
        if (keyType != 0L) return null // PUBLIC_KEY_TYPE_ED25519
        if (!has(32)) return null
        p += 32
        if (!skipVarOpaque(64)) return null // Signature = opaque<64>
        true
      case _ => return null
    }
    if (!has(32)) return null
    val txSetResultHash = bytes(32)
    if (!has(32)) return null
    val bucketListHash = bytes(32)
    if (!has(4 + 8 + 8 + 4 + 8 + 4 + 4 + 4 + 128 + 4)) return null
    val ledgerSeq = u32()
    val totalCoins = u64()
    val feePool = u64()
    val inflationSeq = u32()
    val idPool = u64()
    val baseFee = u32()
    val baseReserve = u32()
    val maxTxSetSize = u32()
    p += 128 // skipList: Hash[4], validated for presence above
    val hdrExt = u32()
    val flags = hdrExt match {
      case 0L => 0L
      case 1L => // LedgerHeaderExtensionV1: uint32 flags + ext(0)
        if (!has(8)) return null
        val fl = u32()
        if (u32() != 0L) return null
        fl
      case _ => return null
    }
    if (p != b.length) return null // exact consumption: no trailing bytes
    new GenericInternalRow(Array[Any](
      ledgerVersion, prevHash, txSetHash, closeTime, nUpgrades, signed,
      txSetResultHash, bucketListHash, ledgerSeq, totalCoins, feePool,
      inflationSeq, idPool, baseFee, baseReserve, maxTxSetSize, flags))
  }
}

/** `graft_xdr_account_entry(bin)`: full AccountEntry record decode —
  * the second whole-record composition, and the one that exercises the
  * XDR-cursor × strkey-codec COMPOSITION: account ids arrive as raw
  * ed25519 PublicKeys and surface as checksum-carrying G-addresses
  * (SEP-23 strkey, version byte 48), exactly the spelling the
  * reference's `accounts` table stores. Layout walked
  * (Stellar-ledger-entries.x):
  * {{{
  *   AccountID accountID          // PublicKey: uint32 0 + opaque[32]
  *   int64  balance
  *   int64  seqNum
  *   uint32 numSubEntries
  *   AccountID* inflationDest     // optional: uint32 0|1 (+ PublicKey)
  *   uint32 flags
  *   string32 homeDomain          // len, bytes, pad to 4
  *   Thresholds thresholds        // opaque[4]: master/low/med/high
  *   Signer signers<20>           // per signer: SignerKey union
  *                                //   (0|1|2: opaque[32];
  *                                //    3: opaque[32] + opaque<64>)
  *                                //   + uint32 weight
  *   ext: uint32 0 | 1 (AccountEntryExtensionV1:
  *     Liabilities { int64 buying; int64 selling } + inner ext 0)
  * }}}
  * Same quarantine + exact-consumption semantics as the header decode.
  */
object XdrAccountEntry {
  val accountEntryType: StructType = StructType(Seq(
    StructField("account_id", StringType),
    StructField("balance", LongType),
    StructField("sequence_number", LongType),
    StructField("num_subentries", LongType),
    StructField("inflation_destination", StringType),
    StructField("flags", LongType),
    StructField("home_domain", StringType),
    StructField("master_weight", LongType),
    StructField("threshold_low", LongType),
    StructField("threshold_med", LongType),
    StructField("threshold_high", LongType),
    StructField("num_signers", LongType),
    StructField("buying_liabilities", LongType),
    StructField("selling_liabilities", LongType)))

  /** Cursor parse; null on ANY structural violation. */
  def decode(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    var p = 0
    def has(n: Int): Boolean = n >= 0 && b.length - p >= n
    def u32(): Long = {
      val v = ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
      p += 4; v
    }
    def i64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      p += 8; v
    }
    // PublicKey union: type 0 (ed25519) + opaque[32] → strkey G-address
    def publicKey(): org.apache.spark.unsafe.types.UTF8String = {
      if (!has(36) || u32() != 0L) return null
      val key = java.util.Arrays.copyOfRange(b, p, p + 32); p += 32
      StrkeyCodec.encode(48, key) // 48 = SEP-23 account version byte 'G'
    }
    def varBytes(max: Long): Array[Byte] = {
      if (!has(4)) return null
      val len = u32()
      if (len > max) return null
      val pad = ((4L - len % 4L) % 4L).toInt
      if (!has(len.toInt + pad)) return null
      val out = java.util.Arrays.copyOfRange(b, p, p + len.toInt)
      p += len.toInt
      var i = 0
      while (i < pad) { if (b(p + i) != 0) return null; i += 1 }
      p += pad
      out
    }

    val accountId = publicKey()
    if (accountId == null) return null
    if (!has(8 + 8 + 4 + 4)) return null
    val balance = i64()
    val seqNum = i64()
    val numSubEntries = u32()
    val hasInflation = u32()
    val inflationDest = hasInflation match {
      case 0L => null
      case 1L =>
        val d = publicKey()
        if (d == null) return null
        d
      case _ => return null
    }
    if (!has(4)) return null
    val flags = u32()
    val homeDomainBytes = varBytes(32) // string32
    if (homeDomainBytes == null) return null
    if (!has(4 + 4)) return null
    val thr = java.util.Arrays.copyOfRange(b, p, p + 4); p += 4
    val nSigners = u32()
    if (nSigners > 20) return null // Signer signers<20>
    var s = 0L
    while (s < nSigners) {
      if (!has(4)) return null
      val keyType = u32()
      if (keyType < 0L || keyType > 3L) return null
      if (!has(32)) return null
      p += 32
      if (keyType == 3L && varBytes(64) == null) return null // signed payload
      if (!has(4)) return null
      u32() // weight
      s += 1
    }
    if (!has(4)) return null
    val (buying, selling) = u32() match {
      case 0L => (0L, 0L)
      case 1L => // AccountEntryExtensionV1: Liabilities + inner ext 0
        if (!has(8 + 8 + 4)) return null
        val bl = i64(); val sl = i64()
        if (u32() != 0L) return null
        (bl, sl)
      case _ => return null
    }
    if (p != b.length) return null // exact consumption
    new GenericInternalRow(Array[Any](
      accountId, balance, seqNum, numSubEntries, inflationDest, flags,
      org.apache.spark.unsafe.types.UTF8String.fromBytes(homeDomainBytes),
      (thr(0) & 0xff).toLong, (thr(1) & 0xff).toLong,
      (thr(2) & 0xff).toLong, (thr(3) & 0xff).toLong,
      nSigners, buying, selling))
  }
}

case class XdrAccountEntryDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_xdr_account_entry requires a binary arg, got ${child.dataType}")

  override def dataType: DataType = XdrAccountEntry.accountEntryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xdr_account_entry"

  override def nullSafeEval(input: Any): Any =
    XdrAccountEntry.decode(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.XdrAccountEntry.decode($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XdrAccountEntryDecode =
    copy(child = newChild)
}

/** `graft_xdr_tx_envelope(bin)`: TransactionV1Envelope record decode —
  * the third whole-record composition and the one that carries the
  * reference's per-OPERATION table transform: the decoded struct's
  * `operations` array explodes into history_operations-shaped rows
  * (the reference's Go binary fans one transaction XDR out to the
  * transactions + operations tables, build_export_task.py:94-161).
  * Layout walked (Stellar-transaction.x), ENVELOPE_TYPE_TX = 2:
  * {{{
  *   uint32 2                       // TransactionEnvelope union arm
  *   MuxedAccount sourceAccount     // uint32 0: opaque[32]
  *                                  // uint32 0x100: uint64 id + opaque[32]
  *   uint32 fee
  *   int64  seqNum
  *   Preconditions: uint32 0 (none) | 1 (TimeBounds: uint64 min, max)
  *   Memo: uint32 0 | 1 string<28> | 2 uint64 | 3/4 opaque[32]
  *   Operation operations<100>:     // per op:
  *     MuxedAccount* sourceAccount  //   optional
  *     uint32 type: 0 CREATE_ACCOUNT → AccountID dest + int64 balance
  *                  1 PAYMENT → MuxedAccount dest + Asset + int64 amount
  *     Asset: uint32 0 native | 1 code[4]+issuer | 2 code[12]+issuer
  *   uint32 0                       // tx ext
  *   DecoratedSignature signatures<20>  // opaque[4] hint + opaque<64>
  * }}}
  * Ed25519 keys surface as strkey G-addresses; muxed sources surface as
  * the underlying G-address plus the mux id. DECODE BOUNDARY: v0/fee-bump
  * envelopes, PRECOND_V2, and operation types beyond CREATE_ACCOUNT /
  * PAYMENT quarantine to NULL like malformed input — NULL means "this
  * decoder cannot produce the record", the same routing signal either
  * way; extending the op-type switch is mechanical.
  */
object XdrTxEnvelope {

  val operationType: StructType = StructType(Seq(
    StructField("op_type", LongType),
    StructField("source_account", StringType),
    StructField("destination", StringType),
    StructField("asset_type", LongType),
    StructField("asset_code", StringType),
    StructField("asset_issuer", StringType),
    StructField("amount", LongType)))

  val txEnvelopeType: StructType = StructType(Seq(
    StructField("source_account", StringType),
    StructField("muxed_id", LongType),
    StructField("fee", LongType),
    StructField("seq_num", LongType),
    StructField("min_time", LongType),
    StructField("max_time", LongType),
    StructField("memo_type", LongType),
    StructField("memo_text", StringType),
    StructField("memo_id", LongType),
    StructField("memo_hash", BinaryType),
    StructField("n_operations", LongType),
    StructField("n_signatures", LongType),
    StructField("operations", ArrayType(operationType))))

  def decode(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    var p = 0
    def has(n: Int): Boolean = n >= 0 && b.length - p >= n
    def u32(): Long = {
      val v = ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
      p += 4; v
    }
    def i64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      p += 8; v
    }
    def strkey(): org.apache.spark.unsafe.types.UTF8String = {
      val key = java.util.Arrays.copyOfRange(b, p, p + 32); p += 32
      StrkeyCodec.encode(48, key)
    }
    // MuxedAccount → (G-address of the underlying key, mux id or null)
    def muxed(): (org.apache.spark.unsafe.types.UTF8String, Any) = {
      if (!has(4)) return null
      u32() match {
        case 0L => // KEY_TYPE_ED25519
          if (!has(32)) null else (strkey(), null)
        case 0x100L => // KEY_TYPE_MUXED_ED25519
          if (!has(40)) null else { val id = i64(); (strkey(), id) }
        case _ => null
      }
    }
    def accountId(): org.apache.spark.unsafe.types.UTF8String = {
      if (!has(36) || u32() != 0L) return null
      strkey()
    }
    def varBytes(max: Long): Array[Byte] = {
      if (!has(4)) return null
      val len = u32()
      if (len > max) return null
      val pad = ((4L - len % 4L) % 4L).toInt
      if (!has(len.toInt + pad)) return null
      val out = java.util.Arrays.copyOfRange(b, p, p + len.toInt)
      p += len.toInt
      var i = 0
      while (i < pad) { if (b(p + i) != 0) return null; i += 1 }
      p += pad
      out
    }
    // trailing-zero-trimmed fixed asset code (opaque[n])
    def assetCode(n: Int): org.apache.spark.unsafe.types.UTF8String = {
      val raw = java.util.Arrays.copyOfRange(b, p, p + n); p += n
      var end = n
      while (end > 0 && raw(end - 1) == 0) end -= 1
      org.apache.spark.unsafe.types.UTF8String
        .fromBytes(java.util.Arrays.copyOf(raw, end))
    }

    if (!has(4) || u32() != 2L) return null // ENVELOPE_TYPE_TX only
    val src = muxed()
    if (src == null) return null
    if (!has(4 + 8 + 4)) return null
    val fee = u32()
    val seqNum = i64()
    var minTime: Any = null
    var maxTime: Any = null
    u32() match {
      case 0L => ()
      case 1L =>
        if (!has(16)) return null
        minTime = i64(); maxTime = i64()
      case _ => return null // PRECOND_V2: outside this decoder's boundary
    }
    if (!has(4)) return null
    val memoType = u32()
    var memoText: Any = null
    var memoId: Any = null
    var memoHash: Any = null
    memoType match {
      case 0L => ()
      case 1L =>
        val t = varBytes(28)
        if (t == null) return null
        memoText = org.apache.spark.unsafe.types.UTF8String.fromBytes(t)
      case 2L =>
        if (!has(8)) return null
        memoId = i64()
      case 3L | 4L =>
        if (!has(32)) return null
        memoHash = java.util.Arrays.copyOfRange(b, p, p + 32); p += 32
      case _ => return null
    }
    if (!has(4)) return null
    val nOps = u32()
    if (nOps < 1 || nOps > 100) return null // operations<100>, min 1
    val ops = new Array[Any](nOps.toInt)
    var oi = 0
    while (oi < nOps) {
      if (!has(4)) return null
      val opSrc: Any = u32() match {
        case 0L => null
        case 1L =>
          val m = muxed()
          if (m == null) return null
          m._1 // per-op mux ids are not surfaced; the address is
        case _ => return null
      }
      if (!has(4)) return null
      val row: InternalRow = u32() match {
        case 0L => // CREATE_ACCOUNT: AccountID destination + balance
          val dest = accountId()
          if (dest == null || !has(8)) return null
          new GenericInternalRow(Array[Any](
            0L, opSrc, dest, null, null, null, i64()))
        case 1L => // PAYMENT: MuxedAccount destination + Asset + amount
          val dest = muxed()
          if (dest == null || !has(4)) return null
          var aType = 0L
          var aCode: Any = null
          var aIssuer: Any = null
          u32() match {
            case 0L => ()
            case t @ (1L | 2L) =>
              val codeLen = if (t == 1L) 4 else 12
              if (!has(codeLen)) return null
              aCode = assetCode(codeLen)
              aIssuer = accountId()
              if (aIssuer == null) return null
              aType = t
            case _ => return null
          }
          if (!has(8)) return null
          new GenericInternalRow(Array[Any](
            1L, opSrc, dest._1, aType, aCode, aIssuer, i64()))
        case _ => return null // op types beyond the decode boundary
      }
      ops(oi) = row
      oi += 1
    }
    if (!has(4) || u32() != 0L) return null // tx ext
    if (!has(4)) return null
    val nSigs = u32()
    if (nSigs > 20) return null // signatures<20>
    var si = 0L
    while (si < nSigs) {
      if (!has(4)) return null
      p += 4 // hint opaque[4]
      if (varBytes(64) == null) return null
      si += 1
    }
    if (p != b.length) return null // exact consumption
    new GenericInternalRow(Array[Any](
      src._1, src._2, fee, seqNum, minTime, maxTime, memoType, memoText,
      memoId, memoHash, nOps, nSigs,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(ops)))
  }
}

case class XdrTxEnvelopeDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_xdr_tx_envelope requires a binary arg, got ${child.dataType}")

  override def dataType: DataType = XdrTxEnvelope.txEnvelopeType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xdr_tx_envelope"

  override def nullSafeEval(input: Any): Any =
    XdrTxEnvelope.decode(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.XdrTxEnvelope.decode($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XdrTxEnvelopeDecode =
    copy(child = newChild)
}

/** `graft_xdr_ledger_header(bin)`: full LedgerHeader record decode to a
  * struct (see [[XdrRecords.ledgerHeaderType]]); NULL on malformed. */
case class XdrLedgerHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_xdr_ledger_header requires a binary arg, got ${child.dataType}")

  override def dataType: DataType = XdrRecords.ledgerHeaderType
  // malformed input decodes to null even when the input is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xdr_ledger_header"

  override def nullSafeEval(input: Any): Any =
    XdrRecords.decodeLedgerHeader(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.XdrRecords.decodeLedgerHeader($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XdrLedgerHeader =
    copy(child = newChild)
}
