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
