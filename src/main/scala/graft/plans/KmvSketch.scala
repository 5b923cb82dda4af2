package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch over a hash column: keeps
  * the k lexicographically smallest DISTINCT values seen, in O(k) bounded
  * state per group.
  *
  * The estimator is the classic KMV one: for uniformly distributed hashes,
  * the k-th smallest normalized hash U(k) gives n ≈ (k-1)/U(k). The engine
  * exposes the *sketch state* — (number of distinct values retained capped
  * at k, the k-th minimum) — and leaves the estimate to a plain column
  * expression, so the whole computation is reproducible in any SQL engine
  * (the DuckDB oracle re-derives it with a row_number window) and hashes
  * can come from any deterministic function (md5 in the catalog queries).
  *
  * Scale shape: unlike the window formulation (shuffle ALL distinct hashes,
  * sort each group), this is a TypedImperativeAggregate with map-side
  * partial aggregation — every partition reduces to ≤ k short strings
  * before the shuffle, so per-group network cost is O(k), independent of
  * input size. This is the distinct-count path a 100 TB corpus needs; the
  * exact `countDistinct` stays available when the group count is small.
  *
  * Mirrors the reference's reliance on engine-side approximate/statistical
  * aggregation being out of scope (BigQuery owns it) — re-expressed here as
  * a first-class Catalyst aggregate.
  */
case class KmvKthMin(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_kth requires a string hash column, got $dt")
  }

  override def nullable: Boolean = false

  /** (n: distinct values retained, capped at k; kth: the k-th minimum, null
    * while fewer than k distinct values have been seen — in which case `n`
    * IS the exact distinct count).
    */
  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("kth", StringType, nullable = true)))

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def add(buf: java.util.TreeSet[String], s: String): Unit =
    KmvKthMin.boundedAdd(buf, s, k)

  override def update(buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: java.util.TreeSet[String], other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any =
    new GenericInternalRow(Array[Any](
      buf.size,
      if (buf.size >= k) UTF8String.fromString(buf.last) else null))

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] =
    KmvKthMin.serializeSet(buf)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] =
    KmvKthMin.deserializeSet(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvKthMin =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvKthMin =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_kmv_kth"
}

/** The MERGEABLE form of the KMV sketch: emits the full (≤k) sorted array
  * of retained minimum hashes instead of just the k-th. Stored per
  * partition (e.g. one row per day) it becomes a sketch MART: the union of
  * per-partition sketches re-sketched to k is EXACTLY the sketch of the
  * unioned raw data (each of the union's k smallest hashes is necessarily
  * among its own partition's k smallest), so a range distinct-count query
  * merges a handful of k-string arrays instead of rescanning history —
  * the pre-aggregation pattern a 100 TB event log needs.
  */
case class KmvMins(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_mins requires a string hash column, got $dt")
  }

  override def nullable: Boolean = false

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  override def update(buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null)
      KmvKthMin.boundedAdd(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(buf: java.util.TreeSet[String], other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) KmvKthMin.boundedAdd(buf, it.next(), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] =
    KmvKthMin.serializeSet(buf)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] =
    KmvKthMin.deserializeSet(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMins =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvMins =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_kmv_mins"
}

object KmvKthMin {

  /** 2^52: 13 hex chars of a hash parse to a value exactly representable
    * in a double, so the estimate is bit-reproducible in any engine.
    */
  val TwoPow52: Double = 4503599627370496.0

  /** Bounded insert: keep only the k smallest distinct values. */
  def boundedAdd(buf: java.util.TreeSet[String], s: String, k: Int): Unit =
    if (buf.size < k) { buf.add(s); () }
    else if (s.compareTo(buf.last) < 0 && buf.add(s)) { buf.pollLast(); () }

  /** ONE TreeSet codec shared by both KMV aggregates — two hand-copied
    * implementations could drift shuffle-incompatible. writeUTF is fine
    * HERE (values are contractually short hex hashes, never unbounded
    * text — the MgTopK length-prefix concern does not apply). */
  def serializeSet(buf: java.util.TreeSet[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeUTF(it.next())
    out.flush()
    bos.toByteArray
  }

  def deserializeSet(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[String]()
    var i = 0
    while (i < n) { buf.add(in.readUTF()); i += 1 }
    buf
  }

  /** The (k-1)/U(k) estimator over the sketch state; below k distinct
    * values the retained count IS the exact answer.
    */
  def estimate(nCapped: Int, kth: Option[String], k: Int): Double =
    kth match {
      case Some(h) if nCapped >= k =>
        // the normalization assumes >= 13 hex chars (the md5-hash
        // contract): a shorter hash would inflate the estimate ~2^20
        // SILENTLY, a non-hex one would throw a bare NumberFormat
        require(h.length >= 13 &&
          h.take(13).forall(c => Character.digit(c, 16) >= 0),
          s"KMV estimate needs >= 13 hex chars, got '${h.take(16)}'")
        (k - 1).toDouble * TwoPow52 /
          java.lang.Long.parseLong(h.take(13), 16).toDouble
      case _ => nCapped.toDouble
    }
}
