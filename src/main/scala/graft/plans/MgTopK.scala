package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary: the k most frequent values of a
  * string column per group, in O(k) bounded state.
  *
  * Update is the classic MG step (increment if tracked, insert if room,
  * else decrement every counter); merge is the mergeable-summaries form
  * (Agarwal et al., PODS'12): add counts, then subtract the (k+1)-th
  * largest and drop non-positives. Both preserve the MG guarantee
  *   true_count - n/(k+1)  <=  reported_count  <=  true_count
  * so any value with frequency above n/(k+1) is guaranteed present.
  *
  * When a group's distinct-value count never exceeds k, no decrement ever
  * fires and the counts are EXACT — that regime is what the oracle gate
  * checks; the approximate regime's error bound is spec-asserted.
  *
  * Scale shape: the exact top-k-tokens query (explode → count → rank)
  * shuffles the full per-group vocabulary; this summary reduces every
  * partition to ≤ k (value, count) pairs before the shuffle, making
  * per-group network cost independent of vocabulary size — the
  * heavy-hitters path for URL/domain/token frequency over an unbounded
  * keyspace.
  */
case class MgTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k >= 1 && k <= 65536, s"graft_mg_topk needs 1 <= k <= 65536, got $k")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_mg_topk requires a string column, got $dt")
  }

  override def nullable: Boolean = false

  /** Sorted (count desc, value asc) array of the retained summary. */
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) MgTopK.updateMap(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long], other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] =
    MgTopK.mergeInto(buf, other, k)

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (item, cnt) => (-cnt, item) }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), cnt))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed bytes, NOT writeUTF: the tracked values are
      // arbitrary tokens/URLs from unbounded keyspaces, and writeUTF
      // throws past 64 KB of modified-UTF-8 — one pathological crawl
      // token in the k-entry buffer would crash the whole aggregation
      // at shuffle time
      val kb = e.getKey.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MgTopK =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_mg_topk"
}

object MgTopK {

  /** One MG update step: increment if tracked, insert if room, else
    * decrement every counter (amortized O(1) per absorbed occurrence —
    * each decrement pass cancels k+1 item occurrences). Shared by the
    * batch aggregate and the streaming keyed state.
    */
  def updateMap(buf: java.util.HashMap[String, Long], s: String, k: Int): Unit = {
    // containsKey, NOT a get-against-null test: the map's values erase to
    // boxed longs, and Scala unboxes a missing key's null to 0L — a null
    // comparison on the unboxed value is always-true/always-false, which
    // would route every miss through the increment branch and let the
    // buffer grow without bound (the decrement step would never fire).
    if (buf.containsKey(s)) { buf.put(s, buf.get(s) + 1L); () }
    else if (buf.size < k) { buf.put(s, 1L); () }
    else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Mergeable-summaries combine: add counts, then subtract the (k+1)-th
    * largest and drop non-positives — back to <= k entries with the MG
    * bound intact.
    */
  def mergeInto(buf: java.util.HashMap[String, Long],
                other: java.util.HashMap[String, Long], k: Int): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.put(e.getKey, buf.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (buf.size > k) {
      val counts = new Array[Long](buf.size)
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buf.size - k - 1)
      val es = buf.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= sub) es.remove() else e.setValue(e.getValue - sub)
      }
    }
    buf
  }
}
