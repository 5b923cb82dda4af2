package graft.typed

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Typed (Dataset[T]) surface for the hot warehouse rows.
  *
  * Where schemas are fixed and logic is per-entity, case-class Datasets buy
  * compile-time safety and let reductions run as typed map-side combines.
  * `latestByKey` here is the typed alternative to the W1 window: a
  * groupByKey + reduceGroups is a partial aggregation (each map task keeps
  * one candidate row per key before the shuffle) — the same
  * pre-shuffle pruning WindowGroupLimit gives the untyped path.
  */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Option[Double],
    props: String)

final case class UserAgg(user_id: Long, n: Long, total: Double)

/** A closed activity session (streaming sessionization output). */
final case class Session(
    user_id: Long,
    start_ts: java.sql.Timestamp,
    end_ts: java.sql.Timestamp,
    n_events: Long,
    value_sum: Double)

/** Streaming KMV sketch output: distinct values retained (capped at k,
  * exact below it) and the (k-1)/U(k) estimate.
  */
final case class KmvEstimate(key: String, n_distinct_capped: Int, est_distinct: Double)

object TypedOps {

  implicit val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit val userAggEnc: Encoder[UserAgg] = Encoders.product[UserAgg]

  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import graft.sources.Tables
    asTyped(Tables.load(spark, sfDir, "events"))
  }

  /** NTZ-tolerant typed view: the `Event` encoder needs TIMESTAMP
    * (java.sql.Timestamp), but naive parquet timestamps load as
    * TIMESTAMP_NTZ. Under the engine's pinned UTC session zone the cast is
    * a wall-clock bijection, so adapting here loses nothing.
    */
  def asTyped(df: DataFrame): Dataset[Event] = {
    val fixed = df.schema("ts").dataType match {
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
    fixed.as[Event](eventEnc)
  }

  /** Latest event per user, ordered by (ts, event_id) — typed reduction,
    * shuffles exactly one row per key per map task.
    */
  def latestByUser(ds: Dataset[Event]): Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .reduceGroups { (a: Event, b: Event) =>
        val cmp = a.ts.compareTo(b.ts)
        if (cmp > 0 || (cmp == 0 && a.event_id > b.event_id)) a else b
      }
      .map(_._2)
  }

  /** Per-user totals as a typed aggregation. */
  def userTotals(ds: Dataset[Event]): Dataset[UserAgg] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        var n = 0L
        var total = 0.0
        it.foreach { e => n += 1; total += e.value.getOrElse(0.0) }
        UserAgg(uid, n, total)
      }
  }
}
