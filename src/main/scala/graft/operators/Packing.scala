package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing: assign variable-length documents to fixed token-budget
  * training sequences.
  *
  * Globally optimal packing is bin packing (NP-hard) and irrelevant at
  * corpus scale; the standard compromise is shard-local greedy: bucket the
  * docs into `shards` independent shards, order each shard
  * deterministically, and fill sequences first-fit in that order. One
  * shuffle, then a single sequential pass per shard — this is the one
  * place imperative per-partition logic genuinely beats a relational
  * formulation (the running "current sequence fill" state is inherently
  * order-dependent), so it runs in `mapPartitions` with the iterator
  * consumed lazily: nothing accumulates in memory beyond one row.
  *
  * Determinism: shard = md5 bucket of the id ([[Sampling.hashBucket]]),
  * order = id within the shard, so the assignment is a pure function of
  * (ids, token counts, budget, shards) — independent of input
  * partitioning, stable across runs, and reproducible by any engine (the
  * DuckDB oracle replays the greedy scan with a recursive CTE).
  */
object Packing {

  val packedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("shard", IntegerType, nullable = false),
    StructField("seq_idx", LongType, nullable = false),
    StructField("tok_offset", LongType, nullable = false),
    StructField("truncated", BooleanType, nullable = false)))

  /** Pack docs into sequences of at most `budget` tokens. A doc longer
    * than the budget gets a sequence of its own, flagged `truncated`
    * (the trainer decides whether to split or drop it). `tok_offset` is
    * the doc's token start position inside its sequence.
    */
  def packSequences(docs: DataFrame, idCol: String, nTokensCol: String,
                    budget: Long, shards: Int): DataFrame = {
    require(budget >= 1 && shards >= 1)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(packedSchema)
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(nTokensCol).cast("long").as("n_tokens"),
        Sampling.hashBucket(col(idCol), shards).as("shard"))
      // equal shard values co-locate; a partition may hold several whole
      // shards, so the scan below resets its state on shard change
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .mapPartitions { rows =>
        var cur = -1
        var seq = 0L
        var fill = 0L
        var inSeq = 0L // emptiness by doc count, not fill: zero-token docs
                       // still claim their sequence slot
        rows.map { r =>
          val id = r.getLong(0)
          val n = math.max(r.getLong(1), 0L)
          val shard = r.getInt(2)
          if (shard != cur) { cur = shard; seq = 0L; fill = 0L; inSeq = 0L }
          val truncated = n > budget
          if (inSeq > 0 && (truncated || fill + n > budget)) {
            seq += 1; fill = 0L; inSeq = 0L
          }
          val offset = fill
          fill += n
          inSeq += 1
          val emitSeq = seq
          if (truncated) { seq += 1; fill = 0L; inSeq = 0L } // oversized doc closes its own sequence
          Row(id, n, shard, emitSeq, offset, truncated)
        }
      }(enc)
  }
}
