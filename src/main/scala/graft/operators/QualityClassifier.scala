package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Classifier-based quality filtering (the fastText/DCLM bootstrap
  * recipe) as exact integer dataflow: a high-precision seed rule labels
  * a positive subset, "training" distills it into per-bucket integer
  * weights (class-size-normalized centroid difference over hashed
  * features), and inference scores any doc as the exact integer margin
  * Σ v(doc,bucket)·w(bucket). No model framework, no floats: the
  * keep/drop boundary is bit-identical on any engine and any
  * partitioning, where a float sigmoid would put libm and
  * summation-order noise in the verdict.
  *
  * The train/infer split is the production shape: train once offline
  * over the labeled corpus, persist the dims-sized weight table as the
  * model artifact, then score batches or micro-batches against the
  * FROZEN broadcast weights — per-doc inference is batch-local, so
  * streaming inference commutes with any slicing of the corpus
  * ([[graft.streaming.StreamingGate]]'s quality-filter drain).
  *
  * Scale shape: featurization is a narrow tokenize+explode into a
  * (doc, bucket) hash aggregate — one shuffle, token-count-linear;
  * the weight table is dims-sized and broadcasts; scoring is one more
  * (doc) hash aggregate. Nothing is corpus-quadratic and no scalar
  * driver actions exist anywhere in the lazy plans.
  */
object QualityClassifier {

  /** The gates' shared seed rule: 'spark'-DENSE text (occurrences·20
    * beats the token count) — one definition so the batch query, the
    * streaming gate, and the scale probe cannot drift apart on the
    * threshold while the oracles replay one rule. */
  def sparkDensitySeed(lt: Column): Column =
    (size(split(lt, "spark", -1)) - 1) * 20 >
      size(TextFunctions.tokens(lt))

  /** Hashed signed-count features with the seed label carried:
    * (doc_id, seed, bucket, v) where v is the exact signed token count
    * of the bucket ([[TextFunctions.featureHashBucket]]/`Sign`). `seed`
    * is built by the caller from the LOWERED text column it receives —
    * keep the rule length-free (a density, not a presence test): a
    * presence rule correlates with doc length and the learned
    * difference direction degenerates into the global mean.
    */
  def featurizeSeeded(docs: DataFrame, idCol: String, textCol: String,
                      seed: Column => Column, dims: Int): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    docs.select(col(idCol).as("doc_id"), lower(col(textCol)).as("lt"))
      // hash-spread by doc_id (a narrow two-column shuffle) BEFORE the
      // per-token work so tokenizing runs on every slot even when the
      // source is one parquet split — and, because HashPartitioning on
      // doc_id co-locates every row of both downstream grouping keys
      // ((doc_id, seed, token) and (doc_id, seed, bucket)), this is the
      // ONLY exchange in the featurization: both aggregates run
      // shuffle-free on top of it
      .repartition(col("doc_id"))
      // seed in its OWN projection below the explode: a select that mixes
      // a computed column with a generator desugars to Project(expr) ABOVE
      // Generate — the seed rule (two regex passes over the whole text)
      // would re-evaluate once per TOKEN row, a ~tokens-per-doc-times CPU
      // amplification (measured 5.2 s vs 1.5 s on the sf0.1 corpus for
      // explode+seed fused vs staged). Staged, Generate carries `seed` as
      // a required child attribute and the rule runs once per doc.
      .select(col("doc_id"), col("lt"), seed(col("lt")).as("seed"))
      .select(col("doc_id"), col("seed"),
        explode(TextFunctions.tokens(col("lt"))).as("token"))
      // collapse to DISTINCT (doc, token) with its multiplicity BEFORE
      // hashing: md5 cost drops by the token-repetition factor — the
      // digest count is vocabulary-per-doc-sized, not corpus-token-sized
      .groupBy("doc_id", "seed", "token")
      .agg(count(lit(1)).as("n"))
      // ONE md5 per distinct token: bucket and sign both read the same
      // digest column (two featureHash* calls would hash twice — CSE
      // across the aggregate boundary is not guaranteed)
      .select(col("doc_id"), col("seed"), col("n"), md5(col("token")).as("h"))
      .select(col("doc_id"), col("seed"),
        (conv(substring(col("h"), 1, 4), 16, 10).cast("long") % dims)
          .as("bucket"),
        (when(conv(substring(col("h"), 5, 1), 16, 10).cast("long") % 2 === 0,
          1L).otherwise(-1L) * col("n")).as("sv"))
      .groupBy("doc_id", "seed", "bucket")
      .agg(sum(col("sv")).as("v"))
  }

  /** Inference-side features (no label): (doc_id, bucket, v). */
  def featurize(docs: DataFrame, idCol: String, textCol: String,
                dims: Int): DataFrame =
    featurizeSeeded(docs, idCol, textCol, _ => lit(false), dims)
      .drop("seed")

  /** Train by counting: the class-size-normalized centroid difference,
    * cross-multiplied so weights stay INTEGER —
    * `w(b) = n_neg·Σ_seed v(b) − n_pos·Σ_nonseed v(b)`. Without the
    * normalization an unbalanced corpus collapses the difference
    * direction into the global mean and every margin lands one side.
    * Output is the dims-sized (bucket, w) model artifact.
    */
  def trainWeights(seededFeats: DataFrame): DataFrame = {
    val cls = seededFeats.select("doc_id", "seed").distinct()
      .agg(sum(when(col("seed"), 1L).otherwise(0L)).as("np"),
        sum(when(col("seed"), 0L).otherwise(1L)).as("nn"))
    seededFeats.groupBy("bucket")
      .agg(sum(when(col("seed"), col("v")).otherwise(lit(0L))).as("sp"),
        sum(when(!col("seed"), col("v")).otherwise(lit(0L))).as("sn"))
      .crossJoin(broadcast(cls))
      .select(col("bucket"),
        (col("nn") * col("sp") - col("np") * col("sn")).as("w"))
  }

  /** Score features against a frozen weight table: the exact integer
    * margin per doc, and the keep verdict at the zero boundary. A
    * bucket the training corpus never populated carries weight 0 (left
    * join — an inner join would silently DROP a new doc's unseen
    * features, and a doc made entirely of them), so out-of-vocabulary
    * inference degrades to margin 0, never to a missing row. */
  def score(feats: DataFrame, weights: DataFrame): DataFrame =
    feats.join(broadcast(weights.select(col("bucket"), col("w"))),
        Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(sum(col("v") * coalesce(col("w"), lit(0L))).as("margin"))
      .select(col("doc_id"), col("margin"), (col("margin") > 0).as("keep"))
}
