package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * Shape: everything is RELATIONAL — shingles/tokens are exploded to rows
  * once, then min/sum hash-aggregated by doc id. Nesting the whole pipeline
  * into one expression tree (transform-inside-aggregate-inside-array) would
  * re-evaluate the tokenizer per lambda element and fall out of codegen;
  * exploded rows keep every md5 evaluation done exactly once and the
  * aggregates map-side combinable. The only shuffles move (id, 32-char
  * digest) pairs — never document text — so the plan holds when documents
  * are 100 TB: candidate generation is an equi-join on band keys, and the
  * quadratic verify step is confined to LSH bucket-local pairs.
  */
object Dedup {

  /** Exact dedup via content hash (optionally normalization-insensitive).
    * Output: one row per distinct content with canonical (min) id and the
    * duplicate count.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String,
                  normalize: Boolean = false): DataFrame = {
    val key = if (normalize) TextFunctions.fingerprintMd5(col(textCol)) else md5(col(textCol))
    docs.withColumn("content_hash", key)
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))
  }

  /** One row per (doc, shingle): word n-grams of the lowercased text, with a
    * whole-text fallback for docs shorter than n tokens. Duplicated shingles
    * are kept (harmless to min-hash, de-duped where sets are needed).
    */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    spread(docs)
      .select(col(idCol).as("id"), TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .select(col("id"), explode(
        transform(
          sequence(lit(1), greatest(size(col("toks")) - (n - 1), lit(1))),
          i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("shingle"))

  /** Documents often arrive as a handful of files; without a spread the
    * whole tokenize+hash pipeline serializes onto one task per file (and a
    * single interpreted thread can be 30x slower than the JITed path). One
    * round-robin shuffle of the raw text buys full-core parallelism for
    * everything downstream — at 100 TB the input is already thousands of
    * splits and this collapses to a no-op repartition decision.
    */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** MinHash signatures: ONE md5 per shingle, k hash functions derived as
    * non-overlapping 4-hex-char (16-bit) windows of the digest, signature_j
    * = lexicographic min over the doc's shingles (string-min of fixed-width
    * hex is order-isomorphic to numeric min). One digest per shingle instead
    * of k keeps the hash cost flat in k; 16-bit slots quantize the
    * similarity estimate but banded keys still carry 16*rows bits, ample for
    * candidate generation (false positives die in the Jaccard verify). One
    * hash-aggregate produces all k slots; partial aggregation runs map-side.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame =
    signaturesFromShingles(shingleRows(docs, idCol, textCol, n), k)

  /** Signature aggregation over pre-computed (id, shingle) rows — lets a
    * caller that also needs the shingles (the Jaccard verify) tokenize the
    * corpus exactly once.
    */
  def signaturesFromShingles(sh: DataFrame, k: Int): DataFrame = {
    require(k * 4 <= 32, s"k=$k needs ${k * 4} hex chars; md5 has 32")
    val hashed = sh.select(col("id"), md5(col("shingle")).as("d"))
    hashed.groupBy("id").agg(
      min(substring(col("d"), 1, 4)).as("sig_0"),
      (1 until k).map(j =>
        min(substring(col("d"), 1 + 4 * j, 4)).as(s"sig_$j")): _*)
  }

  /** (id, band) rows: the k signature slots split into `bands` groups of
    * k/bands, each hashed to one short bucket key.
    */
  def bandRows(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws("|",
        lit(b.toString) +: (b * rows until (b + 1) * rows).map(j => col(s"sig_$j")): _*))
    }
    sigs.select(col("id"), explode(array(bandCols: _*)).as("band"))
  }

  /** Candidate duplicate pairs via MinHash LSH: docs sharing any band bucket,
    * each unordered pair emitted once. The join key is a 32-char digest — at
    * scale this is a shuffled equi-join on short keys with AQE splitting any
    * skewed bucket.
    */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                            n: Int = 3, k: Int = 8, bands: Int = 4): DataFrame = {
    val banded = bandRows(minhashSignatures(docs, idCol, textCol, n, k), k, bands)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
  }

  /** LSH candidates verified with exact n-gram Jaccard >= threshold: the full
    * near-dup pipeline (signature map -> bucket join -> bounded verify).
    * Set sizes and intersections are computed over distinct shingles, so the
    * result matches the set-based definition exactly.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, k: Int = 8, bands: Int = 4,
                   threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // The shingle rows feed both the signature pipeline and the Jaccard
    // verify, and the candidate pairs fan out to several joins below;
    // pinning both means the corpus is tokenized exactly once and the
    // band self-join runs exactly once. At warehouse scale these would be
    // materialized tables; in-session persist gives the same shape.
    val shRaw = shingleRows(docs, idCol, textCol, n)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = bandRows(signaturesFromShingles(shRaw, k), k, bands)
    val a = banded.as("a")
    val b = banded.as("b")
    val cands = a.join(b, col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val shd = shRaw.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = shd.groupBy("id").agg(count(lit(1)).as("sz"))
    // common shingle count, restricted to candidate pairs
    val common = cands
      .join(shd.select(col("id").as("doc_a"), col("shingle").as("sh_a")), "doc_a")
      .join(shd.select(col("id").as("doc_b"), col("shingle").as("sh_b")), "doc_b")
      .filter(col("sh_a") === col("sh_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    cands
      .join(common, Seq("doc_a", "doc_b"), "left_outer")
      .na.fill(0L, Seq("n_common"))
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          greatest(col("sz_a") + col("sz_b") - col("n_common"), lit(1L)).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 32-bit SimHash per doc: bit b of the hash is the sign of the sum over
    * tokens of ±1 according to bit b of the token's md5 (first 8 hex
    * nibbles). Token digests are computed once on exploded rows; all 32 bit
    * sums run in a single hash-aggregate.
    */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokRows = spread(docs)
      .select(col(idCol).as("id"), TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .select(col("id"), explode(col("toks")).as("tok"))
      .select(col("id"), md5(col("tok")).as("h"))
    def bitContrib(b: Int): Column = {
      val nib = conv(substring(col("h"), b / 4 + 1, 1), 16, 10).cast("long")
      when(shiftright(nib, 3 - (b % 4)).bitwiseAND(1) === 1, lit(1L)).otherwise(lit(-1L))
    }
    val sums = tokRows.groupBy("id").agg(
      sum(bitContrib(0)).as("s_0"),
      (1 until 32).map(b => sum(bitContrib(b)).as(s"s_$b")): _*)
    val hash = (0 until 32)
      .map(b => when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("id").as("doc_id"), hash.as("simhash"))
  }

  /** Exact n-gram Jaccard for a pair of (distinct) shingle-set columns. */
  def jaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast("double") /
      greatest(size(array_union(shA, shB)), lit(1)).cast("double")
}
