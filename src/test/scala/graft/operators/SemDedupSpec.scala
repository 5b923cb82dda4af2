package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("semanticPairs stays within cells and respects the threshold") {
    val pairs = SemDedup.semanticPairs(emb, nlist = 8, iters = 1, tau = 0.35)
      .collect()
    assert(pairs.nonEmpty, "fixture should produce some semantic dups")
    assert(pairs.forall(_.getDouble(2) >= 0.35))
    // a pair is only ever emitted from a shared cell: re-derive the
    // assignment and check both endpoints landed together
    val cents = graft.functions.IvfIndex.lloydCentroids(emb, 8, 1)
    val asn = graft.functions.IvfIndex
      .assign(emb, cents, "vec_id", "embedding", nativeCosine = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { p =>
      assert(asn(p.getLong(0)) == asn(p.getLong(1)),
        s"pair ${p.getLong(0)},${p.getLong(1)} crosses cells")
    }
  }

  test("survivors are canonical min-ids and no same-cell survivor pair is >= tau") {
    val verdict = SemDedup.semDedup(emb, nlist = 8, iters = 1, tau = 0.35)
    val rows = verdict.collect()
    assert(rows.length == emb.count())
    val kept = rows.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    // every vector's canonical is itself kept, and is <= the member id
    rows.foreach { r =>
      assert(kept.contains(r.getLong(2)), s"canonical ${r.getLong(2)} not kept")
      assert(r.getLong(2) <= r.getLong(0))
    }
    // survivors of one cell are pairwise below tau: any >= tau same-cell
    // pair would have joined the two into one component
    val survivors = verdict.filter(col("keep"))
      .select(col("vec_id"), col("cell"))
    val sp = SemDedup.semanticPairs(emb, nlist = 8, iters = 1, tau = 0.35)
      .join(survivors.select(col("vec_id").as("vec_a")), "vec_a")
      .join(survivors.select(col("vec_id").as("vec_b")), "vec_b")
    assert(sp.count() == 0, "two same-cell survivors are still near-dups")
  }

  test("dropping duplicates shrinks the corpus but keeps one per group") {
    val verdict = SemDedup.semDedup(emb, nlist = 8, iters = 1, tau = 0.35)
    val nGroups = verdict.select("canonical_id").distinct().count()
    val nKept = verdict.filter(col("keep")).count()
    assert(nKept == nGroups, "exactly one survivor per duplicate group")
    assert(nKept < emb.count(), "fixture contains at least one dup to drop")
  }
}
