package graft.plans

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("native expression is bit-identical to the composable fold") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        VectorFunctions.cosine(col("embedding"), col("qv")).as("fold"),
        VectorFunctions.cosineNative(col("embedding"), col("qv")).as("native"))
    assert(both.filter(col("fold") =!= col("native")).count() == 0,
      "accumulation order must match exactly")
  }

  test("zero-norm vectors score 0.0, never NaN — a NaN would sort " +
      "LARGEST and rank the zero vector first in every top-k") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (2L, Array(1.0f, 2.0f), Array(0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f), Array(0.0f, 0.0f)),
      (4L, Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorFunctions.cosineNative(col("a"), col("b")).as("n"),
        VectorFunctions.cosine(col("a"), col("b")).as("f"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) == ((0.0, 0.0)), s"zero-norm row $id: ${got(id)}")
    }
    assert(math.abs(got(4L)._1 - 1.0) < 1e-12 && !got.values.exists(v =>
      v._1.isNaN || v._2.isNaN))
  }

  test("null array yields null; null elements contribute zero") {
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
      (None, Some(Array(1.0f, 0.0f))))
      .toDF("a", "b")
    val out = df.select(VectorFunctions.cosineNative(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).contains(1.0))
    assert(out(1).isEmpty)
  }

  test("expression participates in whole-stage codegen") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val df = emb
      .select(VectorFunctions.cosineNative(col("embedding"), col("embedding")).as("c"))
      .filter(col("c") > 0.5)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_cosine"), s"expected codegen in:\n$plan")
  }

  test("SQL surface works after registration (graft_cosine)") {
    Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("emb")
    val n = spark.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS c
        |FROM emb a JOIN emb b ON b.vec_id = 0""".stripMargin)
      .filter(col("c").isNotNull).count()
    assert(n > 0)
  }
}
