package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension points.
  *
  * Installable two ways:
  *  - at session build time:
  *    `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *  - imperatively on an existing session (the Verify/Bench drivers build
  *    their own sessions): [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineDescriptor)
    ext.injectOptimizerRule(_ => IntervalBroadcastRule)
  }
}

object GraftFunctions {

  private[plans] val cosineDescriptor
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_cosine(a, b) takes two array<float> args")
      CosineSimilarity(children.head, children(1))
    })

  /** Idempotently register the engine's native functions on a session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = cosineDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
