package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimFloat, MortonInterleave16}

/** Catalyst extension entry point: makes the engine's native functions
  * available in ANY session — including pure-SQL users — via
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * This is the deployment-grade alternative to calling
  * graft.functions.GraftFunctions.register(spark) in code.
  *
  * Injection surface (SURVEY.md §4.3): native functions (SEMANTICS the
  * built-ins lack) plus one optimizer rule,
  * [[graft.plans.PinnedDimBroadcast]] (an OPTIMIZATION — broadcast
  * pinning for the schema-bounded dims, safe under any stats/threshold
  * configuration). No planner strategies: every operator's semantics
  * are expressible in the DataFrame algebra.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.PinnedDimBroadcast)
    e.injectFunction((
      FunctionIdentifier("cosine_f"),
      new ExpressionInfo(classOf[CosineSimFloat].getName, "cosine_f"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimFloat(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("morton16"),
      new ExpressionInfo(classOf[MortonInterleave16].getName, "morton16"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MortonInterleave16(exprs(0), exprs(1))))
  }
}
