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
  * graft.functions.GraftFunctions.register(spark) in code
  * (SURVEY.md §4.3: we inject functions; no custom optimizer rules or
  * planner strategies are needed for this engine's semantics).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
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
