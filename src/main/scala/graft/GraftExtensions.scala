package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** SparkSessionExtensions module: registers the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")`
  * works anywhere the Scala `ArrayMath.dot` does. Attach with:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      GraftExtensions.dotBuilder))
  }
}

object GraftExtensions {
  val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_dot takes exactly 2 arguments")
    DotProduct(children.head, children(1))
  }

  /** Register on an already-built session (extensions only apply at
    * builder time; this is the runtime-attach form, e.g. for tests and
    * notebooks).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "graft_dot", dotBuilder)
}
