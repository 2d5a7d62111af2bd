package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftext.VecDot

/** Session extension registering the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql("... vec_dot(a, b) ...")`
  * works next to the Column API.
  *
  * Activate at session build time:
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * — or imperatively on an existing session via
  * [[org.apache.spark.sql.graftext.ColumnBridge.registerFunctions]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** (identifier, info, builder) triples — shared by the extension and
    * the imperative registrar.
    */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
     new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
     (args: Seq[Expression]) => VecDot(args(0), args(1))))
}
