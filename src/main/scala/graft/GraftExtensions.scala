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
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftext.ColumnBridge
  import graft.functions.TextAnalysis

  /** Lift a Column-composition (builtins only, stays in codegen) into
    * a SQL function builder via the expression bridge — the pipeline's
    * text devices become callable from `Engine.sql` next to the
    * Column API, with ONE definition serving both surfaces.
    */
  private def unary(name: String, f: Column => Column) =
    (FunctionIdentifier(name),
     new ExpressionInfo(TextAnalysis.getClass.getName, name),
     (args: Seq[Expression]) => {
       require(args.length == 1, s"$name expects exactly 1 argument")
       ColumnBridge.resolvableExpression(f(ColumnBridge.column(args.head)))
     })

  /** (identifier, info, builder) triples — shared by the extension and
    * the imperative registrar.
    */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
     new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
     (args: Seq[Expression]) => VecDot(args(0), args(1))),
    // the curation text devices (p07/p74/p02/p08's building blocks)
    unary("lang_guess", TextAnalysis.langGuessOf),
    unary("quality_score", TextAnalysis.qualityScore),
    unary("doc_fingerprint", TextAnalysis.fingerprint),
    unary("ws_tokens", TextAnalysis.wsTokenCount),
    (FunctionIdentifier("shingles"),
     new ExpressionInfo(TextAnalysis.getClass.getName, "shingles"),
     (args: Seq[Expression]) => {
       require(args.length == 2 && args(1).foldable,
         "shingles(text, n) expects a literal shingle width")
       val v = args(1).eval()
       require(v.isInstanceOf[Number],
         "shingles(text, n) expects a literal INTEGER shingle width, " +
           s"got ${if (v == null) "NULL" else v.getClass.getSimpleName}")
       ColumnBridge.resolvableExpression(
         TextAnalysis.shingles(ColumnBridge.column(args.head),
           v.asInstanceOf[Number].intValue))
     }))
}
