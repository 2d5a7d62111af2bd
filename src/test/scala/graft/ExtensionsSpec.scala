package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftext.ColumnBridge

class ExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("vec_dot is callable from SQL after registration") {
    ColumnBridge.registerFunctions(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
  }

  test("vec_dot's description builds an evaluable expression") {
    // spark.sql.extensions is a STATIC conf read at SparkContext
    // creation, so the conf path can't be re-exercised on the shared
    // test context; Verify/Bench set it on their fresh JVMs. Here we
    // assert the injected builder yields a working expression.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import org.apache.spark.sql.catalyst.util.ArrayData
    val args = Seq(
      Literal(ArrayData.toArrayData(Array(1.0f, 2.0f)), ArrayType(FloatType)),
      Literal(ArrayData.toArrayData(Array(3.0f, 4.0f)), ArrayType(FloatType)))
    val builder = GraftExtensions.descriptions
      .find(_._1.funcName == "vec_dot").get._3
    assert(builder(args).eval(null) === 11.0)
  }

  test("the text devices answer identically through SQL and the Column API") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.functions.TextAnalysis
    ColumnBridge.registerFunctions(spark)
    val t = "the quick brown fox and the lazy dog of the fence the the"
    val sql = spark.sql(
      s"""SELECT lang_guess('$t') AS lg, quality_score('$t') AS qs,
         |       doc_fingerprint('$t') AS fp, ws_tokens('$t') AS wt,
         |       shingles('$t', 5) AS sh""".stripMargin).head()
    val want = spark.range(1).select(
      TextAnalysis.langGuessOf(lit(t)).as("lg"),
      TextAnalysis.qualityScore(lit(t)).as("qs"),
      TextAnalysis.fingerprint(lit(t)).as("fp"),
      TextAnalysis.wsTokenCount(lit(t)).as("wt"),
      TextAnalysis.shingles(lit(t), 5).as("sh")).head()
    assert(sql === want)
    assert(sql.getAs[String]("lg") === "en")
    assert(sql.getAs[Int]("wt") === 13)
    // and over a real table through the Engine.sql front door
    val n = Engine.sql(spark, "/root/testdata/sf0.001",
      "SELECT doc_id FROM documents WHERE lang_guess(text) = 'en'").count()
    assert(n > 0)
  }
}
