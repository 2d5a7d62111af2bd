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

  test("every extension description builds an evaluable expression") {
    // spark.sql.extensions is a STATIC conf read at SparkContext
    // creation, so the conf path can't be re-exercised on the shared
    // test context; Verify/Bench set it on their fresh JVMs. Here we
    // assert each injected builder yields a working expression.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import org.apache.spark.sql.catalyst.util.ArrayData
    val args = Seq(
      Literal(ArrayData.toArrayData(Array(1.0f, 2.0f)), ArrayType(FloatType)),
      Literal(ArrayData.toArrayData(Array(3.0f, 4.0f)), ArrayType(FloatType)))
    GraftExtensions.descriptions.foreach { case (ident, _, builder) =>
      val e = builder(args)
      assert(e.eval(null) === 11.0, s"function ${ident.funcName}")
    }
  }
}
