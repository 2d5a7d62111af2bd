package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source/sink format matrix: every format the engine reads/writes
  * round-trips losslessly (schema via explicit read schema for the
  * schemaless formats). Parquet is exercised everywhere else; this
  * pins csv, json, and text.
  */
class FormatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  val df = Seq((1L, "alpha beta", 1.5), (2L, "gamma, with comma", -0.25),
    (3L, "", 0.0)).toDF("id", "txt", "score")

  test("csv round-trip with header and quoting") {
    val dir = Files.createTempDirectory("fmt_csv").toString + "/out"
    df.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema("id LONG, txt STRING, score DOUBLE").csv(dir)
      .na.fill("", Seq("txt")) // csv writes empty string as null
      .orderBy($"id")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      === df.orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq)
  }

  test("orc round-trip with predicate pushdown") {
    val dir = Files.createTempDirectory("fmt_orc").toString + "/out"
    df.write.orc(dir)
    val back = spark.read.orc(dir).orderBy($"id")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      === df.orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq)
    // filters reach the ORC scan just like parquet
    val plan = spark.read.orc(dir).filter($"id" > 1L)
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]].*"),
      "no pushed filter on ORC scan")
  }

  test("json lines round-trip") {
    val dir = Files.createTempDirectory("fmt_json").toString + "/out"
    df.write.json(dir)
    val back = spark.read.schema("id LONG, txt STRING, score DOUBLE").json(dir)
      .orderBy($"id")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      === df.orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq)
  }

  test("text round-trip (single value column, the wordlist format)") {
    val dir = Files.createTempDirectory("fmt_text").toString + "/out"
    val words = Seq("apple", "banana", "cherry").toDF("value")
    words.write.text(dir)
    val back = spark.read.textFile(dir).toDF()
    assert(back.collect().map(_.getString(0)).sorted.toSeq
      === Seq("apple", "banana", "cherry"))
  }

  test("parquet schema evolution: old files readable after a column is added") {
    val dir = Files.createTempDirectory("fmt_evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "txt").write.parquet(dir)
    Seq((2L, "b", 0.5)).toDF("id", "txt", "score")
      .write.mode("append").parquet(dir)
    val back = spark.read.option("mergeSchema", "true").parquet(dir).orderBy($"id")
    assert(back.columns.toSeq === Seq("id", "txt", "score"))
    val rows = back.collect()
    assert(rows(0).isNullAt(2), "old-file row must surface null for the new column")
    assert(rows(1).getDouble(2) === 0.5)
  }
}
