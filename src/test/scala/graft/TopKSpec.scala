package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.TopK

class TopKSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  val df = Seq(
    ("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 9.0, 3L), ("a", 1.0, 4L),
    ("b", 2.0, 5L), ("b", 3.0, 6L),
    ("c", 7.0, 7L)
  ).toDF("g", "v", "id").repartition(4) // force multi-partition partials + merge

  test("topk agg matches the window-rank form, ties broken by struct order") {
    val got = df.groupBy($"g")
      .agg(TopK.topk(struct($"v", $"id"), 2).as("top"))
      .select($"g", posexplode($"top").as(Seq("i", "t")))
      .select($"g", $"i", $"t.v", $"t.id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSet
    // largest (v, id) structs first: for g=a ties on v=9.0 -> larger id wins rank 0
    assert(got === Set(
      ("a", 0, 9.0, 3L), ("a", 1, 9.0, 2L),
      ("b", 0, 3.0, 6L), ("b", 1, 2.0, 5L),
      ("c", 0, 7.0, 7L)))
  }

  test("topk buffer survives serialization across shuffle (distinct agg forces it)") {
    // countDistinct alongside forces the ObjectHashAggregate fallback /
    // buffer serialize path through the exchange
    val got = df.groupBy($"g")
      .agg(TopK.topk(struct($"v", $"id"), 1).as("top"), countDistinct($"id").as("nd"))
      .select($"g", element_at($"top", 1).getField("id").as("top_id"), $"nd")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("a", 3L, 4L), ("b", 6L, 2L), ("c", 7L, 1L)))
  }

  test("k larger than group size returns the whole group sorted") {
    val got = df.filter($"g" === "b").groupBy($"g")
      .agg(TopK.topk(struct($"v", $"id"), 10).as("top"))
      .select(size($"top")).head().getInt(0)
    assert(got === 2)
  }
}
