package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Pipeline11

/** Diagnostic behind the p102/p107 round budgets: per-round training
  * misclassification counts of the raw batch-perceptron trajectory on
  * the full corpus at both test SFs, plus (on the even/odd split) the
  * per-round held-out accuracy. This is the measurement that chose the
  * POCKET form over weight averaging for p107 — the full-corpus
  * trajectories oscillate without converging (sf0.1 swings 73 ↔ 733
  * misclassifications), the half-corpus trajectory converges to a
  * separable optimum at round ~37, and every averaged variant sits
  * below the raw endpoint on held-out accuracy because the first ~13
  * all-positive-basin rounds dominate the average.
  */
object PerceptronProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("perceptron-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val yCol = expr("CASE WHEN 50 * size(filter(split(text, ' '), " +
      "t -> t IN ('the','a','of','and','to'))) - " +
      "size(split(text, ' ')) >= 0 THEN 1 ELSE -1 END").as("y")

    def trajectory(docs: DataFrame, held: Option[DataFrame],
                   label: String, rounds: Int): Unit = {
      val fts = Pipeline11.featsOfProbe(docs)
        .join(docs.select(col("doc_id"), yCol), Seq("doc_id"))
        .localCheckpoint(eager = false)
      var w = fts.select(col("b")).distinct()
        .withColumn("w", lit(0L)).localCheckpoint()
      var converged = false
      for (t <- 1 to rounds if !converged) {
        val margins = fts.join(broadcast(w), Seq("b"), "left")
          .groupBy(col("doc_id"), col("y"))
          .agg(sum(col("cnt") * coalesce(col("w"), lit(0L))).as("margin"))
          .localCheckpoint()
        val nMis = margins.filter(col("y") * col("margin") <= 0).count()
        val heldAcc = held.map { h =>
          val scored = Pipeline11.perceptronScore(h, w)
            .join(h.select(col("doc_id"), yCol), Seq("doc_id")).collect()
          scored.count(r => r.getAs[Long]("pred") ==
            r.getAs[Int]("y").toLong) / scored.length.toDouble
        }
        println(f"$label round $t%2d: mis=$nMis" +
          heldAcc.map(a => f" held=$a%.4f").getOrElse(""))
        if (nMis == 0) converged = true
        else {
          val mis = margins.filter(col("y") * col("margin") <= 0)
            .select(col("doc_id"))
          val delta = fts.join(mis, Seq("doc_id"))
            .groupBy(col("b")).agg(sum(col("y") * col("cnt")).as("dw"))
          w = w.join(delta, Seq("b"), "left")
            .select(col("b"),
              (col("w") + coalesce(col("dw"), lit(0L))).as("w"))
            .localCheckpoint()
        }
      }
    }

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = graft.Tables.documents(spark, s"/root/testdata/$sf")
      trajectory(docs, None, s"$sf full", 40)
    }
    val all = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    trajectory(all.filter(col("doc_id") % 2 === 0),
      Some(all.filter(col("doc_id") % 2 === 1)), "sf0.01 half", 48)
    spark.stop()
  }
}
