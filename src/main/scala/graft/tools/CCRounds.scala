package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import graft.operators.Dedup

/** Dev diagnostic: time the two connected-component queries and print
  * how many rounds each took to converge — the number the O(log n)
  * claims (and any seeding change) must move.
  * Usage: runMain graft.tools.CCRounds [sfDir] [reps]
  */
object CCRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (r <- 1 to reps) {
      for ((name, counter) <- Seq(
            "p20_dedup_clusters" -> (() => Dedup.lastRoundsMinLabel),
            "p33_dedup_clusters_logn" -> (() => Dedup.lastRoundsLogN))) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[ccrounds] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2fs " +
          s"rounds=${counter()} rows=$n")
      }
    }
    spark.stop()
  }
}
