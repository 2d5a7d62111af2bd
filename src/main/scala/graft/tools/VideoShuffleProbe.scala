// Video-path scale probe: substantiate "signatures shuffle, pixels
// never do" with the Spark metrics bus. Renders/decodes the full
// sf-dir clip corpus, runs the temporal near-dup pipeline (p90), and
// compares the TOTAL shuffle bytes written across all its stages
// against the total payload bytes the decode walked. One-off audit
// tool (not a registered query); results recorded in BASELINE.md.
// Run: sbt "runMain graft.tools.VideoShuffleProbe"
package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

object VideoShuffleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"))

    // payload volume from the geometry formula (hd = "P6\n<w> <h>\n255\n")
    val payloadBytes = docs
      .select((col("doc_id") % 4 * 8 + 32).as("w"),
              (col("doc_id") % 5 * 8 + 24).as("h"),
              (col("doc_id") % 8 % 3 + 2).as("nf"))
      .select(((length(concat(lit("P6\n"), col("w"), lit(" "), col("h"),
          lit("\n255\n"))) + col("w") * col("h") * 3) * col("nf")).as("b"))
      .agg(sum(col("b"))).head().getLong(0)

    val shuffleW = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleW.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    val pairs = Multimodal.videoNearDupPairs(
        Multimodal.decodeVideoFrames(Multimodal.attachVideo(docs)),
        maxHamming = 3)
      .count()
    Thread.sleep(2000) // let the listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    println(f"[video-probe] clips=${docs.count()} pairs=$pairs " +
      f"payload_bytes=$payloadBytes shuffle_bytes=${shuffleW.get()} " +
      f"ratio=${payloadBytes.toDouble / shuffleW.get()}%.1f")
    spark.stop()
  }
}
