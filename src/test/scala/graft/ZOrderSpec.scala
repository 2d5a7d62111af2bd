package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Z-order key invariants: the mask-shift cascade must equal a
  * bit-by-bit reference interleave, and sorting by the key must
  * cluster both dimensions (the data-skipping property).
  */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Reference: interleave bit-by-bit, x at even positions. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("morton16 equals bit-by-bit reference interleave") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L), (65536L + 3L, 2L)) // x past 16 bits → masked
    val got = pts.toDF("x", "y")
      .select(ZOrder.morton16($"x", $"y").as("z"), $"x", $"y")
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) === mortonRef(r.getLong(1) & 65535L, r.getLong(2) & 65535L))
    }
  }

  /** 3-D reference: interleave bit-by-bit, x at positions ≡ 0 (mod 3). */
  private def morton3Ref(x: Long, y: Long, z: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (3 * i)) |
        (((y >> i) & 1L) << (3 * i + 1)) | (((z >> i) & 1L) << (3 * i + 2))
    }

  test("morton16x3 equals bit-by-bit reference interleave") {
    val pts = Seq((0L, 0L, 0L), (65535L, 65535L, 65535L), (1L, 2L, 4L),
      (12345L, 54321L, 4242L), (65536L + 7L, 1L, 1L))
    val got = pts.toDF("x", "y", "z")
      .select(ZOrder.morton16x3($"x", $"y", $"z").as("m"), $"x", $"y", $"z")
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) === morton3Ref(
        r.getLong(1) & 65535L, r.getLong(2) & 65535L, r.getLong(3) & 65535L))
    }
  }

  test("morton-sorted layout skips row groups for a y-only predicate; x-sorted cannot") {
    import java.nio.file.Files
    val rows = for { x <- 0 until 256; y <- 0 until 256 } yield (x.toLong, y.toLong)
    val df = rows.toDF("x", "y").withColumn("zkey", ZOrder.morton16($"x", $"y"))
    def writeSorted(sortCol: String): String = {
      val p = Files.createTempDirectory(s"zorder_$sortCol").toString
      df.repartitionByRange(16, col(sortCol)).sortWithinPartitions(sortCol)
        .write.mode("overwrite").parquet(p)
      p
    }
    // rows actually READ from parquet (post row-group skip, pre-Filter)
    def rowsScanned(path: String): Long = {
      val q = spark.read.parquet(path).filter($"y" < 16)
      assert(q.count() === 256 * 16) // same answer either layout
      val qe = q.queryExecution
      qe.executedPlan.executeCollect()
      qe.executedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get.metrics("numOutputRows").value
    }
    val zScanned = rowsScanned(writeSorted("zkey"))
    val xScanned = rowsScanned(writeSorted("x"))
    // x-sorted files each span the full y domain → stats can't skip any
    assert(xScanned === 256L * 256L, s"x-sorted unexpectedly skipped: $xScanned")
    // morton-sorted files are 64x64 tiles → only the bottom tile row survives
    assert(zScanned <= xScanned / 2, s"zorder read $zScanned of $xScanned")
  }

  test("sorting by morton key bounds both dimensions per block") {
    // 32x32 grid sorted by z-key, cut into 64 blocks of 16: each block's
    // x-range and y-range must span at most half the domain — the
    // property that makes row-group min/max prune on either column.
    val rows = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val sorted = rows.toDF("x", "y")
      .orderBy(ZOrder.morton16($"x", $"y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    sorted.grouped(16).foreach { block =>
      val (xs, ys) = block.unzip
      assert(xs.max - xs.min <= 16, s"x-spread ${xs.min}..${xs.max}")
      assert(ys.max - ys.min <= 16, s"y-spread ${ys.min}..${ys.max}")
    }
  }
}
