package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Maintenance

class MaintenanceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet"))

  test("compaction collapses a small-files table, preserves data, keeps files skippable") {
    val src = Files.createTempDirectory("cmp_src").toString + "/t"
    val dst = Files.createTempDirectory("cmp_dst").toString + "/t"
    // 40 files of 25 rows each — the classic streaming-ingest mess
    (1 to 1000).map(i => (i.toLong, s"row$i")).toDF("k", "v")
      .repartition(40).write.parquet(src)
    assert(parquetFiles(src).length === 40)

    val n = Maintenance.compact(spark, src, dst, targetRowsPerFile = 250L, sortCol = "k")
    assert(n === 1000L)
    assert(parquetFiles(dst).length === 4)
    // same multiset of rows
    val a = spark.read.parquet(src).orderBy($"k").collect()
    val b = spark.read.parquet(dst).orderBy($"k").collect()
    assert(a.toSeq === b.toSeq)
    // range-clustered: per-file key ranges must not overlap
    val ranges = Maintenance.fileStats(spark, dst, "k")
      .select($"lo".cast("long"), $"hi".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlap: $hi1 >= $lo2")
      case _ =>
    }
  }

  test("fileStats manifest prunes like the reference's chunksinfo") {
    val dir = Files.createTempDirectory("stats_t").toString + "/t"
    (1 to 1000).map(_.toLong).toDF("k")
      .repartitionByRange(10, $"k").sortWithinPartitions($"k").write.parquet(dir)
    val stats = Maintenance.fileStats(spark, dir, "k").cache()
    assert(stats.count() === 10)
    assert(stats.agg(sum($"rows")).collect()(0).getLong(0) === 1000L)
    // a 150-wide key range hits at most 3 of the 10 ~100-row files
    val hit = Maintenance.filesInRange(stats, 425L, 575L)
    assert(hit.count() <= 3, s"pruning too weak: ${hit.count()} files")
    // and those files cover every matching row
    val total = spark.read.parquet(dir).filter($"k".between(425, 575)).count()
    assert(total === 151)
    stats.unpersist()
  }
}
