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

  test("partitioned compaction collapses per-cell ingest files, keeps pruning and answers") {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.seedCentroids(emb, 8)
    val store = Files.createTempDirectory("ivf_cmp_src").toString
    val tidy = Files.createTempDirectory("ivf_cmp_dst").toString
    // base + three small ingest batches: the small-files mess, per cell
    Similarity.ivfWrite(emb.filter($"vec_id" % 4 === 0), cents, store)
    (1L to 3L).foreach { r =>
      Similarity.ivfAppend(emb.filter($"vec_id" % 4 === r), cents, store)
    }
    def perCellFiles(p: String): Map[String, Int] =
      new java.io.File(p).listFiles.filter(_.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles.count(_.getName.endsWith(".parquet")))
        .toMap
    val before = perCellFiles(store)
    assert(before.values.max > 1, "fixture failed to accumulate small files")
    Maintenance.compactPartitioned(spark, store, tidy, "cell")
    val after = perCellFiles(tidy)
    assert(after.keySet === before.keySet, "compaction changed the cell set")
    assert(after.values.forall(_ === 1), s"cells not collapsed to one file: $after")
    // probe answers identical over the compacted store
    val q = emb.filter($"vec_id" < 5)
    def rows(p: String) = Similarity.ivfTopKStored(spark, p, q, cents, 10, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    assert(rows(tidy) === rows(store))
    // the compacted store still partition-prunes
    assert(Similarity.ivfTopKStored(spark, tidy, q, cents, 10, nProbe = 2)
      .queryExecution.executedPlan.toString.contains("dynamicpruningexpression"))
  }

  test("compactionPlan: a fresh sorted store recommends nothing; appended slivers flag every band") {
    import graft.operators.Dedup
    val docs = (0L until 60L)
      .map(i => (i, s"w${i % 7} x$i y${i % 3} common words here padding " +
        s"more filler tokens ${i % 5}"))
      .toDF("doc_id", "text")
    val store = Files.createTempDirectory("plan_store").toString + "/s"
    Dedup.lshStoreWrite(
      Dedup.lshSignatureRows(docs, "doc_id", "text"), store)
    // freshly built: one sig_h-sorted file per band — the planner must
    // recommend NOTHING (trigger quiescent right after maintenance)
    val fresh = Maintenance.compactionPlan(spark, store, "band", "sig_h")
      .collect()
    assert(fresh.nonEmpty && fresh.forall(!_.getAs[Boolean]("compact")),
      s"fresh store flagged: ${fresh.mkString(",")}")
    assert(fresh.forall(_.getAs[Long]("n_overlapping") === 0L))
    // 12 streamed appends: unsorted sliver files whose sig_h ranges all
    // span the signature space — every band must flag, on BOTH signals
    for (b <- 0 until 12) {
      Dedup.lshSignatureRows(
          docs.select(($"doc_id" + 60 * (b + 1)).as("doc_id"), $"text"),
          "doc_id", "text")
        .withColumn("ingest_batch", lit(b.toLong))
        .write.mode("append").partitionBy("band").parquet(store)
    }
    val appended = Maintenance.compactionPlan(spark, store, "band", "sig_h")
      .collect()
    assert(appended.forall(_.getAs[Boolean]("compact")),
      "a 12-append partition escaped the compaction recommendation")
    assert(appended.forall(_.getAs[Long]("n_files") === 13L))
    assert(appended.forall(_.getAs[Long]("n_overlapping") > 0L))
    // after the matching compactor runs, the planner goes quiet again
    val tidy = Files.createTempDirectory("plan_tidy").toString + "/s"
    Dedup.lshStoreCompact(spark, store, tidy)
    val after = Maintenance.compactionPlan(spark, tidy, "band", "sig_h")
      .collect()
    assert(after.nonEmpty && after.forall(!_.getAs[Boolean]("compact")))
    // rows conserved through the whole cycle
    assert(after.map(_.getAs[Long]("rows")).sum ===
      appended.map(_.getAs[Long]("rows")).sum)
  }

  test("bucketed compaction plan: fresh store clean, 12-append store flags every bucket, compaction clears it") {
    import graft.sources.Bucketed
    val n = 4
    val table = "graft_cpb_plan"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a one-file-per-bucket build (repartition on the bucket key aligns
    // task and bucket boundaries — the compactBucketed device), each
    // file key-sorted: nothing to recommend
    val df = spark.range(200).select($"id".as("k"), ($"id" * 2).as("v"))
    Bucketed.writeBucketed(df.repartition(n, $"k"), table, "k", n)
    val fresh = Maintenance.compactionPlanBucketed(spark, table, "k")
      .collect()
    assert(fresh.length === n, s"expected $n buckets, got ${fresh.length}")
    assert(fresh.forall(!_.getAs[Boolean]("compact")),
      "a freshly compacted layout was flagged")
    // 12 streamed-merge-style appends: each leaves sliver files whose
    // key ranges span the whole space — the measured 19x probe
    // pathology the trigger exists to catch
    for (b <- 1 to 12) {
      spark.range(200).select($"id".as("k"), ($"id" * 2 + b).as("v"))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .bucketBy(n, "k").sortBy("k").format("parquet").saveAsTable(table)
    }
    val flooded = Maintenance.compactionPlanBucketed(spark, table, "k")
      .collect()
    assert(flooded.forall(_.getAs[Boolean]("compact")),
      "an appended-to bucket was not flagged")
    assert(flooded.forall(_.getAs[Long]("n_files") >= 13L),
      "per-bucket file count did not grow one per append")
    assert(flooded.forall(_.getAs[Long]("n_overlapping") > 0L),
      "full-range sliver appends reported no overlap")
    // the recommendation feeds the matching compactor and clears
    Bucketed.compactBucketed(spark, table, "k", n)
    val after = Maintenance.compactionPlanBucketed(spark, table, "k")
      .collect()
    assert(after.length === n &&
      after.forall(!_.getAs[Boolean]("compact")),
      "compaction did not clear the recommendation")
    assert(after.map(_.getAs[Long]("rows")).sum ===
      flooded.map(_.getAs[Long]("rows")).sum,
      "rows not conserved through the cycle")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
