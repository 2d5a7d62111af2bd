package graft.operators

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity core: the distributed existence query over a
  * range-partitioned wordlist — the entire capability of
  * `afx07/optimal-bruteforce-hadoop`, rebuilt Spark-first (SURVEY.md §2
  * O1–O6, §7.1).
  *
  * Mapping (reference cite → here):
  *  - chunk metadata `id=<lo><hi>` (`chunksinfo.txt`, parsed at
  *    `server.go:376-391`)            → [[parseChunkInfo]] / [[ChunkRange]]
  *  - partition pruning on the first char (`server.go:399-411`, the
  *    "optimal" — lowercased probe, inclusive containment, overlapping
  *    ranges produce multi-chunk fan-out)  → [[requiredChunks]]
  *  - line scan + bytewise equality (`slave.go:68-105`, `slave.go:85`)
  *                                    → `textFile(...).filter(===)`
  *  - per-partition short-circuit + master OR + sibling abort
  *    (`slave.go:81-104`, `server.go:277-303`)
  *                                    → `take(1)`/`isEmpty`: Spark's
  *    CollectLimitExec scans partitions incrementally and stops the job
  *    at the first hit — O4+O5+O6 in one builtin.
  *
  * Intentional divergences (SURVEY.md §2 quirks): dead-task "miss"
  * semantics (Q6) are replaced by Spark task retry/recompute (exact
  * answers); the single-digit id limit (Q2) and the shared abort-flag
  * race (Q7) are artifacts and not replicated.
  *
  * Scale: the layout is Hive-partitioned (`bucket=<id>/`), so at 100 TB
  * the pruned read lists only the matching buckets' files — the scan
  * cost is proportional to the pruned fraction, and within a bucket
  * Spark splits files across executors. Pruning happens at path
  * selection (driver metadata only) exactly like the reference's master,
  * but the scan+filter runs as whole-stage codegen over file splits.
  */
object WordlistSearch {

  /** Inclusive first-character range of one chunk (overlaps allowed —
    * boundary characters legitimately map to two chunks, SURVEY Q3).
    */
  case class ChunkRange(id: Int, lo: Char, hi: Char) {
    def contains(c: Char): Boolean = lo <= c && c <= hi
  }

  /** Parse `id=<lo><hi>` metadata lines (chunksinfo.txt format). */
  def parseChunkInfo(lines: Seq[String]): Seq[ChunkRange] =
    lines.filter(_.contains("=")).map { line =>
      val Array(id, range) = line.split("=", 2)
      ChunkRange(id.trim.toInt, range.charAt(0), range.charAt(1))
    }

  /** O3 — the reference's only optimization: chunks whose range contains
    * the LOWERCASED first character of the probe (`server.go:400` — the
    * probe is lowercased, the row filter is not; Q1 case asymmetry kept
    * deliberately). Sound (superset), not minimal, under overlaps.
    */
  def requiredChunks(ranges: Seq[ChunkRange], pw: String): Seq[Int] =
    if (pw.isEmpty) Seq.empty
    else {
      val c = pw.toLowerCase.charAt(0)
      ranges.filter(_.contains(c)).map(_.id)
    }

  /** Test/fixture writer: place each word in the FIRST bucket whose
    * range contains its (lowercased) first char — boundary words land in
    * the lower bucket, which the pruning fan-out must still find.
    */
  def writeBucketed(words: Seq[String], ranges: Seq[ChunkRange], base: String): Unit = {
    val byBucket = words.groupBy { w =>
      val c = w.toLowerCase.charAt(0)
      ranges.find(_.contains(c)).map(_.id).getOrElse(ranges.last.id)
    }
    ranges.foreach { r =>
      val dir = Paths.get(base, s"bucket=${r.id}")
      Files.createDirectories(dir)
      val content = byBucket.getOrElse(r.id, Seq.empty).mkString("\n")
      Files.write(dir.resolve("part-0.txt"), content.getBytes(StandardCharsets.UTF_8))
    }
  }

  /** The pruned scan as a DataFrame — only the required buckets' paths
    * are ever listed or read (verifiable via `inputFiles`).
    */
  def prunedScan(spark: SparkSession, base: String,
                 ranges: Seq[ChunkRange], pw: String): DataFrame = {
    val ids = requiredChunks(ranges, pw)
    if (ids.isEmpty) spark.emptyDataFrame.withColumn("value", lit(""))
    else spark.read.textFile(ids.map(id => s"$base/bucket=$id"): _*).toDF()
  }

  /** Q_ref(password): `SELECT EXISTS(SELECT 1 FROM wordlist WHERE
    * candidate = :pw)` with pruning + early termination. Case-SENSITIVE
    * row filter over case-INSENSITIVE pruning, like the reference.
    */
  def exists(spark: SparkSession, base: String,
             ranges: Seq[ChunkRange], pw: String): Boolean =
    !prunedScan(spark, base, ranges, pw)
      .filter(col("value") === lit(pw))
      .isEmpty

  /** The generalized form: all matches with their source file (the
    * reference's per-chunk verdict, O4 partial phase, kept as data).
    */
  def find(spark: SparkSession, base: String,
           ranges: Seq[ChunkRange], pw: String): DataFrame =
    prunedScan(spark, base, ranges, pw)
      .filter(col("value") === lit(pw))
      .select(col("value"), input_file_name().as("source_file"))
}
