package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WordlistSearch._

/** Reference-semantics tests (SURVEY.md §5.2/§5.3): hit, boundary
  * fan-out, miss, case asymmetry (Q1), pruning soundness + provable
  * non-read of pruned buckets, and a seeded property sweep
  * (exists == set membership).
  */
class WordlistSearchSpec extends AnyFunSuite with SparkTestBase {

  // mirrors /root/reference/chunksinfo.txt (low/high sentinels + overlaps)
  val ranges = Seq(
    ChunkRange(1, '\u0004', 'b'), ChunkRange(2, 'b', 'f'),
    ChunkRange(3, 'f', 'k'), ChunkRange(4, 'k', 'p'),
    ChunkRange(5, 'p', 't'), ChunkRange(6, 't', '\uFFFD'))

  val words = Seq("apple", "banana", "fig", "kiwi", "pear", "tango", "Zebra")

  lazy val base: String = {
    val dir = Files.createTempDirectory("wordlist").toString
    writeBucketed(words, ranges, dir)
    dir
  }

  test("chunksinfo parsing") {
    val parsed = parseChunkInfo(Seq("1=\u0004b", "2=bf", "3=fk"))
    assert(parsed === Seq(ChunkRange(1, '\u0004', 'b'),
      ChunkRange(2, 'b', 'f'), ChunkRange(3, 'f', 'k')))
  }

  test("hit mid-bucket") {
    assert(exists(spark, base, ranges, "apple"))
  }

  test("boundary char fans out to two chunks and still hits (Q3)") {
    assert(requiredChunks(ranges, "fig") === Seq(2, 3))
    assert(exists(spark, base, ranges, "fig"))
  }

  test("miss within a scanned bucket") {
    assert(!exists(spark, base, ranges, "durian"))
  }

  test("case asymmetry (Q1): pruning lowercases, filter is exact") {
    // corpus has lowercase "apple": uppercase probe prunes fine but fails filter
    assert(!exists(spark, base, ranges, "Apple"))
    // corpus literally contains "Zebra": uppercase probe prunes via 'z' and matches
    assert(exists(spark, base, ranges, "Zebra"))
  }

  test("empty probe returns false, scans nothing") {
    assert(requiredChunks(ranges, "") === Seq.empty)
    assert(!exists(spark, base, ranges, ""))
  }

  test("pruned buckets are provably unread") {
    val files = prunedScan(spark, base, ranges, "apple").inputFiles
    assert(files.nonEmpty && files.forall(_.contains("bucket=1")))
  }

  test("find returns provenance") {
    val rows = find(spark, base, ranges, "fig").collect()
    assert(rows.length === 1 && rows.head.getString(1).contains("bucket=2"))
  }

  test("property: exists == set membership (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    def randWord() = (1 to (1 + rnd.nextInt(8)))
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    for (trial <- 1 to 5) {
      val corpus = Seq.fill(30)(randWord()).distinct
      val dir = Files.createTempDirectory(s"wl$trial").toString
      writeBucketed(corpus, ranges, dir)
      val probes = corpus.take(5) ++ Seq.fill(5)(randWord())
      probes.foreach { p =>
        assert(exists(spark, dir, ranges, p) === corpus.contains(p),
          s"probe=$p corpus=${corpus.take(8)}...")
      }
      // pruning soundness: the pruned chunk set contains every chunk
      // whose range covers the probe's first char
      probes.foreach { p =>
        val c = p.toLowerCase.charAt(0)
        val req = requiredChunks(ranges, p).toSet
        assert(ranges.filter(_.contains(c)).map(_.id).toSet.subsetOf(req))
      }
    }
  }
}
