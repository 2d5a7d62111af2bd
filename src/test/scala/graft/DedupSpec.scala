package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // doc 1 = exact dup of 0; doc 2 = near-dup of 0 (last word changed);
  // doc 3 = permuted+repeated tokens of 0 (fingerprint dup, not exact);
  // doc 4 = unrelated; doc 5 = near-dup of 4 (one word changed mid-doc)
  val docs = Seq(
    (0L, "alpha bravo charlie delta echo foxtrot golf hotel india juliett"),
    (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliett"),
    (2L, "alpha bravo charlie delta echo foxtrot golf hotel india kilo"),
    (3L, "juliett india hotel golf foxtrot echo delta charlie bravo alpha alpha"),
    (4L, "lima mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu one two three four five"),
    (5L, "lima mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu one two three four CHANGED")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .filter($"n_copies" > 1).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("keep_id") === 0L)
    assert(r.head.getAs[Long]("n_copies") === 2L)
  }

  test("fingerprint dedup catches permutation+repetition variants") {
    val fp = Dedup.byFingerprint(docs, "doc_id", "text")
    val cluster = fp.filter($"n_copies" >= 3).collect()
    // docs 0,1,3 share the sorted-distinct token set
    assert(cluster.length === 1 && cluster.head.getAs[Long]("keep_id") === 0L
      && cluster.head.getAs[Long]("n_copies") === 3L)
  }

  test("ngram jaccard finds near-dup pairs with exact similarity") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // docs 0/2 (10 words): 6 5-grams each, 5 shared -> 5/7
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 2L && math.abs(j - 0.7143) < 1e-9 })
    // identical docs 0/1: jaccard 1.0
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 1L && j == 1.0 })
    // near-dup long docs 4/5 share most shingles
    assert(pairs.exists { case (a, b, _) => a == 4L && b == 5L })
    // unrelated docs never pair
    assert(!pairs.exists { case (a, b, _) => a <= 3L && b >= 4L })
  }

  test("minhash LSH surfaces true near-dups and skips unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))   // identical: all bands collide
    assert(pairs.contains((4L, 5L)))   // 15/16 shingles shared
    assert(!pairs.exists { case (a, b) => a <= 3L && b >= 4L })
  }

  test("simhash: near-identical docs land within hamming threshold") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val zeroOne = pairs.find(p => p._1 == 0L && p._2 == 1L)
    assert(zeroOne.nonEmpty && zeroOne.get._3 === 0) // identical docs: distance 0
    val fourFive = pairs.find(p => p._1 == 4L && p._2 == 5L)
    assert(fourFive.nonEmpty && fourFive.get._3 <= 10) // 1 of 20 words changed
  }

  test("dedupClusters resolves chains and leaves singletons canonical") {
    import spark.implicits._
    val vs = (0L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // chain 0-1-2-3 (diameter 3, needs multiple propagation rounds),
    // pair 5-7, singletons 4,6,8,9
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 7L)).toDF("d1", "d2")
    val got = Dedup.dedupClusters(vs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 5L, 6L -> 6L, 7L -> 5L, 8L -> 8L, 9L -> 9L))
  }

  test("simhash signature is deterministic across runs") {
    val a = Dedup.simhash(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(_.getLong(1)).toSeq
    val b = Dedup.simhash(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(_.getLong(1)).toSeq
    assert(a === b)
  }

  test("maxDf / maxBucket caps only SHRINK the candidate pair sets") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val jacAll = pairSet(
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.1))
    val jacCap = pairSet(
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.1,
        maxDf = 3))
    assert(jacCap.subsetOf(jacAll), "capped Jaccard pairs are not a subset")
    val lshAll = pairSet(Dedup.minhashLshPairs(corpus, "doc_id", "text"))
    val lshCap = pairSet(Dedup.minhashLshPairs(corpus, "doc_id", "text",
      maxBucket = 2))
    assert(lshCap.subsetOf(lshAll), "capped LSH candidates are not a subset")
    assert(lshCap.size < lshAll.size || lshAll.isEmpty,
      "cap of 2 should bite on a corpus with wider buckets")
  }

  test("dupSpans: maximal duplicated token intervals, merged and bounded") {
    import graft.operators.Pipeline5
    // doc 10 and 11 share a 12-token run (tokens 0..11 of doc 10 appear
    // at offset 3 of doc 11); doc 12 is all-fresh prose
    val shared = (1 to 12).map(n => s"tok$n").mkString(" ")
    val spanDocs = Seq(
      (10L, s"$shared t a i l one two three"),
      (11L, s"pre amble here $shared"),
      (12L, "totally fresh words with no repeats whatsoever in this doc at all"))
      .toDF("doc_id", "text")
    val got = Pipeline5.dupSpansOf(spanDocs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // a 12-token shared run with window 10 = 3 overlapping windows,
    // merged into ONE span covering tokens [0,11] / [3,14]
    assert(got.toSeq === Seq((10L, 0, 11, 3L), (11L, 3, 14, 3L)),
      s"got ${got.toSeq}")
  }

  test("fuzzyKeyPairs: exactly the Levenshtein<=1 pairs, including every edit kind") {
    import graft.operators.Dedup
    val rows = Seq(
      (1L, "spark query"),  // base
      (2L, "spark query"),  // equal             -> lev 0
      (3L, "spork query"),  // substitution      -> lev 1
      (4L, "spark querys"), // insertion at end  -> lev 1
      (5L, "spak query"),   // deletion          -> lev 1
      (6L, "sparq kuery"),  // two edits         -> excluded
      (7L, "aab"),          // repeated-adjacent chars: dup deletion variants
      (8L, "ab"),           // lev 1 from 7
      (9L, "zzzzzz")        // isolated
    ).toDF("doc_id", "k")
    val got = Dedup.fuzzyKeyPairs(rows, "doc_id", "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // driver-side brute force over the same keys
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val keys = rows.collect().map(r => r.getLong(0) -> r.getString(1))
    val brute = (for {
      (a, ka) <- keys; (b, kb) <- keys if a < b
      l = lev(ka, kb) if l <= 1
    } yield (a, b, l)).toSet
    assert(got === brute, "blocking lost or invented pairs vs brute force")
    assert(brute.contains((1L, 3L, 1)) && brute.contains((1L, 4L, 1)) &&
      brute.contains((1L, 5L, 1)) && brute.contains((1L, 2L, 0)) &&
      brute.contains((7L, 8L, 1)) && !brute.exists(p => p._1 == 6L || p._2 == 6L))
    assert(!got.exists(p => p._1 == p._2), "self-pair leaked from dup variants")
  }

  test("dupSpans: the xxhash64 scale variant emits identical spans to the md5 oracle form") {
    import graft.operators.Pipeline5
    // real corpus — on any collision-free input the two hashes induce
    // the same repeated-window set, hence bit-identical span output
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val md5Spans = Pipeline5.dupSpansOf(docs).collect().map(_.toSeq)
    val xxSpans = Pipeline5.dupSpansOfXx(docs).collect().map(_.toSeq)
    assert(md5Spans.nonEmpty, "fixture corpus has no duplicated spans to compare")
    assert(xxSpans.toSeq === md5Spans.toSeq, "hash choice changed the span output")
  }

  test("p67: near-dup clusters never straddle the train/eval boundary") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 5, numHashes = 16, bands = 4)
    val split = Dedup.leakFreeSplit(docs, "doc_id", pairs, evalPct = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(split.length === 6)
    // one side per cluster — the property the op exists for
    split.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"cluster $canon split across sides: $members")
    }
    // and the side is a pure function of the canonical id: recompute it
    val expected = split.map(_._2).distinct.map { canon =>
      val bucket = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(canon.toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString.take(7), 16) % 100
      canon -> (if (bucket < 50) "eval" else "train")
    }.toMap
    split.foreach { case (id, canon, side) =>
      assert(side === expected(canon), s"doc $id side != hash(cluster $canon)")
    }
  }

  test("span family coherence: p52's coverage and p54's cuts agree with p51's spans") {
    import graft.operators.Pipeline5
    val dir = "/root/testdata/sf0.001"
    val cov = Pipeline5.dupSpanCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap  // doc -> (dl, dup_tokens)
    val cut = Pipeline5.applySpanCuts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(cut.nonEmpty && cut.length === cov.size)
    val texts = graft.Tables.documents(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    cut.foreach { case (id, clean, nKept) =>
      val (dl, dupTokens) = cov(id)
      // the cut removes exactly the covered tokens
      assert(nKept + dupTokens === dl.toLong,
        s"doc $id: kept $nKept + dup $dupTokens != dl $dl")
      // zero coverage <=> text unchanged
      if (dupTokens == 0L) assert(clean === texts(id), s"doc $id mutated")
      else assert(clean !== texts(id), s"doc $id should have been trimmed")
    }
  }

  test("stored LSH probe: the broadcast fallback (oversized batch) matches the literal plan") {
    // the probe-literal contract: up to MaxProbeLiterals query sigs
    // plan as pushed literals; above, the SAME semantics must come out
    // of the broadcast-join fallback — forced here via maxLiterals = 0
    val store = java.nio.file.Files.createTempDirectory("lsh_fb").toString
    Dedup.lshStoreWrite(Dedup.lshSignatureRows(docs, "doc_id", "text"), store)
    val sigs = Dedup.lshSignatureRows(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val lit = Dedup.lshProbeStored(spark, store, sigs)
      .orderBy($"qid", $"doc_id").collect().map(_.toSeq).toSeq
    val fb = Dedup.lshProbeStored(spark, store, sigs, maxLiterals = 0)
    assert(lit.nonEmpty &&
      fb.orderBy($"qid", $"doc_id").collect().map(_.toSeq).toSeq === lit,
      "fallback path diverged from the literal plan")
    // graceful degradation, not abdication: the band prune must stay a
    // static partition filter and the probe side must broadcast
    val plan = fb.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*band[^\\]]*IN.*"),
      "fallback lost the band partition prune")
    assert(plan.contains("BroadcastHashJoin"),
      "fallback probe frame no longer broadcasts")
  }

  test("label store: incremental folds equal the from-scratch contraction; untouched buckets stay byte-identical") {
    import graft.operators.LabelStore
    val path = java.nio.file.Files
      .createTempDirectory("graft_lblstore").toString
    // batch 0: two 2-clusters {10,11} and {20,21}, singletons 12/30
    val b0 = Seq(10L, 11L, 12L, 20L, 21L, 30L).toDF("doc_id")
    val p0 = Seq((10L, 11L), (20L, 21L)).toDF("d1", "d2")
    LabelStore.write(Dedup.dedupClusters(b0, "doc_id", p0), path)
    def files(lb: Long) = new java.io.File(s"$path/lb=$lb")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    val bucket30Before = files(30L % LabelStore.LabelBuckets)
    // batch 1 exercises BOTH hard cases: doc 15 bridges the two stored
    // clusters (component MERGE — old canonical 20 must rewrite to the
    // union minimum 10), and doc 5 pairs with stored singleton 12 (a
    // LATE-ARRIVING smaller minimum — old canonical 12 rewrites to 5);
    // doc 40 arrives pairless
    val b1 = Seq(15L, 40L, 5L).toDF("doc_id")
    val p1 = Seq((15L, 11L), (15L, 21L), (5L, 12L)).toDF("d1", "d2")
    LabelStore.update(spark, path, b1, p1)
    def labels = LabelStore.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = labels
    val union = b0.union(b1)
    val want = Dedup.dedupClusters(union, "doc_id", p0.union(p1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want, "incremental fold diverged from from-scratch")
    assert(got(21L) === 10L && got(15L) === 10L, "merge missed the union minimum")
    assert(got(12L) === 5L, "late smaller minimum did not rewrite its component")
    assert(got(40L) === 40L && got(30L) === 30L)
    // doc 30's bucket held no affected or new row — dynamic overwrite
    // must have left its files alone
    assert(files(30L % LabelStore.LabelBuckets) === bucket30Before,
      "an untouched bucket was rewritten")
    // a pairless batch is a pure append
    LabelStore.update(spark, path, Seq(50L).toDF("doc_id"),
      Seq.empty[(Long, Long)].toDF("d1", "d2"))
    val after = labels
    assert(after(50L) === 50L && (after - 50L) === got,
      "a pairless append changed existing labels")
    // weights refresh from the store alone and match p118's device on
    // the same label table
    val w = LabelStore.weightsFromStore(spark, path).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(w(21L) === ((5L, 200000L)), // {10,11,15,20,21}
      "merged 5-cluster weight wrong")
    assert(w(12L) === ((2L, 500000L)) && w(50L) === ((1L, 1000000L)))
    // updates rewrite whole buckets as one task each, so the layout
    // never fragments — no compactor needed for this store family
    val buckets = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("lb="))
    assert(buckets.nonEmpty && buckets.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) === 1),
      "an update left more than one file in a bucket")
  }

  test("label store: re-folding a delivered batch is a content no-op (at-least-once replay)") {
    // foreachBatch is at-least-once: a crash after the fold but before
    // the ingest marker re-delivers the batch, so fold∘fold must equal
    // fold — the replayed ids anti-join away against their stored rows
    // instead of appending duplicate conflicting labels
    import graft.operators.LabelStore
    val path = java.nio.file.Files
      .createTempDirectory("graft_lbl_replay").toString
    val b0 = Seq(10L, 11L, 12L, 20L).toDF("doc_id")
    LabelStore.write(
      Dedup.dedupClusters(b0, "doc_id", Seq((10L, 11L)).toDF("d1", "d2")),
      path)
    val b1 = Seq(15L, 40L).toDF("doc_id")
    val p1 = Seq((15L, 11L), (15L, 20L)).toDF("d1", "d2")
    LabelStore.update(spark, path, b1, p1)
    def snapshot = LabelStore.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val once = snapshot
    LabelStore.update(spark, path, b1, p1) // the replay
    assert(snapshot === once,
      "re-folding the same batch changed the store")
    assert(once.map(_._1).distinct.size === once.size,
      "replay left duplicate doc_id rows")
    val w = LabelStore.weightsFromStore(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(w(15L) === 250000L, // {10,11,15,20}
      "weights corrupted by the replayed fold")
  }

  test("label store: re-writing a path with a different bucket count refreshes the memo") {
    // the per-JVM bucket memo must track write(): a rewrite of an
    // existing path with a new nBuckets previously left later updates
    // on the stale modulus — endpoint lookups pruned to the WRONG
    // buckets, silently missing stored endpoints (a stored doc would be
    // treated as new and its component mislabeled)
    import graft.operators.LabelStore
    val path = java.nio.file.Files
      .createTempDirectory("graft_lbl_memo").toString
    val init = Seq((3L, 3L), (7L, 3L)).toDF("doc_id", "canonical")
    LabelStore.write(init, path, nBuckets = 4)
    // touch the store so the memo caches 4
    LabelStore.update(spark, path, Seq(50L).toDF("doc_id"),
      spark.emptyDataFrame.withColumn("d1", lit(0L))
        .withColumn("d2", lit(0L)).limit(0))
    // rewrite the SAME path with a different layout
    LabelStore.write(init, path, nBuckets = 8)
    // under a stale memo=4, endpoint 7 would be probed in lb=3 while
    // its row now lives in lb=7 — missed, so (100,7) would contract to
    // canonical 7 instead of joining 3's component
    LabelStore.update(spark, path, Seq(100L).toDF("doc_id"),
      Seq((100L, 7L)).toDF("d1", "d2"))
    val lbl = LabelStore.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(100L) === 3L,
      "stale bucket memo misrouted the endpoint lookup after a re-write")
    // and the new rows landed under the new modulus (lb = id mod 8)
    assert(new java.io.File(s"$path/lb=${100L % 8}").exists(),
      "batch row not routed by the re-written layout's bucket count")
  }

  test("label store: remove(ids) equals a from-scratch rebuild of the surviving corpus") {
    import graft.operators.LabelStore
    val path = java.nio.file.Files
      .createTempDirectory("graft_lbl_remove").toString
    // components: {1,2,3} chained 1-2-3 (2 is the BRIDGE), {10,11},
    // {20} singleton, {5,21} sharing bucket 5 (nBuckets=16: 21%16=5),
    // plus loose singletons
    val ids = Seq(1L, 2L, 3L, 5L, 10L, 11L, 20L, 21L, 33L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 21L))
      .toDF("d1", "d2")
    LabelStore.write(LabelStore.labelsFor(ids, pairs), path)
    // remove: the bridge 2 (splits {1,2,3} into {1},{3}), canonical 10
    // (forces {11}'s relabel), BOTH of bucket-5's docs (empties lb=5),
    // and an id never stored (no-op member)
    val rm = Seq(2L, 10L, 5L, 21L, 999L).toDF("doc_id")
    // the evidence-source contract: pairs among survivors — here the
    // full surviving pair relation (edges touching removed docs are
    // filtered by remove itself)
    LabelStore.remove(spark, path, rm, pairs)
    val got = LabelStore.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // from-scratch rebuild of the surviving corpus
    val surv = Seq(1L, 3L, 11L, 20L, 33L).toDF("doc_id")
    val survPairs = pairs.filter(!col("d1").isin(2L, 10L, 5L, 21L) &&
      !col("d2").isin(2L, 10L, 5L, 21L))
    val want = LabelStore.labelsFor(surv, survPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === want, "remove diverged from the from-scratch rebuild")
    assert(got.find(_._1 == 1L).get._2 === 1L &&
      got.find(_._1 == 3L).get._2 === 3L,
      "bridge removal did not split the component")
    assert(got.find(_._1 == 11L).get._2 === 11L,
      "removing the canonical did not relabel the survivor")
    // the emptied bucket is DELETED, not silently kept (dynamic
    // overwrite cannot empty a partition — the manifest prune does)
    assert(!new java.io.File(s"$path/lb=5").exists(),
      "emptied bucket survived the removal with stale rows")
    // removing only absent ids is a no-op
    val before = got
    LabelStore.remove(spark, path, Seq(999L).toDF("doc_id"), pairs)
    assert(LabelStore.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq === before,
      "no-op removal changed the store")
    // PARTIAL evidence splits conservatively, never invents a merge:
    // removing 33 with EMPTY evidence relabels nothing it shouldn't
    LabelStore.remove(spark, path, Seq(33L).toDF("doc_id"),
      pairs.limit(0))
    val after = LabelStore.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(after === before.filterNot(_._1 == 33L),
      "singleton removal under empty evidence touched other rows")
  }

  test("label store: remove crash between stage and overwrite recovers to the intended state") {
    import graft.operators.LabelStore
    val a = java.nio.file.Files
      .createTempDirectory("graft_lbl_rmcrash_a").toString
    val b = java.nio.file.Files
      .createTempDirectory("graft_lbl_rmcrash_b").toString
    val ids = Seq(1L, 2L, 3L, 5L, 21L, 40L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 21L)).toDF("d1", "d2")
    LabelStore.write(LabelStore.labelsFor(ids, pairs), a)
    LabelStore.write(LabelStore.labelsFor(ids, pairs), b)
    val rm = Seq(2L, 5L, 21L).toDF("doc_id") // split + emptied bucket
    LabelStore.remove(spark, a, rm, pairs) // the uninterrupted twin
    // the interrupted one: stage lands (marker committed), overwrite
    // never runs — recover must replay overwrite AND the bucket prune
    assert(LabelStore.stageRemove(spark, b, rm, pairs))
    intercept[IllegalArgumentException] { LabelStore.read(spark, b) }
    assert(LabelStore.recover(spark, b), "recover found nothing to do")
    def labels(p: String) = LabelStore.read(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(labels(b) === labels(a),
      "recovered removal diverged from the uninterrupted one")
    assert(!new java.io.File(s"$b/lb=5").exists(),
      "recovery skipped the emptied-bucket prune")
    assert(!LabelStore.recover(spark, b), "second recover was not a no-op")
  }

  test("label store: crash between stage and overwrite recovers to the intended state") {
    import graft.operators.LabelStore
    val a = java.nio.file.Files
      .createTempDirectory("graft_lbl_crash_a").toString
    val b = java.nio.file.Files
      .createTempDirectory("graft_lbl_crash_b").toString
    val b0 = Seq(10L, 11L, 12L, 20L, 21L, 30L).toDF("doc_id")
    val p0 = Seq((10L, 11L), (20L, 21L)).toDF("d1", "d2")
    val init = Dedup.dedupClusters(b0, "doc_id", p0).localCheckpoint()
    LabelStore.write(init, a)
    LabelStore.write(init, b)
    val b1 = Seq(15L, 5L).toDF("doc_id")
    val p1 = Seq((15L, 11L), (15L, 21L), (5L, 12L)).toDF("d1", "d2")
    LabelStore.update(spark, a, b1, p1) // the uninterrupted run
    // store B: stage lands, then the process dies mid-overwrite — one
    // affected bucket is already gone, others not yet rewritten
    assert(LabelStore.stageUpdate(spark, b, b1, p1))
    // doc 20's bucket is affected (its canonical rewrites to the union
    // minimum) — losing it mid-overwrite is the half-rewritten state
    val bucket20 = new java.io.File(
      s"$b/lb=${20L % LabelStore.LabelBuckets}")
    bucket20.listFiles().foreach(_.delete()); bucket20.delete()
    // a dirty stage must fail LOUDLY on read and on a new fold — a
    // half-rewritten store silently read or re-folded compounds the
    // damage
    intercept[IllegalArgumentException] { LabelStore.read(spark, b) }
    intercept[IllegalArgumentException] {
      LabelStore.update(spark, b, Seq(99L).toDF("doc_id"),
        Seq.empty[(Long, Long)].toDF("d1", "d2"))
    }
    assert(LabelStore.recover(spark, b), "recover found nothing to do")
    def labels(p: String) = LabelStore.read(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(labels(b) === labels(a),
      "recovered store diverged from the uninterrupted update")
    assert(!LabelStore.recover(spark, b), "second recover was not a no-op")
    // a stage WITHOUT the committed marker means the crash hit
    // mid-stage-write: the store was never touched — recover just
    // drops the stage and the deterministic update re-runs
    val before = labels(b)
    val dirtyStage = new java.io.File(s"${b}__updstage")
    dirtyStage.mkdirs()
    assert(LabelStore.recover(spark, b))
    assert(labels(b) === before,
      "recover of an uncommitted stage changed the store")
  }

  test("stored LSH probe, DataFrame form: matches the literal plan and keeps the band prune") {
    // the no-driver-collect spelling (the verified gate's oversized
    // path): same candidates as the literal probe, band prune intact
    val store = java.nio.file.Files.createTempDirectory("lsh_df").toString
    Dedup.lshStoreWrite(Dedup.lshSignatureRows(docs, "doc_id", "text"), store)
    val sigRows = Dedup.lshSignatureRows(docs, "doc_id", "text")
    val sigs = sigRows.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val lit = Dedup.lshProbeStored(spark, store, sigs)
      .orderBy($"qid", $"doc_id").collect().map(_.toSeq).toSeq
    val dfp = Dedup.lshProbeStoredDF(spark, store, sigRows)
    assert(lit.nonEmpty &&
      dfp.orderBy($"qid", $"doc_id").collect().map(_.toSeq).toSeq === lit,
      "DataFrame probe diverged from the literal plan")
    val plan = dfp.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*band[^\\]]*IN.*"),
      "DataFrame probe lost the band partition prune")
  }

  test("p126 at partial probe: incremental vector clusters REFINE the full-probe clusters") {
    // the IVF recall trade as a checked invariant: a narrower probe
    // can only MISS merges (pairs hiding in unprobed cells), never
    // invent them — so every partial-probe cluster must sit inside one
    // full-probe (exact) cluster, i.e. the partial labeling is a
    // refinement of the registered one
    import graft.operators.Pipeline14
    val d = "/root/testdata/sf0.001"
    def labelsAt(np: Int): Map[Long, Long] =
      Pipeline14.incrementalVectorLabelsAt(spark, d, np).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = labelsAt(8)
    val partial = labelsAt(1)
    assert(full.keySet === partial.keySet)
    // refinement: ids sharing a partial cluster share the full cluster
    partial.groupBy(_._2).foreach { case (_, members) =>
      assert(members.keys.map(full).toSet.size === 1,
        s"partial-probe cluster ${members.keys.toSeq.sorted} straddles full clusters")
    }
    // and the trade is visible on this corpus: the exact labeling has
    // at least as many merged (non-singleton) docs
    def merged(m: Map[Long, Long]) = m.count { case (id, c) => id != c }
    assert(merged(full) >= merged(partial) && merged(full) > 0,
      s"full=${merged(full)} partial=${merged(partial)}")
  }

  test("contractEdges: the driver union-find fast path equals the distributed contraction") {
    import graft.operators.LabelStore
    // chain + star + merge-through-bridge shapes, min NOT first in its
    // edge list
    val edges = Seq((9L, 4L), (4L, 7L), (30L, 31L), (31L, 32L),
      (7L, 30L), (100L, 2L), (2L, 50L)).toDF("d1", "d2")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = canon(LabelStore.contractEdges(edges))
    val dist = canon(LabelStore.contractEdges(edges, maxDriverEdges = 0L))
    assert(fast === dist, "fast path diverged from distributed contraction")
    assert(fast(32L) === 4L && fast(9L) === 4L, "chain did not reach its minimum")
    assert(fast(100L) === 2L && fast(50L) === 2L)
    assert(!fast.contains(999L) && fast.size === 9, "isolated ids must not be labeled")
  }

  test("dedupClusters/dedupClustersLogN: driver fast path equals the distributed loops") {
    // chain (diameter > 1), star, bridge-merged component, singletons —
    // the shapes whose min labels a wrong contraction gets wrong
    val vs = (0L to 40L).toDF("doc_id")
    val pairs = Seq((9L, 4L), (4L, 7L), (30L, 31L), (31L, 32L),
      (7L, 30L), (12L, 2L), (2L, 15L), (40L, 39L)).toDF("d1", "d2")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fastMin = canon(Dedup.dedupClusters(vs, "doc_id", pairs))
    val loopMin = canon(Dedup.dedupClusters(vs, "doc_id", pairs,
      maxDriverEdges = 0L))
    assert(fastMin === loopMin, "dedupClusters fast path diverged from the loop")
    val fastLog = canon(Dedup.dedupClustersLogN(vs, "doc_id", pairs))
    val loopLog = canon(Dedup.dedupClustersLogN(vs, "doc_id", pairs,
      maxDriverEdges = 0L))
    assert(fastLog === loopLog, "dedupClustersLogN fast path diverged from the loop")
    assert(fastMin === fastLog, "the two cluster devices disagree")
    assert(fastMin(32L) === 4L && fastMin(15L) === 2L && fastMin(39L) === 39L
      && fastMin(0L) === 0L, "expected min labels")
  }

  test("stageUpdate: the driver-resolved fold equals the distributed fallback") {
    import graft.operators.LabelStore
    val b0 = Seq(0L, 3L, 7L, 10L).toDF("doc_id")
    val p0 = Seq((7L, 3L)).toDF("d1", "d2")
    // batch 1 merges into stored component {3,7} through a stored
    // endpoint AND creates a fresh component — both remap shapes
    val b1 = Seq(20L, 21L, 22L).toDF("doc_id")
    val p1 = Seq((20L, 7L), (21L, 22L), (20L, 1L), (1L, 3L)).toDF("d1", "d2")
    def foldWith(maxFoldEdges: Long): Map[Long, Long] = {
      val path = java.nio.file.Files
        .createTempDirectory("graft_fold_eq_").toString
      LabelStore.write(LabelStore.labelsFor(b0, p0), path)
      assert(LabelStore.stageUpdate(spark, path, b1, p1, maxFoldEdges))
      LabelStore.recover(spark, path) // apply the stage like update does
      val got = LabelStore.read(spark, path).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      got
    }
    val fast = foldWith(LabelStore.MaxDriverEdges)
    val dist = foldWith(0L)
    assert(fast === dist, "driver-resolved fold diverged from the fallback")
    // evidence bridges through id 1 (outside both batches): stored {3,7}
    // and arriving 20 merge to canonical 1's component minimum — the
    // same closure both paths must produce
    assert(fast(20L) === fast(7L) && fast(21L) === 21L && fast(22L) === 21L)
  }
}
