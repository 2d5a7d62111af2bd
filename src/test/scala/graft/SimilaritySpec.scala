package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorOps

class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  val dim = 64

  /** Seeded clustered corpus: 10 centers, 10 members each with small
    * noise — gives real nearest-neighbor structure for recall tests.
    */
  lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(10)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    val rows = for (c <- centers.indices; m <- 0 until 10) yield {
      val v = centers(c).map(x => x + (rnd.nextDouble() * 0.1 - 0.05).toFloat)
      ((c * 10 + m).toLong, v.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "label").cache()
  }

  test("VecDot (codegen expression) is bit-identical to the higher-order-function fold") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 50L).map { i =>
      (i, Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    } :+ (50L, Seq.empty[Float]) :+ (51L, Seq(0.5f))
    val df = vecs.toDF("vec_id", "embedding")
    val diffs = df.as("a").crossJoin(df.as("b"))
      .select(
        VectorOps.dot($"a.embedding", $"b.embedding").as("native"),
        VectorOps.dotHof($"a.embedding", $"b.embedding").as("hof"))
      .filter(not($"native" <=> $"hof"))
      // hof zip_with pads the shorter vector with nulls -> null result;
      // VecDot truncates. Compare only equal-length pairs for parity.
      .count()
    val mismatchedLen = df.as("a").crossJoin(df.as("b"))
      .filter(size($"a.embedding") =!= size($"b.embedding")).count()
    assert(diffs === mismatchedLen)
  }

  test("cosine column matches a driver-side computation") {
    val two = Seq((0L, Seq(1f, 0f, 0f, 1f)), (1L, Seq(1f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val c = two.as("a").crossJoin(two.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .select(VectorOps.cosine($"a.embedding", $"b.embedding"))
      .head().getDouble(0)
    assert(math.abs(c - 0.5) < 1e-12) // dot=1, norms sqrt(2)*sqrt(2)
  }

  test("brute-force top-k returns same-cluster neighbors in cosine order") {
    val queries = corpus.filter($"vec_id" === 0L)
    val top = Similarity.bruteForceTopK(corpus, queries, 9).collect()
    assert(top.length === 9)
    // all 9 nearest of vec 0 are its 9 cluster-mates (ids 1..9)
    assert(top.map(_.getAs[Long]("cid")).toSet === (1L to 9L).toSet)
    // scores descending
    val scores = top.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("sign-LSH ANN recall vs brute force is high on clustered data") {
    val queries = corpus.filter($"vec_id" % 10 === 0L) // one per cluster
    val exact = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val approx = Similarity.signLshTopK(corpus, queries, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("IVF ANN recall vs brute force is high on clustered data") {
    val queries = corpus.filter($"vec_id" % 10 === 0L)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val approx = Similarity.ivfTopK(corpus, queries, 5, nCells = 10, nProbe = 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("IVF probes fewer candidates than brute force scores") {
    val queries = corpus.filter($"vec_id" === 0L)
    val res = Similarity.ivfTopK(corpus, queries, 5, nCells = 10, nProbe = 2).collect()
    assert(res.length <= 5 && res.nonEmpty)
    // self is never its own neighbor
    assert(!res.exists(r => r.getAs[Long]("cid") == 0L))
  }

  // ---- bucket-width cap (the corpus-scale guard) ----

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long](0), r.getAs[Long](1))).toSet

  test("capped near-dup pairs are a subset of the uncapped set; generous cap is identity") {
    val uncapped = pairSet(Similarity.nearDupPairs(corpus, 0.9))
    for (cap <- Seq(1, 2, 5, 20)) {
      val capped = pairSet(Similarity.nearDupPairs(corpus, 0.9, maxBucket = cap))
      assert(capped.subsetOf(uncapped), s"cap=$cap emitted pairs absent uncapped")
    }
    assert(pairSet(Similarity.nearDupPairs(corpus, 0.9, maxBucket = 1000)) === uncapped)
  }

  test("bucket cap drops a degenerate all-identical bucket instead of squaring it") {
    val n = 40L
    val dupes = (0L until n).map(i => (i, Seq.fill(dim)(0.25f)))
      .toDF("vec_id", "embedding")
    // identical vectors land in one bucket per band: uncapped emits the
    // full quadratic pair set, the cap removes the bucket entirely
    assert(Similarity.nearDupPairs(dupes, 0.99).count() === n * (n - 1) / 2)
    assert(Similarity.nearDupPairs(dupes, 0.99, maxBucket = 10).count() === 0L)
  }

  test("capped sign-LSH candidates are a subset of the uncapped candidate set") {
    val queries = corpus.filter($"vec_id" % 10 === 0L)
    val k = 200 // >= corpus size: the rank filter never binds, output = candidates
    def cands(maxBucket: Int) =
      Similarity.signLshTopK(corpus, queries, k, maxBucket = maxBucket).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val uncapped = cands(Int.MaxValue)
    for (cap <- Seq(2, 10, 30)) {
      assert(cands(cap).subsetOf(uncapped), s"cap=$cap emitted novel candidates")
    }
  }

  test("bucket cap: derived corpus plans ONE derivation, raw scan keeps the shuffle-free anti-join") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = raw.filter($"vec_id" < 2)
    // raw scan: rescanning is cheap, so the cap stays a broadcast
    // anti-join (no band-key shuffle of embedding rows); the corpus is
    // banded twice — count pass + probe pass — plus the queries scan = 3
    val rawPlan = Similarity.signLshTopK(raw, queries, 3, maxBucket = 10)
      .queryExecution.executedPlan.toString
    assert(rawPlan.contains("LeftAnti"), "raw-scan cap lost its broadcast anti-join")
    assert("FileScan parquet".r.findAllIn(rawPlan).size === 3)
    // derived corpus (shuffle below): the derivation must execute ONCE —
    // cap switches to a count window over the band key, no anti-join,
    // and the expensive aggregate appears a single time in the plan
    val derived = raw.groupBy(($"vec_id" % 97).as("g"))
      .agg(min($"vec_id").as("vec_id"), first($"embedding").as("embedding"))
      .select($"vec_id", $"embedding")
    val dPlan = Similarity.signLshTopK(derived, queries, 3, maxBucket = 10)
      .queryExecution.executedPlan.toString
    assert(!dPlan.contains("LeftAnti"), "derived cap still double-computes the corpus")
    assert("FileScan parquet".r.findAllIn(dPlan).size === 2,
      "derived corpus banded more than once under a cap")
    assert(dPlan.contains("hashpartitioning(band"),
      "one-pass cap lost its band-key count window")
    // and the one-pass shape is semantically identical to the two-pass:
    // a degenerate all-identical bucket is dropped, not squared
    val n = 40L
    val dupes = (0L until n).map(i => (i, Seq.fill(dim)(0.25f)))
      .toDF("vec_id", "embedding")
      .groupBy($"vec_id").agg(first($"embedding").as("embedding")) // derived
    assert(Similarity.nearDupPairs(dupes, 0.99).count() === n * (n - 1) / 2)
    assert(Similarity.nearDupPairs(dupes, 0.99, maxBucket = 10).count() === 0L)
  }

  test("IVF recall is monotone in nProbe and exact at full probe") {
    val queries = corpus.filter($"vec_id" % 10 === 0L)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    def recall(nProbe: Int): Double = {
      val approx = Similarity.ivfTopK(corpus, queries, 5, nCells = 10, nProbe = nProbe)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val (r1, r3, r10) = (recall(1), recall(3), recall(10))
    assert(r1 <= r3 && r3 <= r10, s"recall not monotone: $r1, $r3, $r10")
    assert(r10 === 1.0, s"probing every cell must equal brute force, got $r10")
  }

  test("stored IVF layout is semantics-preserving and the probe reads only probed cells") {
    val pqCorpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.seedCentroids(pqCorpus, 10)
    val store = java.nio.file.Files.createTempDirectory("ivf_store_spec").toString
    Similarity.ivfWrite(pqCorpus, cents, store)
    // 1) the layout changes WHERE bytes live, never the answer: the
    // stored probe equals the in-memory probe for the same model
    val queries = pqCorpus.filter($"vec_id" < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Int]("rnk"))).toSet
    val mem = rows(Similarity.ivfTopK(pqCorpus, queries, 10, nCells = 10, nProbe = 2))
    val stored = Similarity.ivfTopKStored(spark, store, queries, cents, 10, nProbe = 2)
    assert(rows(stored) === mem, "stored layout changed the top-k answer")
    // 2) a single-query probe must physically read only its nProbe cell
    // directories: dynamic partition pruning via the reused probe
    // broadcast, observable in the scan's partition/file metrics
    val one = Similarity.ivfTopKStored(spark, store,
      pqCorpus.filter($"vec_id" === 55L), cents, 5, nProbe = 2)
    assert(one.queryExecution.executedPlan.toString.contains("dynamicpruningexpression"),
      "stored probe lost its dynamic partition-pruning filter")
    one.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case s: FileSourceScanExec    => Seq(s)
      case other => other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    val storeScan = scans(one.queryExecution.executedPlan)
      .find(_.metrics.contains("numPartitions"))
      .getOrElse(fail("no partitioned scan in the stored-probe plan"))
    val partsRead = storeScan.metrics("numPartitions").value
    val filesRead = storeScan.metrics("numFiles").value
    val filesTotal = storeScan.metrics("staticFilesNum").value
    assert(partsRead <= 2, s"probe read $partsRead cells, expected <= nProbe = 2")
    assert(filesRead < filesTotal,
      s"no file-level pruning: read $filesRead of $filesTotal")
  }

  test("filtered stored-IVF probe: pre-filter semantics, not a lossy post-filter") {
    val pqCorpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.seedCentroids(pqCorpus, 10)
    val store = java.nio.file.Files.createTempDirectory("ivf_filter_spec").toString
    Similarity.ivfWrite(pqCorpus, cents, store)
    val queries = pqCorpus.filter($"vec_id" < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Int]("rnk"))).toSet
    // 1) allow-everything filter is a no-op: identical to the unfiltered probe
    val all = pqCorpus.select($"vec_id")
    assert(rows(Similarity.ivfTopKStoredFiltered(spark, store, queries, cents, all, 10, 2))
      === rows(Similarity.ivfTopKStored(spark, store, queries, cents, 10, 2)),
      "allow-all filter changed the answer")
    // 2) a selective filter: every result id passes it, and each query
    // returns the FULL top-k of the allowed subset — ids the unfiltered
    // top-k never surfaced must appear once their betters are filtered
    // out (the pre-filter vs post-filter distinction)
    val allowed = pqCorpus.filter($"vec_id" % 3 === 0L).select($"vec_id")
    val filtered = Similarity.ivfTopKStoredFiltered(
      spark, store, queries, cents, allowed, 10, nProbe = 10)
    val got = rows(filtered)
    assert(got.nonEmpty && got.forall(_._2 % 3 == 0), "result escaped the filter")
    val post = rows(Similarity.ivfTopKStored(spark, store, queries, cents, 10, 10))
      .filter(_._2 % 3 == 0).map(t => (t._1, t._2))
    assert(post.subsetOf(got.map(t => (t._1, t._2))),
      "pre-filter should dominate the post-filtered top-k")
    assert(got.size > post.size,
      "pre-filter surfaced no ids beyond the post-filter — fixture not probative")
  }

  test("Lloyd-trained IVF recall beats (or matches) the coreset seed") {
    // the seed is adversarial here by construction: vec_ids 0..9 are all
    // members of cluster 0, so the untrained centroid set is 10 near-
    // identical vectors from ONE true cluster; Lloyd rounds must spread
    // the centroids toward the real cluster structure.
    val queries = corpus.filter($"vec_id" % 10 === 0L)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = df.collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val seed = recallOf(Similarity.ivfTopK(corpus, queries, 5, nCells = 10, nProbe = 2))
    val trained = recallOf(Similarity.ivfTopKTrained(corpus, queries, 5,
      nCells = 10, nProbe = 2, iters = 3))
    assert(trained >= seed,
      s"training regressed recall: seed=$seed trained=$trained")
    assert(trained >= 0.7, s"trained recall too low: $trained (seed=$seed)")
  }

  test("incremental ivfAppend equals a full rebuild over the unioned corpus") {
    val pq = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = pq.filter($"vec_id" % 2 === 0)
    val delta = pq.filter($"vec_id" % 2 === 1)
    val cents = Similarity.seedCentroids(pq, 10)
    val incr = java.nio.file.Files.createTempDirectory("ivf_incr").toString
    val full = java.nio.file.Files.createTempDirectory("ivf_full").toString
    Similarity.ivfWrite(base, cents, incr)
    Similarity.ivfAppend(delta, cents, incr)  // ingest batch, no rebuild
    Similarity.ivfWrite(pq, cents, full)      // the from-scratch reference
    val queries = pq.filter($"vec_id" < 5)
    def rows(path: String) =
      Similarity.ivfTopKStored(spark, path, queries, cents, 10, nProbe = 2)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"),
                             r.getAs[Int]("rnk"))).toSet
    assert(rows(incr) === rows(full),
      "appended store diverges from a full rebuild over the same corpus")
  }

  test("Lloyd training on an empty model returns the empty seed instead of crashing") {
    // ids not starting below nCells -> seedCentroids is empty; training
    // must degrade to the (empty) seed, not throw on an empty max
    val shifted = corpus.withColumn("vec_id", $"vec_id" + 1000L)
    val (cents, rounds) = Similarity.trainIvfCentroidsWithRounds(shifted, 10, iters = 3)
    assert(cents.isEmpty && rounds <= 3)
  }

  test("Lloyd training early-exits at its fixed point; recall is non-decreasing in rounds") {
    // a generous budget must stop at the fixed point, not burn it all:
    // every skipped round is a saved corpus pass at 100 TB
    val (cFix, rounds) = Similarity.trainIvfCentroidsWithRounds(corpus, 10, iters = 25)
    assert(rounds < 25, s"no early exit: burned the whole $rounds-round budget")
    // converged means converged: a bigger budget changes nothing
    val (cMore, _) = Similarity.trainIvfCentroidsWithRounds(corpus, 10, iters = rounds + 5)
    assert(cFix.toSeq === cMore.toSeq, "post-convergence rounds moved the centroids")
    // recall against brute force is non-decreasing in the round count
    // on clustered data (the adversarial all-one-cluster seed unfolds
    // toward the true structure monotonically here)
    val queries = corpus.filter($"vec_id" % 10 === 0L)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    def recallAt(iters: Int): Double = {
      val approx = Similarity.ivfTopKTrained(corpus, queries, 5,
          nCells = 10, nProbe = 2, iters = iters).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val recalls = Seq(0, 1, 2, rounds).map(recallAt)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall degraded with more training: $recalls")
  }

  test("similarity ops add no repartition exchange on an already-parallel input") {
    // range-based input starts at defaultParallelism partitions, so
    // ensureParallel must pass it through untouched
    val par = spark.range(100)
      .select($"id".as("vec_id"),
        array(Seq.fill(dim)(lit(0.1f)): _*).cast("array<float>").as("embedding"))
    assert(par.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
    val q = par.filter($"vec_id" < 2)
    val plan = Similarity.signLshTopK(par, q, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("RoundRobinPartitioning"),
      "gratuitous repartition of an already-parallel corpus")
    // and the single-split local path still parallelizes (skipped on a
    // serial runner, where repartition(1) would be correctly elided)
    assume(spark.sparkContext.defaultParallelism > 1)
    val serial = par.coalesce(1)
    val plan1 = Similarity.signLshTopK(serial, q.coalesce(1), 3)
      .queryExecution.executedPlan.toString
    assert(plan1.contains("RoundRobinPartitioning"),
      "single-split input no longer rebalanced")
  }

  test("operator construction never executes the corpus (plan-static parallelism decision)") {
    // a derived corpus whose plan contains a shuffle: under AQE, reading
    // .rdd at construction time would eagerly run that shuffle stage and
    // throw the work away (the operator re-executes from the logical
    // plan). The split estimate must come from the plan alone.
    val derived = corpus.groupBy($"label")
      .agg(min($"vec_id").as("vec_id"), first($"embedding").as("embedding"))
      .select($"vec_id", $"embedding")
    // Count ONLY jobs tagged with this test's job group (prior tests in
    // the shared session can't pollute, late listener delivery can't
    // race), and flush the listener bus deterministically by running a
    // sentinel job in a second group and waiting for its event: the bus
    // is ordered, so once the sentinel is seen every construction-time
    // job would already have been delivered.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val sc = spark.sparkContext
    val constructionJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val sentinelSeen = new java.util.concurrent.CountDownLatch(1)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val group = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (group == "zero-jobs-sentinel") sentinelSeen.countDown()
        else if (group == "zero-jobs-construction") constructionJobs.incrementAndGet()
      }
    }
    sc.addSparkListener(listener)
    try {
      sc.setJobGroup("zero-jobs-construction", "operator construction under test")
      Similarity.signLshTopK(derived, derived.limit(2), 3) // construction only
      Similarity.bruteForceTopK(derived, derived.limit(2), 3)
      Similarity.nearDupPairs(derived, 0.9, maxBucket = 10)
      sc.setJobGroup("zero-jobs-sentinel", "listener-bus flush")
      spark.range(1).count()
      assert(sentinelSeen.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "sentinel job event never delivered")
      assert(constructionJobs.get() === 0,
        s"operator construction submitted ${constructionJobs.get()} Spark job(s)")
    } finally {
      sc.clearJobGroup()
      sc.removeSparkListener(listener)
    }
  }

  test("near-dup pairs finds cluster-mates above threshold, no cross-cluster pairs") {
    val pairs = Similarity.nearDupPairs(corpus, threshold = 0.9).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("cos")))
    assert(pairs.nonEmpty)
    // same cluster iff same id/10
    assert(pairs.forall { case (a, b, _) => a / 10 === b / 10 })
    assert(pairs.forall { case (_, _, c) => c >= 0.9 })
  }

  test("p116 tuning curve: recall and read fraction climb with nProbe; full scan is exact") {
    val rows = graft.operators.Pipeline12
      .annTuning(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Int]("nprobe"), r.getAs[Double]("recall"),
        r.getAs[Long]("read_ppm")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 2, 4, 8))
    // both dials are monotone non-decreasing in the fan-out
    rows.sliding(2).foreach {
      case Array((_, r1, p1), (_, r2, p2)) =>
        assert(r1 <= r2, s"recall fell: $r1 -> $r2")
        assert(p1 <= p2, s"read fraction fell: $p1 -> $p2")
      case _ =>
    }
    // probing every cell IS the exact scan: recall 1 at 100% read
    assert(rows.last._2 === 1.0, s"full-scan recall ${rows.last._2} != 1")
    assert(rows.last._3 === 1000000L,
      s"full-scan read_ppm ${rows.last._3} != 1e6")
  }

  test("frozen Lloyd training: partition-invariant centroids, stored-probe recall beats the seed on clustered data") {
    // the p124 device: integer-micro means make the trained quantizer a
    // deterministic function of corpus CONTENT — retraining on a
    // differently-partitioned corpus must yield bit-identical centroids
    // (the float-mean trainer cannot promise this, which is why it
    // never reached the oracle registry)
    val frozen = Similarity.trainIvfCentroidsFrozen(corpus, 10, 3)
    val frozen2 = Similarity.trainIvfCentroidsFrozen(corpus.repartition(7), 10, 3)
    assert(frozen.map { case (i, v) => (i, v.toList) }.toSeq ===
      frozen2.map { case (i, v) => (i, v.toList) }.toSeq,
      "frozen training is partition-sensitive")
    // graduated into the store/probe path: same adversarial seed as the
    // unfrozen test (centroids 0..9 all from ONE true cluster) — the
    // frozen-trained AT-REST layout must beat the seed layout's recall
    val queries = corpus.filter($"vec_id" % 10 === 0L)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    def recallOf(cents: Array[(Int, Seq[Float])]): Double = {
      val store = java.nio.file.Files
        .createTempDirectory("graft_froz_ivf").toString
      Similarity.ivfWrite(corpus, cents, store)
      val approx = Similarity
        .ivfTopKStored(spark, store, queries, cents, 5, nProbe = 2)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val seed = recallOf(Similarity.seedCentroids(corpus, 10))
    val trained = recallOf(frozen)
    assert(trained > seed,
      s"frozen training bought no stored-probe recall: seed=$seed trained=$trained")
    assert(trained >= 0.7, s"trained recall too low: $trained (seed=$seed)")
  }

  test("frozen Lloyd rounds sweep: recall plateaus past the knee (what a deployment reads before paying for training)") {
    // the p124 curve extended over the training-rounds axis on the
    // clustered fixture: recall climbs from the adversarial one-cluster
    // seed and PLATEAUS — extra rounds past the knee re-balance cells
    // without buying recall, so a deployment budgets rounds by this
    // sweep, not by faith. Deterministic end to end (frozen integer
    // means, seeded fixture), so exact inequalities are safe to pin.
    val queries = corpus.filter($"vec_id" % 10 === 0L)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    def recallAt(rounds: Int): Double = {
      val cents = Similarity.trainIvfCentroidsFrozen(corpus, 10, rounds)
      val store = java.nio.file.Files
        .createTempDirectory(s"graft_sweep_ivf_$rounds").toString
      Similarity.ivfWrite(corpus, cents, store)
      val approx = Similarity
        .ivfTopKStored(spark, store, queries, cents, 5, nProbe = 2)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val r = Seq(1, 2, 4).map(n => n -> recallAt(n)).toMap
    assert(r(1) <= r(2) + 1e-9 && r(2) <= r(4) + 1e-9,
      s"recall regressed with more rounds: $r")
    assert(r(4) <= r(2) + 0.1,
      s"no plateau by round 2 — the knee moved, re-derive the budget: $r")
    assert(r(2) >= 0.7, s"post-knee recall too low: $r")
  }

  test("cell-blocked within-batch tau-pairs: exact at full fan-out, subset at partial, never a cartesian") {
    // the p126 within-batch device: at nProbe = nCells every pair
    // shares a cell, so the blocked relation must equal the all-pairs
    // tau-relation exactly; at partial fan-out it may only SHRINK (the
    // refinement the maintenance loop relies on); and the plan must
    // carry no cartesian stage — that is the whole point of blocking
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
    val cents = Similarity.seedCentroids(emb, 8)
    val tau = 0.3
    val blocked = Similarity.cellBlockedTauPairs(emb, cents, tau, nProbe = 8)
    val got = blocked.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = emb.as("a").crossJoin(emb.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .filter(VectorOps.cosine($"a.embedding", $"b.embedding") >= tau)
      .select($"a.vec_id", $"b.vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got === want,
      "full fan-out cell blocking diverged from the exact tau-relation")
    val partial = Similarity.cellBlockedTauPairs(emb, cents, tau, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(partial.subsetOf(got),
      "partial fan-out invented pairs the exact relation lacks")
    val p = blocked.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "cell-blocked pair generation degraded to an unblocked cartesian")
  }

  test("vector retraction: cell-pruned takedown removes labels and vectors; withdrawn content cannot resurface") {
    // the embedding twin of the text takedown: labels recontract from
    // store-derived evidence, the IVF half rewrites ONLY the retracted
    // ids' cells (untouched cells byte-identical, mtime-pinned), and a
    // later duplicate of the withdrawn vector gates clean
    import graft.streaming.StreamingOps
    import graft.operators.LabelStore
    val cents = Similarity.seedCentroids(corpus, 10)
    val store = java.nio.file.Files.createTempDirectory("vrt_ivf").toString
    val labels = java.nio.file.Files.createTempDirectory("vrt_lbl").toString
    val stage = java.nio.file.Files.createTempDirectory("vrt_stage").toString
    Similarity.ivfWrite(corpus, cents, store)
    val tau = 0.9
    LabelStore.write(
      LabelStore.labelsFor(corpus.select($"vec_id".as("doc_id")),
        Similarity.cellBlockedTauPairs(corpus, cents, tau, nProbe = 10)),
      labels)
    def lbl = LabelStore.read(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(5L) === 0L, "fixture cluster-0 family missing")
    // file inventory before: cells NOT holding vector 0 must not move
    def files() = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("cell=")).flatMap(d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified())).toMap
    val cellOf0 = spark.read.parquet(store).filter($"vec_id" === 0L)
      .select($"cell").head().get(0).toString
    val before = files()
    // retract the canonical of cluster 0
    val n = StreamingOps.vectorRetractBatch(spark, store, labels,
      cents, tau, nProbe = 10)(Seq(0L).toDF("vec_id"))
    assert(n === 1L)
    val after = files()
    val untouchedBefore = before.filterNot(_._1.contains(s"cell=$cellOf0"))
    assert(untouchedBefore.forall { case (p, m) => after.get(p).contains(m) },
      "retraction rewrote cells that hold no retracted vector")
    // labels: from-scratch parity on the surviving corpus
    val surv = corpus.filter($"vec_id" =!= 0L)
    val want = LabelStore.labelsFor(surv.select($"vec_id".as("doc_id")),
        Similarity.cellBlockedTauPairs(surv, cents, tau, nProbe = 10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lbl.toSeq.map(t => (t._1, t._2)).toSet === want,
      "vector retraction diverged from the from-scratch rebuild")
    assert(!lbl.contains(0L) && lbl(5L) === 1L,
      "withdrawn canonical still present or family not relabeled")
    assert(spark.read.parquet(store).filter($"vec_id" === 0L).isEmpty,
      "withdrawn vector still in the cell store")
    // a duplicate of the withdrawn embedding arrives: it must match the
    // surviving cluster-mates only, and id 0 must appear nowhere
    val dup = corpus.filter($"vec_id" === 1L)
      .select(lit(500L).as("vec_id"), $"embedding")
    val verdicts = StreamingOps.vectorDedupMaintainBatch(spark, store,
        labels, stage, cents, tau, nProbe = 10)(dup, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verdicts.nonEmpty && !verdicts.exists(_._2 == 0L),
      "gate matched the withdrawn vector")
    val lbl2 = lbl
    assert(!lbl2.contains(0L) && !lbl2.values.toSet.contains(0L),
      "withdrawn id resurfaced after a matching arrival")
    assert(lbl2(500L) === 1L, "arrival missed the surviving family")
  }

  test("drift-gated IVF retrain: gate fires, rebuilt layout recovers partial-probe recall, swap heals") {
    // the composition p112 + warm-start frozen Lloyd + checked swap:
    // a drifted feed fires the gate, the live store retrains and
    // rebuilds, full-probe answers on unchanged vectors are identical
    // (the layout is semantics-preserving at any model), and
    // partial-probe recall on the drifted queries recovers. Everything
    // here is deterministic (seeded fixture, integer-frozen training),
    // so the inequalities are exact reproducible facts, not statistics.
    import graft.streaming.StreamingOps
    import graft.operators.Pipeline12
    val rnd = new scala.util.Random(31)
    def clusters(centers: Seq[Array[Float]], perC: Int, noise: Double,
                 base: Long) =
      (for (c <- centers.indices; m <- 0 until perC) yield {
        val v = centers(c).map(x =>
          x + (rnd.nextDouble() * 2 * noise - noise).toFloat)
        (base + c * perC + m, v.toSeq)
      }).toDF("vec_id", "embedding")
    val baseCenters = Seq.fill(8)(
      Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    val base = clusters(baseCenters, 10, 0.05, 0L).cache() // ids 0..79
    val cents0 = Similarity.trainIvfCentroidsFrozen(base, 8, 2)
    val store = java.nio.file.Files.createTempDirectory("drift_ivf").toString
    Similarity.ivfWrite(base, cents0, store)
    val baseRates = Pipeline12.cellRates(base, cents0, "cb", "rb")
      .localCheckpoint()
    val threshold = 1000000000L // 1e9 ppm² — ~3%+ of mass moving per cell
    // an IN-DISTRIBUTION batch stays quiet (no rebuild paid)
    val ok = clusters(baseCenters, 3, 0.05, 2000L)
    assert(StreamingOps.ivfRetrainIfDrifted(spark, store, cents0,
        baseRates, ok, threshold).isEmpty,
      "gate fired on an in-distribution batch")
    // the DRIFTED feed: wide clusters around new centers — under the
    // frozen model their members scatter across cells (near-zero
    // cosine to every centroid, noise decides), which is exactly the
    // forever-degraded-recall state the retrain exists to fix
    val driftCenters = Seq.fill(8)(
      Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    val drifted = clusters(driftCenters, 25, 0.35, 1000L).cache()
    Similarity.ivfAppend(drifted, cents0, store) // admitted at the frozen model
    val q = base.filter($"vec_id" % 10 === 0L)
    def fullProbe(model: Array[(Int, Seq[Float])]) =
      Similarity.ivfTopKStored(spark, store, q, model, 5, nProbe = 8)
        .collect().map(_.toSeq).toSet
    val fullBefore = fullProbe(cents0)
    val dq = drifted.filter($"vec_id" % 25 === 0L).cache()
    val exact = Similarity.bruteForceTopK(base.unionByName(drifted), dq, 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    def recallAt(model: Array[(Int, Seq[Float])], np: Int) = {
      val got = Similarity.ivfTopKStored(spark, store, dq, model, 5, np)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val degraded = recallAt(cents0, 2)
    val retrained = StreamingOps.ivfRetrainIfDrifted(spark, store, cents0,
      baseRates, drifted, threshold)
    assert(retrained.nonEmpty, "gate did not fire on the drifted feed")
    val cents1 = retrained.get
    // model-adoption atomicity: the rebuilt layout carries its own
    // model — a restart that lost the returned value recovers it from
    // the store instead of probing rebuilt cells with stale centroids
    assert(StreamingOps.ivfStoreModel(spark, store)
        .map(_.toSeq.map { case (c, e) => (c, e.toSeq) }) ===
      Some(cents1.toSeq.map { case (c, e) => (c, e.toSeq) }),
      "rebuilt store does not carry the retrained model")
    // unchanged vectors, full probe: identical answers pre/post rebuild
    assert(fullProbe(cents1) === fullBefore,
      "rebuild changed full-probe answers on unchanged vectors")
    val recovered = recallAt(cents1, 2)
    assert(recovered > degraded,
      s"retrain did not recover drifted-query recall " +
        s"($degraded -> $recovered)")
    assert(recovered >= 0.5,
      s"recovered recall $recovered below the clustered-fixture floor")
    // a triggered compaction carries the model sidecar through the
    // rewrite — a layout must never part from its model
    Similarity.ivfAppend(drifted.filter($"vec_id" === 1000L)
      .withColumn("vec_id", $"vec_id" + 5000L), cents1, store)
    assert(StreamingOps.compactIfDue(spark, store, "cell", maxFiles = 1)(
      (src, dst) => graft.sources.Maintenance.compactPartitioned(
        spark, src, dst, "cell")),
      "compaction trigger did not fire on the slivered store")
    assert(StreamingOps.ivfStoreModel(spark, store)
        .map(_.toSeq.map { case (c, e) => (c, e.toSeq) }) ===
      Some(cents1.toSeq.map { case (c, e) => (c, e.toSeq) }),
      "compaction dropped or changed the layout's model sidecar")
    // crash between the two renames heals: both copies exist, the live
    // path is missing — recoverStoreSwap finishes the swap
    val want = spark.read.parquet(store).collect().map(_.toSeq).toSet
    graft.sources.Maintenance.compactPartitioned(
      spark, store, s"${store}__compact", "cell")
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(s"${store}__precompact")))
    assert(StreamingOps.recoverStoreSwap(spark, store))
    assert(spark.read.parquet(store).collect().map(_.toSeq).toSet === want,
      "healed store diverged after the simulated rename crash")
  }
}
