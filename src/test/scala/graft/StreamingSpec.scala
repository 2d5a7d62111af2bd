package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Event, UserRunning}

class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  def ts(hhmm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  val batch1 = Seq(
    Event(0L, ts("00:10"), 1L, "error", 10.0),
    Event(1L, ts("00:20"), 2L, "signup", 5.0),
    Event(2L, ts("01:05"), 1L, "error", 2.5))
  val batch2 = Seq(
    Event(3L, ts("01:45"), 1L, "purchase", 1.0),
    Event(4L, ts("02:15"), 2L, "error", 4.0))

  test("tumbling-window counts match the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.hourlyCounts(ms.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("complete")
      .start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
      val got = spark.table("hourly")
        .orderBy($"hr", $"event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val exp = (batch1 ++ batch2).toDF()
        .groupBy(date_trunc("hour", $"ts").as("hr"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .orderBy($"hr", $"event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq === exp.toSeq)
    } finally q.stop()
  }

  test("windowed existence detection emits only windows containing the needle") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.existenceByWindow(ms.toDF(), "error")
      .writeStream.format("memory").queryName("needle").outputMode("complete")
      .start()
    try {
      ms.addData(batch1 ++ batch2); q.processAllAvailable()
      val hrs = spark.table("needle").orderBy($"hr")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
      assert(hrs.toSeq === Seq(("2024-01-01 00:00:00.0", 1L),
        ("2024-01-01 01:00:00.0", 1L), ("2024-01-01 02:00:00.0", 1L)))
    } finally q.stop()
  }

  test("session windows split on the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.sessionCounts(ms.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("complete")
      .start()
    try {
      ms.addData(Seq(
        Event(0L, ts("00:00"), 1L, "view", 1.0),
        Event(1L, ts("00:10"), 1L, "view", 2.0),  // same session
        Event(2L, ts("01:00"), 1L, "view", 3.0),  // gap > 30m -> new session
        Event(3L, ts("00:05"), 2L, "view", 4.0)))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .select($"user_id", $"n_events", $"total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
    } finally q.stop()
  }

  case class Doc(doc_id: Long, text: String, ts: Timestamp)

  test("streaming dedup keeps first occurrence per content hash") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Doc]
    val q = StreamingOps.streamingDedup(ms.toDF(), "text", "ts")
      .writeStream.format("memory").queryName("sdedup").outputMode("append")
      .start()
    try {
      ms.addData(Seq(
        Doc(0L, "alpha beta", ts("00:10")),
        Doc(1L, "alpha beta", ts("00:20")),   // dup within watermark
        Doc(2L, "gamma", ts("00:30"))))
      q.processAllAvailable()
      ms.addData(Seq(Doc(3L, "gamma", ts("00:40")))) // dup, second batch
      q.processAllAvailable()
      val ids = spark.table("sdedup").select($"doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(0L, 2L))
    } finally q.stop()
  }

  test("streaming perplexity gate scores exactly like batch p71 scoring, including held-out smoothing") {
    implicit val sqlCtx = spark.sqlContext
    val train = Seq(
      (100L, "the quick fox jumps over the lazy dog"),
      (101L, "the quick dog naps under the warm sun")).toDF("doc_id", "text")
    val model = graft.operators.Pipeline7.lmTrain(train)
    val v = train.select(explode(split($"text", " ")).as("t"))
      .agg(countDistinct($"t")).collect()(0).getLong(0)
    val docs = Seq(
      Doc(0L, "the quick fox jumps", ts("00:10")),       // all seen
      Doc(1L, "purple elephants sing opera loudly", ts("00:20")), // all unseen
      Doc(2L, "the quick zebra runs", ts("00:30")))       // mixed: seen ctx, unseen bigram
    val ms = MemoryStream[Doc]
    val q = StreamingOps.perplexityScoreStream(ms.toDF(), model, v, threshold = 4.0)
      .writeStream.format("memory").queryName("ppl").outputMode("append")
      .start()
    try {
      ms.addData(docs)
      q.processAllAvailable()
      // advance the watermark so the 00:00 window closes and emits
      ms.addData(Seq(Doc(99L, "a b", ts("03:30"))))
      q.processAllAvailable()
      val got = spark.table("ppl")
        .filter($"doc_id" < 99).collect()
        .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
      val exp = graft.operators.Pipeline7
        .perplexityScore(docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"), model, v)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got.keySet === exp.keySet)
      exp.foreach { case (id, (n, x)) =>
        assert(got(id)._1 === n, s"doc $id bigram count diverged from batch")
        assert(math.abs(got(id)._2 - x) < 1e-12, s"doc $id xent diverged from batch")
        assert(got(id)._3 === (x > 4.0), s"doc $id flag wrong")
      }
      // the gate orders the docs sensibly: fully-unseen > mixed > fully-seen
      assert(got(1L)._2 > got(2L)._2 && got(2L)._2 > got(0L)._2)
    } finally q.stop()
  }

  case class RasterDoc(doc_id: Long, payload: Array[Byte], ts: Timestamp)

  test("drift gate: a clean batch passes, a flooded batch names the bad bucket") {
    import graft.operators.Pipeline9
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = Pipeline9.bucketRates(docs, "cb", "rb").cache()
    // a batch drawn from the same distribution: nothing should fire at
    // a threshold comfortably above sampling noise
    val clean = StreamingOps.driftGateBatch(
      docs.limit(100), base, thresholdPpm2 = 10000L * 10000L)
    assert(clean.isEmpty, "clean batch tripped the drift gate")
    // a boilerplate flood must fire, naming the flooded token's bucket
    val flood = spark.range(60).select(col("id").as("doc_id"),
      lit(Seq.fill(40)("zzzflood").mkString(" ")).as("text"))
    val fired = StreamingOps.driftGateBatch(flood, base, 10000L * 10000L)
      .collect()
    assert(fired.nonEmpty, "flooded batch passed the gate")
    val floodBucket = spark.range(1)
      .select(pmod(conv(substring(md5(lit("zzzflood")), 1, 7), 16, 10)
        .cast("long"), lit(1024L))).collect()(0).getLong(0).toInt
    assert(fired(0).getInt(0) === floodBucket)
    // an EMPTY micro-batch (routine on watermark-advance triggers) has
    // no distribution to compare — it must be admitted, not reported
    // as "the whole baseline vanished" (the full-outer form's hazard)
    val empty = StreamingOps.driftGateBatch(
      docs.filter(lit(false)), base, thresholdPpm2 = 1L)
    assert(empty.isEmpty, "empty micro-batch fired the drift gate")
  }

  test("score-drift gate: identical feed drifts zero, a stopword flood fires, empty admits") {
    import graft.operators.{Pipeline11, Pipeline13}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val w = Pipeline11.perceptronTrain(docs).localCheckpoint()
    val base = Pipeline13.scoreBandRates(docs, w).localCheckpoint()
    // the same corpus re-scored: band rates are IDENTICAL integers, so
    // drift is exactly zero — passes at any threshold, no noise margin
    val clean = StreamingOps.scoreDriftGateBatch(docs, w, base, 0L)
    assert(clean.isEmpty, "identical feed tripped the score-drift gate")
    // a stopword flood scores every doc to the SAME margin, so one
    // band's occupancy jumps to 1e6 ppm — the gate fires and the top
    // mover IS that band
    val flood = spark.range(60).select((col("id") + 10000L).as("doc_id"),
      lit(Seq.fill(40)("the").mkString(" ")).as("text"))
    val fired = StreamingOps.scoreDriftGateBatch(
      flood, w, base, 10000L * 10000L).collect()
    assert(fired.nonEmpty, "flooded batch passed the score-drift gate")
    assert(fired(0).getAs[Long]("ri") === 1000000L,
      "top mover is not the concentrated flood band")
    // idle triggers must admit, not report the baseline vanished
    val empty = StreamingOps.scoreDriftGateBatch(
      docs.filter(lit(false)), w, base, 1L)
    assert(empty.isEmpty, "empty micro-batch fired the score-drift gate")
  }

  test("admission pipeline: the optional score gate quarantines a margin-shifted batch") {
    import graft.operators.{Pipeline9, Pipeline11, Pipeline13}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") < 400L).localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("adm_score").toString
    Engine.lshStoreWrite(base, "doc_id", "text", store)
    val rates = Pipeline9.bucketRates(base, "cb", "rb").localCheckpoint()
    val vocab = base.select(explode(split(col("text"), " ")).as("term"))
      .distinct().localCheckpoint()
    val w = Pipeline11.perceptronTrain(base).localCheckpoint()
    val bandBase = Pipeline13.scoreBandRates(base, w).localCheckpoint()
    // in-vocab stopword flood: token drift and OOV are deliberately
    // disarmed (maxed thresholds) — only the margin distribution knows
    // this feed is wrong for the classifier
    val flood = spark.range(60).select((col("id") + 50000L).as("doc_id"),
      lit(Seq.fill(40)("the").mkString(" ")).as("text"))
    val gated = StreamingOps.admissionGateBatch(spark, store, rates, vocab,
      driftPpm2 = Long.MaxValue, oovPpm = 1000000L,
      scoreGate = Some((w, bandBase, 10000L * 10000L)))(flood).collect()
    assert(gated.nonEmpty && gated.forall(r =>
      !r.getBoolean(1) && r.getString(2) == "score_drift"),
      "score-gated admission did not quarantine the shifted batch")
    // without the score gate, the same batch sails through every gate
    val open = StreamingOps.admissionGateBatch(spark, store, rates, vocab,
      driftPpm2 = Long.MaxValue, oovPpm = 1000000L)(flood).collect()
    assert(open.forall(_.getBoolean(1)),
      "control run without the score gate should admit the flood")
  }

  test("admission pipeline: batch gates quarantine, doc gates reject, clean docs land") {
    import graft.operators.Pipeline9
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") < 400L).localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("adm_store").toString
    Engine.lshStoreWrite(base, "doc_id", "text", store)
    val rates = Pipeline9.bucketRates(base, "cb", "rb").localCheckpoint()
    val vocab = base.select(explode(split(col("text"), " ")).as("term"))
      .distinct().localCheckpoint()
    val bench = docs.filter(col("doc_id") % 97L === 0L)
    // the frozen per-deployment artifact, like rates/vocab above
    val benchIdx = graft.operators.Pipeline10.benchShingleIndex(bench)
      .localCheckpoint()
    val gate = (b: org.apache.spark.sql.DataFrame) =>
      StreamingOps.admissionGateBatch(spark, store, rates, vocab,
        driftPpm2 = 100000L * 100000L, oovPpm = 100000L,
        benchIndex = Some(benchIdx))(b)
    def verdicts(b: org.apache.spark.sql.DataFrame) =
      gate(b).collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.getString(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // clean batch: in-vocabulary words, novel shingles (reversed word
    // order of base docs) — every doc admitted. Ids 1-10: doc 0 is a
    // BENCH member and repetitive runs make some reversed trigrams
    // self-collide, so reversing a bench doc can legitimately flag
    val cleanTexts = base.filter(col("doc_id").between(1L, 10L))
      .select((col("doc_id") + 2000L).as("doc_id"),
        concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
      .localCheckpoint()
    val vA = verdicts(cleanTexts)
    assert(vA.size === 10 && vA.values.forall(_ == ((true, None, None))),
      s"clean batch not fully admitted: $vA")
    // mixed batch: one exact re-publish among clean docs — only the
    // copy is rejected, and dup_of names a stored doc with its text
    val copy = base.filter(col("doc_id") === 7L)
      .select(lit(2107L).as("doc_id"), col("text"))
    val vB = verdicts(cleanTexts.limit(3).unionByName(copy))
    assert(vB(2107L)._1 === false && vB(2107L)._2 === Some("near_dup"))
    val dupOf = vB(2107L)._3.get
    val baseText = base.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(baseText(dupOf) === baseText(7L),
      "dup_of does not point at a stored copy of the text")
    assert(vB.filter(_._1 != 2107L).values.forall(_ == ((true, None, None))))
    // a benchmark re-publish: its text IS a bench doc AND a published
    // doc, so both doc gates match — eval safety outranks dedup and
    // the verdict is 'contaminated' with no dup_of
    val benchCopy = docs.filter(col("doc_id") === 97L)
      .select(lit(2197L).as("doc_id"), col("text"))
    val vBc = verdicts(cleanTexts.limit(2).unionByName(benchCopy))
    assert(vBc(2197L) === ((false, Some("contaminated"), None)),
      s"benchmark copy verdict wrong: ${vBc(2197L)}")
    assert(vBc.filter(_._1 != 2197L).values.forall(_ == ((true, None, None))))
    // flooded batch: the whole batch quarantined by the BATCH gate —
    // per-doc reasons all 'drift', dup probe never consulted
    val flood = spark.range(60).select((col("id") + 3000L).as("doc_id"),
      lit(Seq.fill(40)("zzzflood").mkString(" ")).as("text"))
    val vC = verdicts(flood)
    assert(vC.size === 60 && vC.values.forall(_ == ((false, Some("drift"), None))),
      "flooded batch was not fully quarantined as drift")
    // empty trigger: empty verdict table, nothing quarantined
    assert(gate(docs.filter(lit(false))).isEmpty)
  }

  test("admission pipeline, verified mode: a banding false positive is admitted, a true copy still drops") {
    import graft.operators.{Dedup, Pipeline9}
    val tau = 0.9
    // synthetic base so the near-miss is a GUARANTEED LSH candidate:
    // 60 distinct words; the arriving variant changes one middle word,
    // keeping most shingles (high-but-below-tau Jaccard)
    val baseText = (1 to 60).map(i => s"tok$i").mkString(" ")
    val missWords = (1 to 60).map(i => if (i == 30) "zzzz" else s"tok$i")
    val base = (0L until 20L).map(i => (i, if (i == 0) baseText
        else (1 to 30).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text").localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("vadm_store").toString
    val sidecar = java.nio.file.Files.createTempDirectory("vadm_side").toString
    Engine.lshStoreWrite(base, "doc_id", "text", store)
    Engine.shingleSidecarWrite(base, "doc_id", "text", sidecar)
    val rates = Pipeline9.bucketRates(base, "cb", "rb").localCheckpoint()
    val vocab = base.select(explode(split(col("text"), " ")).as("term"))
      .distinct().unionByName(Seq("zzzz").toDF("term")).localCheckpoint()
    val arriving = Seq(1000L -> missWords.mkString(" "),
      1001L -> baseText).toDF("doc_id", "text").localCheckpoint()
    // fixture preconditions: the near-miss IS an LSH candidate of doc 0
    // and sits below tau on exact Jaccard — so the two modes MUST differ
    val un = base.unionByName(arriving)
    assert(Dedup.minhashLshPairs(un, "doc_id", "text")
      .filter(col("d1") === 0L && col("d2") === 1000L).count() === 1,
      "fixture near-miss lost LSH candidacy")
    val j = Dedup.ngramJaccardPairs(un, "doc_id", "text", 5, 0.0)
      .filter(col("d1") === 0L && col("d2") === 1000L)
      .head().getDouble(2)
    assert(j > 0.5 && j < tau, s"fixture near-miss Jaccard out of band: $j")
    def verdicts(vs: Option[(String, Double)]) =
      StreamingOps.admissionGateBatch(spark, store, rates, vocab,
          driftPpm2 = Long.MaxValue, oovPpm = 1000000L,
          verifySidecar = vs)(arriving)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // candidate mode: BOTH rejected (the banding surfaces both)
    val cand = verdicts(None)
    assert(cand(1000L) === false && cand(1001L) === false,
      s"candidate mode did not reject both: $cand")
    // verified mode: the below-tau near-miss is ADMITTED, the true
    // copy (Jaccard 1.0) still drops
    val ver = verdicts(Some((sidecar, tau)))
    assert(ver(1000L) === true,
      "verified mode dropped a below-threshold banding candidate")
    assert(ver(1001L) === false,
      "verified mode admitted an exact re-publish")
  }

  test("vector admission pipeline: drift quarantines the batch, near-dups reject per vector") {
    import graft.operators.{Pipeline12, Similarity}
    val tau = 0.3
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val pub = emb.filter(col("vec_id") < 400L).localCheckpoint()
    val cents = Similarity.seedCentroids(pub, 8)
    val store = java.nio.file.Files.createTempDirectory("vadm_ivf").toString
    Similarity.ivfWrite(pub, cents, store)
    val base = Pipeline12.cellRates(pub, cents, "cb", "rb").localCheckpoint()
    // a 2-vector batch concentrates all its mass in ≤2 of 8 cells, so
    // a tight ppm² bar would ALWAYS fire on it (sampling, not drift) —
    // the mixed-batch phase runs with the bar effectively off, the
    // flood phase with the deployment bar
    val gate = (driftPpm2: Long) => (b: org.apache.spark.sql.DataFrame) =>
      StreamingOps.vectorAdmissionGateBatch(spark, store, cents, base,
        driftPpm2 = driftPpm2, tau = tau, nProbe = 1)(b)
    // mixed batch: a copy of a published vector + an unpublished one —
    // the copy rejects with dup_of naming its original, the fresh
    // vector's verdict matches its own-cell stored-witness relation
    val vecs = emb.filter(col("vec_id").isin(7L, 450L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    val batch = Seq(1007L -> vecs(7L), 1450L -> vecs(450L))
      .toDF("vec_id", "embedding")
    val v = gate(Long.MaxValue)(batch).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(v(1007L)._1 === false && v(1007L)._2 === Some(7L),
      s"published copy not rejected with its original: ${v(1007L)}")
    val freshWitnessed = Similarity.ivfProbeNearDup(spark, store,
        batch.filter(col("vec_id") === 1450L), cents, tau, nProbe = 1)
      .count() > 0
    assert(v(1450L)._1 === !freshWitnessed,
      "fresh vector's verdict diverged from its stored-witness relation")
    // flooded batch (every vector identical): the BATCH gate fires and
    // the near-dup probe is never consulted — all 'drift'
    val v3 = emb.filter(col("vec_id") === 3L).select(col("embedding"))
    val flood = spark.range(60).select((col("id") + 5000L).as("vec_id"))
      .crossJoin(broadcast(v3))
    val vf = gate(100000L * 100000L)(flood).collect()
      .map(r => (r.getBoolean(1), r.getString(2))).toSet
    assert(vf === Set((false, "drift")),
      s"flooded vector batch not fully quarantined: $vf")
    // empty trigger: empty verdict table
    assert(gate(100000L * 100000L)(emb.filter(lit(false))).isEmpty)
  }

  test("embedding drift gate: split batch passes, a single-cell flood names the cell") {
    import graft.operators.{Pipeline12, Similarity}
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.seedCentroids(emb, 8)
    val base = Pipeline12.cellRates(
      emb.filter(col("vec_id") % 5 =!= 0), cents, "cb", "rb")
    // the registered p112 split: same feed, different sample — admitted
    // under a 10-percentage-point bar
    val clean = StreamingOps.embeddingDriftGateBatch(
      emb.filter(col("vec_id") % 5 === 0), base, cents,
      thresholdPpm2 = 100000L * 100000L)
    assert(clean.isEmpty, "same-feed batch tripped the embedding drift gate")
    // a model-switch stand-in: every arriving vector identical (all
    // mass lands in one cell) — must fire, naming centroid 3's cell
    val v3 = emb.filter(col("vec_id") === 3L).select(col("embedding"))
    val flood = spark.range(60).select(col("id").as("vec_id"))
      .crossJoin(broadcast(v3))
    val fired = StreamingOps.embeddingDriftGateBatch(flood, base, cents,
      thresholdPpm2 = 100000L * 100000L).collect()
    assert(fired.nonEmpty, "single-cell flood passed the gate")
    assert(fired(0).getInt(0) === 3, "flooded cell not ranked first")
    // empty micro-batch admitted, never "the baseline vanished"
    val empty = StreamingOps.embeddingDriftGateBatch(
      emb.filter(lit(false)), base, cents, thresholdPpm2 = 1L)
    assert(empty.isEmpty, "empty micro-batch fired the embedding gate")
  }

  test("oov gate: in-vocab batch passes, a new-vocabulary flood names its top terms") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val vocab = docs.select(explode(split(col("text"), " ")).as("term"))
      .distinct().cache()
    // a batch whose every token is in the frozen vocab: zero OOV
    val clean = StreamingOps.oovGateBatch(docs.limit(80), vocab,
      thresholdPpm = 1L)
    assert(clean.isEmpty, "in-vocab batch tripped the OOV gate")
    // a feed shift: half the tokens are a vocabulary the tokenizer has
    // never seen — the gate must fire and rank the new terms
    val shifted = spark.range(50).select(col("id").as("doc_id"),
      concat(lit("join filter "),
        lit(Seq.fill(6)("zzznew wwwnew zzznew").mkString(" "))).as("text"))
    val fired = StreamingOps.oovGateBatch(shifted, vocab,
      thresholdPpm = 100000L).collect() // fires at >= 10% OOV
    assert(fired.nonEmpty, "shifted batch passed the OOV gate")
    assert(fired(0).getString(0) === "zzznew", "top OOV term not ranked first")
    assert(fired.map(_.getString(0)).toSet === Set("zzznew", "wwwnew"))
    val n = fired(0).getAs[Long]("n")
    val nOov = fired(0).getAs[Long]("n_oov")
    assert(nOov * 1000000L >= 100000L * n)
  }

  test("trending terms: the streaming SpaceSaving window agrees with its batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Doc]
    val q = StreamingOps.trendingTermsStream(ms.toDF(), "ts",
        capacity = 8, topN = 3)
      .writeStream.format("memory").queryName("trend").outputMode("complete")
      .start()
    try {
      val docs = Seq(
        Doc(0L, "alpha alpha alpha beta gamma", ts("00:10")),
        Doc(1L, "alpha beta beta delta", ts("00:30")),
        Doc(2L, "epsilon alpha beta", ts("01:10")))
      ms.addData(docs.take(2)); q.processAllAvailable()
      ms.addData(docs.drop(2)); q.processAllAvailable()
      val got = spark.table("trend")
        .orderBy($"w_start").collect()
      assert(got.nonEmpty)
      // batch twin per window over the same data
      val batch = docs.map(d => (d.text, d.ts)).toDF("text", "ts")
        .select($"ts", explode(split($"text", " ")).as("term"))
        .groupBy(window($"ts", "3 hours", "1 hour"))
        .agg(Engine.heavyHittersAgg($"term", 8).as("hh"))
        .select($"window.start".as("w_start"), expr("slice(hh, 1, 3)").as("top_terms"))
        .orderBy($"w_start").collect()
      assert(got.map(_.toString).toSeq === batch.map(_.toString).toSeq,
        "streaming windows diverged from the batch twin")
      // the dominant term leads its windows
      val first = got.head.getSeq[org.apache.spark.sql.Row](1)
      assert(first.head.getString(0) === "alpha")
    } finally q.stop()
  }

  test("streaming audio dedup: first clip per fingerprint survives, decode runs in-stream") {
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[RasterDoc] // same (doc_id, payload, ts) shape
    val q = StreamingOps.audioDedupStream(ms.toDF(), "ts")
      .writeStream.format("memory").queryName("adedup").outputMode("append")
      .start()
    try {
      val fp = (id: Long) => {
        val (period, phase, n, k) = Multimodal.waveParams(id)
        Multimodal.waveFingerprint(
          Array.tabulate(n)(t => Multimodal.sampleAt(period, phase, n, k, t)))
      }
      // 0 and 160 are byte-identical audio (every synth param shared);
      // 1 is a different scene with a distinct profile
      assert(fp(0L) === fp(160L), "fixture: 0/160 must share the fingerprint")
      assert(fp(0L) !== fp(1L), "fixture: different scenes must differ")
      ms.addData(Seq(
        RasterDoc(0L, Multimodal.waveBytes(0L), ts("00:10")),
        RasterDoc(160L, Multimodal.waveBytes(160L), ts("00:20")),
        RasterDoc(1L, Multimodal.waveBytes(1L), ts("00:30"))))
      q.processAllAvailable()
      ms.addData(Seq( // 320 = dup of 0 arriving in a LATER micro-batch
        RasterDoc(320L, Multimodal.waveBytes(320L), ts("00:40"))))
      q.processAllAvailable()
      val kept = spark.table("adedup").select($"doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(kept === Seq(0L, 1L),
        s"expected first-per-fingerprint {0,1}, got $kept")
      // decoded stats flow through alongside the dedup key
      val row0 = spark.table("adedup").filter($"doc_id" === 0L).collect()(0)
      assert(row0.getAs[Int]("n_samples") === Multimodal.waveParams(0L)._3)
    } finally q.stop()
  }

  test("streaming video dedup: first clip per signature survives, walk runs in-stream") {
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[RasterDoc] // same (doc_id, payload, ts) shape
    val q = StreamingOps.videoDedupStream(ms.toDF(), "ts")
      .writeStream.format("memory").queryName("vdedup").outputMode("append")
      .start()
    try {
      // 0 and 160 are byte-identical clips (every geometry modulus
      // divides 160); 1 is a different scene family
      ms.addData(Seq(
        RasterDoc(0L, Multimodal.videoBytes(0L), ts("00:10")),
        RasterDoc(160L, Multimodal.videoBytes(160L), ts("00:20")),
        RasterDoc(1L, Multimodal.videoBytes(1L), ts("00:30"))))
      q.processAllAvailable()
      ms.addData(Seq( // 320 = dup of 0 arriving in a LATER micro-batch
        RasterDoc(320L, Multimodal.videoBytes(320L), ts("00:40"))))
      q.processAllAvailable()
      val kept = spark.table("vdedup").select($"doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(kept === Seq(0L, 1L),
        s"expected first-per-signature {0,1}, got $kept")
      assert(spark.table("vdedup").filter($"doc_id" === 0L)
        .collect()(0).getAs[Int]("n_frames") === Multimodal.videoParams(0L)._3)
    } finally q.stop()
  }

  test("streaming keyframes: stateless kernel extraction matches batch p93 rows") {
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[RasterDoc]
    val q = StreamingOps.videoKeyframesStream(ms.toDF(), tau = 8, "ts")
      .writeStream.format("memory").queryName("vkeyf").outputMode("append")
      .start()
    try {
      val ids = Seq(0L, 1L, 6L, 9L)
      ms.addData(ids.map(i => RasterDoc(i, Multimodal.videoBytes(i), ts("00:10"))))
      q.processAllAvailable()
      val got = spark.table("vkeyf")
        .select($"doc_id", $"frame", $"scene", $"fhash")
        .collect().map(_.toSeq).toSet
      val want = graft.operators.Pipeline10.keyframesOf(
          Multimodal.decodeVideoFrames(Multimodal.attachVideo(
            ids.toDF("doc_id"))), tau = 8)
        .collect().map(_.toSeq).toSet
      assert(got === want, "streamed keyframes diverged from batch p93")
    } finally q.stop()
  }

  test("streaming perceptual dedup: first image per dHash survives, decode runs in-stream") {
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[RasterDoc]
    val q = StreamingOps.perceptualDedupStream(ms.toDF(), "ts")
      .writeStream.format("memory").queryName("pdedup").outputMode("append")
      .start()
    try {
      // 0 and 160 render IDENTICAL rasters (same dims/scene/jitter);
      // 1 is a different scene; 81 is 1's jitter twin whose brightness
      // shift flips 2 sampled wrap bits -> dHash differs -> admitted
      // (the gate is exact-signature; radius dedup is the batch path)
      ms.addData(Seq(
        RasterDoc(0L, Multimodal.rasterBytes(0L), ts("00:10")),
        RasterDoc(160L, Multimodal.rasterBytes(160L), ts("00:20")),
        RasterDoc(1L, Multimodal.rasterBytes(1L), ts("00:30"))))
      q.processAllAvailable()
      ms.addData(Seq(
        RasterDoc(320L, Multimodal.rasterBytes(320L), ts("00:40")), // dup of 0, 2nd batch
        RasterDoc(81L, Multimodal.rasterBytes(81L), ts("00:50"))))
      q.processAllAvailable()
      val kept = spark.table("pdedup").select($"doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      val h = (id: Long) => {
        val b = Multimodal.rasterBytes(id)
        val off = b.indexOfSlice("255\n".getBytes("US-ASCII")) + 4
        val (w, hh) = Multimodal.rasterDims(id)
        Multimodal.dHash(b, off, w, hh)
      }
      assert(h(0L) === h(160L) && h(0L) === h(320L), "fixture: 0/160/320 must collide")
      assert(h(1L) !== h(81L), "fixture: jitter twin must differ in dHash")
      assert(kept === Seq(0L, 1L, 81L),
        s"expected first-per-hash {0,1,81}, got $kept")
      // decoded stats flow through the stream alongside the dedup keys
      val row0 = spark.table("pdedup").filter($"doc_id" === 0L).collect()(0)
      assert(row0.getAs[Int]("width") === Multimodal.rasterDims(0L)._1)
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with recent purchases only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamingOps.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("sjoin").outputMode("append")
      .start()
    try {
      purchases.addData(Seq(
        Event(10L, ts("00:30"), 1L, "purchase", 9.0),
        Event(11L, ts("02:00"), 1L, "purchase", 7.0)))
      clicks.addData(Seq(
        Event(20L, ts("01:00"), 1L, "click", 0.0),  // matches 00:30 only
        Event(21L, ts("04:00"), 1L, "click", 0.0))) // matches nothing (>1h)
      q.processAllAvailable()
      val got = spark.table("sjoin")
        .select($"click_id", $"purchase_value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got === Set((20L, 9.0)))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.runningUserTotals(ms.toDS())
      .writeStream.format("memory").queryName("running").outputMode("update")
      .start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
      // last update per user reflects all 5 events
      val last = spark.table("running").groupBy($"user_id")
        .agg(max(struct($"n_events", $"total_value")).as("s"))
        .select($"user_id", $"s.n_events", $"s.total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(last === Set((1L, 3L, 13.5), (2L, 2L, 9.0)))
    } finally q.stop()
  }

  test("streaming Welford anomaly: spike flagged against pre-spike history") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.streamingAnomalies(ms.toDS())
      .writeStream.format("memory").queryName("anom").outputMode("update")
      .start()
    try {
      // batch 1: stable history for user 7 (mean ~10.4, sd ~0.55)
      ms.addData(Seq(10.0, 11.0, 10.0, 11.0, 10.0).zipWithIndex.map {
        case (v, i) => Event(i.toLong, ts(f"00:0$i"), 7L, "view", v)
      })
      q.processAllAvailable()
      // batch 2: a 30.0 spike, then a normal 11.0 after it
      ms.addData(Seq(Event(10L, ts("01:00"), 7L, "view", 30.0),
                     Event(11L, ts("01:01"), 7L, "view", 11.0)))
      q.processAllAvailable()
      val rows = spark.table("anom").collect()
        .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
      assert(rows.size === 7)
      // warm-up rows (history < 3) are never flagged
      (0L to 2L).foreach(i => assert(!rows(i)._2, s"warm-up event $i flagged"))
      assert(rows(10L)._2, s"spike not flagged: z=${rows(10L)._1}")
      assert(rows(10L)._1 > 10.0)
      // the post-spike normal value is judged against history that now
      // includes the spike — still not anomalous
      assert(!rows(11L)._2, s"normal event flagged: z=${rows(11L)._1}")
      (3L to 4L).foreach(i => assert(!rows(i)._2, s"stable event $i flagged"))
    } finally q.stop()
  }

  test("sliding 3h/1h windows match the batch sliding aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.slidingUserActivity(ms.toDF())
      .writeStream.format("memory").queryName("sliding").outputMode("complete")
      .start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
      val got = spark.table("sliding").orderBy($"w_start")
        .collect().map(r => (r.getTimestamp(0), r.getLong(2), r.getLong(3)))
      val exp = (batch1 ++ batch2).toDF()
        .groupBy(window($"ts", "3 hours", "1 hour"))
        .agg(hll_sketch_estimate(
               hll_sketch_agg($"user_id", lit(graft.operators.Sketches.LgConfigK))).as("u"),
             count(lit(1)).as("n"))
        .select($"window.start", $"u", $"n").orderBy($"start")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
      // window set and event counts are exact; the HLL estimate is
      // compared within 2x the shared precision's standard error, NOT
      // bit-equal — the streaming run merges incremental state-store
      // sketches across micro-batches while the batch twin aggregates
      // in one pass, and DataSketches estimates are path-dependent
      // below the error floor (see Sketches.LgConfigK)
      assert(got.map(t => (t._1, t._3)).toSeq === exp.map(t => (t._1, t._3)).toSeq)
      val tol = 2 * 1.04 / math.sqrt(1 << graft.operators.Sketches.LgConfigK)
      got.zip(exp).foreach { case ((w, s, _), (_, b, _)) =>
        assert(math.abs(s - b) <= math.max(1.0, tol * b),
          s"window $w: streaming estimate $s vs batch $b beyond sketch error")
      }
      // every event covers exactly 3 sliding windows
      assert(got.map(_._3).sum === 3L * (batch1.size + batch2.size))
    } finally q.stop()
  }

  test("streaming contamination gate matches the batch join on identical documents") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextAnalysis.shingles
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val hashes = StreamingOps.benchShingleHashes(bench)
    assert(hashes.size === 2) // 6 words -> two 5-gram shingles
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon nothing else here at all"),
      (2L, "completely different words with no overlap whatsoever in them"),
      (3L, "alpha beta gamma delta epsilon zeta and a tail of words"),
      (4L, null.asInstanceOf[String])) // null text must gate as clean, like the batch twin
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.contaminationGate(ms.toDF().toDF("doc_id", "text"), hashes)
      .writeStream.format("memory").queryName("cgate").outputMode("append")
      .start()
    try {
      ms.addData(corpus); q.processAllAvailable()
      val got = spark.table("cgate").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
      // the batch twin: p30's explode + broadcast-join + per-doc count
      // shape over the very same frames
      val sh = corpus.toDF("doc_id", "text")
        .select($"doc_id", explode(shingles($"text", 5)).as("s"))
        .select($"doc_id", xxhash64($"s").as("h"))
      val bsh = bench.select(explode(shingles($"text", 5)).as("s"))
        .select(xxhash64($"s").as("h")).distinct()
      val exp = sh.join(broadcast(bsh), "h")
        .groupBy($"doc_id").agg(countDistinct($"h").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      corpus.foreach { case (id, _) =>
        val (n, flag) = got(id)
        assert(n.toLong === exp.getOrElse(id, 0L), s"doc $id count diverges from batch")
        assert(flag === exp.contains(id), s"doc $id flag diverges from batch")
      }
      assert(got(3L)._1 === 2 && got(1L)._1 === 1 && got(2L)._1 === 0)
      assert(got(4L) === ((0, false)), "null text must be clean, not NULL/-1")
    } finally q.stop()
  }

  test("stream-static enrich joins the dim without streaming state") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val ms = MemoryStream[Event]
    val q = StreamingOps.enrichWithDim(ms.toDF(), dim)
      .writeStream.format("memory").queryName("enriched").outputMode("append")
      .start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      val got = spark.table("enriched")
        .select($"event_id", $"tier").orderBy($"event_id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq === Seq((0L, "gold"), (1L, "basic"), (2L, "gold")))
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty, "unexpected streaming state")
    } finally q.stop()
  }

  test("idempotent batch sink: re-delivered micro-batch writes nothing twice") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val write = StreamingOps.idempotentParquetBatch(dir) _
    write(batch1.toDF(), 0L)
    val firstRows = spark.read.parquet(s"$dir/batch=0").count()
    assert(firstRows === batch1.size)
    // simulate foreachBatch re-delivery of the SAME batch id with
    // different (partial) content after a crash-restart: must be a no-op
    write(batch1.take(1).toDF(), 0L)
    assert(spark.read.parquet(s"$dir/batch=0").count() === firstRows)
    // a NEW batch id still lands
    write(batch2.toDF(), 1L)
    assert(spark.read.parquet(s"$dir/batch=1").count() === batch2.size)
  }

  test("idempotent batch sink: crash mid-write (dir present, no marker) is overwritten, not skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    // Simulate FileOutputCommitter state after a crash mid-job: the
    // batch directory exists (with _temporary debris) but the job never
    // committed — no marker. The re-delivered batch MUST land.
    val debris = new java.io.File(s"$dir/batch=0/_temporary/0")
    assert(debris.mkdirs())
    val write = StreamingOps.idempotentParquetBatch(dir) _
    write(batch1.toDF(), 0L)
    assert(spark.read.parquet(s"$dir/batch=0").count() === batch1.size)
    assert(new java.io.File(s"$dir/batch=0/_GRAFT_COMMITTED").exists())
    // and now that it committed, a second re-delivery is a no-op
    write(batch1.take(1).toDF(), 0L)
    assert(spark.read.parquet(s"$dir/batch=0").count() === batch1.size)
  }

  test("aggregation state survives a query restart via the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val ms = MemoryStream[Event]
    def start(name: String) = StreamingOps.hourlyCounts(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode("complete")
      .option("checkpointLocation", ckpt).start()
    val q1 = start("ckpt_run1")
    try { ms.addData(batch1); q1.processAllAvailable() } finally q1.stop()
    // restart: the new query never sees batch1's rows (offsets are
    // committed), yet its output must still include them — the window
    // state comes back from the state store, not from reprocessing.
    val q2 = start("ckpt_run2")
    try {
      ms.addData(batch2); q2.processAllAvailable()
      val got = spark.table("ckpt_run2")
        .orderBy($"hr", $"event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      val exp = (batch1 ++ batch2).toDF()
        .groupBy(date_trunc("hour", $"ts").as("hr"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"hr", $"event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      assert(got.toSeq === exp.toSeq,
        "restarted query lost pre-restart aggregation state")
    } finally q2.stop()
  }

  test("ivf-pq streaming ingest: staged exactly-once, merged store equals a full rebuild") {
    import graft.operators.Pipeline6
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val cents = Similarity.seedCentroids(emb, 8)
    val cb = Pipeline6.pqCodebook(emb)
    val base = emb.filter($"vec_id" < 25)
    val inc1 = emb.filter($"vec_id" >= 25 && $"vec_id" < 40)
    val inc2 = emb.filter($"vec_id" >= 40)
    val store = java.nio.file.Files.createTempDirectory("ivfpq_live").toString
    val stage = java.nio.file.Files.createTempDirectory("ivfpq_stage").toString
    Pipeline6.ivfPqWrite(cents, cb, base, store)
    // micro-batches arrive (exercised exactly as foreachBatch delivers)
    val ingest = StreamingOps.ivfPqIngestBatch(cents, cb, stage) _
    ingest(inc1, 0L)
    ingest(inc2, 1L)
    // crash-redelivery of batch 0 with partial content: must be a no-op
    ingest(inc1.limit(3), 0L)
    assert(StreamingOps.ivfPqMergeStaged(spark, stage, store) === 2)
    // a second merge folds nothing (tombstones)
    assert(StreamingOps.ivfPqMergeStaged(spark, stage, store) === 0)
    // the live store now answers identically to a one-shot full build
    val queries = emb.filter($"vec_id" < 3)
    val rebuilt = java.nio.file.Files.createTempDirectory("ivfpq_full").toString
    Pipeline6.ivfPqWrite(cents, cb, emb, rebuilt)
    def probe(p: String) =
      Pipeline6.ivfPqTopKStored(spark, p, queries, cents, cb, k = 10, nProbe = 3)
        .orderBy($"qid", $"rnk").collect().toSeq
    assert(probe(store) === probe(rebuilt),
      "streamed-and-merged store diverges from a full rebuild")
    // the merge accumulates small per-cell files; partition-preserving
    // compaction (the documented maintenance step) must not change a
    // single probe answer
    val compacted = java.nio.file.Files.createTempDirectory("ivfpq_compact").toString
    graft.sources.Maintenance.compactPartitioned(spark, store, compacted, "cell")
    assert(probe(compacted) === probe(store),
      "compaction changed probe results on the live store")
  }

  test("lexical streaming ingest: staged exactly-once, merged index answers like a full rebuild") {
    import graft.operators.Pipeline6
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val base = docs.filter($"doc_id" < 25)
    val inc1 = docs.filter($"doc_id" >= 25 && $"doc_id" < 38)
    val inc2 = docs.filter($"doc_id" >= 38)
    val table = "graft_postings_stream_spec"
    val stage = java.nio.file.Files.createTempDirectory("lex_stage").toString
    Pipeline6.postingsWrite(base, table, nBuckets = 8)
    val ingest = StreamingOps.lexicalIngestBatch(stage) _
    ingest(inc1, 0L)
    ingest(inc2, 1L)
    ingest(inc1.limit(2), 0L) // crash-redelivery: must be a no-op
    assert(StreamingOps.lexicalMergeStaged(spark, stage, table, 8) === 2)
    assert(StreamingOps.lexicalMergeStaged(spark, stage, table, 8) === 0)
    // merged index == one-shot rebuild over the union corpus, exactly:
    // the stats folds are pure long addition, so idf/avgdl are not
    // approximately refreshed but bit-identical
    val full = "graft_postings_stream_spec_full"
    Pipeline6.postingsWrite(docs, full, nBuckets = 8)
    val terms = Seq("merge", "stream", "vector")
    val got = Pipeline6.bm25TopKStored(spark, table, 20, terms).collect()
    val want = Pipeline6.bm25TopKStored(spark, full, 20, terms).collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq,
      "streamed-and-merged lexical index diverges from a full rebuild")
    // and the folded stats equal the rebuild's (the merged table holds
    // one append-only row per batch; the fold is exact long addition)
    def foldStats(t: String): (Long, Long) = {
      val Array(r) = spark.table(s"${t}_stats")
        .agg(sum($"n"), sum($"sdl")).collect()
      (r.getLong(0), r.getLong(1))
    }
    assert(foldStats(table) === foldStats(full))
    // bucket pruning survives ingestion: appended files carry the same
    // bucket spec, so the probe still reads <=|terms| of the buckets
    val plan = Pipeline6.bm25TopKStored(spark, table, 20, terms)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, "merged index lost bucket pruning")
    assert(m.get.group(1).toInt <= 3 && m.get.group(2).toInt === 8,
      s"probe reads ${m.get.group(1)} of ${m.get.group(2)} buckets after merge")
  }

  test("lexical merge compaction trigger: slivers fold to one file per bucket, search parity holds") {
    // the bucketed twin of the handler trigger: with the bound forced
    // low, the merge itself pays compactBucketed — one file per bucket
    // after, search and stats parity untouched, bucket pruning intact
    import graft.operators.Pipeline6
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val base = docs.filter($"doc_id" < 25)
    val table = "graft_postings_trigger_spec"
    val stage = java.nio.file.Files.createTempDirectory("lex_trig").toString
    Pipeline6.postingsWrite(base, table, nBuckets = 8)
    val ingest = StreamingOps.lexicalIngestBatch(stage) _
    ingest(docs.filter($"doc_id" >= 25 && $"doc_id" < 38), 0L)
    ingest(docs.filter($"doc_id" >= 38), 1L)
    assert(StreamingOps.lexicalMergeStaged(spark, stage, table, 8,
      compactMaxFiles = 1) === 2)
    val loc = spark.sql(s"DESCRIBE FORMATTED $table")
      .filter($"col_name" === "Location").head().getString(1)
    val bucketOf = "_(\\d+)\\.c000".r
    val counts = new java.io.File(new java.net.URI(loc)).listFiles()
      .map(_.getName)
      .filter(n => !n.startsWith(".") && n.endsWith(".parquet"))
      .flatMap(n => bucketOf.findFirstMatchIn(n).map(_.group(1)))
      .groupBy(identity).view.mapValues(_.length)
    assert(counts.nonEmpty && counts.values.forall(_ === 1),
      s"trigger left sliver files per bucket: ${counts.toMap}")
    val full = "graft_postings_trigger_spec_full"
    Pipeline6.postingsWrite(docs, full, nBuckets = 8)
    val terms = Seq("merge", "stream", "vector")
    assert(Pipeline6.bm25TopKStored(spark, table, 20, terms)
        .collect().map(_.toSeq).toSeq ===
      Pipeline6.bm25TopKStored(spark, full, 20, terms)
        .collect().map(_.toSeq).toSeq,
      "compacted streamed index diverges from a full rebuild")
    val plan = Pipeline6.bm25TopKStored(spark, table, 20, terms)
      .queryExecution.executedPlan.toString
    assert("SelectedBucketsCount: (\\d+) out of 8".r
      .findFirstMatchIn(plan).exists(_.group(1).toInt <= 3),
      "bucket pruning lost after triggered compaction")
  }

  test("store-swap crash recovery: both swap devices heal a death between their renames") {
    import graft.operators.Dedup
    // hive-layout store: kill the swap after rename(root -> precompact)
    // — the window where the live path is missing but BOTH copies exist
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").filter($"doc_id" < 60)
    val store = java.nio.file.Files.createTempDirectory("swap_lsh").toString
    Engine.lshStoreWrite(docs, "doc_id", "text", store)
    val want = spark.read.parquet(store).collect().map(_.toSeq).toSet
    Dedup.lshStoreCompact(spark, store, s"${store}__compact")
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(s"${store}__precompact")))
    assert(StreamingOps.recoverStoreSwap(spark, store),
      "heal found nothing in the between-renames state")
    assert(spark.read.parquet(store).collect().map(_.toSeq).toSet === want,
      "healed store content diverged")
    assert(!new java.io.File(s"${store}__precompact").exists() &&
      !new java.io.File(s"${store}__compact").exists(),
      "heal left swap debris")
    assert(!StreamingOps.recoverStoreSwap(spark, store),
      "second heal was not a no-op")
    // bucketed-table device: kill between DROP and RENAME — the live
    // table is gone, its complete replacement still registered as tmp
    import graft.operators.Pipeline6
    val table = "graft_swap_recovery_spec"
    Pipeline6.postingsWrite(docs, table, nBuckets = 4)
    val wantRows = spark.table(table).collect().map(_.toSeq).toSet
    graft.sources.Bucketed.writeBucketed(
      spark.table(table).repartition(4, $"term"), s"${table}__compact",
      "term", 4)
    spark.sql(s"DROP TABLE $table")
    assert(graft.sources.Bucketed.recoverBucketedSwap(spark, table),
      "bucketed heal found nothing after the DROP")
    assert(spark.table(table).collect().map(_.toSeq).toSet === wantRows,
      "healed bucketed table content diverged")
    assert(!spark.catalog.tableExists(s"${table}__compact"))
  }

  test("lexical merge survives every crash window: empty batch, re-append, lost tombstone") {
    import graft.operators.Pipeline6
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val base = docs.filter($"doc_id" < 30)
    val inc = docs.filter($"doc_id" >= 30 && $"doc_id" < 45)
    val table = "graft_postings_crash_spec"
    val stage = java.nio.file.Files.createTempDirectory("lex_crash_stage").toString
    Pipeline6.postingsWrite(base, table, nBuckets = 8)
    val ingest = StreamingOps.lexicalIngestBatch(stage) _
    // an EMPTY micro-batch (foreachBatch delivers them): must stage,
    // fold as (id, 0, 0), and never poison subsequent merges
    ingest(docs.filter(lit(false)), 0L)
    ingest(inc, 1L)
    assert(StreamingOps.lexicalMergeStaged(spark, stage, table, 8) === 2)
    val terms = Seq("merge", "stream", "vector")
    val want = Pipeline6.bm25TopKStored(spark, table, 20, terms)
      .collect().map(_.toSeq).toSeq
    def stats() = spark.table(s"${table}_stats")
      .agg(sum($"n"), sum($"sdl")).collect()(0)
    val wantStats = (stats().getLong(0), stats().getLong(1))
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window A: tombstone lost AFTER a complete fold — the stats
    // commit record must short-circuit to tombstone repair, appending
    // nothing twice
    fs.delete(new org.apache.hadoop.fs.Path(s"$stage/batch=1/_GRAFT_MERGED"), false)
    assert(StreamingOps.lexicalMergeStaged(spark, stage, table, 8) === 1)
    assert(Pipeline6.bm25TopKStored(spark, table, 20, terms)
      .collect().map(_.toSeq).toSeq === want, "tombstone repair duplicated postings")
    assert((stats().getLong(0), stats().getLong(1)) === wantStats,
      "tombstone repair double-folded stats")
    // crash window B: postings appended but crash BEFORE the stats
    // commit — simulate by hand-running the merge's append step for a
    // fresh batch, then merging normally: the presence probe must skip
    // the re-append and only the stats row lands
    val inc2 = docs.filter($"doc_id" >= 45 && $"doc_id" < 55)
    ingest(inc2, 2L)
    spark.read.parquet(s"$stage/batch=2").withColumn("ingest_batch", lit(2L))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(8, "term").sortBy("term").format("parquet").saveAsTable(table)
    assert(StreamingOps.lexicalMergeStaged(spark, stage, table, 8) === 1)
    val full = "graft_postings_crash_spec_full"
    Pipeline6.postingsWrite(docs.filter($"doc_id" < 55), full, nBuckets = 8)
    assert(Pipeline6.bm25TopKStored(spark, table, 20, terms)
        .collect().map(_.toSeq).toSeq ===
      Pipeline6.bm25TopKStored(spark, full, 20, terms)
        .collect().map(_.toSeq).toSeq,
      "crash between posting append and stats commit corrupted the index")
  }

  test("ivf-pq merge repairs a lost tombstone without duplicating code rows") {
    import graft.operators.{Pipeline6, Similarity}
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val cents = Similarity.seedCentroids(emb, 8)
    val cb = Pipeline6.pqCodebook(emb)
    val store = java.nio.file.Files.createTempDirectory("ivfpq_crash_live").toString
    val stage = java.nio.file.Files.createTempDirectory("ivfpq_crash_stage").toString
    Pipeline6.ivfPqWrite(cents, cb, emb.filter($"vec_id" < 30), store)
    StreamingOps.ivfPqIngestBatch(cents, cb, stage)(emb.filter($"vec_id" >= 30), 0L)
    assert(StreamingOps.ivfPqMergeStaged(spark, stage, store) === 1)
    val want = spark.read.parquet(store).count()
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$stage/batch=0/_GRAFT_MERGED"), false)
    assert(StreamingOps.ivfPqMergeStaged(spark, stage, store) === 1)
    assert(spark.read.parquet(store).count() === want,
      "lost tombstone re-appended an already-folded batch")
  }

  test("frame-signature streaming ingest: staged exactly-once, merged store probes like a full rebuild") {
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id").localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("frame_live").toString
    val stage = java.nio.file.Files.createTempDirectory("frame_stage").toString
    Multimodal.frameStoreWrite(
      Multimodal.decodeVideoFrames(Multimodal.attachVideo(
        docs.filter($"doc_id" < 30)))
        .select($"doc_id", $"frame", $"fhash"), store)
    // a REAL stream drives the ingest through foreachBatch
    val ms = MemoryStream[Long]
    val q = ms.toDF().toDF("doc_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamingOps.frameIngestBatch(stage)(
          Multimodal.attachVideo(batch), id)
      }
      .start()
    try {
      val rest = docs.filter($"doc_id" >= 30).as[Long].collect()
      ms.addData(rest.take(rest.length / 2).toSeq); q.processAllAvailable()
      ms.addData(rest.drop(rest.length / 2).toSeq); q.processAllAvailable()
    } finally q.stop()
    assert(StreamingOps.frameMergeStaged(spark, stage, store) === 2)
    assert(StreamingOps.frameMergeStaged(spark, stage, store) === 0)
    // crash window: lost tombstone must repair without duplicate rows
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$stage/batch=0/_GRAFT_MERGED"), false)
    val want = spark.read.parquet(store).count()
    assert(StreamingOps.frameMergeStaged(spark, stage, store) === 1)
    assert(spark.read.parquet(store).count() === want,
      "lost tombstone re-appended an already-folded frame batch")
    // the merged store answers identically to a one-shot full build
    val full = java.nio.file.Files.createTempDirectory("frame_full").toString
    Multimodal.frameStoreWrite(
      Multimodal.decodeVideoFrames(Multimodal.attachVideo(docs))
        .select($"doc_id", $"frame", $"fhash"), full)
    val qs = Multimodal.decodeVideoFrames(Multimodal.attachVideo(
        docs.filter($"doc_id" < 5)))
      .filter($"frame" === 0)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("fhash"))).toSeq
    def probe(p: String) =
      Multimodal.frameProbeStored(spark, p, qs, maxHamming = 3)
        .orderBy($"qid", $"doc_id", $"frame").collect().map(_.toSeq).toSeq
    val got = probe(store)
    assert(got.nonEmpty && got === probe(full),
      "streamed-and-merged frame store diverges from a full rebuild")
    // compaction (which restores ONE band_v-sorted file per band, and
    // with it row-group skipping) must not change a single probe answer
    val compacted = java.nio.file.Files.createTempDirectory("frame_compact").toString
    Multimodal.frameStoreCompact(spark, store, compacted)
    assert(probe(compacted) === got,
      "compaction changed probe results on the live frame store")
    // post-compaction layout: one file per band partition, and the
    // probe plan still pushes the band_v filter into the scan
    val lfs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    for (b <- 0 until 4) {
      val files = lfs.listStatus(
        new org.apache.hadoop.fs.Path(s"$compacted/band_i=$b"))
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(files === 1, s"band $b not compacted to one file ($files)")
    }
    val plan = Multimodal.frameProbeStored(spark, compacted, qs, maxHamming = 3)
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*band_v.*"),
      "band_v filter no longer pushed into the compacted store scan")
  }

  test("streaming containment gate matches batch p99 on the same rows") {
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    // published corpus → live frame store (the p100 layout)
    val pub = (0L until 40L).toDF("doc_id").localCheckpoint()
    val pubFrames = Multimodal.decodeVideoFrames(Multimodal.attachVideo(pub))
      .select($"doc_id", $"frame", $"n_frames", $"fhash").localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("cg_store").toString
    Multimodal.frameStoreWrite(
      pubFrames.select($"doc_id", $"frame", $"fhash"), store)
    // arriving batch: hand-sliced trims of a published clip (the true
    // re-upload case), plus an unrelated clip
    val full = Multimodal.videoBytes(2L) // published, 4 frames
    val (w, h, _) = Multimodal.videoParams(2L)
    val frameLen = s"P6\n$w $h\n255\n".length + w * h * 3
    val arriving = Seq(
      1000L -> full.drop(frameLen),                 // head-trim (3 frames)
      1001L -> full.slice(frameLen, 3 * frameLen),  // middle slice (2 frames)
      1002L -> Multimodal.videoBytes(41L))          // unrelated
    // drive the gate through a REAL stream, collecting verdicts per batch
    val verdicts = collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val ms = MemoryStream[Long]
    val payloads = arriving.toMap
    val q = ms.toDF().toDF("doc_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val withPayload = batch.collect().map(_.getLong(0))
          .map(id => (id, payloads(id))).toSeq.toDF("doc_id", "payload")
        verdicts ++= StreamingOps.containmentGateBatch(spark, store)(withPayload)
          .collect().map(_.toSeq)
        ()
      }
      .start()
    try {
      ms.addData(Seq(1000L, 1001L)); q.processAllAvailable()
      ms.addData(Seq(1002L)); q.processAllAvailable()
    } finally q.stop()
    // batch p99 over the union corpus, restricted to (arriving, stored)
    val batchFrames = Multimodal.decodeVideoFrames(
        arriving.toDF("doc_id", "payload"))
      .select($"doc_id", $"frame", $"n_frames", $"fhash")
    val want = Multimodal.clipContainment(
        pubFrames.unionByName(batchFrames), maxHamming = 3)
      .filter($"short_id" >= 1000L && $"long_id" < 1000L)
      .collect().map(_.toSeq).toSet
    assert(verdicts.toSet === want,
      "streaming containment gate diverged from batch p99")
    assert(verdicts.exists(v => v(0) == 1000L && v(1) == 2L && v(2) == 1),
      "head-trim of a published clip not flagged at offset 1")
    assert(verdicts.exists(v => v(0) == 1001L && v(1) == 2L && v(2) == 1),
      "middle slice of a published clip not flagged")
  }

  test("streaming AUDIO containment gate matches batch p105 on the same rows") {
    // the modality-generic gate core through its audio wrapper: a
    // published corpus's segment fingerprints at rest, arriving tracks
    // hand-sliced at segment boundaries from a published track's
    // samples — the jingle-re-upload case
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val L = 64
    val pub = (0L until 40L).toDF("doc_id").localCheckpoint()
    val pubSegs = Multimodal.decodeWaveSegments(Multimodal.attachWave(pub), L)
      .localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("ag_store").toString
    Engine.audioStoreWrite(pubSegs, store)
    val (period, phase, n, k) = Multimodal.waveParams(3L) // published, 7 segs
    val base = Array.tabulate(n)(t => Multimodal.sampleAt(period, phase, n, k, t))
    val arriving = Seq(
      1000L -> Multimodal.wavePcmBytes(base.slice(L, 5 * L)), // middle (4 segs)
      1001L -> Multimodal.wavePcmBytes(base.drop(4 * L)),     // tail (3 segs)
      1002L -> Multimodal.waveBytes(41L))                     // unrelated
    val verdicts = collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val ms = MemoryStream[Long]
    val payloads = arriving.toMap
    val q = ms.toDF().toDF("doc_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val withPayload = batch.collect().map(_.getLong(0))
          .map(id => (id, payloads(id))).toSeq.toDF("doc_id", "payload")
        verdicts ++= StreamingOps.audioContainmentGateBatch(spark, store, L)(
          withPayload).collect().map(_.toSeq)
        ()
      }
      .start()
    try {
      ms.addData(Seq(1000L, 1001L)); q.processAllAvailable()
      ms.addData(Seq(1002L)); q.processAllAvailable()
    } finally q.stop()
    val batchSegs = Multimodal.decodeWaveSegments(
      arriving.toDF("doc_id", "payload"), L)
    val want = Multimodal.audioContainment(
        pubSegs.unionByName(batchSegs), maxHamming = 3)
      .filter($"short_id" >= 1000L && $"long_id" < 1000L)
      .collect().map(_.toSeq).toSet
    assert(verdicts.toSet === want,
      "streaming audio containment gate diverged from batch p105")
    assert(verdicts.exists(v => v(0) == 1000L && v(1) == 3L && v(2) == 1),
      "middle slice of a published track not flagged at offset 1")
    assert(verdicts.exists(v => v(0) == 1001L && v(1) == 3L && v(2) == 4),
      "tail trim of a published track not flagged at offset 4")
  }

  test("streaming TEXT near-dup gate + staged LSH merge match batch p04") {
    // the text member of the published-corpus gate family: arriving
    // documents probed against everything already published (which a
    // within-stream watermark gate cannot see), then folded into the
    // live store exactly-once
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val pub = docs.filter($"doc_id" < 400L).localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("lsh_store").toString
    Engine.lshStoreWrite(pub, "doc_id", "text", store)
    // arriving: exact copies of two published docs under new ids (the
    // re-publish case) plus an unrelated fresh doc
    val texts = docs.filter($"doc_id".isin(7L, 23L, 450L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val arriving = Seq(1007L -> texts(7L), 1023L -> texts(23L),
      1450L -> texts(450L))
    val stage = java.nio.file.Files.createTempDirectory("lsh_stage").toString
    val verdicts = collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ms = MemoryStream[Long]
    val payloads = arriving.toMap
    val q = ms.toDF().toDF("doc_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val withText = batch.collect().map(_.getLong(0))
          .map(i => (i, payloads(i))).toSeq.toDF("doc_id", "text")
        verdicts ++= StreamingOps.textDedupGateBatch(spark, store)(withText)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        StreamingOps.lshIngestBatch(stage)(withText, id)
        ()
      }
      .start()
    try {
      ms.addData(Seq(1007L, 1023L, 1450L)); q.processAllAvailable()
    } finally q.stop()
    // parity: batch p04 over the union corpus, cross-split pairs only
    // (published ids < 1000 <= arriving, and d1 < d2 in p04's output)
    val want = Dedup.minhashLshPairs(
        pub.unionByName(arriving.toDF("doc_id", "text")), "doc_id", "text")
      .filter($"d1" < 1000L && $"d2" >= 1000L)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(verdicts.toSet === want,
      "streaming text gate diverged from batch p04 candidates")
    assert(want((1007L, 7L)) && want((1023L, 23L)),
      "re-published copies not flagged against their originals")
    // staged merge folds the batch exactly once: the copy becomes
    // findable, a second merge pass adds nothing
    assert(StreamingOps.lshMergeStaged(spark, stage, store) >= 1)
    val q7 = Dedup.lshSignatureRows(pub.filter($"doc_id" === 7L),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val hits = Dedup.lshProbeStored(spark, store, q7)
      .collect().map(_.getLong(1)).toSet
    assert(hits(7L) && hits(1007L),
      "merged store does not answer for both the original and the copy")
    val n1 = spark.read.parquet(store).count()
    StreamingOps.lshMergeStaged(spark, stage, store)
    assert(spark.read.parquet(store).count() === n1,
      "re-running the merge double-folded a staged batch")
    // compaction restores one sig_h-sorted file per band with probe
    // parity and the pushed filter intact (the frame-store discipline)
    val before = Dedup.lshProbeStored(spark, store, q7)
      .collect().map(_.toSeq).toSet
    val compacted = java.nio.file.Files
      .createTempDirectory("lsh_compact").toString
    Dedup.lshStoreCompact(spark, store, compacted)
    val after = Dedup.lshProbeStored(spark, compacted, q7)
    assert(after.collect().map(_.toSeq).toSet === before,
      "compaction changed probe answers")
    for (b <- 0 until 4) {
      val files = new java.io.File(s"$compacted/band=$b")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"band=$b not compacted to one file")
    }
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*sig_h.*"),
      "sig_h filter no longer pushed into the compacted store scan")
  }

  test("streaming EMBEDDING near-dup gate + staged IVF merge match batch p73") {
    // the VECTOR member of the published-corpus gate family: arriving
    // embeddings probed against everything already published (which a
    // within-batch SemDeDup cannot see), then folded into the live
    // cell store exactly-once
    import graft.operators.{Pipeline7, Similarity}
    implicit val sqlCtx = spark.sqlContext
    val tau = 0.3
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
    val pub = emb.filter($"vec_id" < 400L).localCheckpoint()
    val cents = Similarity.seedCentroids(pub, 8)
    val store = java.nio.file.Files.createTempDirectory("ivf_live").toString
    Similarity.ivfWrite(pub, cents, store)
    // arriving: exact copies of two published vectors under new ids
    // (the re-publish case) plus a copy of an unpublished one
    val vecs = emb.filter($"vec_id".isin(7L, 23L, 450L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    val payloads = Map(1007L -> vecs(7L), 1023L -> vecs(23L),
      1450L -> vecs(450L))
    // precondition for exact p73 parity: no arriving vector may
    // witness another arriving one (their originals must sit apart)
    def cosLocal(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (u, v) => u.toDouble * v.toDouble }.sum
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    }
    for (Seq(a, b) <- Seq(7L, 23L, 450L).combinations(2)) {
      val c = cosLocal(vecs(a), vecs(b))
      assert(math.abs(c) < tau, s"fixture originals $a/$b too close: $c")
    }
    val arriving = payloads.toSeq.sortBy(_._1).toDF("vec_id", "embedding")
      .localCheckpoint()
    // gate at nProbe = 1 (p73's own-cell witness semantics)
    val flagged = StreamingOps.embeddingDedupGateBatch(spark, store, cents,
        tau, nProbe = 1)(arriving)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // parity: batch p73 over the union corpus under the SAME frozen
    // centroids — an arriving vector is flagged iff p73 drops it
    val want = Pipeline7.semDedupOf(pub.unionByName(arriving), cents, tau)
      .filter($"vec_id" >= 1000L && !$"kept")
      .collect().map(_.getLong(0)).toSet
    assert(flagged.keySet === want,
      s"streaming embedding gate diverged from batch p73: got " +
        s"${flagged.keySet}, want $want")
    assert(flagged.contains(1007L) && flagged.contains(1023L),
      "re-published vectors not flagged against their originals")
    // the copies' closest stored match is the original (cos = 1)
    assert(flagged(1007L) === 7L && flagged(1023L) === 23L,
      "dup_of did not name the original")
    // widening the probe fan-out only ADDS candidates
    val wide = StreamingOps.embeddingDedupGateBatch(spark, store, cents,
        tau, nProbe = 2)(arriving)
      .collect().map(_.getLong(0)).toSet
    assert(flagged.keySet.subsetOf(wide),
      "nProbe = 2 lost a flag nProbe = 1 had")
    // staged merge folds the batch exactly once into the live store
    val stage = java.nio.file.Files.createTempDirectory("ivf_stage").toString
    val ms = MemoryStream[Long]
    val q = ms.toDF().toDF("vec_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val withVec = batch.collect().map(_.getLong(0))
          .map(i => (i, payloads(i))).toSeq.toDF("vec_id", "embedding")
        StreamingOps.ivfIngestBatch(cents, stage)(withVec, id)
      }
      .start()
    try {
      ms.addData(Seq(1007L, 1023L, 1450L)); q.processAllAvailable()
    } finally q.stop()
    assert(StreamingOps.ivfMergeStaged(spark, stage, store) === 1)
    val n1 = spark.read.parquet(store).count()
    assert(n1 === 403L, "merged store row count off")
    assert(StreamingOps.ivfMergeStaged(spark, stage, store) === 0)
    assert(spark.read.parquet(store).count() === n1,
      "re-running the merge double-folded a staged batch")
    // the merged store now answers for the copy: probing with the
    // original's embedding finds both original and copy at cos 1
    val hits = Similarity.ivfProbeNearDup(spark, store,
        pub.filter($"vec_id" === 7L), cents, tau, nProbe = 1)
      .collect().map(_.getLong(1)).toSet
    assert(hits(1007L), "merged copy not findable from the live store")
  }

  test("VERIFIED streaming text gate matches exact Jaccard on the union corpus") {
    // the verify stage the unverified gate defers: candidates from the
    // LSH store, closed with exact Jaccard against the shingle SIDECAR
    // — no corpus rescan anywhere
    import graft.operators.Dedup
    val tau = 0.9
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val pub = docs.filter($"doc_id" < 400L).localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("vg_store").toString
    val sidecar = java.nio.file.Files.createTempDirectory("vg_side").toString
    Dedup.lshStoreWrite(
      Dedup.lshSignatureRows(pub, "doc_id", "text"), store)
    Dedup.shingleStoreWrite(
      Dedup.shingleSidecarRows(pub, "doc_id", "text"), sidecar)
    // arriving: an exact copy of a published doc (candidate, verifies
    // at 1.0), a near-miss (one word changed mid-doc: LSH-candidate
    // territory but BELOW tau — the verify must reject it), a fresh doc
    val texts = docs.filter($"doc_id".isin(7L, 23L, 450L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val words = texts(23L).split(" ")
    val nearMiss = (words.take(words.length / 2) ++ Array("zzzz") ++
      words.drop(words.length / 2 + 1)).mkString(" ")
    val arriving = Seq(1007L -> texts(7L), 1023L -> nearMiss,
      1450L -> texts(450L)).toDF("doc_id", "text").localCheckpoint()
    val got = StreamingOps.textDedupVerifiedGateBatch(spark, store,
        sidecar, tau)(arriving)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // parity: exact p03-at-tau over the union, restricted to the
    // cross-split LSH-candidate pairs — the gate's exact contract
    val un = pub.unionByName(arriving)
    val candBatch = Dedup.minhashLshPairs(un, "doc_id", "text")
      .filter($"d1" < 1000L && $"d2" >= 1000L)
    val want = Dedup.ngramJaccardPairs(un, "doc_id", "text", 5, tau)
      .join(candBatch, Seq("d1", "d2"), "left_semi")
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
      .toSet
    assert(got.toSet === want,
      s"verified gate diverged: got ${got.toSet}, want $want")
    // the copy is confirmed at Jaccard 1.0 ...
    assert(got.exists { case (d, o, j) => d == 1007L && o == 7L && j == 1.0 },
      "re-published copy not confirmed by the verify stage")
    // ... and the near-miss is REJECTED by verify even when the
    // banding surfaces it (assert the stage binds, not rubber-stamps)
    val nearMissCandidate = Dedup.minhashLshPairs(un, "doc_id", "text")
      .filter($"d1" === 23L && $"d2" === 1023L).count() > 0
    val nearMissJ = Dedup.ngramJaccardPairs(un, "doc_id", "text", 5, 0.0)
      .filter($"d1" === 23L && $"d2" === 1023L)
      .collect().headOption.map(_.getDouble(2))
    assert(nearMissJ.exists(j => j > 0 && j < tau),
      s"fixture near-miss out of band: $nearMissJ")
    if (nearMissCandidate)
      assert(!got.exists(_._1 == 1023L),
        "verify stage passed a below-threshold candidate through")
    // sidecar ingestion: staged merge folds the arriving shingles
    // exactly once; the verified gate then confirms a copy of an
    // ARRIVING doc against the merged sidecar
    val stage = java.nio.file.Files.createTempDirectory("vg_stage").toString
    StreamingOps.shingleIngestBatch(stage)(arriving, 0L)
    StreamingOps.lshIngestBatch(java.nio.file.Files
      .createTempDirectory("vg_sigstage").toString)(arriving, 0L)
    assert(StreamingOps.shingleMergeStaged(spark, stage, sidecar) === 1)
    assert(StreamingOps.shingleMergeStaged(spark, stage, sidecar) === 0)
    // fold the signatures too, then re-probe with a copy of doc 1450
    val sigStage = java.nio.file.Files
      .createTempDirectory("vg_sigstage2").toString
    StreamingOps.lshIngestBatch(sigStage)(arriving, 0L)
    assert(StreamingOps.lshMergeStaged(spark, sigStage, store) === 1)
    val again = StreamingOps.textDedupVerifiedGateBatch(spark, store,
        sidecar, tau)(Seq(2450L -> texts(450L)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.contains((2450L, 1450L, 1.0)),
      "copy of a merged arriving doc not confirmed from the live stores")
  }

  test("end-to-end: real streams feed BOTH staged merges; phrase + vector probes match batch builds") {
    // The integration seam the per-store specs don't cross: actual
    // Structured Streaming queries (MemoryStream → foreachBatch) drive
    // the lexical AND the vector ingestion, the operator-scheduled
    // merges fold both stores, and then RETRIEVAL runs over the
    // just-merged stores — a phrase probe (p58) and an IVF-PQ probe
    // (p49) — asserting row-for-row parity with one-shot batch builds
    // over the same union corpus.
    import graft.operators.{Pipeline6, Similarity}
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      .localCheckpoint()
    val emb = Tables.embeddings(spark, dir).localCheckpoint()
    val cents = Similarity.seedCentroids(emb, 8)
    val cb = Pipeline6.pqCodebook(emb)
    val table = "graft_postings_e2e_spec"
    val store = java.nio.file.Files.createTempDirectory("e2e_vec_live").toString
    val lexStage = java.nio.file.Files.createTempDirectory("e2e_lex_stage").toString
    val vecStage = java.nio.file.Files.createTempDirectory("e2e_vec_stage").toString
    Pipeline6.postingsWrite(docs.filter($"doc_id" < 30), table, nBuckets = 8)
    Pipeline6.ivfPqWrite(cents, cb, emb.filter($"vec_id" < 30), store)
    val docStream = MemoryStream[(Long, String)]
    val lexQ = docStream.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch(StreamingOps.lexicalIngestBatch(lexStage) _)
      .start()
    val vecStream = MemoryStream[(Long, Seq[Float], Int)]
    val vecQ = vecStream.toDF().toDF("vec_id", "embedding", "label")
      .writeStream.outputMode("append")
      .foreachBatch(StreamingOps.ivfPqIngestBatch(cents, cb, vecStage) _)
      .start()
    try {
      val docRows = docs.filter($"doc_id" >= 30)
        .as[(Long, String)].collect()
      val vecRows = emb.filter($"vec_id" >= 30)
        .as[(Long, Seq[Float], Int)].collect()
      // two micro-batches per stream, split mid-corpus
      docStream.addData(docRows.take(docRows.length / 2).toSeq)
      vecStream.addData(vecRows.take(vecRows.length / 2).toSeq)
      lexQ.processAllAvailable(); vecQ.processAllAvailable()
      docStream.addData(docRows.drop(docRows.length / 2).toSeq)
      vecStream.addData(vecRows.drop(vecRows.length / 2).toSeq)
      lexQ.processAllAvailable(); vecQ.processAllAvailable()
    } finally { lexQ.stop(); vecQ.stop() }
    assert(StreamingOps.lexicalMergeStaged(spark, lexStage, table, 8) === 2)
    assert(StreamingOps.ivfPqMergeStaged(spark, vecStage, store) === 2)
    // retrieval over the just-merged stores vs one-shot batch builds
    val fullTable = "graft_postings_e2e_spec_full"
    Pipeline6.postingsWrite(docs, fullTable, nBuckets = 8)
    val fullStore = java.nio.file.Files.createTempDirectory("e2e_vec_full").toString
    Pipeline6.ivfPqWrite(cents, cb, emb, fullStore)
    val phrase = Seq("table", "hash") // p58's pinned phrase
    val gotPhrase = Pipeline6.phraseTopKStored(spark, table, phrase, 20)
      .collect().map(_.toSeq).toSeq
    val wantPhrase = Pipeline6.phraseTopKStored(spark, fullTable, phrase, 20)
      .collect().map(_.toSeq).toSeq
    assert(gotPhrase.nonEmpty, "pinned phrase found nothing — dead probe")
    assert(gotPhrase === wantPhrase,
      "phrase results over the streamed store diverge from the batch build")
    val queries = emb.filter($"vec_id" < 3)
    def probe(p: String) =
      Pipeline6.ivfPqTopKStored(spark, p, queries, cents, cb, k = 10, nProbe = 3)
        .orderBy($"qid", $"rnk").collect().map(_.toSeq).toSeq
    val gotVec = probe(store)
    assert(gotVec.nonEmpty && gotVec === probe(fullStore),
      "vector probe over the streamed store diverges from the batch build")
  }

  test("gate-fed label store: streaming dedup verdicts keep soft-dedup weights live, matching from-scratch p118") {
    // the p123 deployment loop driven by the REAL gates: per
    // micro-batch, textDedupGateBatch verdicts (batch vs published) +
    // within-batch LSH pairs fold into the live label store, the
    // batch's signatures merge into the live LSH store, and the
    // refreshed weights must hash-match the from-scratch contraction
    // of the union corpus — append-equals-rebuild through the
    // streaming path
    import graft.operators.{Dedup, LabelStore, Pipeline13}
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val pub = docs.filter($"doc_id" < 400L).localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("lbl_lsh").toString
    val stage = java.nio.file.Files.createTempDirectory("lbl_stage").toString
    val labels = java.nio.file.Files.createTempDirectory("lbl_lbl").toString
    Engine.lshStoreWrite(pub, "doc_id", "text", store)
    LabelStore.write(
      Dedup.dedupClusters(pub, "doc_id",
        Dedup.minhashLshPairs(pub, "doc_id", "text")), labels)
    val texts = docs.filter($"doc_id".isin(7L, 23L, 450L, 451L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // micro-batch 0: a re-published copy (1007≈7) plus two fresh docs
    // that duplicate EACH OTHER (within-batch pair 1450≈1451);
    // micro-batch 1: another copy of 7 (2007 — must hit BOTH 7 and the
    // already-ingested 1007 through the merged store) and a fresh doc
    val payloads = Map(1007L -> texts(7L), 1450L -> texts(450L),
      1451L -> texts(450L), 2007L -> texts(7L), 2500L -> texts(451L))
    val verdicts = collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ms = MemoryStream[Long]
    val q = ms.toDF().toDF("doc_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val withText = batch.collect().map(_.getLong(0))
          .map(i => (i, payloads(i))).toSeq.toDF("doc_id", "text")
        // THE library handler a deployment copies: gate → label fold →
        // staged ingest → merge, in one call
        verdicts ++= StreamingOps
          .dedupMaintainBatch(spark, store, labels, stage)(withText, id)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        ()
      }
      .start()
    try {
      ms.addData(Seq(1007L, 1450L, 1451L)); q.processAllAvailable()
      ms.addData(Seq(2007L, 2500L)); q.processAllAvailable()
    } finally q.stop()
    val unionDocs = pub.unionByName(payloads.toSeq.toDF("doc_id", "text"))
    val want = Pipeline13.softDedupWeightsOf(
        Dedup.dedupClusters(unionDocs, "doc_id",
          Dedup.minhashLshPairs(unionDocs, "doc_id", "text")))
      .collect().map(_.toSeq).toSet
    val got = LabelStore.weightsFromStore(spark, labels)
      .collect().map(_.toSeq).toSet
    assert(got === want,
      "gate-fed incremental weights diverged from from-scratch p118")
    val lbl = LabelStore.read(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(2007L) === lbl(7L) && lbl(1007L) === lbl(7L),
      "second-wave copy did not join the published family")
    assert(lbl(1451L) === lbl(1450L),
      "within-batch near-dups landed in different clusters")
    // the handler's returned verdicts carry the routing signal: the
    // second-wave copy is flagged against BOTH the original and the
    // first-wave copy it entered through the merged store
    assert(verdicts.toSet.contains((2007L, 7L)) &&
      verdicts.toSet.contains((2007L, 1007L)),
      "gate verdicts missing the published/merged matches")
  }

  test("maintenance handler self-heals a label store wedged by a crashed fold") {
    // a fold that died mid-overwrite leaves its committed stage beside
    // a possibly half-rewritten store; the NEXT delivery must replay
    // the staged buckets (LabelStore.recoverAndUpdate) and then fold
    // normally — not wedge every later batch behind the fail-loud check
    import graft.operators.{Dedup, LabelStore}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val pub = docs.filter($"doc_id" < 200L).localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("heal_lsh").toString
    val stage = java.nio.file.Files.createTempDirectory("heal_stage").toString
    val labels = java.nio.file.Files.createTempDirectory("heal_lbl").toString
    Engine.lshStoreWrite(pub, "doc_id", "text", store)
    LabelStore.write(
      Dedup.dedupClusters(pub, "doc_id",
        Dedup.minhashLshPairs(pub, "doc_id", "text")), labels)
    // the interrupted fold: batch {5000 ≈ 7} staged but never applied
    assert(LabelStore.stageUpdate(spark, labels,
      Seq(5000L).toDF("doc_id"), Seq((5000L, 7L)).toDF("d1", "d2")))
    intercept[IllegalArgumentException] { LabelStore.read(spark, labels) }
    // next delivery through the handler: heals, then folds its own batch
    val texts = docs.filter($"doc_id".isin(7L, 23L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    StreamingOps.dedupMaintainBatch(spark, store, labels, stage)(
      Seq(5001L -> texts(23L)).toDF("doc_id", "text"), 0L).collect()
    val lbl = LabelStore.read(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(5000L) === lbl(7L),
      "the staged fold was lost instead of replayed")
    assert(lbl(5001L) === lbl(23L),
      "the healing delivery's own fold went missing")
  }

  test("fold guard is fold-specific: a stage pre-populated by ingest-only batches still folds") {
    // the redelivery guard must key on the FOLD's own marker, not the
    // staging layer's commit marker: a stage dir previously populated
    // by the ingest-only pipeline (lshIngestBatch + lshMergeStaged)
    // carries committed markers for batches whose label folds never
    // ran — handing that stage to the maintenance handler must not
    // silently skip those folds and drop the batch's labels forever
    import graft.operators.{Dedup, LabelStore}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val pub = docs.filter($"doc_id" < 200L).localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("fmark_lsh").toString
    val stage = java.nio.file.Files.createTempDirectory("fmark_stage").toString
    val labels = java.nio.file.Files.createTempDirectory("fmark_lbl").toString
    Engine.lshStoreWrite(pub, "doc_id", "text", store)
    LabelStore.write(
      Dedup.dedupClusters(pub, "doc_id",
        Dedup.minhashLshPairs(pub, "doc_id", "text")), labels)
    val texts = docs.filter($"doc_id".isin(7L, 23L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = Seq(3007L -> texts(7L)).toDF("doc_id", "text")
    // ingest-only path delivers batch 0: signatures staged (committed
    // marker written) and merged — but NO fold ran
    StreamingOps.lshIngestBatch(stage)(batch, 0L)
    StreamingOps.lshMergeStaged(spark, stage, store)
    // the maintenance handler takes over the same stage at the same id:
    // the fold must still run (3007 joins 7's family)
    StreamingOps.dedupMaintainBatch(spark, store, labels, stage)(
      batch, 0L).collect()
    val lbl = LabelStore.read(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.contains(3007L) && lbl(3007L) === lbl(7L),
      "ingest-only commit marker suppressed the handler's label fold")
    // and the fold's own marker now guards replays: a redelivery of the
    // same id skips the fold (content would be a no-op anyway — this
    // pins the marker exists and the skip path still returns verdicts)
    assert(new java.io.File(s"$stage/_GRAFT_FOLDED_0").exists(),
      "fold marker missing after a completed fold")
    val replay = StreamingOps.dedupMaintainBatch(spark, store, labels, stage)(
      batch, 0L).collect()
    assert(replay.nonEmpty, "replayed delivery lost its gate verdicts")
    assert(LabelStore.read(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === lbl,
      "replayed delivery changed the label store")
  }

  test("compactBucketed called directly in the DROP-window heals instead of deleting the sole copy") {
    // crash state: a previous compaction died between DROP TABLE and
    // RENAME — the live table is gone and __compact is the ONLY copy.
    // A direct compactBucketed used to DROP that sole copy as "tmp
    // debris" and then fail; it must heal first and compact normally.
    import graft.operators.Pipeline6
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").filter($"doc_id" < 40)
    val table = "graft_compact_heal_spec"
    Pipeline6.postingsWrite(docs, table, nBuckets = 4)
    val want = spark.table(table).collect().map(_.toSeq).toSet
    graft.sources.Bucketed.writeBucketed(
      spark.table(table).repartition(4, $"term"), s"${table}__compact",
      "term", 4)
    spark.sql(s"DROP TABLE $table") // the crash window
    graft.sources.Bucketed.compactBucketed(spark, table, "term", 4)
    assert(spark.catalog.tableExists(table), "table lost after heal+compact")
    assert(spark.table(table).collect().map(_.toSeq).toSet === want,
      "heal+compact changed the table content")
    assert(!spark.catalog.tableExists(s"${table}__compact"),
      "compaction left its tmp table behind")
  }

  test("gate-fed VIDEO label store: clip maintenance matches the from-scratch p91 contraction") {
    // the p127 loop through the library handler: per batch ONE decode
    // feeds the stored gate, the within-batch pairs and the staged
    // frame ingest; after two waves the maintained weights must match
    // the from-scratch p90-relation contraction of the union corpus.
    // Fixture geometry: ids congruent mod 160 render byte-identical
    // clips, so 310/470 pair WITHIN a batch, both hit published 150,
    // and 630 must hit 470 only through the MERGED store
    import graft.operators.{Dedup, LabelStore, Multimodal, Pipeline13}
    val pubIds = spark.range(0, 300).select($"id".as("doc_id"))
    val store = java.nio.file.Files.createTempDirectory("vid_frames").toString
    val stage = java.nio.file.Files.createTempDirectory("vid_stage").toString
    val labels = java.nio.file.Files.createTempDirectory("vid_lbl").toString
    def framesOf(ids: org.apache.spark.sql.DataFrame) =
      Multimodal.decodeVideoFrames(Multimodal.attachVideo(ids))
        .select($"doc_id", $"frame", $"n_frames", $"fhash")
    val pubFrames = framesOf(pubIds).localCheckpoint()
    Multimodal.frameStoreWrite(
      pubFrames.select($"doc_id", $"frame", $"fhash"), store)
    LabelStore.write(
      Dedup.dedupClusters(pubIds, "doc_id",
        Multimodal.videoNearDupPairs(pubFrames, 3).select($"d1", $"d2")),
      labels)
    val waves = Seq(Seq(310L, 470L), Seq(630L))
    val verdicts = collection.mutable.Set.empty[(Long, Long)]
    waves.zipWithIndex.foreach { case (ids, i) =>
      verdicts ++= StreamingOps.videoMaintainBatch(spark, store, labels,
          stage)(
          Multimodal.attachVideo(ids.toDF("doc_id")), i.toLong)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    val unionIds = pubIds.union(waves.flatten.toDF("doc_id"))
      .localCheckpoint()
    val want = Pipeline13.softDedupWeightsOf(
        Dedup.dedupClusters(unionIds, "doc_id",
          Multimodal.videoNearDupPairs(framesOf(unionIds), 3)
            .select($"d1", $"d2")))
      .collect().map(_.toSeq).toSet
    val got = LabelStore.weightsFromStore(spark, labels)
      .collect().map(_.toSeq).toSet
    assert(got === want,
      "gate-fed incremental video weights diverged from from-scratch p91")
    val lbl = LabelStore.read(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(470L) === lbl(150L) && lbl(310L) === lbl(150L) &&
      lbl(630L) === lbl(150L),
      "clip copies did not join the published family")
    assert(verdicts.contains((630L, 470L)),
      "second-wave clip missed the first-wave twin through the merged store")
    assert(verdicts.contains((310L, 150L)),
      "arriving clip missed its published twin")
  }

  test("gate-fed AUDIO label store: fingerprint maintenance matches the from-scratch p79 contraction") {
    // the p128 loop through the library handler — same fixture
    // congruence (ids mod 160 share byte-identical audio), same
    // merged-store visibility requirement for the second wave
    import graft.operators.{Dedup, LabelStore, Multimodal, Pipeline13}
    val pubIds = spark.range(0, 300).select($"id".as("doc_id"))
    val store = java.nio.file.Files.createTempDirectory("aud_fps").toString
    val stage = java.nio.file.Files.createTempDirectory("aud_stage").toString
    val labels = java.nio.file.Files.createTempDirectory("aud_lbl").toString
    def fpsOf(ids: org.apache.spark.sql.DataFrame) =
      Multimodal.decodeWave(Multimodal.attachWave(ids))
        .select($"doc_id", $"afp")
    def pairsOf(fps: org.apache.spark.sql.DataFrame) =
      Multimodal.perceptualNearDupPairs(
          fps.select($"doc_id", $"afp".as("dhash")), 3)
        .select($"d1", $"d2")
    val pubFps = fpsOf(pubIds).localCheckpoint()
    Multimodal.frameStoreWrite(
      pubFps.select($"doc_id", lit(0).as("frame"), $"afp".as("fhash")),
      store)
    LabelStore.write(
      Dedup.dedupClusters(pubIds, "doc_id", pairsOf(pubFps)), labels)
    val waves = Seq(Seq(310L, 470L), Seq(630L))
    val verdicts = collection.mutable.Set.empty[(Long, Long)]
    waves.zipWithIndex.foreach { case (ids, i) =>
      verdicts ++= StreamingOps.audioMaintainBatch(spark, store, labels,
          stage)(
          Multimodal.attachWave(ids.toDF("doc_id")), i.toLong)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    val unionIds = pubIds.union(waves.flatten.toDF("doc_id"))
      .localCheckpoint()
    val want = Pipeline13.softDedupWeightsOf(
        Dedup.dedupClusters(unionIds, "doc_id", pairsOf(fpsOf(unionIds))))
      .collect().map(_.toSeq).toSet
    val got = LabelStore.weightsFromStore(spark, labels)
      .collect().map(_.toSeq).toSet
    assert(got === want,
      "gate-fed incremental audio weights diverged from from-scratch p79")
    assert(verdicts.contains((630L, 470L)),
      "second-wave track missed the first-wave twin through the merged store")
  }

  test("retraction handler: takedown removes labels AND signatures; withdrawn content cannot resurface") {
    // the composed takedown path: LabelStore.remove alone is NOT
    // compliance — signatures left in the store make later arrivals
    // gate-match withdrawn content, and the fold (finding no stored
    // label for the retracted id) resurrects it as a cluster CANONICAL.
    // Two parallel fixtures: the handler (labels + signatures removed)
    // stays clean; the labels-only half demonstrates the hazard is real.
    import graft.operators.{Dedup, LabelStore}
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val texts = docs.filter($"doc_id".isin(7L, 23L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // published corpus with a dup family {7, 1007}
    val pub = docs.filter($"doc_id" < 200L)
      .unionByName(Seq(1007L -> texts(7L)).toDF("doc_id", "text"))
      .localCheckpoint()
    def build(): (String, String) = {
      val store = java.nio.file.Files.createTempDirectory("rt_lsh").toString
      val labels = java.nio.file.Files.createTempDirectory("rt_lbl").toString
      Engine.lshStoreWrite(pub, "doc_id", "text", store)
      LabelStore.write(
        Dedup.dedupClusters(pub, "doc_id",
          Dedup.minhashLshPairs(pub, "doc_id", "text")), labels)
      (store, labels)
    }
    def lbl(labels: String) = LabelStore.read(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ---- the composed handler: clean takedown ----
    val (store, labels) = build()
    assert(lbl(labels)(1007L) === 7L, "fixture family missing")
    val n = StreamingOps.dedupRetractBatch(spark, store, labels)(
      Seq(7L).toDF("doc_id"))
    assert(n === 1L)
    val afterRm = lbl(labels)
    assert(!afterRm.contains(7L) && afterRm(1007L) === 1007L,
      "retraction left the withdrawn row or stale canonical behind")
    // a new copy of the withdrawn text arrives through the maintenance
    // handler: it must match the surviving twin ONLY, and the withdrawn
    // id must appear nowhere — not as a row, not as a canonical
    val stage = java.nio.file.Files.createTempDirectory("rt_stage").toString
    val verdicts = StreamingOps.dedupMaintainBatch(spark, store, labels,
        stage)(Seq(2007L -> texts(7L)).toDF("doc_id", "text"), 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verdicts.contains((2007L, 1007L)),
      "arrival missed the surviving twin")
    assert(!verdicts.exists(_._2 == 7L),
      "gate matched the withdrawn document's signatures")
    val afterArrival = lbl(labels)
    assert(!afterArrival.contains(7L) &&
      !afterArrival.values.toSet.contains(7L),
      "withdrawn id resurfaced after a matching arrival")
    assert(afterArrival(2007L) === 1007L)
    // retracting an id that is not stored is a no-op
    assert(StreamingOps.dedupRetractBatch(spark, store, labels)(
      Seq(9999L).toDF("doc_id")) === 0L)
    // ---- the hazard half: labels-only removal resurrects the id ----
    val (storeH, labelsH) = build()
    LabelStore.remove(spark, labelsH, Seq(7L).toDF("doc_id"),
      Dedup.lshPairsFromStore(spark, storeH)) // signatures left behind
    val stageH = java.nio.file.Files.createTempDirectory("rt_stageh").toString
    StreamingOps.dedupMaintainBatch(spark, storeH, labelsH, stageH)(
      Seq(2007L -> texts(7L)).toDF("doc_id", "text"), 0L).collect()
    val hazard = lbl(labelsH)
    assert(hazard.values.toSet.contains(7L),
      "hazard fixture unexpectedly clean — the spec's premise broke " +
        "(did the gate stop matching leftover signatures?)")
  }

  test("video/audio retraction: takedown completes the matrix, no resurfacing through either gate") {
    // the third and fourth takedown twins: evidence reconstructs from
    // the stores' own rows (frames / fingerprints off one band
    // partition), the retracted signatures leave, and a later
    // congruent arrival (mod-160 fixture geometry) gates against the
    // surviving twin only — the withdrawn id appears nowhere
    import graft.operators.{Dedup, LabelStore, Multimodal}
    val pubIds = spark.range(0, 300).select($"id".as("doc_id"))
    // ---- VIDEO ----
    val vStore = java.nio.file.Files.createTempDirectory("vret_frames").toString
    val vLbl = java.nio.file.Files.createTempDirectory("vret_lbl").toString
    val vStage = java.nio.file.Files.createTempDirectory("vret_stage").toString
    def framesOf(ids: org.apache.spark.sql.DataFrame) =
      Multimodal.decodeVideoFrames(Multimodal.attachVideo(ids))
        .select($"doc_id", $"frame", $"n_frames", $"fhash")
    val pubFrames = framesOf(pubIds).localCheckpoint()
    Multimodal.frameStoreWrite(
      pubFrames.select($"doc_id", $"frame", $"fhash"), vStore)
    LabelStore.write(
      Dedup.dedupClusters(pubIds, "doc_id",
        Multimodal.videoNearDupPairs(pubFrames, 3).select($"d1", $"d2")),
      vLbl)
    def lblOf(p: String) = LabelStore.read(spark, p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lblOf(vLbl)(170L) === 10L, "video fixture family missing")
    // retract the family's canonical
    assert(StreamingOps.videoRetractBatch(spark, vStore, vLbl)(
      Seq(10L).toDF("doc_id")) === 1L)
    val v1 = lblOf(vLbl)
    // from-scratch parity over the survivors (the family is larger
    // than the mod-160 twins — the radius links mod-80 neighbors too,
    // so the expected labels are DERIVED, never hard-coded)
    val vSurv = pubIds.filter($"doc_id" =!= 10L).localCheckpoint()
    val vWant = Dedup.dedupClusters(vSurv, "doc_id",
        Multimodal.videoNearDupPairs(framesOf(vSurv), 3)
          .select($"d1", $"d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v1.toSeq.map(t => (t._1, t._2)).toSet === vWant,
      "video retraction diverged from the from-scratch rebuild")
    assert(!v1.contains(10L),
      "video retraction left the withdrawn row behind")
    assert(spark.read.parquet(vStore).filter($"doc_id" === 10L).isEmpty,
      "withdrawn clip's signatures still stored")
    // a congruent clip arrives (330 ≡ 10 mod 160): matches the
    // surviving family, never the withdrawn id
    val vVerd = StreamingOps.videoMaintainBatch(spark, vStore, vLbl,
        vStage)(Multimodal.attachVideo(Seq(330L).toDF("doc_id")), 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(vVerd.contains((330L, 170L)) && !vVerd.exists(_._2 == 10L),
      "video gate matched the withdrawn clip")
    val v2 = lblOf(vLbl)
    assert(!v2.contains(10L) && !v2.values.toSet.contains(10L) &&
      v2(330L) === v2(170L), "withdrawn clip id resurfaced")
    // ---- AUDIO ----
    val aStore = java.nio.file.Files.createTempDirectory("aret_fps").toString
    val aLbl = java.nio.file.Files.createTempDirectory("aret_lbl").toString
    val aStage = java.nio.file.Files.createTempDirectory("aret_stage").toString
    def fpsOf(ids: org.apache.spark.sql.DataFrame) =
      Multimodal.decodeWave(Multimodal.attachWave(ids))
        .select($"doc_id", $"afp")
    def aPairs(fps: org.apache.spark.sql.DataFrame) =
      Multimodal.perceptualNearDupPairs(
        fps.select($"doc_id", $"afp".as("dhash")), 3).select($"d1", $"d2")
    val pubFps = fpsOf(pubIds).localCheckpoint()
    Multimodal.frameStoreWrite(
      pubFps.select($"doc_id", lit(0).as("frame"), $"afp".as("fhash")),
      aStore)
    LabelStore.write(
      Dedup.dedupClusters(pubIds, "doc_id", aPairs(pubFps)), aLbl)
    assert(lblOf(aLbl)(170L) === lblOf(aLbl)(10L),
      "audio fixture family missing")
    assert(StreamingOps.audioRetractBatch(spark, aStore, aLbl)(
      Seq(10L).toDF("doc_id")) === 1L)
    assert(spark.read.parquet(aStore).filter($"doc_id" === 10L).isEmpty,
      "withdrawn track's fingerprints still stored")
    val aVerd = StreamingOps.audioMaintainBatch(spark, aStore, aLbl,
        aStage)(Multimodal.attachWave(Seq(330L).toDF("doc_id")), 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(aVerd.exists(v => v._1 == 330L && v._2 != 10L) &&
      !aVerd.exists(_._2 == 10L),
      "audio gate matched the withdrawn track")
    val a2 = lblOf(aLbl)
    assert(!a2.contains(10L) && !a2.values.toSet.contains(10L),
      "withdrawn track id resurfaced")
    // retraction parity with the from-scratch rebuild of survivors
    val surv = pubIds.filter($"doc_id" =!= 10L)
      .union(Seq(330L).toDF("doc_id")).localCheckpoint()
    val want = Dedup.dedupClusters(surv, "doc_id", aPairs(fpsOf(surv)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a2.toSeq.map(t => (t._1, t._2)).toSet === want,
      "audio retraction+arrival diverged from the from-scratch rebuild")
  }

  test("gate-fed CROSS-MODAL label store: unified maintenance matches the from-scratch p85 contraction") {
    // the p132 loop through the library handler: ONE label space fed by
    // all four modality gates + within-batch relations. The designed
    // merge: 470 carries doc 3's TEXT (joining the {3, 83} text family)
    // while its payload signatures are congruent to 150 mod 160 (the
    // fixture geometry the video/audio specs pin) — so folding 470
    // unites a text family and a perceptual family ACROSS modalities,
    // which the four separate per-modality stores cannot express; 630
    // then reaches that family only through the MERGED stores
    import graft.operators.{Dedup, LabelStore, Multimodal, Pipeline9}
    def docsOf(ids: org.apache.spark.sql.DataFrame) = ids
      .withColumn("tid",
        when($"doc_id" === 83L, 3L)
          .when($"doc_id" === 470L, 3L)
          .otherwise($"doc_id"))
      .select($"doc_id",
        concat(lit("crossmodal text "), $"tid".cast("string")).as("text"))
    def payloadDocsOf(docs: org.apache.spark.sql.DataFrame) = docs
      .join(Multimodal.attachRaster(docs).withColumnRenamed("payload", "img"),
        Seq("doc_id"))
      .join(Multimodal.attachWave(docs).withColumnRenamed("payload", "wav"),
        Seq("doc_id"))
      .join(Multimodal.attachVideo(docs).withColumnRenamed("payload", "vid"),
        Seq("doc_id"))
    def unionPairsOf(docs: org.apache.spark.sql.DataFrame) = {
      val dh = Multimodal.decodeRaster(Multimodal.attachRaster(docs))
        .select($"doc_id", $"dhash")
      val af = Multimodal.decodeWave(Multimodal.attachWave(docs))
        .select($"doc_id", $"afp")
      val vf = Multimodal.decodeVideoFrames(Multimodal.attachVideo(docs))
        .select($"doc_id", $"frame", $"n_frames", $"fhash")
      Pipeline9.exactTextPairsOf(docs)
        .union(Multimodal.perceptualNearDupPairs(dh, 3)
          .select($"d1", $"d2"))
        .union(Multimodal.perceptualNearDupPairs(
            af.select($"doc_id", $"afp".as("dhash")), 3)
          .select($"d1", $"d2"))
        .union(Multimodal.videoNearDupPairs(vf, 3).select($"d1", $"d2"))
    }
    val pubIds = spark.range(0, 300).select($"id".as("doc_id"))
    val pub = docsOf(pubIds).localCheckpoint()
    def tmp(t: String) = java.nio.file.Files.createTempDirectory(t).toString
    val (txt, img, aud, vid) =
      (tmp("xm_txt"), tmp("xm_img"), tmp("xm_aud"), tmp("xm_vid"))
    val stage = tmp("xm_stage"); val labels = tmp("xm_lbl")
    Multimodal.frameStoreWrite(
      Pipeline9.exactTextSigFrames(pub)
        .select($"doc_id", $"frame", $"fhash"), txt)
    Multimodal.frameStoreWrite(
      Multimodal.decodeRaster(Multimodal.attachRaster(pub))
        .select($"doc_id", lit(0).as("frame"), $"dhash".as("fhash")), img)
    Multimodal.frameStoreWrite(
      Multimodal.decodeWave(Multimodal.attachWave(pub))
        .select($"doc_id", lit(0).as("frame"), $"afp".as("fhash")), aud)
    Multimodal.frameStoreWrite(
      Multimodal.decodeVideoFrames(Multimodal.attachVideo(pub))
        .select($"doc_id", $"frame", $"fhash"), vid)
    LabelStore.write(
      Dedup.dedupClusters(pubIds, "doc_id", unionPairsOf(pub)), labels)
    val waves = Seq(Seq(470L), Seq(630L))
    val verdicts = collection.mutable.Set.empty[(Long, Long, String)]
    waves.zipWithIndex.foreach { case (ids, i) =>
      verdicts ++= StreamingOps.multimodalMaintainBatch(spark,
          txt, img, aud, vid, labels, stage)(
          payloadDocsOf(docsOf(ids.toDF("doc_id"))), i.toLong)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    }
    val unionIds = pubIds.union(waves.flatten.toDF("doc_id"))
      .localCheckpoint()
    val want = Dedup.dedupClusters(unionIds, "doc_id",
        unionPairsOf(docsOf(unionIds)))
      .collect().map(_.toSeq).toSet
    val got = LabelStore.read(spark, labels)
      .collect().map(_.toSeq).toSet
    assert(got === want,
      "gate-fed cross-modal labels diverged from the from-scratch p85 contraction")
    val lbl = LabelStore.read(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(470L) === lbl(3L) && lbl(470L) === lbl(150L) &&
      lbl(83L) === lbl(150L),
      "the bridging doc did not unite the text and perceptual families")
    assert(lbl(630L) === lbl(150L),
      "second-wave doc did not join the unified family")
    assert(verdicts.contains((470L, 3L, "text")),
      "text gate missed the exact published match")
    assert(verdicts.exists(v => v._1 == 470L && v._2 == 150L &&
      (v._3 == "audio" || v._3 == "video")),
      "perceptual gates missed the published congruent twin")
    assert(verdicts.exists(v => v._1 == 630L && v._2 == 470L),
      "second wave missed the first-wave doc through the merged stores")
    // ---- retraction over the unified space: withdraw the BRIDGE ----
    // 470 united the text and perceptual families; retracting it must
    // split them back apart (evidence reconstructed from all four
    // stores, no re-decode) and its signatures must leave every store
    assert(StreamingOps.multimodalRetractBatch(spark, txt, img, aud,
      vid, labels)(Seq(470L).toDF("doc_id")) === 1L)
    val surv = unionIds.filter($"doc_id" =!= 470L).localCheckpoint()
    val wantRm = Dedup.dedupClusters(surv, "doc_id",
        unionPairsOf(docsOf(surv)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotRm = LabelStore.read(spark, labels).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotRm === wantRm,
      "cross-modal retraction diverged from the from-scratch rebuild")
    Seq(txt, img, aud, vid).foreach { s =>
      assert(spark.read.parquet(s).filter($"doc_id" === 470L).isEmpty,
        s"withdrawn doc's signatures still in $s")
    }
    // a congruent arrival (790 ≡ 150 mod 160, unique text) matches the
    // perceptual family but never the withdrawn bridge
    val verd2 = StreamingOps.multimodalMaintainBatch(spark,
        txt, img, aud, vid, labels, stage)(
        payloadDocsOf(docsOf(Seq(790L).toDF("doc_id"))), 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(verd2.exists(v => v._1 == 790L && v._2 == 150L) &&
      !verd2.exists(_._2 == 470L),
      "gates matched the withdrawn bridge after retraction")
    val lblFinal = LabelStore.read(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!lblFinal.contains(470L) &&
      !lblFinal.values.toSet.contains(470L),
      "withdrawn bridge resurfaced through the unified fold")
    assert(lblFinal(790L) === lblFinal(150L),
      "congruent arrival missed the surviving perceptual family")
  }

  test("maintenance handler compaction trigger: sliver files fold to one per band, probe parity holds") {
    // dedupMaintainBatch consults the file-count trigger after every
    // merge: with the bound forced low, three appended batches must
    // leave ONE sorted file per band (not four slivers), the
    // ingest_batch column must survive (the merge's exactly-once
    // presence probe), and the maintained weights must still match the
    // from-scratch contraction — compaction swaps are content-neutral
    import graft.operators.{Dedup, LabelStore, Pipeline13}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val pub = docs.filter($"doc_id" < 300L).localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("cmp_lsh").toString
    val stage = java.nio.file.Files.createTempDirectory("cmp_stage").toString
    val labels = java.nio.file.Files.createTempDirectory("cmp_lbl").toString
    Engine.lshStoreWrite(pub, "doc_id", "text", store)
    LabelStore.write(
      Dedup.dedupClusters(pub, "doc_id",
        Dedup.minhashLshPairs(pub, "doc_id", "text")), labels)
    val texts = docs.filter($"doc_id".isin(7L, 23L, 42L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val waves = Seq(
      Seq(1007L -> texts(7L)),          // dup of a published doc
      Seq(1023L -> texts(23L)),
      Seq(1042L -> texts(42L), 1043L -> texts(42L))) // within-batch pair
    waves.zipWithIndex.foreach { case (w, id) =>
      StreamingOps.dedupMaintainBatch(spark, store, labels, stage,
        compactMaxFiles = 1)(w.toDF("doc_id", "text"), id.toLong)
        .collect()
    }
    val bands = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("band="))
    assert(bands.nonEmpty && bands.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) === 1),
      "trigger did not fold the appended slivers to one file per band")
    assert(spark.read.parquet(store).columns.contains("ingest_batch"),
      "compaction dropped the merge's presence-probe column")
    val unionDocs = pub.unionByName(
      waves.flatten.toDF("doc_id", "text"))
    val want = Pipeline13.softDedupWeightsOf(
        Dedup.dedupClusters(unionDocs, "doc_id",
          Dedup.minhashLshPairs(unionDocs, "doc_id", "text")))
      .collect().map(_.toSeq).toSet
    val got = LabelStore.weightsFromStore(spark, labels)
      .collect().map(_.toSeq).toSet
    assert(got === want,
      "weights diverged once the compaction trigger was in the loop")
    // and the compacted store still answers the gate: a fresh copy of
    // doc 7 must hit both the original and its first-wave twin
    val verdicts = StreamingOps.textDedupGateBatch(spark, store)(
        Seq(2007L -> texts(7L)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verdicts.contains((2007L, 7L)) && verdicts.contains((2007L, 1007L)),
      "probe over the compacted store lost stored signatures")
  }

  test("gate-fed VECTOR label store: full-probe maintenance matches from-scratch tau-components") {
    // the p126 deployment loop driven through the library handler: at
    // nProbe = nCells the fold is exact, so the maintained weights must
    // hash-match the from-scratch contraction of the union corpus
    import graft.operators.{Dedup, LabelStore, Pipeline13, Similarity}
    import graft.functions.VectorOps
    implicit val sqlCtx = spark.sqlContext
    val tau = 0.3
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
    val pub = emb.filter($"vec_id" < 150L).localCheckpoint()
    val cents = Similarity.seedCentroids(pub, 8)
    val store = java.nio.file.Files.createTempDirectory("vlbl_ivf").toString
    val stage = java.nio.file.Files.createTempDirectory("vlbl_stage").toString
    val labels = java.nio.file.Files.createTempDirectory("vlbl_lbl").toString
    Similarity.ivfWrite(pub, cents, store)
    val pubPairs = pub.as("a").crossJoin(pub.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .filter(VectorOps.cosine($"a.embedding", $"b.embedding") >= tau)
      .select($"a.vec_id".as("d1"), $"b.vec_id".as("d2"))
    LabelStore.write(LabelStore.labelsFor(
      pub.select($"vec_id".as("doc_id")), pubPairs), labels)
    // arriving waves: re-published copies (1007≈7, 2007≈7 again via the
    // merged store) + two fresh vectors duplicating each other
    val vecs = emb.filter($"vec_id".isin(7L, 160L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val payloads = Map(
      1007L -> vecs(7L), 1160L -> vecs(160L), 1161L -> vecs(160L),
      2007L -> vecs(7L))
    val verdicts = collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ms = MemoryStream[Long]
    val q = ms.toDF().toDF("vec_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val withVec = batch.collect().map(_.getLong(0))
          .map(i => (i, payloads(i))).toSeq.toDF("vec_id", "embedding")
        verdicts ++= StreamingOps.vectorDedupMaintainBatch(spark, store,
            labels, stage, cents, tau, nProbe = 8)(withVec, id)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        ()
      }
      .start()
    try {
      ms.addData(Seq(1007L, 1160L, 1161L)); q.processAllAvailable()
      ms.addData(Seq(2007L)); q.processAllAvailable()
    } finally q.stop()
    val unionVecs = pub.unionByName(payloads.toSeq.toDF("vec_id", "embedding"))
      .localCheckpoint()
    val unionPairs = unionVecs.as("a").crossJoin(unionVecs.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .filter(VectorOps.cosine($"a.embedding", $"b.embedding") >= tau)
      .select($"a.vec_id".as("d1"), $"b.vec_id".as("d2"))
    val want = Pipeline13.softDedupWeightsOf(
        Dedup.dedupClusters(unionVecs.select($"vec_id".as("doc_id")),
          "doc_id", unionPairs))
      .collect().map(_.toSeq).toSet
    val got = LabelStore.weightsFromStore(spark, labels)
      .collect().map(_.toSeq).toSet
    assert(got === want,
      "gate-fed incremental vector weights diverged from from-scratch")
    val lbl = LabelStore.read(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(2007L) === lbl(7L) && lbl(1007L) === lbl(7L),
      "second-wave vector copy did not join the published family")
    assert(lbl(1161L) === lbl(1160L),
      "within-batch vector near-dups landed in different clusters")
    assert(verdicts.toSet.contains((2007L, 7L)) &&
      verdicts.toSet.contains((2007L, 1007L)),
      "vector gate verdicts missing the published/merged matches")
  }
}
