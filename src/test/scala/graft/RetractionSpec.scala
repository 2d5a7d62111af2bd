package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pipeline6, Similarity}
import graft.sources.{Bucketed, Maintenance}
import graft.streaming.StreamingOps

/** Takedown reaches RETRIEVAL: the dedup-store retraction family
  * (dedupRetractBatch and twins) is spec-pinned in StreamingSpec; this
  * suite pins the RETRIEVAL half — a withdrawn document must stop
  * being retrievable, with the surviving ranking bit-identical to a
  * from-scratch index of the surviving corpus (posting rows gone,
  * survivors' rows intact, BM25 stats decremented EXACTLY), plus the
  * pruned retractions of the shingle sidecar (the verified gate must
  * stop confirming against withdrawn docs) and the IVF-PQ codes store.
  */
class RetractionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val Terms = Seq("merge", "stream", "vector")

  /** 12-doc corpus where doc 7 is the runaway top hit for the query
    * terms — retracting it must change rank 1, not just drop a row.
    */
  private def corpus = Seq(
    (1L, "merge sort and stream processing"),
    (2L, "vector clocks in distributed systems"),
    (3L, "the quick brown fox"),
    (4L, "merge merge conflict resolution"),
    (5L, "stream of consciousness writing"),
    (6L, "support vector machines"),
    (7L, "merge merge merge stream stream vector vector vector"),
    (8L, "b tree index pages"),
    (9L, "log structured merge tree"),
    (10L, "vector stream merge pipeline"),
    (11L, "hash table probing"),
    (12L, "columnar storage layout"),
  ).toDF("doc_id", "text")

  private def survivors = corpus.filter(!col("doc_id").isin(7L, 10L))
  private def rmIds = Seq(7L, 10L).toDF("doc_id")

  test("lexical retraction: BM25 + phrase over survivors equal a from-scratch index; stats exact") {
    val t = "graft_spec_lexret_a"
    val ref = "graft_spec_lexret_a_ref"
    Pipeline6.postingsWrite(corpus, t, nBuckets = 4)
    // the doc to be retracted ranks FIRST before the takedown
    val pre = Pipeline6.bm25TopKStored(spark, t, k = 5, terms = Terms).collect()
    assert(pre.head.getLong(0) === 7L, "fixture: doc 7 must rank 1 pre-takedown")

    val n = StreamingOps.lexicalRetractBatch(spark, t, nBuckets = 4,
      retractId = -2L)(rmIds)
    assert(n === 2L)

    Pipeline6.postingsWrite(survivors, ref, nBuckets = 4)
    val got = Pipeline6.bm25TopKStored(spark, t, k = 5, terms = Terms).collect()
    val want = Pipeline6.bm25TopKStored(spark, ref, k = 5, terms = Terms).collect()
    assert(got.toSeq === want.toSeq,
      "post-retraction BM25 must equal a from-scratch index of the survivors")
    assert(!got.exists(_.getLong(0) === 7L))

    val gotP = Pipeline6.phraseTopKStored(spark, t, Seq("merge", "merge"), 5).collect()
    val wantP = Pipeline6.phraseTopKStored(spark, ref, Seq("merge", "merge"), 5).collect()
    assert(gotP.toSeq === wantP.toSeq)

    // stats fold = survivors' exact (n, sdl): the negative row's long
    // arithmetic, not a recount
    val st = spark.table(s"${t}_stats")
      .agg(sum("n"), sum("sdl")).head()
    val sWs = survivors.select(size(split(col("text"), " ")).as("dl"))
      .agg(count(lit(1)), sum("dl")).head()
    assert(st.getLong(0) === sWs.getLong(0))
    assert(st.getLong(1) === sWs.getLong(1))
  }

  test("lexical retraction is replay-idempotent and its crash windows heal") {
    val t = "graft_spec_lexret_b"
    Pipeline6.postingsWrite(corpus, t, nBuckets = 4)

    // window 1: stats row committed, rows still present (crash between
    // the halves) — emulated by appending the commit record by hand
    val dec = corpus.filter(col("doc_id").isin(7L, 10L))
      .select(size(split(col("text"), " ")).as("dl"))
      .agg(count(lit(1)), sum("dl")).head()
    spark.range(1)
      .select(lit(-2L).as("batch_id"), lit(-dec.getLong(0)).as("n"),
        lit(-dec.getLong(1)).as("sdl"))
      .write.mode("append").format("parquet").saveAsTable(s"${t}_stats")
    val statsRows0 = spark.table(s"${t}_stats").count()

    val n = StreamingOps.lexicalRetractBatch(spark, t, nBuckets = 4,
      retractId = -2L)(rmIds)
    assert(n === 0L, "stats half must skip on the committed record")
    assert(spark.table(s"${t}_stats").count() === statsRows0,
      "no double decrement")
    assert(spark.table(t).filter(col("doc_id").isin(7L, 10L)).isEmpty,
      "posting half must still run")

    // full replay: double no-op
    val n2 = StreamingOps.lexicalRetractBatch(spark, t, nBuckets = 4,
      retractId = -2L)(rmIds)
    assert(n2 === 0L)
    assert(spark.table(s"${t}_stats").count() === statsRows0)

    // window 2: a crashed bucket swap (live table gone, __compact is
    // the sole copy) must heal on entry, not wedge or lose data
    spark.sql(s"DROP TABLE IF EXISTS ${t}__compact")
    Bucketed.writeBucketed(spark.table(t).repartition(4, col("term")),
      s"${t}__compact", "term", 4)
    spark.sql(s"DROP TABLE $t")
    val n3 = StreamingOps.lexicalRetractBatch(spark, t, nBuckets = 4,
      retractId = -3L)(Seq(9L).toDF("doc_id"))
    assert(n3 === 1L)
    assert(spark.table(t).filter(col("doc_id") === 9L).isEmpty)
    // retractId namespace guard: ingest-range ids are refused loudly
    intercept[IllegalArgumentException] {
      StreamingOps.lexicalRetractBatch(spark, t, nBuckets = 4,
        retractId = -1L)(rmIds)
    }
  }

  test("sidecar retraction is bucket-pruned and the verified gate stops confirming withdrawn docs") {
    // ids chosen so doc 19 is ALONE in its bucket (19 mod 8 = 3): its
    // retraction must DELETE the bucket directory outright
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),
      (8L, "p q r s t u v w"),
      (9L, "p q r s t u v y"),
      (16L, "m n o aa bb cc dd ee"),
      (19L, "zz yy xx ww vv uu tt ss"),
    ).toDF("doc_id", "text")
    val side = java.nio.file.Files.createTempDirectory("ret_side_").toString
    Dedup.shingleStoreWrite(
      Dedup.shingleSidecarRows(docs, "doc_id", "text", n = 3), side,
      nBuckets = 8)

    // a re-upload of doc 19's content confirms against the sidecar...
    val q = Seq((100L, "zz yy xx ww vv uu tt ss")).toDF("doc_id", "text")
    val qSh = Dedup.shingleSidecarRows(q, "doc_id", "text", n = 3)
      .select(col("doc_id").as("qid"), col("sh"))
    val cand = Seq((100L, 19L)).toDF("qid", "doc_id")
    assert(Dedup.lshVerifyStored(spark, side, cand, qSh, tau = 0.9,
      nBuckets = 8).count() === 1L)

    val untouched = new java.io.File(s"$side/bucket=1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSeq
    assert(Maintenance.removePrunedRows(spark, side,
      Seq(19L).toDF("doc_id"), "doc_id", "bucket", Some("doc_id")))

    // ...and no longer does once the shingle rows leave
    assert(Dedup.lshVerifyStored(spark, side, cand, qSh, tau = 0.9,
      nBuckets = 8).isEmpty)
    // pruned: buckets without a retracted row keep their exact files
    val after = new java.io.File(s"$side/bucket=1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSeq
    assert(after === untouched, "untouched bucket rewritten")
    // emptied: doc 19's whole bucket directory is gone
    assert(!new java.io.File(s"$side/bucket=3").exists())
    // replay converges
    assert(!Maintenance.removePrunedRows(spark, side,
      Seq(19L).toDF("doc_id"), "doc_id", "bucket", Some("doc_id")))
  }

  test("Engine.takedownText clears every text store a deployment keeps, idempotently") {
    import graft.operators.LabelStore
    val lsh = java.nio.file.Files.createTempDirectory("tdx_lsh_").toString
    val lbl = java.nio.file.Files.createTempDirectory("tdx_lbl_").toString
    val side = java.nio.file.Files.createTempDirectory("tdx_side_").toString
    val t = "graft_spec_tdx_postings"
    Dedup.lshStoreWrite(Dedup.lshSignatureRows(corpus, "doc_id", "text",
      n = 3, numHashes = 16, bands = 4), lsh)
    LabelStore.write(Dedup.dedupClusters(corpus, "doc_id",
      Dedup.minhashLshPairs(corpus, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4)), lbl)
    Dedup.shingleStoreWrite(
      Dedup.shingleSidecarRows(corpus, "doc_id", "text", n = 3), side)
    Pipeline6.postingsWrite(corpus, t, nBuckets = 4)

    val n = Engine.takedownText(spark, rmIds, lsh, lbl,
      sidecarPath = Some(side), postingTable = Some(t),
      postingBuckets = 4)
    assert(n === 2L)
    // invisible through every store: labels, signatures, shingles,
    // postings — and therefore through every probe path
    assert(LabelStore.read(spark, lbl)
      .filter(col("doc_id").isin(7L, 10L)).isEmpty)
    assert(spark.read.parquet(lsh)
      .filter(col("doc_id").isin(7L, 10L)).isEmpty)
    assert(spark.read.parquet(side)
      .filter(col("doc_id").isin(7L, 10L)).isEmpty)
    assert(spark.table(t).filter(col("doc_id").isin(7L, 10L)).isEmpty)
    assert(!Pipeline6.bm25TopKStored(spark, t, k = 12, terms = Terms)
      .collect().exists(r => Seq(7L, 10L).contains(r.getLong(0))))
    // the composition is a no-op on replay
    assert(Engine.takedownText(spark, rmIds, lsh, lbl,
      sidecarPath = Some(side), postingTable = Some(t),
      postingBuckets = 4) === 0L)
  }

  test("IVF-PQ codes retraction: probe parity with a rebuild of the survivors, untouched cells intact") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val cents = Similarity.seedCentroids(emb, 8)
    val cb = Pipeline6.pqCodebook(emb)
    val store = java.nio.file.Files.createTempDirectory("ret_pq_").toString
    val refStore = java.nio.file.Files.createTempDirectory("ret_pq_ref_").toString
    Pipeline6.ivfPqWrite(cents, cb, emb, store)

    val rm = emb.filter(pmod(col("vec_id"), lit(10L)) === 7L)
      .select(col("vec_id"))
    val cells = spark.read.parquet(store)
      .join(rm, Seq("vec_id"), "left_semi").select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    val quiet = (0 until 8).filterNot(cells.contains)
    val before = quiet.map(c => new java.io.File(s"$store/cell=$c").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSeq)

    assert(Maintenance.removeIvfRows(spark, store, rm))
    Pipeline6.ivfPqWrite(cents, cb,
      emb.join(rm, Seq("vec_id"), "left_anti"), refStore)

    val queries = emb.filter(col("vec_id").isin(1L, 2L, 3L))
    val got = Pipeline6.ivfPqTopKStored(spark, store, queries, cents, cb,
      k = 10, nProbe = 8).collect()
    val want = Pipeline6.ivfPqTopKStored(spark, refStore, queries, cents, cb,
      k = 10, nProbe = 8).collect()
    assert(got.toSeq === want.toSeq,
      "post-retraction codes probe must equal a rebuild of the survivors")
    assert(!got.exists(r => r.getLong(1) % 10L === 7L),
      "a retracted vector surfaced in the shortlist")
    val after = quiet.map(c => new java.io.File(s"$store/cell=$c").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSeq)
    assert(after === before, "cell-pruned rewrite touched a quiet cell")
  }
}
