// Retrieval-quality audit: recall@k of every approximate search path
// against exact search, per query, at a given scale factor — the
// measured accuracy column next to each path's IO-savings claim.
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.tools.RecallAudit"
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Pipeline6, Similarity}

object RecallAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val k = 10
    val nQ = 5

    val emb = graft.Tables.embeddings(spark, dir)
    val all = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qids = all.keys.filter(_ < nQ).toSeq.sorted

    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def exactTop(qid: Long, byCos: Boolean): Set[Long] = {
      val q = all(qid)
      all.keys.filter(_ != qid).toSeq.sortBy { v =>
        val c = all(v)
        if (byCos) (-dot(q, c) / (math.sqrt(dot(q, q)) * math.sqrt(dot(c, c))), v)
        else ((dot(q, q) - 2 * dot(q, c)) + dot(c, c), v)
      }.take(k).toSet
    }
    val exactCos = qids.map(q => q -> exactTop(q, byCos = true)).toMap
    val exactL2 = qids.map(q => q -> exactTop(q, byCos = false)).toMap

    def recall(got: DataFrame, qidCol: String, cidCol: String,
               truth: Map[Long, Set[Long]]): Double = {
      val by = got.collect()
        .groupBy(r => r.getAs[Any](qidCol).toString.toLong)
        .view.mapValues(_.map(r => r.getAs[Any](cidCol).toString.toLong).toSet)
      val hits = qids.map(q => (by.getOrElse(q, Set.empty) & truth(q)).size).sum
      hits.toDouble / (qids.size * k)
    }

    val queries = emb.filter(col("vec_id") < nQ)
    val cents = Similarity.seedCentroids(emb, 8)
    val cb = Pipeline6.pqCodebook(emb)

    // cosine-metric paths vs exact cosine top-k
    val lsh = Similarity.signLshTopK(emb, queries, k, nBands = 8, width = 8)
    val ivf = Similarity.ivfTopK(emb, queries, k, nCells = 8, nProbe = 2)
    val ivf4 = Similarity.ivfTopK(emb, queries, k, nCells = 8, nProbe = 4)
    // L2-metric paths vs exact L2 top-k
    val store = java.nio.file.Files.createTempDirectory("recall_ivfpq").toString
    Pipeline6.ivfPqWrite(cents, cb, emb, store)
    def ivfpq(nProbe: Int) =
      Pipeline6.ivfPqTopKStored(spark, store, queries, cents, cb, k, nProbe)
    val adcFull = ivfpq(8)  // no IVF gate: pure PQ quantization loss
    val adc2 = ivfpq(2)     // the production probe: quantization + gate
    // the refine stage: ADC shortlist -> exact re-rank off the p41
    // embedding layout — how much of the PQ gap the re-rank closes
    val embStoreR = java.nio.file.Files.createTempDirectory("recall_ivfemb").toString
    Similarity.ivfWrite(emb, cents, embStoreR)
    def refined(nProbe: Int, r: Int) =
      Pipeline6.ivfPqRefineTopK(spark, store, embStoreR, queries,
        cents, cb, k, r, nProbe)
    val ref2 = refined(2, 30)
    val refFull = refined(8, 30)
    // residual encoding (true IVFADC): codes quantize v - centroid(cell)
    val cbR = Pipeline6.pqResidualCodebook(cents, emb)
    val storeR = java.nio.file.Files.createTempDirectory("recall_ivfpqres").toString
    Pipeline6.ivfPqResidualWrite(cents, cbR, emb, storeR)
    def resAdc(nProbe: Int) =
      Pipeline6.ivfPqResidualTopKStored(spark, storeR, queries, cents, cbR, k, nProbe)

    // trained codebook (per-subspace k-means): quantization quality vs
    // the coreset seed, same geometry, same stores rebuilt
    val cbT = Pipeline6.trainPqCodebook(emb, iters = 3)
    val storeT = java.nio.file.Files.createTempDirectory("recall_ivfpq_t").toString
    Pipeline6.ivfPqWrite(cents, cbT, emb, storeT)
    val adcFullT = Pipeline6.ivfPqTopKStored(spark, storeT, queries, cents, cbT, k, 8)
    val ref2T = Pipeline6.ivfPqRefineTopK(spark, storeT, embStoreR, queries,
      cents, cbT, k, 30, 2)

    // at-rest footprint: same corpus, embedding store (p41) vs codes
    // store (p49) — the measured form of the compression claim
    val embStore = java.nio.file.Files.createTempDirectory("size_ivf").toString
    Similarity.ivfWrite(emb, cents, embStore)
    def bytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    val (be, bc) = (bytes(embStore), bytes(store))
    println(f"at-rest bytes, ${all.size} vectors: IVF(embeddings)=$be  " +
      f"IVF-PQ(codes)=$bc  ratio=${be.toDouble / bc}%.1fx")
    println(f"recall@$k over ${qids.size} queries, $dir")
    println(f"  sign-LSH (8x8 bands)        vs exact-cos: ${recall(lsh, "qid", "cid", exactCos)}%.2f")
    println(f"  IVF nProbe=2/8              vs exact-cos: ${recall(ivf, "qid", "cid", exactCos)}%.2f")
    println(f"  IVF nProbe=4/8              vs exact-cos: ${recall(ivf4, "qid", "cid", exactCos)}%.2f")
    println(f"  PQ-ADC all cells (8x4 geo)  vs exact-L2:  ${recall(adcFull, "qid", "cid", exactL2)}%.2f")
    println(f"  IVF-PQ nProbe=2/8           vs exact-L2:  ${recall(adc2, "qid", "cid", exactL2)}%.2f")
    println(f"  IVF-PQ+refine nProbe=2 r=30 vs exact-L2:  ${recall(ref2, "qid", "cid", exactL2)}%.2f")
    println(f"  IVF-PQ+refine nProbe=8 r=30 vs exact-L2:  ${recall(refFull, "qid", "cid", exactL2)}%.2f")
    println(f"  TRAINED ADC all cells       vs exact-L2:  ${recall(adcFullT, "qid", "cid", exactL2)}%.2f")
    println(f"  TRAINED IVF-PQ+refine 2/30  vs exact-L2:  ${recall(ref2T, "qid", "cid", exactL2)}%.2f")
    println(f"  RESIDUAL IVF-PQ nProbe=2/8  vs exact-L2:  ${recall(resAdc(2), "qid", "cid", exactL2)}%.2f")
    println(f"  RESIDUAL IVF-PQ all cells   vs exact-L2:  ${recall(resAdc(8), "qid", "cid", exactL2)}%.2f")
    spark.stop()
  }
}
