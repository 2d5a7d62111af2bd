package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.{TextAnalysis, VectorOps}

/** Property-based checks (SURVEY.md §5.3): algebraic invariants of the
  * dedup/text/vector operators over generated inputs. Generators are
  * bounded small — each property round-trips through Spark jobs.
  */
class PropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Deterministic ScalaCheck sampling: n draws from fixed seeds, so
    * failures reproduce exactly.
    */
  private def forAll[A](g: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default.withSize(8), Seed(i.toLong)))
    }

  private val word = Gen.choose(1, 6).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val doc = Gen.choose(1, 20).flatMap(n =>
    Gen.listOfN(n, word).map(_.mkString(" ")))
  private val corpus = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, doc))

  test("exact dedup: every text keeps its minimum doc_id and total copies") {
    forAll(corpus) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.exact(df, "doc_id", "text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val exp = docs.zipWithIndex.groupBy(_._1).map { case (t, g) =>
        (t, g.map(_._2.toLong).min, g.size.toLong) }.toSet
      assert(got === exp)
    }
  }

  test("jaccard pairs: symmetric bound (0, 1] and d1 < d2") {
    forAll(corpus) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 2, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.forall { case (a, b, j) => a < b && j > 0.0 && j <= 1.0 })
    }
  }

  test("identical docs always collide in MinHash LSH") {
    forAll(doc.suchThat(_.split(" ").length >= 6)) { t =>
      val df = Seq((0L, t), (1L, t)).toDF("doc_id", "text")
      val pairs = Dedup.minhashLshPairs(df, "doc_id", "text", n = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.toSeq === Seq((0L, 1L)))
    }
  }

  test("LSH store probe equals the in-memory candidate relation on random corpora") {
    // the at-rest layout (p111) must be semantics-preserving for ANY
    // corpus, not just the fixture: probing the store with every doc's
    // own signatures reproduces exactly p04's candidate pairs (plus
    // the self-hits a probe includes by construction)
    forAll(corpus, n = 3) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").localCheckpoint()
      val sigs = Dedup.lshSignatureRows(df, "doc_id", "text", n = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      if (sigs.nonEmpty) {
        val store = java.nio.file.Files
          .createTempDirectory("prop_lsh").toString
        Dedup.lshStoreWrite(
          Dedup.lshSignatureRows(df, "doc_id", "text", n = 3), store)
        val got = Dedup.lshProbeStored(spark, store, sigs)
          .filter(col("qid") < col("doc_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = Dedup.minhashLshPairs(df, "doc_id", "text", n = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === want, s"stored probe diverged on corpus $docs")
      }
    }
  }

  test("stored IVF near-dup probe equals the in-memory witness relation on random vectors") {
    // p115's layout must be semantics-preserving for ANY vector set:
    // probing the store at nProbe = 1 with every vector reproduces the
    // own-cell within-tau relation derived INDEPENDENTLY in memory
    import graft.operators.Similarity
    val vec = Gen.listOfN(8, Gen.choose(-100, 100).map(_.toFloat / 100f))
      .suchThat(v => v.exists(_ != 0f))
    val vecs = Gen.choose(6, 16).flatMap(n => Gen.listOfN(n, vec))
    forAll(vecs, n = 3) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding").localCheckpoint()
      val cents = Similarity.seedCentroids(df, 4)
      val store = java.nio.file.Files
        .createTempDirectory("prop_ivf").toString
      Similarity.ivfWrite(df, cents, store)
      val tau = 0.5
      val got = Similarity
        .ivfProbeNearDup(spark, store, df, cents, tau, nProbe = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val assigned = Similarity.assignCells(cents, df)
        .localCheckpoint(eager = false)
      val want = assigned.as("a").join(assigned.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .filter(VectorOps.cosine(col("a.embedding"), col("b.embedding"))
          >= tau)
        .select(col("a.vec_id"), col("b.vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"stored near-dup probe diverged on $vs")
    }
  }

  test("simhash of identical docs is identical; hamming to itself is 0") {
    forAll(doc) { t =>
      val df = Seq((0L, t), (1L, t)).toDF("doc_id", "text")
      val sigs = Dedup.simhash(df, "doc_id", "text")
        .collect().map(_.getLong(1)).distinct
      assert(sigs.length === 1)
    }
  }

  test("rollingHash is order-sensitive and deterministic") {
    forAll(corpus.suchThat(_.nonEmpty)) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val a = df.select(TextAnalysis.rollingHash($"text")).collect().map(_.getLong(0))
      val b = df.select(TextAnalysis.rollingHash($"text")).collect().map(_.getLong(0))
      assert(a.toSeq === b.toSeq)
      assert(a.forall(h => h >= 0 && h < (1L << 30)))
    }
  }

  test("TopK aggregate equals the sort-take reference on random groups") {
    val grouped = Gen.choose(5, 30).flatMap(n => Gen.listOfN(n,
      for {
        g <- Gen.choose(0, 3)
        v <- Gen.choose(-1000, 1000)
      } yield (g, v.toDouble)))
    forAll(grouped) { rows =>
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id").repartition(3)
      val got = df.groupBy($"g")
        .agg(org.apache.spark.sql.graftext.TopK.topk(struct($"v", $"id"), 3).as("top"))
        .select($"g", explode($"top").as("t"))
        .collect().map(r => (r.getInt(0), r.getStruct(1).getDouble(0),
          r.getStruct(1).getLong(1))).toSet
      val exp = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
        .groupBy(_._1).flatMap { case (_, grp) =>
          grp.sortBy(t => (-t._2, -t._3)).take(3)
        }.toSet
      assert(got === exp)
    }
  }

  test("VecDot equals the in-memory dot product") {
    val vec = Gen.choose(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100, 100).map(_ / 10.0f)))
    forAll(vec) { v =>
      val df = Seq((0L, v)).toDF("vec_id", "embedding")
      val got = df.select(VectorOps.dot($"embedding", $"embedding")).head().getDouble(0)
      val exp = v.map(x => x.toDouble * x.toDouble).sum
      assert(math.abs(got - exp) < 1e-9)
    }
  }

  private val longRows = Gen.choose(1, 40).flatMap(n =>
    Gen.listOfN(n, Gen.zip(Gen.choose(0L, 500L), Gen.choose(0L, 9L))))

  test("TwoLevel global rank/cumsum equal the naive global window on arbitrary data") {
    import org.apache.spark.sql.expressions.Window
    forAll(longRows) { rows =>
      // unique tie-break id per row; shard key deliberately collides
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, k, v) }
        .toDF("id", "k", "v")
      val rk = operators.TwoLevel.withGlobalRank(df, "k", Seq("id"), "rn")
        .select(col("id"), col("rn"))
      val rkNaive = df.select(col("id"),
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long").as("rn"))
      assert(rk.exceptAll(rkNaive).isEmpty && rkNaive.exceptAll(rk).isEmpty)
      val cs = operators.TwoLevel
        .withGlobalCumsum(df, "k", Seq("id"), "v", "cum")
        .select(col("id"), col("cum"))
      val w = Window.orderBy(col("k"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val csNaive = df.select(col("id"), sum(col("v")).over(w).as("cum"))
      assert(cs.exceptAll(csNaive).isEmpty && csNaive.exceptAll(cs).isEmpty)
    }
  }

  test("bloomPrefilter: never a false negative on arbitrary key sets") {
    forAll(longRows) { rows =>
      val fact = rows.zipWithIndex
        .map { case ((k, _), i) => (i.toLong, k) }.toDF("id", "key")
      val dim = rows.map(_._1).distinct.filter(_ % 3 == 0).toDF("key")
      if (dim.head(1).nonEmpty) {
        val pre = Engine.bloomPrefilter(fact, "key", dim, "key", bits = 1 << 12)
          .select(col("id"), col("key"))
        val trueMatch = fact.join(dim, Seq("key"), "left_semi")
          .select(col("id"), col("key"))
        assert(trueMatch.exceptAll(pre).isEmpty,
          "bloom dropped a row whose key is present")
        // the lazy broadcast-join probe keeps IDENTICAL semantics
        val lazyPre = Engine
          .bloomPrefilterLazy(fact, "key", dim, "key", bits = 1 << 12)
          .select(col("id"), col("key"))
        assert(lazyPre.exceptAll(pre).isEmpty && pre.exceptAll(lazyPre).isEmpty,
          "lazy bloom variant disagrees with the literal-array variant")
      }
    }
  }

  test("weighted sample: exact A-Res top-n semantics, determinism, subset monotonicity") {
    import graft.operators.Pipeline5
    val df = (0L until 2000L).map(i => (i, 1L + i % 7)).toDF("id", "w")
    // exact semantics: the selected set IS the top-n of the A-Res key
    // (computed here via the same package-private key expression the
    // sampler orders by — the scratch column itself no longer leaks
    // into the sampler's output)
    assert(!Pipeline5.weightedSample(df, "id", col("w"), 10, seed = 5L)
      .columns.exists(_.startsWith("__")), "scratch column leaked")
    val keyed = df
      .withColumn("k", Pipeline5.aresKey("id", col("w"), seed = 5L))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("k")))
    val expect200 = keyed.sortBy { case (id, k) => (-k, id) }.take(200)
      .map(_._1).toSet
    val got200 = Pipeline5.weightedSample(df, "id", col("w"), 200, seed = 5L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got200 === expect200, "selection is not the top-n by A-Res key")
    // determinism under a different physical layout
    val got200b = Pipeline5
      .weightedSample(df.repartition(7), "id", col("w"), 200, seed = 5L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got200b === got200, "sample depends on partition layout")
    // subset monotonicity in n
    val got100 = Pipeline5.weightedSample(df, "id", col("w"), 100, seed = 5L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got100.subsetOf(got200))
  }

  test("weighted sample: inclusion frequency scales with weight across seeds") {
    import graft.operators.Pipeline5
    // 1000 rows of weight 1, 1000 rows of weight 4; sample 200 per seed.
    // With a 10% sampling fraction A-Res inclusion probability is close
    // to proportional: expect the weight-4 rows to appear ~4x as often,
    // within a generous band (exact proportionality only holds in the
    // small-fraction limit).
    val df = (0L until 2000L).map(i => (i, if (i < 1000) 1L else 4L))
      .toDF("id", "w")
    var heavy = 0L
    var light = 0L
    for (seed <- 1L to 10L) {
      val ids = Pipeline5.weightedSample(df, "id", col("w"), 200, seed)
        .collect().map(_.getAs[Long]("id"))
      heavy += ids.count(_ >= 1000L)
      light += ids.count(_ < 1000L)
    }
    val ratio = heavy.toDouble / math.max(1L, light).toDouble
    assert(ratio > 2.5 && ratio < 6.0,
      s"inclusion ratio $ratio not ~4x for 4x weights (heavy=$heavy light=$light)")
  }

  test("weighted sample: non-positive / NaN weights raise in-plan; reserved column rejected") {
    import graft.operators.Pipeline5
    val df = Seq((1L, 1.0), (2L, 0.0)).toDF("id", "w")
    val e = intercept[Exception] {
      Pipeline5.weightedSample(df, "id", col("w"), 2, seed = 1L).collect()
    }
    assert(e.getMessage.contains("weight must be > 0"),
      s"zero weight did not raise the documented error: ${e.getMessage}")
    val neg = Seq((1L, 1.0), (2L, -3.0)).toDF("id", "w")
    assertThrows[Exception] {
      Pipeline5.weightedSample(neg, "id", col("w"), 2, seed = 1L).collect()
    }
    val nan = Seq((1L, 1.0), (2L, Double.NaN)).toDF("id", "w")
    assertThrows[Exception] {
      Pipeline5.weightedSample(nan, "id", col("w"), 2, seed = 1L).collect()
    }
    val clash = Seq((1L, 1.0)).toDF("id", "__wkey")
    assertThrows[IllegalArgumentException] {
      Pipeline5.weightedSample(clash, "id", lit(1.0), 1, seed = 1L)
    }
  }

  test("per-stratum weighted sample: independent exact top-n per stratum, determinism") {
    import graft.operators.Pipeline5
    // 3 strata of very different sizes; small stratum returned whole
    val df = (0L until 900L)
      .map(i => (i, s"src${i % 3}", 1L + i % 5))
      .filter { case (i, s, _) => s != "src2" || i < 30 } // src2 tiny (10 rows)
      .toDF("id", "src", "w")
    val got = Pipeline5.weightedSampleBy(df, "src", "id", col("w"), 20, seed = 9L)
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("id")))
    val bySrc = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(bySrc("src0").size === 20 && bySrc("src1").size === 20,
      "full strata must fill their quota exactly")
    assert(bySrc("src2").size === 10, "small stratum must be returned whole")
    // per-stratum selection IS the top-n of the A-Res key within the stratum
    val keyed = df.withColumn("k", Pipeline5.aresKey("id", col("w"), seed = 9L))
      .collect()
      .map(r => (r.getAs[String]("src"), r.getAs[Long]("id"), r.getAs[Double]("k")))
    for (s <- Seq("src0", "src1", "src2")) {
      val expect = keyed.filter(_._1 == s)
        .sortBy { case (_, id, k) => (-k, id) }.take(20).map(_._2).toSet
      assert(bySrc(s) === expect, s"stratum $s selection is not its top-n by key")
    }
    // determinism under a different physical layout
    val gotB = Pipeline5
      .weightedSampleBy(df.repartition(7), "src", "id", col("w"), 20, seed = 9L)
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("id"))).toSet
    assert(gotB === got.toSet, "per-stratum sample depends on partition layout")
    // scratch columns never leak
    assert(!Pipeline5.weightedSampleBy(df, "src", "id", col("w"), 5, seed = 9L)
      .columns.exists(_.startsWith("__")), "scratch column leaked")
  }

  test("temperature mixing: quotas respect the budget and flatten the source distribution") {
    import graft.operators.Pipeline5
    // skewed sources: 600 / 250 / 50 docs
    val df = ((0L until 600L).map((_, "big")) ++
              (600L until 850L).map((_, "mid")) ++
              (850L until 900L).map((_, "small")))
      .toDF("doc_id", "source")
    val budget = 300
    val got = Pipeline5.mixTemperature(df, budget).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
    val per = got.groupBy(_._1).view.mapValues(_.length).toMap
    // floor quotas: total never exceeds the budget, never undershoots
    // by more than one doc per source
    assert(got.length <= budget && got.length > budget - 3)
    // alpha = 1/2 flattening: every tail source's share strictly
    // exceeds its proportional share, the head source's share shrinks
    val n = Map("big" -> 600.0, "mid" -> 250.0, "small" -> 50.0)
    val total = n.values.sum
    assert(per("small") / got.length.toDouble > n("small") / total,
      "tail source not up-weighted")
    assert(per("mid") / got.length.toDouble > n("mid") / total,
      "mid source not up-weighted")
    assert(per("big") / got.length.toDouble < n("big") / total,
      "head source not down-weighted")
    // still proportional in sqrt-space: quota ratios track sqrt(n) ratios
    val sq = n.map { case (k, v) => k -> math.sqrt(v) }
    val w = sq.values.sum
    n.keys.foreach { k =>
      val ideal = budget * sq(k) / w
      assert(math.abs(per(k) - ideal) <= 1.0,
        s"$k quota ${per(k)} drifted from floor($ideal)")
    }
    // deterministic under physical layout changes
    val again = Pipeline5.mixTemperature(df.repartition(7), budget).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(again === got.toSet, "mix depends on partition layout")
  }

  test("p74: map-side rule statistics equal a Scala reference on generated corpora") {
    forAll(corpus, n = 4) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = operators.Pipeline8.qualityRulesOf(df).collect()
        .map(r => r.getLong(0) -> r).toMap
      docs.zipWithIndex.foreach { case (t, i) =>
        val w = t.split(" ")
        val wc = w.length
        val stop = Set("the", "a", "of", "and", "to")
        val mwl = (t.length - wc + 1).toDouble / wc
        val stopRatio = w.count(stop).toDouble / wc
        val topFrac = w.groupBy(identity).values.map(_.length).max.toDouble / wc
        val distinctRatio = w.distinct.length.toDouble / wc
        val want = Seq(
          "r_wordcount" -> (wc >= 20 && wc <= 90),
          "r_wordlen" -> (mwl >= 4.2 && mwl <= 4.8),
          "r_stopword" -> (stopRatio >= 0.02),
          "r_repetition" -> (topFrac <= 0.15),
          "r_diversity" -> (distinctRatio >= 0.32))
        val row = got(i.toLong)
        want.foreach { case (c, v) =>
          assert(row.getAs[Boolean](c) === v,
            s"doc '$t': $c diverged from the reference")
        }
        assert(row.getAs[Boolean]("pass") === want.forall(_._2))
      }
    }
  }

  test("q69: bounded-state EWMA equals the collect_list fold on skewed corpora") {
    // one heavy user (far above average), negative cents, timestamp
    // ties broken by event_id — the exact conditions under which the
    // two physical shapes could diverge if the fold order or the Long
    // `/` vs Spark DIV semantics disagreed
    val ev = for {
      nUsers <- Gen.choose(2, 5)
      heavy <- Gen.choose(40, 120)
      rows <- Gen.listOfN(heavy, Gen.zip(
        Gen.frequency(7 -> Gen.const(0L), 3 -> Gen.choose(1L, nUsers.toLong)),
        Gen.choose(0L, 5L), // coarse → frequent ts ties
        Gen.choose(-500L, 500L)))
    } yield rows.zipWithIndex.map { case ((u, ts, c), i) => (u, ts, i.toLong, c) }
    forAll(ev, n = 4) { rows =>
      val df = rows.toDF("user_id", "us", "event_id", "c")
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2))
      val slow = operators.Relational8.ewmaCollected(df).collect().map(key).toSet
      val fast = operators.Relational8.ewmaBounded(df).collect().map(key).toSet
      assert(fast === slow)
    }
  }

  test("q65: degree-ordered triangle counts equal id-ordered on random graphs") {
    val graph = for {
      nNodes <- Gen.choose(4, 14)
      nEdges <- Gen.choose(3, 40)
      es <- Gen.listOfN(nEdges, Gen.zip(
        Gen.choose(0L, nNodes.toLong), Gen.choose(0L, nNodes.toLong)))
    } yield es.filter { case (a, b) => a != b }
    forAll(graph, n = 5) { es =>
      val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toDF("a", "b")
      val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
      val byId = operators.Relational8.trianglesIdOrdered(und)
        .collect().map(key).toSet
      val byDeg = operators.Relational8.trianglesDegreeOrdered(und)
        .collect().map(key).toSet
      assert(byDeg === byId)
    }
  }

  test("media decoders on mutated payloads: guard-raised failures only, shape-stable under data flips") {
    // the class of bug ADVICE r7 caught in the RIFF walk (a corrupt
    // chunk size looping an executor forever): random byte mutations
    // and truncations of VALID payloads must either parse or raise the
    // guards' own IllegalArgumentException, in bounded time. The
    // kernels run DIRECTLY on the driver (no Spark job, no task-failure
    // wrapping — ADVICE r8), so a raw ArrayIndexOutOfBounds /
    // NegativeArraySize propagates and FAILS the test instead of
    // hiding inside a SparkException, and a hang trips the suite
    // timeout. Shape half of the contract: a byte FLIP strictly inside
    // a pixel/sample block never touches a header, so the parse must
    // succeed and every shape field must equal the clean decode's;
    // a video truncation that parses must be an exact frame prefix.
    import graft.operators.Multimodal
    val mutation = for {
      id <- Gen.choose(0L, 400L)
      kind <- Gen.choose(0, 2)
      at <- Gen.choose(0, 10000)
      b <- Gen.choose(0, 255)
    } yield (id, kind, at, b)
    forAll(Gen.listOfN(30, mutation), n = 3) { ms =>
      ms.foreach { case (id, kind, at0, b) =>
        def corrupt(good: Array[Byte]): (Array[Byte], Int) = {
          val at = at0 % math.max(1, good.length)
          (kind match {
            case 0 => good.take(at)                       // truncate
            case 1 => val c = good.clone(); c(at) = b.toByte; c // flip
            case 2 => (good.take(at) :+ b.toByte) ++ good.drop(at) // insert
          }, at)
        }
        // run the kernel; None = the guards rejected it (the ONLY
        // tolerated failure), Some(result) = it parsed
        def run[A](thunk: => A): Option[A] =
          try Some(thunk) catch { case _: IllegalArgumentException => None }

        // video: flips outside the per-frame headers keep the exact
        // frame geometry; a parsed truncation is a clean-walk prefix
        val vGood = Multimodal.videoBytes(id)
        val vClean = Multimodal.walkVideo(id, vGood)
        val (vw, vh, _) = Multimodal.videoParams(id)
        val vHdLen = s"P6\n$vw $vh\n255\n".length
        val vStride = vHdLen + vw * vh * 3
        val (vBad, vAt) = corrupt(vGood)
        run(Multimodal.walkVideo(id, vBad)) match {
          case Some(frames) if kind == 0 =>
            assert(frames == vClean.take(frames.length),
              s"doc $id: truncated walk is not a clean prefix")
          case Some(frames) if kind == 1 =>
            assert(frames.map(f => (f._1, f._2, f._3)) ===
              vClean.map(f => (f._1, f._2, f._3)),
              s"doc $id: flip changed frame geometry")
          case Some(_) => // insert that still parses: tolerated
          case None =>
            assert(!(kind == 1 && vAt % vStride >= vHdLen),
              s"doc $id: pixel-block flip at $vAt must not fail the parse")
        }

        // wave: flips inside the sample block ([44, end)) keep rate/n
        val wGood = Multimodal.waveBytes(id)
        val wClean = Multimodal.waveKernel(id, wGood)
        val (wBad, wAt) = corrupt(wGood)
        run(Multimodal.waveKernel(id, wBad)) match {
          case Some(out) if kind == 1 && wAt >= 44 =>
            assert(out(0) == wClean(0) && out(1) == wClean(1),
              s"doc $id: sample flip changed rate/n_samples")
          case Some(_) =>
          case None =>
            assert(!(kind == 1 && wAt >= 44),
              s"doc $id: sample flip at $wAt must not fail the parse")
        }

        // raster: flips at/after the header keep (w, h, maxval, bytes)
        val rGood = Multimodal.rasterBytes(id)
        val rClean = Multimodal.rasterKernel(id, rGood)
        val rHdLen = rGood.length - rClean(3).asInstanceOf[Long].toInt
        val (rBad, rAt) = corrupt(rGood)
        run(Multimodal.rasterKernel(id, rBad)) match {
          case Some(out) if kind == 1 && rAt >= rHdLen =>
            assert(out.take(4) == rClean.take(4),
              s"doc $id: pixel flip changed raster shape")
          case Some(_) =>
          case None =>
            assert(!(kind == 1 && rAt >= rHdLen),
              s"doc $id: pixel flip at $rAt must not fail the parse")
        }
      }
    }
  }
}
