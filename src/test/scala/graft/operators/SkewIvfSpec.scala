package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewIvfSpec extends SparkSpec {

  import spark.implicits._

  test("salted join is row-identical to the plain join on a skewed key") {
    // 90% of fact rows share one hot key
    val fact = spark.range(0, 1000)
      .select((when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")))
        .as("k"), col("id").as("payload"))
    val dim = Seq((7L, "hot"), (0L, "a"), (10L, "b"), (20L, "c"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "name").collect().map(_.toString).sorted
    val salted = Skew.saltedEquiJoin(fact, dim, "k", numSalts = 8)
      .select("k", "payload", "name").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("salted join spreads a hot key across salt values") {
    val fact = spark.range(0, 1000).select(lit(1L).as("k"), col("id").as("p"))
    val salts = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 4, s"hot key only landed on $salts salts")
  }

  test("chooseSalts: declines below break-even, slices to the measured " +
      "skew above it, and the auto join stays row-identical") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      // uniform keys: hot share ~1/50, over = 32/50 < 2 -> don't salt
      val uniform = spark.range(0, 20000)
        .select(pmod(col("id"), lit(50)).as("k"), col("id").as("p"))
      assert(Skew.chooseSalts(uniform, "k", sampleFraction = 1.0) == 1)
      // 50% hot: over = 0.5 * 32 = 16 -> ceil(16/2) = 8 salts
      val hot = spark.range(0, 20000)
        .select(when(col("id") % 2 === 0, lit(0L))
          .otherwise(pmod(col("id"), lit(1000))).as("k"),
          col("id").as("p"))
      assert(Skew.chooseSalts(hot, "k", sampleFraction = 1.0) == 8)
      // maxSalts caps the slice
      assert(Skew.chooseSalts(hot, "k", sampleFraction = 1.0,
        maxSalts = 4) == 4)
      // empty input: no evidence, no salting
      assert(Skew.chooseSalts(uniform.filter(col("k") < 0), "k",
        sampleFraction = 1.0) == 1)
      // auto join == plain join, rows and all
      val dim = Seq((0L, "hot"), (3L, "a"), (7L, "b")).toDF("k", "name")
      val plain = hot.join(dim, Seq("k"))
        .select("k", "p", "name").collect().map(_.toString).sorted
      val auto = Skew.saltedEquiJoinAuto(hot, dim, "k",
        sampleFraction = 1.0)
        .select("k", "p", "name").collect().map(_.toString).sorted
      assert(auto.toSeq == plain.toSeq && plain.nonEmpty)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("saltedEquiJoinAuto defers to AQE exactly when the session's " +
      "skew-join thresholds cover the estimated hot partition") {
    // the r17 scale-smoke regime, replayed as the decision rule's
    // fixture: 100M rows of (long k, long v) => ~4 wire bytes/row,
    // hot share 0.2 => ~80 MB hot partition on the shuffle wire
    val fact = spark.range(0, 100)
      .select(col("id").as("k"), col("id").as("v"))
    val hotShare = 0.2
    val estRows = 100L * 1000 * 1000
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try {
      // the smoke's partitioning: ~66 reduce partitions at sf1, so the
      // hot partition is ~13x the median — AQE's factor test passes
      // and the decision hinges on the BYTE threshold (at this suite's
      // default of 4 partitions the hot partition would be ~median and
      // AQE would rightly never flag it)
      spark.conf.set("spark.sql.shuffle.partitions", "66")
      // DEFAULT thresholds (256 MB): 80 MB hot wire is SUB-threshold —
      // AQE will not split it (the smoke measured the unsalted
      // straggler at 2x the salted task here), so auto must salt
      assert(!Skew.aqeCoversJoinSkew(fact, hotShare, estRows))
      // the smoke's forced-aggressive conf (8 MB threshold, factor 2):
      // AQE fires and beats salting (2.96s vs 4.73s max task at sf1)
      // — auto must defer
      spark.conf.set(keys(0), s"${8 * 1024 * 1024}")
      spark.conf.set(keys(1), "2.0")
      assert(Skew.aqeCoversJoinSkew(fact, hotShare, estRows))
      // skew-join disabled: never defer, whatever the thresholds
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      assert(!Skew.aqeCoversJoinSkew(fact, hotShare, estRows))
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // no measured skew: nothing for AQE to cover
      assert(!Skew.aqeCoversJoinSkew(fact, 0.0, estRows))
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("salted sum equals plain sum") {
    val df = spark.range(0, 500)
      .select((col("id") % 3).as("k"), (col("id") * 2).cast("double").as("v"))
    val plain = df.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, Seq("k"), "v", numSalts = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("pqMaybeRetrain: the frozen-regime path passes codes and " +
      "codebooks through UNTOUCHED; drift trips the error monitor") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    val cb = Similarity.pqTrainCodebooks(emb, m = 8, ksub = 16, iters = 1)
    val codes = emb.select(col("vec_id"),
      Similarity.pqEncodeCol(col("embedding"), cb).as("codes"))
      .localCheckpoint()
    val baseErr = Similarity.pqQuantErr(emb, codes, cb)
    assert(baseErr > 0)
    // no drift: the SAME codes object comes back (eq, not just equal)
    // and the codebooks are the same arrays — pq_incremental's
    // bit-identity contract is untouched on this path
    val (c1, b1, r1, e1) = Similarity.pqMaybeRetrain(emb, codes, cb, baseErr)
    assert(!r1 && (c1 eq codes) && (b1 eq cb) &&
      math.abs(e1 - baseErr) < 1e-12)
    // drift: translated corpus re-encoded under frozen codebooks —
    // the error monitor must trip and the retrained codebooks must
    // fit the shifted corpus again
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => (x + lit(2.0f)).cast("float")).as("embedding"))
      .localCheckpoint()
    val frozen = shifted.select(col("vec_id"),
      Similarity.pqEncodeCol(col("embedding"), cb).as("codes"))
    val frozenErr = Similarity.pqQuantErr(shifted, frozen, cb)
    assert(frozenErr > baseErr * 10,
      s"drift fixture too weak: $frozenErr vs $baseErr")
    val (c2, b2, r2, e2) = Similarity.pqMaybeRetrain(shifted, frozen, cb,
      baseErr)
    assert(r2, s"monitor did not trip: frozen $frozenErr vs base $baseErr")
    // the returned err on the retrain branch is the POST-retrain error
    // — the caller's next baseline, never the drifted reading
    val retrainedErr = Similarity.pqQuantErr(shifted, c2, b2)
    assert(math.abs(e2 - retrainedErr) < 1e-9,
      s"returned err $e2 is not the post-retrain error $retrainedErr")
    assert(retrainedErr < frozenErr / 10,
      s"retrain did not restore fit: $retrainedErr vs frozen $frozenErr")
  }

  test("ivfRefresh: incremental maintenance is bit-identical to a full " +
      "re-assignment under the same frozen centroids") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val v1 = emb.filter(col("vec_id") % 3 =!= 2)
    val cents = Similarity.trainCentroids(v1, nCentroids = 8, iters = 1)
    val index1 = Similarity.ivfAssign(v1, cents)
    // the delta: inserts (the held-out third), updates (every 6th
    // vector flipped — assignments must MOVE), deletes (every 7th≡3)
    val updated = emb.filter(col("vec_id") % 6 === 0)
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(-1.0f)))
    val upserted = emb.filter(col("vec_id") % 3 === 2 &&
        col("vec_id") % 7 =!= 3)
      .unionByName(updated.filter(col("vec_id") % 7 =!= 3))
    val removedIds = emb.filter(col("vec_id") % 7 === 3 ||
      col("vec_id") % 6 === 0).select("vec_id")
    val maintained = Similarity.ivfRefresh(index1, cents,
      upserted, removedIds)
    val finalCorpus = emb.filter(col("vec_id") % 7 =!= 3)
      .join(updated.select(col("vec_id").as("uid"), col("embedding")
        .as("uvec")), col("vec_id") === col("uid"), "left")
      .select(col("vec_id"),
        coalesce(col("uvec"), col("embedding")).as("embedding"))
    val rebuilt = Similarity.ivfAssign(finalCorpus, cents)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("centroid_id"),
        col("embedding").cast("array<float>"))
      .collect().map(_.toString).sorted.toSeq
    val a = canon(maintained)
    assert(a.nonEmpty && a == canon(rebuilt),
      "maintained index diverged from the full re-assignment")
    // updated vectors really moved lists (the refresh wasn't a no-op)
    val before = index1.filter(col("vec_id") % 6 === 0)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = maintained.filter(col("vec_id") % 6 === 0)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.exists { case (id, c) => before.get(id).exists(_ != c) },
      "no flipped vector changed its inverted list — fixture too weak")
  }

  test("ivfMaybeRetrain: distribution shift erodes frozen-centroid " +
      "recall, the fit trigger fires and the retrain restores it; a " +
      "stable corpus keeps its centroids frozen") {
    val rnd = new scala.util.Random(31)
    val dim = 16
    def clustered(centers: Array[Array[Float]], n: Int,
                  idBase: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val c = centers(i % centers.length)
        (idBase + i, c.map(x => x + (rnd.nextFloat() * 2f - 1f) * 0.1f).toSeq)
      }
    val centersA = Array.fill(8, dim)(rnd.nextFloat() * 2f - 1f)
    val corpusA = clustered(centersA, 400, 0L).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(corpusA, nCentroids = 8)
    val indexA = Similarity.ivfAssign(corpusA, cents).localCheckpoint()
    val baselineFit = Similarity.ivfFit(indexA, cents)
    assert(baselineFit > 0.5, s"clustered fixture should fit well: $baselineFit")

    // STABLE maintenance: a delta drawn from the SAME clusters must
    // NOT trigger a retrain (the zero-training-I/O common case)
    val sameDist = clustered(centersA, 40, 1000L).toDF("vec_id", "embedding")
    val stable = Similarity.ivfRefresh(indexA, cents, sameDist,
      spark.emptyDataFrame.select(lit(0L).as("vec_id")).limit(0))
    val (_, stableCents, retrainedStable, stableFit) =
      Similarity.ivfMaybeRetrain(stable, cents, baselineFit,
        maxFitDrop = 0.05, nCentroids = 8)
    assert(!retrainedStable,
      s"stable corpus triggered a retrain (fit $baselineFit -> $stableFit)")
    assert(stableCents eq cents, "no-drift path must pass centroids through")

    // DRIFT: the new clusters sit ON the old list boundaries — each
    // new center is the midpoint of a NORMALIZED pair of trained
    // centroids, so its members split ~50/50 between two old lists
    // and a single-probe query recovers only its own half. (A tight
    // cluster anywhere ELSE co-locates under any centroid set, which
    // is why "new random clusters" cannot erode frozen recall.)
    val cvecs = cents.orderBy("centroid_id").collect()
      .map(_.getSeq[Float](1).toArray)
    def norm(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centersB = Array.tabulate(4) { j =>
      val a = norm(cvecs(2 * j)); val b = norm(cvecs(2 * j + 1))
      a.zip(b).map { case (x, y) => x + y }
    }
    val corpusB = clustered(centersB, 400, 5000L).toDF("vec_id", "embedding")
    val drifted = Similarity.ivfRefresh(indexA, cents, corpusB,
      corpusA.select("vec_id")).localCheckpoint()
    val queries = corpusB.filter(col("vec_id") % 37 === 0)
      .select((-col("vec_id") - 1L).as("vec_id"), col("embedding"))
    val brute = Similarity.bruteForceTopK(corpusB, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallWith(cs: org.apache.spark.sql.DataFrame,
                   corpus: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.ivfTopKWith(cs, corpus, queries, k = 10,
        nProbe = 1).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      got.count(brute.contains).toDouble / brute.size
    }
    val frozenRecall = recallWith(cents, corpusB)
    val (rebuilt, newCents, retrained, newFit) =
      Similarity.ivfMaybeRetrain(drifted, cents, baselineFit,
        maxFitDrop = 0.05, nCentroids = 4)
    assert(retrained, "full distribution shift did not trigger a retrain")
    assert(newFit > Similarity.ivfFit(drifted, cents),
      "retrain did not improve the fit signal")
    val retrainedRecall = recallWith(newCents,
      rebuilt.select("vec_id", "embedding"))
    assert(frozenRecall < 0.9,
      s"fixture too weak: frozen centroids still at recall $frozenRecall")
    assert(retrainedRecall >= 0.9,
      s"retrain did not restore recall: frozen=$frozenRecall " +
        s"retrained=$retrainedRecall")
  }

  test("IVF assigns every vector to exactly one centroid") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Similarity.ivfIndex(emb, nCentroids = 8)
    assert(idx.count() == emb.count())
    assert(idx.select("centroid_id").distinct().count() <= 8)
  }

  test("Lloyd training strictly improves IVF recall on clustered embeddings at equal nProbe") {
    // the production-ANN case: clustered embeddings with one dense
    // region. A raw corpus sample drops most centroids into the dense
    // cluster, starving the small clusters of inverted lists — queries
    // near those clusters then probe the wrong lists. Lloyd rounds
    // spread the centroids toward the actual cluster structure.
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(8, dim)(rnd.nextFloat() * 2f - 1f)
    val rows = (0 until 400).map { i =>
      val c = if (i % 5 != 0) 0 else 1 + (i / 5) % 7 // 80% crowd cluster 0
      val v = centers(c).map(x => x + (rnd.nextFloat() * 2f - 1f) * 0.15f)
      (i.toLong, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    // queries from the SMALL clusters — the ones sampling starves
    val queries = emb.filter(col("vec_id") < 50 && col("vec_id") % 5 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(trainIters: Int): Double = {
      val approx = Similarity.ivfTopK(emb, queries, k = 10,
        nCentroids = 8, nProbe = 2, trainIters = trainIters).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      approx.count(brute.contains).toDouble / brute.size
    }
    val sampled = recall(0)
    val trained = recall(2)
    assert(trained > sampled,
      s"Lloyd training did not improve recall: sampled=$sampled trained=$trained")

    // SAMPLE-BOUNDED training (the 100 TB path: Lloyd on a bounded
    // sample, one full assignment) must hold the trained recall within
    // tolerance of full-corpus training — not fall back to seed quality
    val sampleTrained = {
      val approx = Similarity.ivfTopK(emb, queries, k = 10,
        nCentroids = 8, nProbe = 2, trainIters = 2,
        maxTrainVectors = 150L).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      approx.count(brute.contains).toDouble / brute.size
    }
    assert(sampleTrained >= trained - 0.15,
      s"sample-bounded Lloyd lost recall: full=$trained sampled=$sampleTrained")
  }

  test("IVF ANN: exact cosines, sane recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 10,
      nCentroids = 8, nProbe = 4).collect()
    assert(ivf.nonEmpty)
    // probing half the lists should recover a nontrivial share of the
    // true top-10 (random 64-dim embeddings are a worst case for IVF)
    val hits = ivf.map(r => (r.getLong(0), r.getLong(2))).count(brute.contains)
    assert(hits > 0, "IVF found none of the true top-10")
    // rank values are exact cosines: cross-check one pair against the
    // brute-force score map
    val bruteScores = Similarity.bruteForceTopK(emb, queries, k = 500).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    ivf.foreach { r =>
      bruteScores.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(math.abs(c - r.getDouble(3)) < 1e-9)
      }
    }
  }

  test("PQ: plan-side encode and ADC agree BIT-EXACTLY with a driver-side " +
      "replay of the same arithmetic") {
    // the claim is not approximation quality (that's the recall test) —
    // it's that the HOF plan arithmetic computes exactly the PQ it
    // says: per-subspace argmin L2 encode, LUT = sub-dot products,
    // ADC = sum of LUT entries at the codes. Left-to-right double
    // accumulation both sides -> bit parity, no tolerance.
    val rnd = new scala.util.Random(11)
    val dim = 16; val m = 4; val ksub = 4; val dsub = dim / m
    val rows = (0L until 60L).map(i => (i, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val emb = rows.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrainCodebooks(emb, m, ksub, iters = 2)
    assert(cb.length == m && cb.forall(_.length == ksub) &&
      cb.forall(_.forall(_.length == dsub)), "codebook shape")
    val got = emb.select(col("vec_id"),
      Similarity.pqEncodeCol(col("embedding"), cb).as("codes"),
      Similarity.pqAdcScore(
        Similarity.pqEncodeCol(col("embedding"), cb),
        Similarity.pqLutCol(col("embedding"), cb), ksub).as("self_adc"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1).toArray, r.getDouble(2)))).toMap
    rows.foreach { case (id, vec) =>
      val (codes, adc) = {
        val cs = Array.tabulate(m) { s =>
          var best = -1; var bestD = Double.MaxValue
          for (c <- 0 until ksub) {
            var d = 0.0
            for (j <- 0 until dsub) {
              val dd = vec(s * dsub + j).toDouble - cb(s)(c)(j).toDouble
              d += dd * dd
            }
            if (d < bestD) { bestD = d; best = c }
          }
          cs_check(best); best
        }
        var a = 0.0
        for (s <- 0 until m) {
          var dot = 0.0
          for (j <- 0 until dsub)
            dot += vec(s * dsub + j).toDouble * cb(s)(cs(s))(j).toDouble
          a += dot
        }
        (cs, a)
      }
      val (gotCodes, gotAdc) = (got(id)._1, got(id)._2)
      assert(gotCodes.toSeq == codes.toSeq, s"codes for vec $id")
      assert(gotAdc == adc, s"self-ADC for vec $id: $gotAdc != $adc")
    }
  }
  private def cs_check(c: Int): Unit = assert(c >= 0, "argmin found no code")

  test("IVF-PQ ANN: planted recovery is exact and clustered recall holds " +
      "against brute force") {
    // clustered fixture (the production shape): IVF prunes to probed
    // lists, ADC over 4-byte-scale codes picks the candidate pool,
    // exact re-rank returns true cosines. Planted near-duplicates must
    // come back rank-1 at their exact cosine; corpus-wide recall@10
    // must clear a floor that code-only scoring without refine+re-rank
    // would miss.
    val rnd = new scala.util.Random(23)
    val dim = 16
    val centers = Array.fill(6, dim)(rnd.nextFloat() * 2f - 1f)
    val rows = (0 until 300).map { i =>
      val c = i % 6
      (i.toLong, centers(c).map(x => x + (rnd.nextFloat() * 2f - 1f) * 0.2f).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 12)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Similarity.ivfPqTopK(emb, queries, k = 10,
      nCentroids = 6, nProbe = 3, m = 4, ksub = 8, refine = 4).collect()
    val recall = pq.map(r => (r.getLong(0), r.getLong(2)))
      .count(brute.contains).toDouble / brute.size
    assert(recall >= 0.7, s"IVF-PQ recall@10 $recall below 0.7")
    // scores exact: every returned cosine matches brute force's
    val bruteScores = Similarity.bruteForceTopK(emb, queries, k = 300)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    pq.foreach { r =>
      bruteScores.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(math.abs(c - r.getDouble(3)) < 1e-9, "re-rank cosine not exact")
      }
    }
    // planted family: the perturbed copy must recover its source at
    // rank 1 (the CORRECTNESS entry's exact shape)
    val planted = emb.filter(col("vec_id") < 5).select(
      (-col("vec_id") - 1L).as("vec_id"),
      transform(col("embedding"), (v, i) =>
        (v + when(pmod(i, lit(2)) === 0, 0.01f).otherwise(-0.01f))
          .cast("float")).as("embedding"))
    val top1 = Similarity.ivfPqTopK(emb, planted, k = 10,
      nCentroids = 6, nProbe = 3, m = 4, ksub = 8, refine = 4)
      .filter(col("rk") === 1).collect()
      .map(r => (-r.getLong(0) - 1L, r.getLong(2))).toMap
    (0L until 5L).foreach { q =>
      assert(top1.get(q).contains(q), s"planted query $q missed its source")
    }
  }

  test("IVF-PQ candidate stage moves codes, not vectors") {
    // the 100 TB claim: between probe join and re-rank, rows carry
    // (id, codes) — the embedding column must not appear in the
    // candidate window's input. Assert on the optimized plan: the
    // window over __adc sees no 'embedding / qvec / nvec' attribute.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 2)
    val df = Similarity.ivfPqTopK(emb, queries, k = 5,
      nCentroids = 4, nProbe = 2, m = 8, ksub = 16, refine = 2)
    val plan = df.queryExecution.optimizedPlan.toString()
    val candWindow = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("__adc"))
      .toSeq
    assert(candWindow.nonEmpty, "ADC candidate window not found in plan")
    assert(!candWindow.exists(l => l.contains("embedding") ||
      l.contains("qvec") || l.contains("nvec")),
      s"candidate window still carries vectors:\n${candWindow.mkString("\n")}")
  }

  test("pqRefresh: incremental code maintenance is bit-identical to a " +
      "full re-encode under frozen codebooks") {
    val rnd = new scala.util.Random(31)
    val dim = 16
    val mk = (n: Int, seed: Int) => {
      val r2 = new scala.util.Random(seed)
      (0 until n).map(i => (i.toLong, Seq.fill(dim)(r2.nextFloat() * 2f - 1f)))
    }
    val v1 = mk(80, 1).toDF("vec_id", "embedding")
    val cb = Similarity.pqTrainCodebooks(v1, m = 4, ksub = 8, iters = 1)
    val codes1 = v1.select(col("vec_id"),
      Similarity.pqEncodeCol(col("embedding"), cb).as("codes"))
    // delta: 20 updated (new vectors for ids 0..19), 10 deleted (70..79),
    // 15 inserted (100..114)
    val updated = mk(20, 2).toDF("vec_id", "embedding")
    val inserted = mk(15, 3).toDF("vec_id", "embedding")
      .withColumn("vec_id", col("vec_id") + 100L)
    val removed = ((0L until 20L) ++ (70L until 80L)).toDF("vec_id")
    val incr = Similarity.pqRefresh(codes1, cb,
      updated.unionByName(inserted), removed)
    val finalCorpus = mk(80, 1).filter(_._1 < 70).filter(_._1 >= 20)
      .toDF("vec_id", "embedding")
      .unionByName(updated).unionByName(inserted)
    val rebuilt = finalCorpus.select(col("vec_id"),
      Similarity.pqEncodeCol(col("embedding"), cb).as("codes"))
    val mis = incr.select(col("vec_id"), col("codes").as("a"))
      .join(rebuilt.select(col("vec_id"), col("codes").as("b")),
        Seq("vec_id"), "full_outer")
      .filter(!(col("a") === col("b")) || col("a").isNull || col("b").isNull)
      .count()
    assert(mis == 0, s"$mis rows diverged from the rebuild")
    assert(incr.count() == 85)
  }
}
