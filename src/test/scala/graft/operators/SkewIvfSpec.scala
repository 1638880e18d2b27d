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

  test("salted sum equals plain sum") {
    val df = spark.range(0, 500)
      .select((col("id") % 3).as("k"), (col("id") * 2).cast("double").as("v"))
    val plain = df.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, Seq("k"), "v", numSalts = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
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
}
