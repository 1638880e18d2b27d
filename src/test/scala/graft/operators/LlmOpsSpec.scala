package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextAnalysis

/** LLM-pipeline operator behavior on controlled fixtures: near-dup
  * recall, ANN quality vs the brute-force baseline, multimodal plumbing. */
class LlmOpsSpec extends SparkSpec {

  import spark.implicits._

  private val doc =
    "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"

  private def docs = Seq(
    (1L, doc),
    (2L, doc + " extra"), // near-dup of 1
    (3L, "completely different content about spark catalyst optimizer internals"),
    (4L, "the quick brown fox jumps over the lazy dog and runs far away into the woods today"), // near-dup of 1
    (5L, "Der schnelle braune Fuchs springt nicht mit und ist ein auf zu")
  ).toDF("doc_id", "text")

  test("repetition signals match hand-computed values") {
    import graft.functions.TextAnalysis._
    import org.apache.spark.sql.functions.col
    // "a a a b": 4 tokens, 2 distinct -> dup 0.5; top "a" 3/4;
    // bigrams [a a, a a, a b]: 3 total, 2 distinct -> dup 1/3
    val df = Seq((1L, "a a a b"), (2L, "x"), (3L, "p q r"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), tokens(col("text")).as("tk"))
    val r = df.select(col("doc_id"),
      dupTokenFrac(col("tk")).as("d"),
      topTokenFrac(col("tk")).as("t"),
      dupBigramFrac(col("tk")).as("b"))
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2), x.getDouble(3)))
      .toMap
    assert(r(1L) == ((0.5, 0.75, 0.333333)))
    assert(r(2L) == ((0.0, 1.0, 0.0))) // single token: no bigrams
    assert(r(3L) == ((0.0, 0.333333, 0.0))) // all distinct
  }

  test("exact dedup keeps lowest id per normalized text") {
    val withDup = docs.unionByName(
      Seq((10L, "  THE quick   brown fox jumps over the lazy dog and runs far away into the woods tonight "))
        .toDF("doc_id", "text"))
    val out = TextDedup.exactDedup(withDup, "doc_id", "text")
    assert(out.count() == 5)
    assert(!out.filter($"doc_id" === 10L).isEmpty == false)
  }

  test("minhash LSH finds the injected near-dup pairs, no false positives across topics") {
    val pairs = TextDedup.minhashNearDupPairs(docs, "doc_id", "text",
      threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash jaccard estimate matches exact jaccard on candidates") {
    val exact = TextDedup.ngramJaccardNearDup(docs, "doc_id", "text",
      threshold = 0.5, blockChars = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = TextDedup.minhashNearDupPairs(docs, "doc_id", "text",
      threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // both compute EXACT jaccard on their candidates; where both found a
    // pair the values must agree
    exact.keySet.intersect(lsh.keySet).foreach { k =>
      assert(math.abs(exact(k) - lsh(k)) < 1e-9)
    }
  }

  test("simhash: identical docs distance 0, near-dups close, different topics far") {
    val sh = docs.select($"doc_id", TextDedup.simhash($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(1L)) == 0)
    assert(ham(sh(1L), sh(4L)) < ham(sh(1L), sh(3L)))
  }

  test("language id picks the language with most stopword hits") {
    val out = docs.select($"doc_id", TextAnalysis.languageId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(5L) == "de")
  }

  test("ANN lsh returns exact-cosine values that appear in the brute-force ranking") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ann = Similarity.lshTopK(emb, queries, k = 10).collect()
    assert(ann.nonEmpty)
    // every ANN hit's cosine equals the exact cosine for that pair
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      brute.get(key).foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-9))
    }
    // recall@10 vs brute force top-10 is nonzero for at least one query
    val bruteTop = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = ann.map(r => (r.getLong(0), r.getLong(2))).count(bruteTop.contains)
    assert(hits > 0, "LSH ANN found none of the true top-10 neighbors")
  }

  test("recall@10 over planted duplicate families is exactly 1.0 (lsh and ivf)") {
    // the EXACT gate-entry computation — reused so the spec and the
    // oracle entry can never diverge on the planted construction
    val rows = graft.Queries.annRecall(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(rows.size == 10, s"expected 2 methods x 5 queries, got $rows")
    rows.foreach { case ((m, q), rec) =>
      assert(rec == 1.0d, s"$m recall@10 for query $q is $rec, not 1.0 — " +
        "the ANN structure lost a planted near-duplicate")
    }
  }

  test("multi-table LSH: OR-amplification strictly grows recall, pairs stay deduped and exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val bruteTop = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(nt: Int): (Double, Array[org.apache.spark.sql.Row]) = {
      val rows = Similarity.lshTopK(emb, queries, k = 10,
        probeRadius = 2, numTables = nt).collect()
      val hits = rows.map(r => (r.getLong(0), r.getLong(2)))
        .count(bruteTop.contains)
      (hits.toDouble / bruteTop.size, rows)
    }
    val (r1, _) = recall(1)
    val (r8, rows8) = recall(8)
    assert(r8 >= r1, s"8 tables recalled $r8 < single table's $r1")
    assert(r8 >= 0.9, s"8-table recall@10 is $r8, below the 0.9 target")
    // candidates deduped across tables: ranks are unique per query
    rows8.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val rks = rs.map(_.getInt(1)).toSeq
      assert(rks.distinct == rks, s"query $q has duplicate ranks: $rks")
    }
    // the gate entry's thresholds hold where the gate runs them
    val gate = graft.Queries.annRecallReal(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(gate == Map("ivf" -> true, "lsh" -> true), s"got $gate")
  }

  test("planted near-queries: LSH(radius 2) and IVF top-1 recover the source vector") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // the EXACT construction the gate entries use — reused, not copied,
    // so a change to the planted shape cannot silently diverge from
    // what this spec covers
    val planted = graft.Queries.plantedAnnQueries(emb, 5)
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
      graft.Queries.annPlantedTop1(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
    for (ann <- Seq(
        Similarity.lshTopK(emb, planted, k = 10, probeRadius = 2),
        Similarity.ivfTopK(emb, planted, k = 10, nCentroids = 16, nProbe = 6))) {
      val got = top1(ann)
      (0L until 5L).foreach { id =>
        val (nid, cos) = got(id)
        assert(nid == id, s"query $id: top-1 is $nid, not the planted source")
        assert(cos > 0.99, s"query $id: top-1 cosine $cos below planted bound")
      }
    }
  }

  test("embedding near-dup recovers injected perturbed pairs with high recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // same injection as Queries.embeddingNearDup: every 10th vector copied
    // (id + 1e6) with an alternating ±0.01 perturbation → cosine ≈ 0.997
    val mutated = emb.filter($"vec_id" % 10 === 0).select(
      ($"vec_id" + 1000000L).as("vec_id"),
      transform($"embedding", (v, i) =>
        (v.cast("double") + when(pmod(i, lit(2)) === 0, lit(0.01))
          .otherwise(lit(-0.01))).cast("float")).as("embedding"),
      $"label")
    val injected = emb.filter($"vec_id" % 10 === 0).select($"vec_id")
      .collect().map(_.getLong(0)).map(id => (id, id + 1000000L)).toSet
    assert(injected.nonEmpty)
    val found = Similarity.embeddingNearDupPairs(
      emb.unionByName(mutated), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // LSH candidates are a subset of true pairs; cosine re-check is exact,
    // so zero false positives below threshold and all found pairs injected
    val foundSet = found.toSet
    assert(found.length == foundSet.size, "duplicate pairs emitted")
    val recall = injected.count(foundSet.contains).toDouble / injected.size
    assert(recall >= 0.6,
      s"recall $recall too low (${foundSet.size} pairs found of ${injected.size} injected)")
  }

  test("zero-norm vectors are null-cosine and never rank in top-k") {
    val vecs = (1L to 5L).map(i =>
      (i, Array.fill(4)(i.toFloat))) :+ (99L, Array.fill(4)(0.0f))
    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val out = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 1L), k = 10)
      .collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getLong(2) == 99L),
      "zero vector ranked as a neighbor (NaN ordering bug)")
  }

  test("multimodal: metadata-only query prunes the binary column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text", "text")
    media.write.mode("overwrite").parquet(dir)
    val metaOnly = spark.read.parquet(dir).select("media_id", "kind", "meta.n_bytes")
    val scan = metaOnly.queryExecution.executedPlan.toString
    assert(!scan.contains("bytes#") || scan.contains("ReadSchema: struct<media_id"),
      s"binary column not pruned:\n$scan")
    assert(metaOnly.count() == 5)
  }

  test("multimodal: frame sampling chunks the byte stream") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text", "text")
    val frames = media.select($"media_id",
      Multimodal.stubSampleFrames($"bytes", chunk = 10, stride = 2).as("frames"))
      .withColumn("n", size($"frames")).collect()
    frames.foreach { r => assert(r.getAs[Int]("n") > 0) }
  }

  test("multimodal: empty payload yields zero frames, not phantom ones") {
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    val media = Multimodal.syntheticMedia(empty, "doc_id", "text", "text")
    val n = media.select(
      size(Multimodal.stubSampleFrames($"bytes", chunk = 10, stride = 1)))
      .head().getInt(0)
    assert(n == 0, s"phantom frames on empty bytes: $n")
  }

  test("multimodal: per-partition feature extraction yields fixed-width vectors") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text", "text")
    val out = Multimodal.extractFeatures(spark, media).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getSeq[Float](r.fieldIndex("features")).length == 8)
    }
    // deterministic: same input, same features
    val again = Multimodal.extractFeatures(spark, media).collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }
}
