package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane-LSH bucketed variant as the scale path.
  *
  * Scale notes (100 TB): brute force broadcasts the (small) query set
  * and scans the corpus once — a narrow map + per-query top-k, no
  * shuffle of the big side; cost O(|corpus|·|queries|·dim), exact. The
  * LSH variant hashes both sides into sign-pattern buckets so each query
  * only scores its bucket (multi-probe over single-bit flips recovers
  * recall); corpus re-bucketing is a one-off map, and the join shuffles
  * only the bucketed candidates. Dot products are `zip_with` +
  * `aggregate` in double precision — codegen'd, no UDF.
  */
object Similarity {

  /** Cosine similarity between two float-array columns — the native
    * codegen expression (one fused loop inside whole-stage codegen;
    * see [[graft.functions.expressions.CosineSimilarity]]). */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftext.GraftBridge
    GraftBridge.column(graft.functions.expressions.CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Composable higher-order-function form of [[cosine]] — interpreted
    * (≈3 passes + per-element closures); kept as the readable reference
    * implementation and the cross-check for the codegen expression.
    * Double accumulation, left-to-right — bit-identical to [[cosine]]. */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    // null (not NaN) on a zero-norm side, matching the codegen expression:
    // NaN would sort above every real cosine in a top-k window
    when(dot(a, a) === 0.0 || dot(b, b) === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))))
  }

  /** Exact top-k neighbors for each query vector, by brute-force cosine.
    * `queries` must be small (it is broadcast). Ties broken by id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .crossJoin(q) // broadcast-nested-loop: corpus scanned once, never shuffled
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qvec"), col("nvec")))
      .filter(col("cosine").isNotNull) // zero-norm corpus vectors are not neighbors
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim d): murmur3 of the pair, mapped to (-0.5, 0.5). In-plan
    * arithmetic — every executor computes the same planes, nothing is
    * shipped. */
  private def planeComponent(p: Column, d: Column): Column =
    (pmod(hash(p, d), lit(10007)).cast("double") / lit(10007.0)) - lit(0.5)

  /** Sign-pattern LSH bucket id of a vector: bit p = sign of dot(vec,
    * plane_p), packed into an int. */
  def lshBucket(vec: Column, numPlanes: Int): Column =
    lshBucketFrom(vec, numPlanes, 0)

  /** Sign-random-projection bucket over planes
    * [offset, offset + numPlanes): each BAND of an OR-amplified index
    * uses its own plane range, so bands are independent. */
  def lshBucketFrom(vec: Column, numPlanes: Int, offset: Int): Column =
    lshBucketFrom(vec, numPlanes, lit(offset))

  /** Column-offset form: multi-TABLE indexes derive each row's plane
    * range from its table index in-plan. */
  def lshBucketFrom(vec: Column, numPlanes: Int, offset: Column): Column = {
    val bits = (0 until numPlanes).map { p =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, d) => v.cast("double") * planeComponent(offset + lit(p), d)),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** ALL band/table buckets of a vector in ONE fused codegen pass —
    * band k over planes [k·numPlanes, (k+1)·numPlanes), bit-identical
    * to per-band [[lshBucketFrom]] (SignLshBandsSpec pins the parity on
    * real embeddings). The interpreted HOF form costs bands × planes
    * array traversals of per-element closures per row; the fused
    * expression is one tight loop over a cached plane table. */
  private[graft] def signBands(vec: Column, numPlanes: Int,
                               bands: Int): Column = {
    import org.apache.spark.sql.graftext.GraftBridge
    GraftBridge.column(graft.functions.expressions.SignLshBands(
      GraftBridge.expression(vec), numPlanes, bands))
  }

  /** ANN top-k: score only corpus vectors whose LSH bucket is within
    * `probeRadius` bit-flips of the query's bucket (multi-probe), then
    * exact cosine re-rank within candidates. Recall is probabilistic
    * and grows with probeRadius — radius 1 probes 1+P buckets, radius
    * 2 probes 1+P+C(P,2); the probe list is a plan-time constant per
    * query, so the candidate step stays one bucket equi-join however
    * wide the probing. Precision is exact (true cosine on every
    * returned pair). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numPlanes: Int = 8,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              probeRadius: Int = 1,
              /** OR-amplification (classic multi-table LSH): `L`
                * independent hash tables, each over its own plane
                * range; a corpus vector is a candidate if ANY table
                * buckets it with the query. Recall composes as
                * 1−(1−r)^L — the lever that reaches a recall target on
                * weakly-clustered data, where one table's multi-probe
                * saturates (probing more buckets of a single table
                * approaches scanning it). Index cost is the textbook
                * one: L postings per corpus vector; candidates dedup
                * before the exact re-rank so no pair scores twice. */
              numTables: Int = 1): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 2,
      s"probeRadius must be 0, 1 or 2, got $probeRadius")
    require(numTables >= 1 && numTables <= 32,
      s"numTables must be in [1, 32], got $numTables")
    // one fused codegen pass computes every table's bucket (r18: the
    // per-(row, table) interpreted lshBucketFrom HOFs were this
    // operator's dominant cost — same fusion embeddingNearDupPairs
    // already runs; bit-identical by SignLshBandsSpec)
    val cb = corpus.select(
        col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
        posexplode(signBands(col(vecCol), numPlanes, numTables))
          .as(Seq("__t", "bucket")))
    // multi-probe: the query claims its own bucket plus every bucket
    // within probeRadius bit-flips — per table
    val flips: Seq[Int] = Seq(0) ++ // the home bucket (xor 0)
      (if (probeRadius >= 1) (0 until numPlanes).map(1 << _) else Nil) ++
      (if (probeRadius >= 2)
        (for { a <- 0 until numPlanes; b <- a + 1 until numPlanes }
          yield (1 << a) | (1 << b))
      else Nil)
    val qb = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
        // home buckets for ALL tables in one fused pass (see cb); the
        // probe set is pure xor on top (inlining it into every flip
        // blew the plan up ~40×: each flip re-derived all dots)
        .select(col("query_id"), col("qvec"),
          posexplode(signBands(col("qvec"), numPlanes, numTables))
            .as(Seq("__t", "__home")))
        .withColumn("bucket", explode(array(flips.map(m =>
          col("__home").bitwiseXOR(lit(m))): _*)))
        .drop("__home"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val candidates = cb.join(qb, Seq("__t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
    // across TABLES the same pair surfaces up to L times: dedup before
    // the exact re-rank so each candidate costs one cosine and
    // row_number never sees duplicates. A single table never produces
    // one (each corpus vector owns ONE bucket per table), so the
    // single-table plan keeps its shuffle-free candidate step.
    val deduped =
      if (numTables == 1) candidates
      else candidates
        .groupBy("query_id", "neighbor_id")
        .agg(first("qvec").as("qvec"), first("nvec").as("nvec"))
    deduped
      .withColumn("cosine", cosine(col("qvec"), col("nvec")))
      .filter(col("cosine").isNotNull)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Seed centroids: a deterministic pseudo-random corpus sample
    * (smallest murmur3(id), id tiebreak). */
  private def seedCentroids(corpus: DataFrame, nCentroids: Int,
                            idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("centroid_id"), col(vecCol).as("cvec"))
      .orderBy(pmod(hash(col("centroid_id")), lit(1000000007)), col("centroid_id"))
      .limit(nCentroids)

  /** Nearest-centroid assignment: |df| × nCentroids codegen cosines —
    * a narrow map against the broadcast centroid set, then an argmax
    * per row via `max_by` so the k-fold row blowup collapses in the
    * MAP-SIDE partial aggregate (a row_number window here would
    * instead shuffle and sort all |df| × k exploded rows). Ties break
    * toward the smallest centroid id; a null cosine (zero-norm vector)
    * ranks below every real one, so every row keeps an assignment. */
  private def assignToCentroids(df: DataFrame, centroids: DataFrame,
                                idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(centroids.select(col("centroid_id"), col("cvec"))))
      .withColumn("__sim", cosine(col(vecCol), col("cvec")))
      .groupBy(idCol)
      // min_by over (−sim, id): highest similarity first, ties to the
      // SMALLEST centroid id — without negating the id column, which
      // fails analysis for non-numeric id types under ANSI (the API
      // advertises a generic idCol)
      .agg(min_by(
        struct(col(vecCol), col("centroid_id")),
        struct(-coalesce(col("__sim"), lit(-2.0)),
          col("centroid_id"))).as("__best"))
      .select(col(idCol), col(s"__best.$vecCol").as(vecCol),
        col("__best.centroid_id").as("centroid_id"))

  /** Sample-bound a training corpus: one count() pass, then a seeded
    * ~1.1x-oversampled Bernoulli sample when the corpus exceeds the
    * budget (shared by centroid and PQ-codebook training so the
    * bounding policy cannot drift between them). */
  private def sampleBounded(corpus: DataFrame,
                            maxTrainVectors: Long): DataFrame = {
    val corpusSize = corpus.count()
    if (corpusSize <= maxTrainVectors) corpus
    else corpus.sample(
      math.min(1.0, maxTrainVectors.toDouble * 1.1 / corpusSize), 42L)
  }

  /** Lloyd-trained IVF centroids: seed with the stable pseudo-random
    * sample, then `iters` assign/update rounds — assignment is the
    * broadcast crossJoin + argmax above; the update is the per-cluster
    * dimension-wise mean via posexplode + two grouped aggregates. On
    * clustered real embeddings a raw sample gives unbalanced inverted
    * lists (most samples land in the dense region), which skews probe
    * fan-out and craters recall for queries near small clusters;
    * training spreads the centroids. Cosine assignment is spherical
    * k-means; the unnormalized mean is fine because cosine is
    * scale-invariant. Empty clusters keep their previous centroid.
    *
    * Per round, the centroid set — O(nCentroids × dim), never
    * O(corpus) — is collected to the driver and re-broadcast, exactly
    * the iteration state MLlib's KMeans keeps; this severs the plan
    * lineage so round N's assignment stays one crossJoin deep. */
  def trainCentroids(corpus: DataFrame, nCentroids: Int, iters: Int = 2,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     /** Lloyd TRAINING set bound. Each iteration scores
                       * train×centroids cosines — on a 100 TB corpus
                       * that must run on a bounded sample (k-means
                       * converges on ~10³ vectors/centroid); only the
                       * one final assignment is O(corpus). Sizing the
                       * sample costs one count() pass up front — the
                       * price of replacing iters full-corpus training
                       * passes with sampled ones. */
                     maxTrainVectors: Long = 100000L): DataFrame = {
    var cents = seedCentroids(corpus, nCentroids, idCol, vecCol)
    if (iters <= 0) return cents
    val spark = corpus.sparkSession
    val train = sampleBounded(corpus, maxTrainVectors)
    if (iters > 1 && (train ne corpus)) train.persist()
    for (_ <- 1 to iters) {
      val assigned = assignToCentroids(train, cents, idCol, vecCol)
      val means = assigned
        .select(col("centroid_id"),
          posexplode(col(vecCol)).as(Seq("__pos", "__x")))
        .groupBy("centroid_id", "__pos")
        .agg(avg("__x").as("__m"))
        .groupBy("centroid_id")
        .agg(sort_array(collect_list(struct(col("__pos"), col("__m"))))
          .as("__pm"))
        .select(col("centroid_id"),
          transform(col("__pm"), e => e.getField("__m").cast("float"))
            .as("cvec"))
      val kept = cents.join(means, Seq("centroid_id"), "left_anti")
      val next = means.unionByName(kept)
      val rows = next.collect() // O(nCentroids·dim) — bounded driver state
      cents = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), next.schema)
    }
    if (iters > 1 && (train ne corpus)) train.unpersist()
    cents
  }

  /** IVF (inverted-file) index: every vector assigned to its nearest of
    * `nCentroids` Lloyd-trained centroids ([[trainCentroids]];
    * `trainIters = 0` keeps the raw sampled seed). */
  def ivfIndex(corpus: DataFrame, nCentroids: Int,
               idCol: String = "vec_id",
               vecCol: String = "embedding",
               trainIters: Int = 2,
               maxTrainVectors: Long = 100000L): DataFrame =
    assignToCentroids(corpus,
      trainCentroids(corpus, nCentroids, trainIters, idCol, vecCol,
        maxTrainVectors),
      idCol, vecCol)

  /** The assignment pass alone, under a caller-supplied (frozen)
    * centroid set — the building block [[ivfRefresh]] keeps bit-parity
    * with, and what a periodic full rebuild runs after a retrain. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame =
    assignToCentroids(corpus, centroids, idCol, vecCol)

  /** CDC-incremental IVF maintenance under a FROZEN centroid set:
    * only the CHANGED vectors are (re)assigned — a broadcast argmax
    * over the delta, O(delta · centroids · dim) work — while ids in
    * `removedIds` (deletes AND the before-images of updates) leave
    * their old inverted lists and every untouched assignment carries
    * over verbatim. Per-vector assignment is a pure function of
    * (vector, centroids), so the maintained index is BIT-IDENTICAL to
    * [[ivfIndex]]'s assignment pass over the full current corpus with
    * the same centroids (spec- and oracle-pinned, not approximately).
    * Centroids stay fixed between retrains — Faiss's operational
    * model: assignment absorbs deltas continuously, training is a
    * periodic offline rebuild when drift erodes recall. At corpus
    * scale this is the difference between O(delta) per refresh and an
    * O(corpus) rebuild per batch. */
  def ivfRefresh(index: DataFrame, centroids: DataFrame,
                 upserted: DataFrame, removedIds: DataFrame,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val gone = removedIds
      .select(col(removedIds.columns.head).as("__gone")).distinct()
    index.join(gone, col(idCol) <=> col("__gone"), "left_anti")
      .unionByName(assignToCentroids(upserted, centroids, idCol, vecCol))
  }

  /** The index's FIT under its centroid set: mean cosine between each
    * vector and its ASSIGNED centroid — the cheap drift signal that
    * decides when [[ivfRefresh]]'s frozen centroids have stopped
    * describing the corpus. One broadcast join + one pass over the
    * index (no re-assignment, no training): O(corpus · dim), the same
    * cost as a single scan — cheap enough to evaluate after every
    * maintenance batch. Distribution shift moves vectors away from
    * the centroids they trained on, so the mean assigned cosine falls
    * monotonically with drift; recall erosion follows the same curve
    * (queries probe lists whose contents no longer cluster). NaN-safe:
    * an empty index reports fit 0. */
  def ivfFit(index: DataFrame, centroids: DataFrame,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): Double = {
    val row = index
      .join(broadcast(centroids.select(col("centroid_id"), col("cvec"))),
        Seq("centroid_id"))
      .agg(avg(cosine(col(vecCol), col("cvec"))).as("fit"))
      .head()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** RECALL-GATED RETRAIN TRIGGER — the piece that closes Faiss's
    * operational loop around [[ivfRefresh]]: assignment absorbs deltas
    * continuously under frozen centroids, and a MONITORED decision —
    * not a human guessing — schedules the periodic offline retrain.
    * The monitor is [[ivfFit]] against the fit recorded when the
    * centroids were last trained: when the mean assigned cosine has
    * fallen more than `maxFitDrop` below `baselineFit`, the corpus has
    * drifted enough that probe recall is eroding, and the trigger
    * retrains (Lloyd, sample-bounded) and fully re-assigns; otherwise
    * the index and centroids pass through UNTOUCHED — zero training
    * I/O on the no-drift path, which is the common case.
    *
    * Returns (index, centroids, retrained, fit): the caller persists
    * the new fit as the next baseline whenever `retrained` is true.
    * At 100 TB the signal pass is one scan and the retrain stays
    * sample-bounded ([[trainCentroids]]'s `maxTrainVectors`) with one
    * O(corpus) final assignment — the same shape as the initial
    * build, paid only when drift demands it. */
  def ivfMaybeRetrain(index: DataFrame, centroids: DataFrame,
                      baselineFit: Double,
                      maxFitDrop: Double = 0.05,
                      nCentroids: Int = 16,
                      trainIters: Int = 2,
                      maxTrainVectors: Long = 100000L,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding")
      : (DataFrame, DataFrame, Boolean, Double) = {
    require(maxFitDrop > 0, s"maxFitDrop must be positive, got $maxFitDrop")
    val fit = ivfFit(index, centroids, idCol, vecCol)
    if (fit >= baselineFit - maxFitDrop) (index, centroids, false, fit)
    else {
      val corpus = index.select(col(idCol), col(vecCol))
      val cents = trainCentroids(corpus, nCentroids, trainIters,
        idCol, vecCol, maxTrainVectors)
      val rebuilt = assignToCentroids(corpus, cents, idCol, vecCol)
      (rebuilt, cents, true, ivfFit(rebuilt, cents, idCol, vecCol))
    }
  }

  /** IVF ANN top-k: queries probe their `nProbe` nearest centroids and
    * score only vectors in those inverted lists, exact cosine re-rank.
    * Recall grows with nProbe (and with centroid training quality);
    * precision is exact. Index and probes share ONE trained centroid
    * set. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              trainIters: Int = 2,
              maxTrainVectors: Long = 100000L): DataFrame =
    ivfTopKWith(
      trainCentroids(corpus, nCentroids, trainIters, idCol, vecCol,
        maxTrainVectors),
      corpus, queries, k, nProbe, idCol, vecCol)

  /** [[ivfTopK]] under a CALLER-TRAINED centroid set — the probe stage
    * alone, so a recall harness (or a production pipeline reusing one
    * trained index across query batches) can time/train separately. */
  def ivfTopKWith(cents: DataFrame,
                  corpus: DataFrame, queries: DataFrame, k: Int,
                  nProbe: Int = 4,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val indexed = assignToCentroids(corpus, cents, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
        col("centroid_id"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("__sim").desc, col("centroid_id"))
    val probes = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
        .crossJoin(broadcast(cents))
        .withColumn("__sim", cosine(col("qvec"), col("cvec")))
        .withColumn("__rk", row_number().over(probeW))
        .filter(col("__rk") <= nProbe)
        .select(col("query_id"), col("qvec"), col("centroid_id")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    indexed.join(probes, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qvec"), col("nvec")))
      .filter(col("cosine").isNotNull)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  // ---------------------------------------------------------------
  // product quantization (IVF-PQ): compressed-code ANN at scale
  // ---------------------------------------------------------------

  /** Train `m` per-subspace PQ codebooks of `ksub` centroids each
    * (classic product quantization: the vector splits into m
    * contiguous sub-vectors, each quantized independently by L2
    * k-means). ALL m codebooks train in the SAME distributed Lloyd
    * pass — sub-vector slicing is a narrow explode, assignment is one
    * broadcast join + argmin, the mean update is one grouped
    * aggregate keyed by (subspace, code) — so training cost does not
    * grow with m. Like [[trainCentroids]], training is SAMPLE-BOUNDED
    * (`maxTrainVectors`) and per-round state collected to the driver
    * is O(m·ksub·dsub) floats — for the canonical 8×16 over 64 dims,
    * one kilobyte. Returns the codebooks driver-side: they are plan
    * literals for the shuffle-free encode ([[pqEncodeCol]]), not a
    * dataset.
    *
    * Scale notes (100 TB): PQ is what makes a billion-vector index
    * RESIDENT — m codes of log2(ksub) bits replace dim floats (8×16
    * over 64-dim float: 4 bytes/vector vs 256, a 64× reduction), so
    * candidate scoring never touches the raw vectors and the whole
    * index fits where the corpus cannot. */
  def pqTrainCodebooks(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
                       iters: Int = 3,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       maxTrainVectors: Long = 100000L)
      : Array[Array[Array[Float]]] = {
    require(m >= 1 && ksub >= 2 && iters >= 0)
    val spark = corpus.sparkSession
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val train = sampleBounded(corpus, maxTrainVectors)
    // (id, sub, svec): one narrow explode — every subspace trains from
    // the same pass over the sample
    val slices = train.select(col(idCol).as("__id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col(vecCol), s * dsub + 1, lit(dsub))))
        .as(Seq("sub", "svec")))
    if (iters > 0) slices.persist()
    val seedW = Window.partitionBy("sub")
      .orderBy(pmod(hash(col("__id")), lit(1000000007)), col("__id"))
    var cb = slices
      .withColumn("__rn", row_number().over(seedW))
      .filter(col("__rn") <= ksub)
      .select(col("sub"), (col("__rn") - 1).as("code"),
        col("svec").as("cvec"))
    var cbRows = cb.collect()
    // fused codegen L2² kernel (r18, guide §4); parity with the
    // former aggregate(zip_with(...)) form pinned by PqCodecSpec
    def l2sq(a: Column, b: Column): Column = {
      import org.apache.spark.sql.graftext.GraftBridge
      GraftBridge.column(graft.functions.expressions.L2SquaredDistance(
        GraftBridge.expression(a), GraftBridge.expression(b)))
    }
    for (_ <- 1 to iters) {
      val cents = broadcast(spark.createDataFrame(
        java.util.Arrays.asList(cbRows: _*), cb.schema))
      val assigned = slices.join(cents, Seq("sub"))
        .withColumn("__d", l2sq(col("svec"), col("cvec")))
        .groupBy("__id", "sub")
        .agg(min_by(struct(col("svec"), col("code")),
          struct(col("__d"), col("code"))).as("__best"))
        .select(col("sub"), col("__best.code").as("code"),
          col("__best.svec").as("svec"))
      val means = assigned
        .select(col("sub"), col("code"),
          posexplode(col("svec")).as(Seq("__pos", "__x")))
        .groupBy("sub", "code", "__pos")
        .agg(avg("__x").as("__mu"))
        .groupBy("sub", "code")
        .agg(sort_array(collect_list(struct(col("__pos"), col("__mu"))))
          .as("__pm"))
        .select(col("sub"), col("code"),
          transform(col("__pm"), e => e.getField("__mu").cast("float"))
            .as("cvec"))
      // ONE collect per iteration (a second .collect for the live-key
      // set would re-run the whole assignment+mean pipeline); empty
      // codes keep their previous centroid
      val meanRows = means.collect()
      val liveKeys = meanRows.map(r => (r.getInt(0), r.getInt(1))).toSet
      cbRows = meanRows ++
        cbRows.filter(r => !liveKeys((r.getInt(0), r.getInt(1))))
    }
    if (iters > 0) slices.unpersist()
    val out = Array.ofDim[Array[Float]](m, ksub)
    cbRows.foreach { r =>
      out(r.getInt(0))(r.getInt(1)) =
        r.getSeq[Float](2).toArray
    }
    // a seed short of ksub distinct rows (tiny corpora) pads with the
    // first centroid so element_at never lands on a hole
    for (s <- 0 until m; c <- 0 until ksub)
      if (out(s)(c) == null) out(s)(c) = out(s)(0)
    out.map(_.toArray)
  }

  private def cbLit(codebooks: Array[Array[Array[Float]]]): Column =
    typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)

  /** SHUFFLE-FREE PQ encode: `vec` → its m nearest-sub-centroid codes
    * (array<int>, one entry per subspace). The codebooks ride the plan
    * as a LITERAL — nothing is joined, nothing is shipped per row —
    * so encoding a 100 TB corpus is a pure narrow map over the scan.
    * Ties break toward the smallest code; assignment is a pure
    * function of (vector, codebooks), so re-encoding is deterministic
    * (the same property [[ivfRefresh]] leans on for incremental
    * maintenance of the coarse index). */
  def pqEncodeCol(vec: Column,
                  codebooks: Array[Array[Array[Float]]]): Column = {
    // r18: one fused codegen loop over a flattened codebook constant
    // (guide §4) — the composable argmin below re-ran a per-element
    // lambda chain per (subspace × code × dim); bit-parity pinned by
    // PqCodecSpec, which exercises pqEncodeColRef against this
    import org.apache.spark.sql.graftext.GraftBridge
    GraftBridge.column(graft.functions.expressions.PqEncode(
      GraftBridge.expression(vec), codebooks))
  }

  /** The composable reference form of [[pqEncodeCol]] — kept for the
    * parity spec (and as the readable definition of the encode
    * semantics the fused expression must match). */
  private[graft] def pqEncodeColRef(vec: Column,
                  codebooks: Array[Array[Array[Float]]]): Column = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    val cb = cbLit(codebooks)
    transform(sequence(lit(0), lit(m - 1)), s => {
      val sub = slice(vec, s * dsub + 1, lit(dsub))
      aggregate(sequence(lit(0), lit(ksub - 1)),
        struct(lit(Double.MaxValue).as("d"), lit(-1).as("c")),
        (acc, c) => {
          val cent = element_at(element_at(cb, s + 1), c + 1)
          val d = aggregate(zip_with(sub, cent, (x, y) => {
            val dd = x.cast("double") - y.cast("double"); dd * dd
          }), lit(0.0), (a, v) => a + v)
          when(d < acc.getField("d"),
            struct(d.as("d"), c.as("c"))).otherwise(acc)
        },
        acc => acc.getField("c"))
    })
  }

  /** CDC-incremental PQ code maintenance under FROZEN codebooks —
    * [[ivfRefresh]]'s exact shape one level down: only CHANGED vectors
    * re-encode (a shuffle-free narrow map over the delta, the
    * codebooks are plan literals), removed ids leave, untouched codes
    * carry verbatim. Encoding is a pure function of (vector,
    * codebooks), so the maintained code table is BIT-IDENTICAL to a
    * full re-encode of the current corpus — O(delta) per refresh
    * where the rebuild is O(corpus). Codebooks freeze between
    * retrains like the coarse centroids (Faiss's operational model);
    * [[ivfMaybeRetrain]]'s drift trigger governs both. */
  def pqRefresh(codes: DataFrame, cb: Array[Array[Array[Float]]],
                upserted: DataFrame, removedIds: DataFrame,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val gone = removedIds
      .select(col(removedIds.columns.head).as("__gone")).distinct()
    codes.join(gone, col(idCol) <=> col("__gone"), "left_anti")
      .unionByName(upserted.select(col(idCol),
        pqEncodeCol(col(vecCol), cb).as("codes")))
  }

  /** Mean PQ QUANTIZATION ERROR of a code table against its codebooks:
    * avg over vectors of Σ_s ‖vec_s − cb[s][code_s]‖² — the ADC drift
    * signal, [[ivfFit]]'s mirror one level down. ADC scores are dot
    * products against exactly the reconstructions this error measures,
    * so ranking quality degrades on the same curve the error rises on
    * (distribution shift moves vectors away from the centroids their
    * codes point at). One equi-join of ids to codes (AQE broadcasts
    * the code table when it is the small side) and one narrow pass
    * with the codebooks as plan literals — O(corpus·dim), cheap
    * enough to evaluate after every maintenance batch. Empty input
    * reports 0.
    *
    * Coverage is REQUIRED: a corpus vector with no code row throws
    * instead of silently dropping out of the mean — a stale or
    * incomplete code table is exactly the failure regime a drift
    * monitor exists to surface, and an inner join would understate
    * the error and suppress the retrain it should trigger. */
  /** The monitor's one-row aggregate PLAN — exposed (not just the
    * scalar) so a spec can assert the physical shape and a scale
    * harness can time exactly this scan. Columns: `e` (mean error
    * over coded vectors), `uncoded`, `n`.
    *
    * Shape: ONE codes equi-join, a narrow per-subspace explode, a
    * BROADCAST join against the m·ksub-row centroid table, one global
    * aggregate — nothing shuffles beyond the codes join. The
    * codebooks deliberately do NOT embed as a plan literal here: the
    * monitor re-plans every maintenance batch, and the nested
    * `cbLit` tree costs seconds of analyzer+codegen per evaluation
    * (constant, but paid each batch — it dominated the 500-vector
    * gate entry); as a 128-row broadcast the plan is tiny and the
    * cost is the O(corpus·dim) scan it should be. */
  def pqQuantErrPlan(corpus: DataFrame, codes: DataFrame,
                     cb: Array[Array[Array[Float]]],
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = broadcast(cb.zipWithIndex.flatMap { case (subCb, s) =>
      subCb.zipWithIndex.map { case (cv, c) => (s, c, cv.toSeq) }
    }.toSeq.toDF("__sub", "__code", "__cvec"))
    // left join, then per-subspace rows: an uncoded vector keeps ONE
    // row (null pos) so coverage gaps surface as a count instead of
    // silently leaving the mean
    val pairs = corpus.select(col(idCol), col(vecCol))
      .join(codes, Seq(idCol), "left")
      .select(col(idCol), posexplode_outer(
        when(col("codes").isNotNull,
          transform(sequence(lit(0), lit(m - 1)), s => struct(
            slice(col(vecCol), s * dsub + 1, lit(dsub)).as("svec"),
            element_at(col("codes"), s + 1).as("code"))))))
      .select(col(idCol), col("pos"),
        col("col.svec").as("__svec"), col("col.code").as("__code"),
        col("pos").as("__sub"))
    // fused codegen L2² kernel (r18); a null __cvec (unmatched code —
    // cannot happen for codes the encode produced) null-propagates
    // exactly as the composable aggregate(zip_with(...)) did
    val err = {
      import org.apache.spark.sql.graftext.GraftBridge
      GraftBridge.column(graft.functions.expressions.L2SquaredDistance(
        GraftBridge.expression(col("__svec")),
        GraftBridge.expression(col("__cvec"))))
    }
    pairs.join(cents, Seq("__sub", "__code"), "left")
      .agg(
        (sum(err) / nullif(count(when(col("pos") === 0, lit(1))), lit(0)))
          .as("e"),
        count(when(col("pos").isNull, lit(1))).as("uncoded"),
        count(when(col("pos") === 0 || col("pos").isNull, lit(1)))
          .as("n"))
  }

  def pqQuantErr(corpus: DataFrame, codes: DataFrame,
                 cb: Array[Array[Array[Float]]],
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): Double = {
    val row = pqQuantErrPlan(corpus, codes, cb, idCol, vecCol).head()
    require(row.getLong(1) == 0L,
      s"pqQuantErr: ${row.getLong(1)} of ${row.getLong(2)} corpus " +
        "vectors have no PQ code — refresh the code table before " +
        "monitoring, or the mean understates the drift")
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** ERROR-GATED PQ RETRAIN TRIGGER — closes the same operational loop
    * [[ivfMaybeRetrain]] closes for the coarse stage, for the codebook
    * stage the r14 verdict flagged as frozen-forever: [[pqRefresh]]
    * absorbs deltas continuously under frozen codebooks, and the
    * monitored mean quantization error ([[pqQuantErr]]) — compared
    * against the error recorded when the codebooks were trained —
    * decides the periodic offline retrain. When the error has grown
    * more than `maxErrGrowth` above `baselineErr`, the codebooks
    * retrain (one sample-bounded distributed Lloyd pass over all m
    * subspaces) and the corpus re-encodes (shuffle-free narrow map);
    * otherwise codes and codebooks pass through UNTOUCHED — the
    * frozen-regime path keeps [[pqRefresh]]'s bit-identity contract
    * and costs one scan, no training I/O.
    *
    * Returns (codes, codebooks, retrained, err). `err` is always
    * measured against the RETURNED (codes, codebooks) pair: when
    * `retrained` it is the POST-retrain error — the caller persists
    * it verbatim as the next baseline (one extra scan, paid only on
    * the retrain branch; returning the pre-retrain drifted error here
    * would hand the caller a ~400× baseline that permanently deadens
    * the monitor). When not retrained it is the monitored error under
    * the frozen codebooks — keep the ORIGINAL baseline in that case
    * (persisting a within-gate reading would ratchet the gate upward
    * batch over batch). A relative gate (×(1+growth)), not the
    * coarse trigger's absolute fit drop: quantization error scales
    * with vector norms and subspace count, so only its RATIO to the
    * training-time error is distribution-free. */
  def pqMaybeRetrain(corpus: DataFrame, codes: DataFrame,
                     cb: Array[Array[Array[Float]]],
                     baselineErr: Double,
                     maxErrGrowth: Double = 0.25,
                     iters: Int = 2,
                     maxTrainVectors: Long = 100000L,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding")
      : (DataFrame, Array[Array[Array[Float]]], Boolean, Double) = {
    require(maxErrGrowth > 0,
      s"maxErrGrowth must be positive, got $maxErrGrowth")
    val err = pqQuantErr(corpus, codes, cb, idCol, vecCol)
    if (err <= baselineErr * (1.0 + maxErrGrowth)) (codes, cb, false, err)
    else {
      val cb2 = pqTrainCodebooks(corpus, cb.length, cb(0).length, iters,
        idCol, vecCol, maxTrainVectors)
      val codes2 = corpus.select(col(idCol),
        pqEncodeCol(col(vecCol), cb2).as("codes"))
      (codes2, cb2, true, pqQuantErr(corpus, codes2, cb2, idCol, vecCol))
    }
  }

  /** Per-query ADC lookup table: `lut[s*ksub + c]` = dot(query's
    * subspace s, codebook centroid c of subspace s) — m·ksub doubles
    * computed ONCE per query, after which scoring a candidate is m
    * array lookups ([[pqAdcScore]]) instead of a dim-length dot
    * product. */
  def pqLutCol(qvec: Column,
               codebooks: Array[Array[Array[Float]]]): Column = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    val cb = cbLit(codebooks)
    flatten(transform(sequence(lit(0), lit(m - 1)), s =>
      transform(sequence(lit(0), lit(ksub - 1)), c =>
        aggregate(zip_with(slice(qvec, s * dsub + 1, lit(dsub)),
          element_at(element_at(cb, s + 1), c + 1),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (a, v) => a + v))))
  }

  /** Asymmetric-distance score: the PQ approximation of dot(query,
    * candidate) — m lookups into the query's LUT, one per code.
    * Fused codegen kernel (r18, guide §4); parity with the composable
    * fold pinned by PqCodecSpec via [[pqAdcScoreRef]]. */
  def pqAdcScore(codes: Column, lut: Column, ksub: Int): Column = {
    import org.apache.spark.sql.graftext.GraftBridge
    GraftBridge.column(graft.functions.expressions.PqAdcLookupScore(
      GraftBridge.expression(codes), GraftBridge.expression(lut), ksub))
  }

  /** Composable reference form of [[pqAdcScore]] (parity spec). */
  private[graft] def pqAdcScoreRef(codes: Column, lut: Column,
                                   ksub: Int): Column =
    aggregate(zip_with(codes, sequence(lit(0), size(codes) - 1),
      (c, s) => element_at(lut, s * ksub + c + 1)),
      lit(0.0), (a, v) => a + v)

  /** IVF-PQ ANN top-k — the Faiss-shaped scale path end to end:
    * queries probe their `nProbe` nearest coarse centroids
    * (inverted-file pruning), candidates inside the probed lists are
    * scored by ADC against their m-byte PQ CODES (the raw vectors
    * never enter the candidate stage — at 8×16 over 64-dim float the
    * code payload is 64× smaller than the vectors it stands for),
    * the top `refine`·k per query by ADC re-rank EXACTLY (true cosine
    * over just those vectors), and the top k of that are returned.
    * Precision of returned scores is exact; recall grows with nProbe
    * (probe coverage) and refine (ADC candidate pool).
    *
    * Scale notes (100 TB): the corpus is touched twice — once at
    * index build (coarse assign + shuffle-free encode, both narrow
    * against broadcast/literal state) and once by the final re-rank,
    * which joins only refine·k ids per query back to their vectors.
    * Everything between — probe join, ADC scoring, candidate top-k —
    * moves (id, codes) pairs, never embeddings. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nCentroids: Int = 16, nProbe: Int = 4,
                m: Int = 8, ksub: Int = 16, refine: Int = 4,
                idCol: String = "vec_id",
                vecCol: String = "embedding",
                trainIters: Int = 2,
                maxTrainVectors: Long = 100000L): DataFrame = {
    val cents = trainCentroids(corpus, nCentroids, trainIters,
      idCol, vecCol, maxTrainVectors)
    val cb = pqTrainCodebooks(corpus, m, ksub, math.max(1, trainIters),
      idCol, vecCol, maxTrainVectors)
    ivfPqTopKWith(cents, cb, corpus, queries, k, nProbe, refine,
      idCol, vecCol)
  }

  /** [[ivfPqTopK]] under CALLER-TRAINED coarse centroids and PQ
    * codebooks — the probe stage alone (mirrors [[ivfTopKWith]]), so
    * a production pipeline trains once and probes per batch, and a
    * harness can time/attribute the stages separately. */
  def ivfPqTopKWith(cents: DataFrame, cb: Array[Array[Array[Float]]],
                    corpus: DataFrame, queries: DataFrame, k: Int,
                    nProbe: Int = 4, refine: Int = 4,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val ksub = cb(0).length
    // the compressed index: (id, coarse list, m-byte codes) — vectors
    // DROPPED here and re-joined only for the exact re-rank
    val codes = assignToCentroids(corpus, cents, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"),
        pqEncodeCol(col(vecCol), cb).as("__codes"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("__sim").desc, col("centroid_id"))
    val probes = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
        .crossJoin(broadcast(cents))
        .withColumn("__sim", cosine(col("qvec"), col("cvec")))
        .withColumn("__rk", row_number().over(probeW))
        .filter(col("__rk") <= nProbe)
        .select(col("query_id"),
          pqLutCol(col("qvec"), cb).as("__lut"), col("centroid_id")))
    val candW = Window.partitionBy("query_id")
      .orderBy(col("__adc").desc, col("neighbor_id"))
    val cand = codes.join(probes, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__adc", pqAdcScore(col("__codes"), col("__lut"), ksub))
      .withColumn("__crk", row_number().over(candW))
      .filter(col("__crk") <= refine * k)
      .select("query_id", "neighbor_id")
    // exact re-rank over refine·k ids per query
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qvec"))), Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("nvec")), Seq("neighbor_id"))
      .withColumn("cosine", cosine(col("qvec"), col("nvec")))
      .filter(col("cosine").isNotNull)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Embedding near-duplicate pairs: bucketed candidate generation (same
    * sign-LSH), exact cosine ≥ threshold re-check. Never all-pairs. */
  /** Near-duplicate pairs by banded sign-LSH: candidates share at
    * least one band's full bucket (OR-amplification — `bands`
    * independent plane sets drive recall toward 1 for truly-near pairs
    * while each band stays selective), then the EXACT cosine re-check
    * decides. Never all-pairs: candidate generation is a bucket
    * equi-join, the 100 TB-safe shape. */
  def embeddingNearDupPairs(df: DataFrame, threshold: Double,
                            numPlanes: Int = 8,
                            bands: Int = 1,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    // candidate IDS travel through the bucket join and the pair dedup
    // WITHOUT their vectors (same design as the minhash pipeline:
    // shipping two dense arrays per candidate pair through the shuffle
    // multiplies its width for nothing); vectors re-attach to the
    // deduplicated pair set for the one exact re-check. Unlike minhash
    // there is no expensive derived column to reuse — the re-attach
    // sides are plain (id, vec) scans — so NO persist/checkpoint:
    // caching a 100 TB corpus to save re-reading two columns is the
    // wrong trade at every scale, and the deterministic seeded planes
    // make recomputation safe.
    val docs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // all band buckets in ONE fused codegen pass over the vector
    // ([[graft.functions.expressions.SignLshBands]], bit-identical to
    // per-band lshBucketFrom, whose interpreted HOFs dominated the
    // whole query's runtime at bands × planes passes per row)
    val bandArr = signBands(col("vec"), numPlanes, bands)
    val b = docs
      .select(col("id"), posexplode(bandArr).as(Seq("band", "bh")))
      .select(col("id"), struct(col("band"), col("bh")).as("bucket"))
    val cand = b.select(col("bucket"), col("id").as("idA"))
      .join(b.select(col("bucket"), col("id").as("idB")), Seq("bucket"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB").dropDuplicates("idA", "idB")
    cand
      .join(docs.select(col("id").as("idA"), col("vec").as("vecA")), Seq("idA"))
      .join(docs.select(col("id").as("idB"), col("vec").as("vecB")), Seq("idB"))
      .withColumn("cosine", cosine(col("vecA"), col("vecB")))
      .filter(col("cosine") >= threshold)
      .select(col("idA"), col("idB"), round(col("cosine"), 6).as("cosine"))
  }
}
