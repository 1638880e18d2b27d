package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Document deduplication for training-data pipelines: exact
  * (normalize+hash), MinHash+LSH banding, SimHash, and n-gram Jaccard —
  * all with BUCKETED candidate generation, never an all-pairs cross
  * join.
  *
  * Scale notes (100 TB): every variant is
  *   map (per-doc signature, codegen'd column algebra)
  *   → explode to (bucket, doc) pairs
  *   → shuffle on bucket (the only wide op; bucket cardinality ≈ corpus
  *     size, so partitions stay balanced)
  *   → within-bucket self-join (tiny groups)
  *   → exact re-check of candidates only.
  * An O(n²) cosine/Jaccard join would be the single worst scale-killer
  * possible at this size; the LSH recall/precision knobs (numHashes,
  * bands) trade re-check cost, not correctness of the exact re-check.
  */
object TextDedup {

  /** Exact dedup: keep the lowest-id document per normalized-text
    * fingerprint. Deterministic (min-id, not arbitrary) so results are
    * stable and oracle-checkable. One hash-shuffle, same shape as the
    * reference's PK dedup (A2). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val w = Window.partitionBy("__fp").orderBy(col(idCol))
    df.withColumn("__fp", fp)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Word w-shingles of the normalized text — distinct AND sorted
    * (binary UTF8 order), the contract [[jaccard]] relies on. Built with
    * higher-order functions — stays in codegen.
    *
    * The w-gram construction zips w SHIFTED SLICES of the token array
    * with `zip_with` string concats: every slice (and the tokenization
    * under it) is a row-level expression, evaluated once per row and
    * common-subexpression-eliminated by codegen. The tempting
    * alternative — `transform(sequence(0, n-w), i => slice(toks, i+1,
    * w))` — captures `toks` inside the lambda, and Catalyst re-evaluates
    * captured expressions per element: one full tokenization PER SHINGLE
    * (~50× per document on real corpora; measured 2× end-to-end on the
    * near-dup pipelines). */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    val len = greatest(n - lit(w - 1), lit(0)) // shingle count when n >= w
    val grams = (1 until w).foldLeft(slice(toks, lit(1), len)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), len),
        (a, b) => concat(a, lit(" "), b))
    }
    sort_array(array_distinct(
      when(n >= w, grams)
        .otherwise(array(concat_ws(" ", toks)))))
  }

  /** Exact Jaccard of two shingle columns — the fused codegen merge loop
    * (see [[graft.functions.expressions.SortedSetJaccard]]); both inputs
    * must come from [[shingles]] (sorted, distinct). */
  def jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftext.GraftBridge
    GraftBridge.column(graft.functions.expressions.SortedSetJaccard(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** MinHash signature FROM A MATERIALIZED shingle column: for hash
    * function i (murmur3 salted with i), the minimum over the doc's
    * shingles. numHashes independent permutation approximations ⇒
    * P(sig_i equal) ≈ Jaccard similarity.
    *
    * Fused: each shingle is string-hashed ONCE and the 64 salted values
    * derive from 5-op int murmurs inside one codegen loop
    * ([[graft.functions.expressions.MinHashMins]] — bit-identical to
    * the HOF form below for non-null inputs, which pays 64 string
    * murmurs per shingle). The shingle expression is evaluated once per
    * row here (single `transform`), so inlining is safe. */
  def minhashSignatureOfShingles(sh: Column, numHashes: Int = 64): Column = {
    import org.apache.spark.sql.graftext.GraftBridge
    GraftBridge.column(graft.functions.expressions.MinHashMins(
      GraftBridge.expression(transform(sh, s => hash(s))), numHashes))
  }

  /** Composable HOF reference form of [[minhashSignatureOfShingles]] —
    * kept as the cross-check for the fused expression. An inline
    * shingle expression here is re-evaluated once PER HASH FUNCTION
    * (64× the tokenization cost; measured 60× slower) — pass a stored
    * column reference. */
  def minhashSignatureOfShinglesHof(sh: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => hash(s, i))))

  /** Convenience one-shot form (tests, single-pass use). */
  def minhashSignature(text: Column, numHashes: Int = 64, w: Int = 3): Column =
    minhashSignatureOfShingles(shingles(text, w), numHashes)

  /** LSH banding: split the signature into `bands` bands of
    * numHashes/bands rows each; docs sharing ANY band hash are
    * candidates. Returns (bucket key columns, exploded). */
  private def bandBuckets(sig: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), hash(slice(sig, b * rows + 1, lit(rows))).as("bh")))
  }

  /** Near-duplicate pairs by MinHash+LSH: candidate pairs from banded
    * buckets, then EXACT shingle-Jaccard re-check ≥ `threshold`.
    * Output: (idA, idB, jaccard) with idA < idB, deduped. */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double = 0.7, numHashes: Int = 64,
                          bands: Int = 16, w: Int = 3): DataFrame = {
    // two-stage projection: shingles stored once, signature computed from
    // the stored column (NOT inline — see minhashSignatureOfShingles)
    val docs = df.select(col(idCol).as("id"), shingles(col(textCol), w).as("sh"))
      .withColumn("sig", minhashSignatureOfShingles(col("sh"), numHashes))
      .persist()
    try {
      // candidate ids travel WITHOUT their shingle arrays (ids are what
      // shuffles); arrays re-attach after pair dedup
      val buckets = docs
        .select(col("id"), explode(bandBuckets(col("sig"), numHashes, bands)).as("bucket"))
      val cand = buckets.select(col("bucket"), col("id").as("idA"))
        .join(buckets.select(col("bucket"), col("id").as("idB")), Seq("bucket"))
        .filter(col("idA") < col("idB"))
        .select("idA", "idB").dropDuplicates("idA", "idB")
      val sh = docs.select(col("id"), col("sh"))
      val result = cand
        .join(sh.select(col("id").as("idA"), col("sh").as("shA")), Seq("idA"))
        .join(sh.select(col("id").as("idB"), col("sh").as("shB")), Seq("idB"))
        .withColumn("jaccard", jaccard(col("shA"), col("shB")))
        .filter(col("jaccard") >= threshold)
        .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
      // materialize (small pair set, lineage truncated) so the doc-level
      // cache can be released now instead of leaking for the session
      result.localCheckpoint(eager = true)
    } finally docs.unpersist()
  }

  /** 64-bit SimHash: per-token murmur3×2 → 64 bit votes (+1 present /
    * −1 absent) summed over tokens; bit b set iff its vote is positive.
    * One fused codegen pass over the token hashes (see
    * [[graft.functions.expressions.SimHash64]]). */
  def simhash(text: Column): Column =
    simhashOfHashes(tokenHashes(text))

  /** Cross-engine token hashes: 60 bits parsed from the md5 hex
    * prefix. Slower than the murmur3 fast path but bit-identical in
    * any engine with md5 (60, not 64, so the value fits a SIGNED long
    * in both Spark and DuckDB); the 4 always-zero high bits cost the
    * simhash nothing — Hamming distances and banding are unaffected. */
  def md5TokenHashes(text: Column): Column =
    transform(TextAnalysis.tokens(text),
      t => conv(substring(md5(encode(t, "UTF-8")), 1, 15), 16, 10)
        .cast("long"))

  /** Per-token 64-bit hashes (murmur3×2) — materialize this column first,
    * then feed [[simhashOfHashes]]: inlining it re-evaluates the
    * tokenization once per bit (64×). */
  def tokenHashes(text: Column): Column =
    transform(TextAnalysis.tokens(text),
      t => hash(t).cast("long") * lit(4294967296L) + // hi 32 bits
        (hash(t, lit(1)).cast("long") + lit(2147483648L))) // lo 32, unsigned

  /** SimHash from a STORED token-hash column (see [[tokenHashes]]) —
    * the fused single-pass codegen expression. */
  def simhashOfHashes(hashes: Column): Column = {
    import org.apache.spark.sql.graftext.GraftBridge
    GraftBridge.column(graft.functions.expressions.SimHash64(
      GraftBridge.expression(hashes)))
  }

  /** Composable higher-order-function form of [[simhashOfHashes]] — 64
    * unrolled `aggregate` passes (O(64·tokens) interpreted lambda calls).
    * Kept as the readable reference implementation and the cross-check
    * for the codegen expression; tests assert bit-identity. */
  def simhashOfHashesHof(hashes: Column): Column = {
    val bits = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0),
        (v, h) => v + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1))
          .otherwise(lit(-1)))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Near-duplicate pairs by SimHash: candidates share at least one of
    * four 16-bit bands (any pair within Hamming distance 3 must agree on
    * ≥1 band — pigeonhole), then exact Hamming re-check ≤ maxDistance. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxDistance: Int = 3,
                          /** Token-hash source. The murmur3 default is
                            * the codegen fast path; [[md5TokenHashes]]
                            * makes the whole pipeline recomputable by
                            * any md5-bearing engine (the DuckDB oracle
                            * re-derives the full simhash). */
                          tokenHash: Column => Column = tokenHashes)
      : DataFrame = {
    val docs = df
      .select(col(idCol).as("id"), tokenHash(col(textCol)).as("th"))
      .select(col("id"), simhashOfHashes(col("th")).as("sh"))
    val banded = docs.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bh"))): _*))
        .as("bucket"))
    val a = banded.select(col("bucket"), col("id").as("idA"), col("sh").as("shA"))
    val b = banded.select(col("bucket"), col("id").as("idB"), col("sh").as("shB"))
    a.join(b, Seq("bucket")).filter(col("idA") < col("idB"))
      .dropDuplicates("idA", "idB")
      .withColumn("hamming", hammingDistance(col("shA"), col("shB")))
      .filter(col("hamming") <= maxDistance)
      .select("idA", "idB", "hamming")
  }

  /** Exact n-gram Jaccard near-dup with prefix blocking: candidates
    * share the first `blockChars` of normalized text (cheap, SQL-
    * expressible blocking — an oracle-checkable complement to the
    * probabilistic LSH path), then exact shingle-Jaccard ≥ threshold. */
  def ngramJaccardNearDup(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double = 0.5, blockChars: Int = 40,
                          w: Int = 3): DataFrame = {
    // persisted: both self-join sides reuse one tokenization pass;
    // released after the (small) pair set is materialized
    val docs = df.select(
      col(idCol).as("id"),
      substring(TextAnalysis.normalize(col(textCol)), 1, blockChars).as("block"),
      shingles(col(textCol), w).as("sh"))
      .persist()
    try {
      val a = docs.select(col("block"), col("id").as("idA"), col("sh").as("shA"))
      val b = docs.select(col("block"), col("id").as("idB"), col("sh").as("shB"))
      val result = a.join(b, Seq("block")).filter(col("idA") < col("idB"))
        .withColumn("jaccard", jaccard(col("shA"), col("shB")))
        .filter(col("jaccard") >= threshold)
        .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
      result.localCheckpoint(eager = true)
    } finally docs.unpersist()
  }
}
