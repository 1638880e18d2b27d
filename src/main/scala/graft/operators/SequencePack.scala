package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for LLM pre-training: lay all documents out on one
  * global token axis in a deterministic order (concat), then cut the
  * axis into fixed `ctxLen`-token context windows (chunk) — the
  * GPT-style "concat and chunk" batching step. Each document's
  * placement is fully described by its `start_offset` on the axis plus
  * the first/last window it lands in; a downstream batch builder reads
  * exactly the docs whose [first_seq, last_seq] range covers the
  * windows it is materializing.
  *
  * 100 TB shape: a naive global-order running sum is a WindowExec over
  * ONE partition — the classic scale killer. This implementation is
  * the textbook two-level distributed prefix sum instead:
  *
  *  1. range-shuffle by the order key (each task holds a contiguous
  *     id slice, sorted within);
  *  2. per-partition token totals — an O(partitions)-row aggregate;
  *  3. exclusive prefix over THOSE — a window over O(partitions) rows,
  *     trivially single-partition at any data scale;
  *  4. broadcast the offsets back and add the partition-local running
  *     sum (parallel window per partition).
  *
  * The range shuffle feeding steps 2 and 4 is one physical exchange —
  * both subtrees share the same canonical plan, so Spark's
  * ReuseExchange computes it once. No driver-side data path.
  */
object SequencePack {

  /** Per-document packing coordinates: (idCol, tokensCol,
    * `start_offset`, `first_seq`, `last_seq`) under `ctxLen`-token
    * windows, documents concatenated in ascending `idCol` order.
    * `idCol` must be UNIQUE — it is the total order of the layout;
    * with duplicate keys the relative placement of the duplicates is
    * partitioner-dependent (and no engine-independent oracle exists
    * for it). Zero-token documents are pinned to the window at their
    * offset (`last_seq = first_seq`) rather than producing an empty
    * span.
    *
    * The partition-local running sum is a `mapPartitions` fold, not a
    * `Window.partitionBy(__pid)`: the input is RANGE-partitioned on
    * the order key, which Spark cannot prove clusters `__pid`, so the
    * window form would insert a SECOND full-data hash exchange — 2×
    * shuffle I/O for nothing. The fold consumes the sorted partition
    * in place; the only full-data exchange in the plan is the range
    * shuffle (its map stage is shared by the tiny per-partition-total
    * aggregate via ReuseExchange), which the spec asserts. */
  def packOffsets(docs: DataFrame, idCol: String, tokensCol: String,
                  ctxLen: Int, numPartitions: Int = 0): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    val spark = docs.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val ranged = docs
      .select(col(idCol), col(tokensCol).cast(LongType).as(tokensCol))
      .repartitionByRange(n, col(idCol))
      .sortWithinPartitions(idCol)
    // one narrow pass over each sorted partition: inclusive local
    // running sum + the partition id the offsets join keys on
    val cumSchema = ranged.schema
      .add("__pid", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("__cum", LongType, nullable = false)
    val tokIdx = ranged.schema.fieldIndex(tokensCol)
    val idIdx = ranged.schema.fieldIndex(idCol)
    val withCum = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var acc = 0L
      it.map { r =>
        // fail fast WITH the offending id: a bare getLong on a null
        // token count would kill the job with an anonymous NPE deep in
        // a task
        if (r.isNullAt(tokIdx))
          throw new IllegalArgumentException(
            s"null $tokensCol for $idCol=${r.get(idIdx)} — every " +
              "document needs a token count before packing")
        acc += r.getLong(tokIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid :+ acc)
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(cumSchema))
    // per-partition totals (= each partition's max inclusive sum), then
    // the exclusive prefix across partitions — O(partitions) rows, so
    // the global-order window here is cheap no matter how large the
    // corpus
    val partOffsets = withCum.groupBy("__pid")
      .agg(max("__cum").as("__psum"))
      .withColumn("__poff",
        coalesce(sum("__psum").over(
          Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__poff"))
    withCum.join(broadcast(partOffsets), Seq("__pid"))
      .select(col(idCol), col(tokensCol),
        (col("__poff") + col("__cum") - col(tokensCol)).as("start_offset"))
      .withColumn("first_seq", expr(s"start_offset div $ctxLen"))
      .withColumn("last_seq",
        expr(s"(start_offset + greatest($tokensCol, 1L) - 1L) div $ctxLen"))
  }
}
