package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair set — the step that
  * turns pairwise "A ~ B" verdicts into dedup DECISIONS: every document
  * in a duplicate cluster gets the cluster's minimum id as its
  * component, and the representative (component == id) is the one
  * surviving document. Pairs alone under-delete: {A~B, B~C} must drop
  * B AND C even though A~C was never emitted.
  *
  * Algorithm: iterative min-label propagation. Each round every node
  * takes the min label among itself and its neighbors; convergence in
  * O(cluster diameter) rounds. Near-dup clusters are near-cliques
  * (diameter 1–3 in practice), so the loop runs 2–4 rounds regardless
  * of corpus size; `maxIters` bounds the pathological chain-graph case
  * (the published alternating large-star/small-star rewiring would cut
  * that to O(log n) — unneeded at dedup shapes).
  *
  * 100 TB shape: state per round is one (node, label) table — O(nodes
  * with an edge), NOT O(corpus); each round is one shuffle join + one
  * grouped min. Rounds are materialized (persist + count) so lineage
  * stays one round deep — the iteration pattern MLlib's own graph
  * loops use. The driver holds only the changed-row COUNT.
  */
object Components {

  /** Release the storage blocks behind a `localCheckpoint(eager)`
    * result. `Dataset.unpersist` only clears CacheManager entries — a
    * checkpointed Dataset is a LogicalRDD whose persisted RDD the
    * cache manager never sees, so without this the per-round state
    * would linger until ContextCleaner GC (O(rounds × nodes) blocks
    * on a deep graph). */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => df.unpersist()
    }

  /** (node, component) for every node appearing in `edges`; component
    * is the minimum id reachable through the pair graph. The returned
    * frame is materialized as executor-local checkpoint blocks — the
    * caller owns them (they are dropped when the frame is GC'd); each
    * superseded round's blocks are released eagerly.
    *
    * Each round ends in `localCheckpoint(eager)`, not `persist`: the
    * round plan references the previous round TWICE (propagation join
    * + union), so under plain caching the LOGICAL plan doubles per
    * round — O(2^rounds) tree nodes that blow up analysis and
    * explain-string generation long before any data does. The eager
    * checkpoint cuts each round's lineage to a LogicalRDD, keeping the
    * plan O(1) deep regardless of graph diameter. */
  def minLabelComponents(edges: DataFrame, aCol: String, bCol: String,
                         maxIters: Int = 50): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    try {
      while (changed > 0 && iter < maxIters) {
        val prop = sym.join(labels, sym("src") === labels("node"))
          .select(col("dst").as("node"), col("label"))
        val next = labels.unionByName(prop)
          .groupBy("node").agg(min("label").as("label"))
          .localCheckpoint(true)
        changed = next.join(
            labels.withColumnRenamed("label", "__old"), Seq("node"))
          .filter(col("label") =!= col("__old")).count()
        releaseCheckpoint(labels)
        labels = next
        iter += 1
      }
      if (changed != 0) {
        releaseCheckpoint(labels)
        throw new IllegalStateException(
          s"components did not converge in $maxIters rounds")
      }
      labels
    } finally sym.unpersist()
  }
}
