package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{CosineSimilarity, MinHashMins, SimHash64, SortedSetJaccard}

/** Session extension registering the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)        // or:
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  *
  * This is the engine's `SparkSessionExtensions` surface — only genuinely
  * non-expressible operators live here (SURVEY.md §2.11: the reference
  * needs none; the similarity kernel is our 100 TB extension).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // COUNT(*) over a graft table answers from manifest metadata —
    // see [[graft.sources.MetadataOnlyCount]]
    ext.injectOptimizerRule(_ => graft.sources.MetadataOnlyCount)
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_similarity takes 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_set_jaccard"),
      new ExpressionInfo(classOf[SortedSetJaccard].getName, "sorted_set_jaccard"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"sorted_set_jaccard takes 2 arguments, got ${children.length}")
        SortedSetJaccard(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"simhash64 takes 1 argument, got ${children.length}")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_mins"),
      new ExpressionInfo(classOf[MinHashMins].getName, "minhash_mins"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"minhash_mins takes 2 arguments (seed array, numHashes), got ${children.length}")
        val n = children(1) match {
          // a foldable CAST(NULL AS INT) passes the type guard but evals
          // to null — reject it with the same message, not an NPE
          case e if e.foldable && e.dataType ==
              org.apache.spark.sql.types.IntegerType && e.eval() != null =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"minhash_mins numHashes must be an int literal, got $other")
        }
        MinHashMins(children.head, n)
      }))
  }
}
