package graft

import org.apache.spark.sql.functions._

/** Dev-only check of the recomputeJoin Scaladoc's plan claim: the
  * dirty-key null-safe semi-join over the current chain should push
  * onto the DIM side of the inner joins (PushDownLeftSemiAntiJoin),
  * narrowing what reaches the aggregate. Prints the optimized plan of
  * the exact `fresh` algebra recomputeDirty builds. */
object SemiPushProbe {
  def main(args: Array[String]): Unit = {
    val spark = Gate.session("8")
    val dir = "/root/testdata/sf0.01"
    val base = s"${sys.props("java.io.tmpdir")}/graft_probe_semipush"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    val fact = plans.SnapshotTable(spark, s"$base/fact", "o_orderkey",
      partitionCol = Some("o_orderstatus"))
    val cust = plans.SnapshotTable(spark, s"$base/customer", "c_custkey")
    val nat = plans.SnapshotTable(spark, s"$base/nation", "n_nationkey")
    fact.create(Tables.load(spark, dir, "orders"))
    cust.create(Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_nationkey"))
    nat.create(Tables.load(spark, dir, "nation")
      .select("n_nationkey", "n_name"))
    // the exact chainJoin + recomputeDirty fresh algebra
    val current = fact.read
      .join(cust.read.withColumnRenamed("c_custkey", "__mv_dimkey_0"),
        col("o_custkey") === col("__mv_dimkey_0")).drop("__mv_dimkey_0")
      .join(nat.read.withColumnRenamed("n_nationkey", "__mv_dimkey_1"),
        col("c_nationkey") === col("__mv_dimkey_1")).drop("__mv_dimkey_1")
    import spark.implicits._
    val dirtyR = Seq("ALGERIA", "KENYA").toDF("__mv_dirty_n_name")
    val fresh = current
      .join(broadcast(dirtyR),
        current("n_name") <=> col("__mv_dirty_n_name"), "left_semi")
      .groupBy("n_name")
      .agg(max(round(col("o_totalprice") * 100).cast("long")).as("hi"))
    println("==== OPTIMIZED ====")
    println(fresh.queryExecution.optimizedPlan.toString)
    println("==== PHYSICAL ====")
    fresh.explain("formatted")
    spark.stop()
  }
}
