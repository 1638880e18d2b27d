package graft

import org.apache.spark.sql.functions._

/** Dev-only phase decomposition of the mv_join_minmax fixture at
  * sf0.1: times table staging, the define fold, and each refresh
  * separately so optimization effort lands on the real cost. */
object MvJoinMinmaxProbe {
  def main(args: Array[String]): Unit = {
    val spark = Gate.session("32")
    val dir = "/root/testdata/sf0.1"
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm generic machinery
    spark.read.parquet(s"$dir/nation.parquet").count()
    val orders = Tables.load(spark, dir, "orders")
    val base = s"${sys.props("java.io.tmpdir")}/graft_probe_mvjm"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    val fact = plans.SnapshotTable(spark, s"$base/fact", "o_orderkey",
      partitionCol = Some("o_orderstatus"))
    val cust = plans.SnapshotTable(spark, s"$base/customer", "c_custkey")
    val nat = plans.SnapshotTable(spark, s"$base/nation", "n_nationkey")
    val view = plans.SnapshotTable(spark, s"$base/view",
      plans.MaterializedAgg.KeyCol,
      statsCols = Seq(plans.MaterializedAgg.KeyCol),
      clusterBy = Seq(plans.MaterializedAgg.KeyCol), clusterFiles = 4)
    val dims = Seq(
      plans.MaterializedAgg.DimSpec(cust, "o_custkey", "c_custkey"),
      plans.MaterializedAgg.DimSpec(nat, "c_nationkey", "n_nationkey"))
    t("stage dims") {
      cust.create(Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_nationkey"))
      nat.create(Tables.load(spark, dir, "nation")
        .select("n_nationkey", "n_name"))
    }
    t("stage fact") {
      fact.create(orders.filter(col("o_orderkey") % 4 =!= 3))
    }
    t("define (fold)") {
      plans.MaterializedAgg.defineRecomputeJoin(fact, dims, view,
        Seq("n_name"),
        Seq("lo_cents" -> "min(CAST(round(o_totalprice * 100) AS BIGINT))",
          "hi_cents" -> "max(CAST(round(o_totalprice * 100) AS BIGINT))"))
    }
    t("mutate span 1") {
      fact.upsert(orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", round(col("o_totalprice") + 1.0d, 2)))
      fact.delete(col("o_totalprice") >= 400000.0d)
      cust.upsert(Tables.load(spark, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"),
          pmod(col("c_nationkey") + 1, lit(25)).as("c_nationkey")))
    }
    t("refresh 1") {
      plans.MaterializedAgg.refreshByDefinition(view)
    }
    t("mutate span 2")(nat.delete(col("n_nationkey") === 7))
    t("refresh 2") {
      plans.MaterializedAgg.refreshByDefinition(view)
    }
    t("read view")(view.read.count())
    spark.stop()
  }
}
