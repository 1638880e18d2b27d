package graft

import graft.operators.Validation
import org.apache.spark.sql.types._

/** Plan-shape assertions: the optimizations the 100 TB design depends on
  * must actually appear in the physical plan — pushed filters, broadcast
  * joins, partial aggregation, shuffle-free maps. A correctness-green
  * query with the wrong plan is a scale bug. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Rows the (already-executed) graft BatchScan actually produced —
    * the ground truth for "did pruning skip files", walked through the
    * adaptive plan's query stages. */
  private def graftScanRows(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    var scanned = -1L
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case b: BatchScanExec if b.toString.contains("graft") =>
          scanned = b.metrics("numOutputRows").value
        case _ => ()
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    scanned
  }

  test("q1: filter is pushed to the parquet scan and aggregation is partial+final") {
    val plan = planOf(Queries.q1Pricing(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"expected partial+final HashAggregate:\n$plan")
  }

  test("q1: scan reads only the referenced columns") {
    val plan = planOf(Queries.q1Pricing(spark, sf))
    // plan strings truncate ReadSchema; assert on the scan's column list
    assert(plan.contains("FileScan parquet [l_quantity#"),
      s"column pruning failed:\n$plan")
    assert(!plan.contains("l_orderkey#"), s"unreferenced column read:\n$plan")
  }

  test("recompute-join dirty scope pushes onto the dim side of the star") {
    // the non-additive star refresh scopes its recompute with a
    // null-safe semi-join on the dirty group keys; when the keys are
    // DIM attributes, Catalyst's PushDownLeftSemiAntiJoin must land
    // the semi directly on the dim relation, below both inner joins —
    // otherwise the scope filters AFTER the full fact join and the
    // refresh aggregates the whole star at every span
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name")
    // the exact chainJoin + recomputeDirty `fresh` algebra
    val current = orders
      .join(customer.withColumnRenamed("c_custkey", "__mv_dimkey_0"),
        col("o_custkey") === col("__mv_dimkey_0")).drop("__mv_dimkey_0")
      .join(nation.withColumnRenamed("n_nationkey", "__mv_dimkey_1"),
        col("c_nationkey") === col("__mv_dimkey_1")).drop("__mv_dimkey_1")
    val dirtyR = Seq("NATION_0", "NATION_7").toDF("__mv_dirty_n_name")
    val fresh = current
      .join(broadcast(dirtyR),
        current("n_name") <=> col("__mv_dirty_n_name"), "left_semi")
      .groupBy("n_name")
      .agg(max(round(col("o_totalprice") * 100).cast("long")).as("hi"))
    val semiOnDim = fresh.queryExecution.optimizedPlan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType.sql == "LEFT SEMI" => j
    }.getOrElse(fail("no semi join in the optimized plan"))
    // the pushed semi's left subtree must be the bare nation relation
    // (one leaf), not the three-table join (three leaves)
    val leaves = semiOnDim.left.collectLeaves()
    assert(leaves.size == 1,
      s"dirty-scope semi did not push to the dim side:\n" +
        fresh.queryExecution.optimizedPlan)
    assert(semiOnDim.left.output.map(_.name).contains("n_name"),
      s"semi pushed to the wrong side:\n${semiOnDim.left}")
    assert(fresh.collect().map(_.getString(0)).toSet ==
      Set("NATION_0", "NATION_7"))
  }

  test("star join: dimension joins broadcast, fact side never shuffles for the joins") {
    val plan = planOf(Queries.starJoinAgg(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"dims not broadcast:\n$plan")
  }

  test("q3: customer broadcasts, date filters push to the scans, top-k never global-sorts") {
    val plan = planOf(Queries.q3ShippingPriority(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"customer dim not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 fell back to a global sort:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"),
      s"lineitem date filter not pushed:\n$plan")
    assert(plan.contains("GreaterThan(o_orderdate") || plan.contains("LessThan(o_orderdate"),
      s"orders date filter not pushed:\n$plan")
  }

  test("q5: all four dims broadcast — exactly one shuffled join (the fact pair)") {
    val plan = planOf(Queries.q5RegionalRevenue(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 4,
      s"expected 4 broadcast dim joins:\n$plan")
    val shuffledJoins = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).length
    assert(shuffledJoins <= 1,
      s"more than one shuffled join in the chain ($shuffledJoins):\n$plan")
  }

  test("funnel: exactly one exchange (the per-user grouping), no join in the plan") {
    val plan = planOf(Queries.funnelSteps(spark, sf))
    // the naive formulation joins the event table once per step; the
    // fold-based operator must not join at all
    assert(!plan.contains("Join"), s"funnel plan contains a join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, // user grouping + the final single-row agg
      s"funnel shuffled $exchanges times:\n$plan")
  }

  test("funnel: step-type filter sits below the exchange (pushed to the scan)") {
    val plan = planOf(Queries.funnelSteps(spark, sf))
    // only step-type events may cross the shuffle — a heavy user's full
    // event history in one collect_list array is the OOM shape at 100×
    val shuffleAt = plan.indexOf("Exchange hashpartitioning")
    assert(shuffleAt >= 0, s"no per-user exchange:\n$plan")
    val belowShuffle = plan.substring(shuffleAt)
    assert(belowShuffle.contains("In(event_type") ||
           "event_type#\\d+ IN \\(".r.findFirstIn(belowShuffle).isDefined,
      s"step-type filter not below the exchange:\n$plan")
    assert(plan.contains("PushedFilters: [In(event_type") ||
           plan.contains("In(event_type"),
      s"step-type filter not pushed to the parquet scan:\n$plan")
  }

  test("retention: two scans only (days + first-activity), sizes derived in-plan") {
    val plan = planOf(Queries.cohortRetention(spark, sf))
    // the sizes column must come from the window over the tiny counts
    // matrix, not a third scan of the event stream
    assert("FileScan".r.findAllIn(plan).length == 2,
      s"cohort sizes re-scanned the events:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"first-activity side not broadcast:\n$plan")
  }

  test("decontaminate: benchmark fingerprints broadcast for the semi-join probe") {
    val plan = planOf(Queries.decontaminate(spark, sf))
    // the membership probe must be a broadcast semi-join — shuffling
    // the corpus's exploded shingles by hash would move O(corpus·grams)
    // rows for an eval-suite-sized right side
    assert("BroadcastHashJoin [^\\n]*LeftSemi".r.findFirstIn(plan).isDefined,
      s"semi-join probe not broadcast:\n$plan")
  }

  test("validation composite is shuffle-free (single-pass map)") {
    val dirty = Tables.load(spark, sf, "orders")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_custkey", LongType, nullable = false)))
    val r = Validation.validate(
      dirty.select("o_orderkey", "o_custkey"), schema, "o_orderkey",
      cache = false)
    val plan = planOf(r.valid)
    assert(!plan.contains("Exchange"), s"validation shuffled:\n$plan")
  }

  test("text stats pipeline is shuffle-free") {
    val plan = planOf(Queries.textStats(spark, sf))
    assert(!plan.contains("Exchange"), s"text stats shuffled:\n$plan")
  }

  test("RI semi join prunes the dim to its key column") {
    val plan = planOf(Queries.riSemiJoin(spark, sf))
    assert(plan.contains("LeftSemi"), s"not a semi join:\n$plan")
    // dim scan must read only the join key + pushed filter column
    assert(plan.contains("ReadSchema: struct<p_partkey:bigint,p_size:int>"),
      s"dim not pruned:\n$plan")
  }

  test("bucketed join: sort-merge with no exchange below the join") {
    val df = Queries.bucketedJoinAgg(spark, sf)
    df.collect()
    // keep only the final adaptive plan (the appended "== Initial
    // Plan ==" section would false-positive the exchange check)
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
    // the only shuffle allowed is the one ABOVE the join for the final
    // groupBy/orderBy — the join inputs read bucketed, no repartition
    val belowJoin = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"join inputs were shuffled despite bucketing:\n$plan")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"scan not bucketed:\n$plan")
  }

  test("doc chunking is a shuffle-free narrow map") {
    val plan = planOf(Queries.docChunks(spark, sf))
    assert(!plan.contains("Exchange"), s"chunking shuffled:\n$plan")
    assert(plan.contains("Generate explode"), s"no explode:\n$plan")
  }

  test("curation pipeline has exactly one shuffle (the dedup window)") {
    val plan = planOf(Queries.curationPipeline(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected the single dedup shuffle, found $exchanges:\n$plan")
  }

  test("PII scrub and dataset split are shuffle-free narrow maps") {
    val scrub = planOf(Queries.piiScrub(spark, sf))
    assert(!scrub.contains("Exchange"), s"pii scrub shuffled:\n$scrub")
    val split = planOf(Queries.datasetSplit(spark, sf))
    assert(!split.contains("Exchange"), s"dataset split shuffled:\n$split")
  }

  test("format(\"graft\") reads are columnar V2 scans planned by the manifest index") {
    val df = Queries.sourceFormatRead(spark, sf)
    val plan = planOf(df)
    // the DSv2 migration's contract: a registered-source read is a
    // vectorized parquet BatchScan (no RDD[Row] conversion at the
    // source boundary), planned by ManifestFileIndex, with the filter
    // pushed and the row-domain side inside whole-stage codegen
    assert(plan.contains("BatchScan graft."), s"not a V2 BatchScan:\n$plan")
    assert(plan.contains("ManifestFileIndex"),
      s"scan not planned by the manifest index:\n$plan")
    assert(plan.contains("ColumnarToRow"), s"scan not columnar:\n$plan")
    assert(!plan.contains("Scan ExistingRDD") && !plan.contains("ExternalRDDScan"),
      s"RDD[Row] conversion survived the DSv2 migration:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), GreaterThanOrEqual(o_orderkey"),
      s"filter not pushed through the V2 scan:\n$plan")
  }

  test("multi-column partitioned read prunes BOTH levels at planning time") {
    val df = Queries.multiPartitionScan(spark, sf)
    val plan = planOf(df)
    // both composite-key columns must appear as PARTITION filters on
    // the manifest-planned scan (planning-time pruning), not as data
    // filters re-evaluated per row
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.isDefined, s"no partition filters on the scan:\n$plan")
    assert(pf.get.contains("o_orderstatus") && pf.get.contains("o_month"),
      s"a composite level missed planning-time pruning: ${pf.get}")
    assert(plan.contains("ManifestFileIndex"),
      s"scan not planned by the manifest index:\n$plan")
  }

  test("dynamic partition pruning narrows a graft fact scan to the joined partitions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val fact = graft.plans.SnapshotTable(spark, s"$root/fact", "id",
      partitionCol = Some("d"))
    fact.create(spark.range(1000).select($"id",
      ($"id" % 20).cast("string").as("d"), ($"id" * 2).as("x")))
    val dim = spark.range(3).select($"id".cast("string").as("d"),
      lit("yes").as("flag"))
    dim.write.parquet(s"$root/dim")

    val j = spark.read.format("graft").load(s"$root/fact")
      .join(spark.read.parquet(s"$root/dim").filter($"flag" === "yes"),
        Seq("d"))
      .groupBy("d").agg(sum("x").as("sx"))
    val rows = j.collect()
    assert(rows.length == 3)

    val plan = planOf(j)
    assert(plan.contains("dynamicpruningexpression"),
      s"no runtime filter reached the graft scan:\n$plan")
    // the decisive check: the fact scan must have LISTED only the 3
    // surviving partitions' rows (150), not the whole table (1000) —
    // manifest pruning happened before any fact I/O
    val scanned = graftScanRows(j)
    assert(scanned == 150L,
      s"fact scan read $scanned rows — dynamic pruning didn't skip files")
  }

  test("runtime join keys skip files via min/max stats on a non-partition column") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_rtskip").toString
    // range-clustered on k: each of the ~8 files covers a narrow k
    // slice, so a 2-key join should open only the files whose range
    // holds those keys
    val fact = graft.plans.SnapshotTable(spark, s"$root/fact", "id",
      statsCols = Seq("k"), clusterBy = Seq("k"), clusterFiles = 8)
    fact.create(spark.range(4000).select($"id", ($"id" % 800).as("k"),
      ($"id" * 3).as("x")))
    val total = fact.candidateFiles().size
    assert(total >= 8)
    spark.range(2).select(($"id" * 300 + 10).as("k"), lit("y").as("flag"))
      .write.parquet(s"$root/dim")

    val j = spark.read.format("graft").load(s"$root/fact")
      .join(spark.read.parquet(s"$root/dim").filter($"flag" === "y"),
        Seq("k"))
      .agg(sum("x").as("sx"))
    j.collect()

    val plan = planOf(j)
    assert(plan.contains("dynamicpruningexpression"),
      s"no runtime filter reached the graft scan:\n$plan")
    // 2 of ~8 k-slices survive → at most half the table's rows listed
    val scanned = graftScanRows(j)
    assert(scanned >= 0 && scanned <= 2000,
      s"fact scan read $scanned of 4000 rows — runtime stats skipping " +
        "didn't drop files")
  }

  test("whole-stage codegen covers the hot paths") {
    val df = Queries.q1Pricing(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = planOf(df)
    // codegen'd operators carry the *(stageId) marker in the final plan
    assert(plan.contains("*(1)"), s"no codegen:\n$plan")
  }

  test("pq drift monitor: one codes equi-join, centroid table " +
      "broadcast, nothing else shuffles") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val cb = Similarity.pqTrainCodebooks(emb, m = 8, ksub = 16, iters = 0)
    val codes = emb.select(col("vec_id"),
      Similarity.pqEncodeCol(col("embedding"), cb).as("codes"))
    val plan = planOf(Similarity.pqQuantErrPlan(emb, codes, cb))
    // the 128-row centroid side must broadcast — per-subspace error
    // lookup may not shuffle the exploded corpus
    assert(plan.contains("BroadcastHashJoin"),
      s"centroid join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"monitor plan degenerated to a product join:\n$plan")
    // exactly two joins: corpus⋈codes (the one allowed shuffle) and
    // the broadcast centroid lookup
    val joins = "Join".r.findAllIn(plan).length
    assert(joins == 2, s"expected 2 joins, found $joins:\n$plan")
    // any hash-partitioned exchange belongs to the codes equi-join —
    // the explode, the centroid lookup and the final global aggregate
    // (a SinglePartition exchange) add none
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2,
      s"monitor shuffles beyond the codes equi-join ($shuffles):\n$plan")
  }
}
