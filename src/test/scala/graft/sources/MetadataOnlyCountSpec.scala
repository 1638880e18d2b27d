package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.SnapshotTable

/** COUNT(*) answered from manifest metadata ([[MetadataOnlyCount]]):
  * the rewrite must be exact under MoR deletes and time travel, and
  * must REFUSE every shape it cannot answer from a row count alone. */
class MetadataOnlyCountSpec extends SparkSpec {

  import spark.implicits._

  override def afterAll(): Unit = {
    // the session is shared across suites — do not leave the rule
    // installed for tests that assert scan shapes
    MetadataOnlyCount.uninstall(spark)
    super.afterAll()
  }

  private def withRule[T](body: => T): T = {
    MetadataOnlyCount.install(spark)
    body
  }

  private def isMetadataOnly(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case _: LocalRelation => ()
    }.nonEmpty

  private def mkTable(tag: String): (SnapshotTable, String) = {
    val path = Files.createTempDirectory(s"graft_$tag").toString + "/t"
    // id and v carry manifest stats; g deliberately does NOT
    val t = SnapshotTable(spark, path, "id", statsCols = Seq("id", "v"))
    t.create((1 to 500).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "v", "g"))
    (t, path)
  }

  test("bare COUNT(*) collapses to a LocalRelation with the exact count") {
    withRule {
      val (_, path) = mkTable("metacount")
      val df = spark.read.format("graft").load(path).agg(count(lit(1)).as("n"))
      assert(isMetadataOnly(df), df.queryExecution.optimizedPlan.toString)
      assert(df.head().getLong(0) == 500L)
      // several count(*) shapes in one aggregate: all rewritten
      val multi = spark.read.format("graft").load(path)
        .agg(count(lit(1)).as("a"), count(lit("x")).as("b"))
      assert(isMetadataOnly(multi))
      assert(multi.head() == org.apache.spark.sql.Row(500L, 500L))
    }
  }

  test("MoR deletes subtract their DV cardinality without a scan") {
    withRule {
      val (t, path) = mkTable("metacountdv")
      t.deleteMoR(col("id") % 10 === 3) // 50 rows into deletion vectors
      val df = spark.read.format("graft").load(path).agg(count(lit(1)).as("n"))
      assert(isMetadataOnly(df), df.queryExecution.optimizedPlan.toString)
      assert(df.head().getLong(0) == 450L)
      // and the scan-based answer agrees
      assert(spark.read.format("graft").load(path)
        .filter(col("id").isNotNull).count() == 450L)
    }
  }

  test("time travel counts the pinned version's manifest") {
    withRule {
      val (t, path) = mkTable("metacounttt")
      t.append(Seq((1001L, "x", 1)).toDF("id", "v", "g"))
      val v1 = spark.read.format("graft").option("versionAsOf", "1")
        .load(path).agg(count(lit(1)).as("n"))
      assert(isMetadataOnly(v1))
      assert(v1.head().getLong(0) == 500L)
      val head = spark.read.format("graft").load(path).agg(count(lit(1)))
      assert(head.head().getLong(0) == 501L)
    }
  }

  test("MIN/MAX answer from manifest stats; mixed aggregates rewrite together") {
    withRule {
      val (_, path) = mkTable("metaminmax")
      val rel = spark.read.format("graft").load(path)
      val df = rel.agg(count(lit(1)).as("n"), min(col("id")).as("lo"),
        max(col("id")).as("hi"), min(col("v")).as("slo"),
        max(col("v")).as("shi"))
      assert(isMetadataOnly(df), df.queryExecution.optimizedPlan.toString)
      // exact vs the scan-computed truth (string min/max are
      // lexicographic: v1 < v10 < ... < v99)
      assert(df.head() == org.apache.spark.sql.Row(500L, 1L, 500L, "v1", "v99"))
    }
  }

  test("MIN/MAX of date/ntz/decimal columns answer from T:/C: stats — " +
      "exactly, including across type-widened vintages") {
    withRule {
      import org.apache.spark.sql.types.{DecimalType, TimestampNTZType}
      import java.time.{LocalDate, LocalDateTime}
      val path = Files.createTempDirectory("graft_metaminmaxtc").toString + "/t"
      val t = SnapshotTable(spark, path, "id", statsCols = Seq("d", "price"))
      t.create((1 to 300).map(i => (i.toLong,
          java.sql.Date.valueOf(LocalDate.of(2021, 1, 1).plusDays(i)),
          new java.math.BigDecimal(s"$i.75")))
        .toDF("id", "d", "price")
        .withColumn("price", col("price").cast(DecimalType(10, 2))))
      val rel = spark.read.format("graft").load(path)
      val df = rel.agg(min(col("d")).as("dlo"), max(col("d")).as("dhi"),
        min(col("price")).as("plo"), max(col("price")).as("phi"))
      assert(isMetadataOnly(df), df.queryExecution.optimizedPlan.toString)
      assert(df.head() == org.apache.spark.sql.Row(
        java.sql.Date.valueOf("2021-01-02"),
        java.sql.Date.valueOf("2021-10-28"),
        new java.math.BigDecimal("1.75"),
        new java.math.BigDecimal("300.75")))
      // widen (date→ntz, decimal scale up), add a wide vintage: the
      // mixed "T:"/"C:" stats still fold — micros are one unit, and
      // each "C:" value carries its own scale
      t.widenColumn("d", TimestampNTZType)
      t.widenColumn("price", DecimalType(14, 4))
      t.upsert(Seq((301L, "2030-06-01T12:30", "98765.4321"))
        .toDF("id", "d", "price")
        .select(col("id"), col("d").cast(TimestampNTZType),
          col("price").cast(DecimalType(14, 4))))
      val df2 = spark.read.format("graft").load(path)
        .agg(min(col("d")).as("dlo"), max(col("d")).as("dhi"),
          min(col("price")).as("plo"), max(col("price")).as("phi"))
      assert(isMetadataOnly(df2), df2.queryExecution.optimizedPlan.toString)
      assert(df2.head() == org.apache.spark.sql.Row(
        LocalDate.of(2021, 1, 2).atStartOfDay,
        LocalDateTime.of(2030, 6, 1, 12, 30),
        new java.math.BigDecimal("1.7500"),
        new java.math.BigDecimal("98765.4321")))
    }
  }

  test("MIN/MAX refuse: deletion vectors, statless columns, expressions") {
    withRule {
      val (t, path) = mkTable("metaminmaxno")
      val rel0 = spark.read.format("graft").load(path)
      // statless column: g has no manifest stats
      assert(!isMetadataOnly(rel0.agg(min(col("g")))))
      // expression over a column: not a bare attribute
      assert(!isMetadataOnly(rel0.agg(min(col("id") + 1))))
      // DVs: a hidden row may be the extreme — and the refusal takes
      // the MIXED aggregate with it (count alone would be answerable)
      t.deleteMoR(col("id") === 500L)
      val rel = spark.read.format("graft").load(path)
      val mixed = rel.agg(count(lit(1)).as("n"), max(col("id")).as("hi"))
      assert(!isMetadataOnly(mixed),
        mixed.queryExecution.optimizedPlan.toString)
      // and the scan answer reflects the delete the stats cannot see
      assert(mixed.head() == org.apache.spark.sql.Row(499L, 499L))
    }
  }

  test("count(col) answers from manifest null counts, exactly") {
    withRule {
      val path = Files.createTempDirectory("graft_metanull").toString + "/t"
      val t = SnapshotTable(spark, path, "id")
      // v null on every 3rd row, g never null, across two commits
      def rows(r: Range) = r.map(i => (i.toLong,
        if (i % 3 == 0) null else s"v$i", i % 7)).toDF("id", "v", "g")
      t.create(rows(1 to 300))
      t.append(rows(301 to 500))
      val rel = spark.read.format("graft").load(path)
      val df = rel.agg(count(col("v")).as("nv"), count(col("g")).as("ng"),
        count(lit(1)).as("n"))
      assert(isMetadataOnly(df), df.queryExecution.optimizedPlan.toString)
      val expected = (1 to 500).count(_ % 3 != 0).toLong
      assert(df.head() == org.apache.spark.sql.Row(expected, 500L, 500L))
      // DVs refuse: the manifest cannot know how many HIDDEN rows
      // were null — and the refusal takes the mixed list with it
      t.deleteMoR(col("id") % 10 === 3)
      val dvd = spark.read.format("graft").load(path)
        .agg(count(col("v")).as("nv"))
      assert(!isMetadataOnly(dvd), dvd.queryExecution.optimizedPlan.toString)
      // the scan answer stays correct with the rule installed
      assert(dvd.head().getLong(0) ==
        (1 to 500).count(i => i % 3 != 0 && i % 10 != 3).toLong)
    }
  }

  test("shapes a row count cannot answer keep their scans") {
    withRule {
      val (_, path) = mkTable("metacountno")
      val rel = spark.read.format("graft").load(path)
      // filtered, grouped, expression-typed, distinct — none may rewrite
      val kept = Seq(
        rel.filter(col("g") === 1).agg(count(lit(1))),
        rel.groupBy("g").agg(count(lit(1))),
        rel.agg(count(col("v") + 1)), // expression, not a bare column
        rel.agg(countDistinct(col("g"))),
        // one unanswerable aggregate keeps the WHOLE list on the scan
        rel.agg(count(lit(1)).as("n"), avg(col("id")).as("m")))
      kept.foreach { df =>
        assert(!isMetadataOnly(df),
          s"must not rewrite:\n${df.queryExecution.optimizedPlan}")
      }
      // and they still answer correctly with the rule installed
      assert(rel.filter(col("g") === 1).count() ==
        (1 to 500).count(_ % 7 == 1))
    }
  }

  test("partition-only filters refuse: consumed filters leave no Filter node") {
    withRule {
      // FileScanBuilder consumes partition filters EXACTLY (no
      // residual logical Filter), so a partition-pruned count reaches
      // the rule as a bare aggregate — a whole-table metadata answer
      // would silently drop the WHERE clause
      val path = Files.createTempDirectory("graft_metapart").toString + "/t"
      val t = SnapshotTable(spark, path, "id", Some("p"))
      t.create((1 to 300).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "p"))
      val df = spark.read.format("graft").load(path)
        .filter(col("p") === "p1").agg(count(lit(1)).as("n"))
      assert(!isMetadataOnly(df),
        s"partition-filtered count rewrote:\n${df.queryExecution.optimizedPlan}")
      assert(df.head().getLong(0) == 100L,
        "partition-filtered count must honor the WHERE clause")
      // the unfiltered count on the same partitioned table still
      // answers from metadata
      val full = spark.read.format("graft").load(path)
        .agg(count(lit(1)).as("n"))
      assert(isMetadataOnly(full))
      assert(full.head().getLong(0) == 300L)
    }
  }

  test("scans report the exact manifest row count to the planner") {
    // no rule needed: this is SupportsReportStatistics, consumed by
    // join-strategy/AQE sizing — exact rowCount beats a bytes guess
    val (t, path) = mkTable("metastats")
    def scanStats(df: DataFrame) =
      df.queryExecution.optimizedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => s.stats
      }.get
    val rel = spark.read.format("graft").load(path)
    assert(scanStats(rel).rowCount.contains(BigInt(500)))
    // DV cardinality subtracts from the reported count too
    t.deleteMoR(col("id") % 10 === 3)
    assert(scanStats(spark.read.format("graft").load(path))
      .rowCount.contains(BigInt(450)))
    // a PARTITION-pruned scan must not claim the whole-table count:
    // the pruned listing's size estimate is the honest one
    val ppath = Files.createTempDirectory("graft_metastatsp").toString + "/t"
    val pt = SnapshotTable(spark, ppath, "id", Some("p"))
    pt.create((1 to 300).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "p"))
    assert(scanStats(spark.read.format("graft").load(ppath))
      .rowCount.contains(BigInt(300)))
    val pruned = spark.read.format("graft").load(ppath)
      .filter(col("p") === "p1")
    assert(scanStats(pruned).rowCount.isEmpty,
      s"pruned scan claimed an exact whole-table count: ${scanStats(pruned)}")
  }

  test("exact count withdraws once the scan's row set narrows") {
    val (_, path) = mkTable("metastatsnarrow")
    val table = new GraftTable(spark, path)
    val scan = table.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().asInstanceOf[GraftScan]
    assert(scan.estimateStatistics().numRows.isPresent)
    // a streaming template delivers only commit deltas per batch; the
    // whole-table count would be off by orders of magnitude there
    scan.toMicroBatchStream(
      Files.createTempDirectory("graft_ckpt").toString)
    assert(!scan.estimateStatistics().numRows.isPresent,
      "streaming template still claims the whole-snapshot exact count")
    // runtime (DPP) narrowing likewise withdraws the claim
    val scan2 = new GraftTable(spark, path).newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().asInstanceOf[GraftScan]
    assert(scan2.estimateStatistics().numRows.isPresent)
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    scan2.filter(Array(new Predicate("=",
      Array(Expressions.column("id"),
        Expressions.literal(1L)))))
    assert(!scan2.estimateStatistics().numRows.isPresent,
      "runtime-narrowed scan still claims the whole-snapshot exact count")
  }

  test("count(col) never uses a stale null count after drop/re-add or rename") {
    withRule {
      import org.apache.spark.sql.types.{StructField, StructType, StringType}
      // id-mapped table: v null on every other row — old files record
      // a nonzero 'nulls:v' that must NOT survive the column's death
      val path = Files.createTempDirectory("graft_metanulldrop").toString + "/t"
      val t = SnapshotTable(spark, path, "id",
        tableProps = Map(SnapshotTable.MappingProp -> "id"))
      t.create((1 to 100).map(i => (i.toLong,
        if (i % 2 == 0) null else s"v$i", i)).toDF("id", "v", "u"))
      t.dropColumn("v")
      t.evolveTo(StructType(t.read.schema.fields :+
        StructField("v", StringType)))
      t.append(Seq((101L, 101, "fresh")).toDF("id", "u", "v"))
      // old files read all-NULL for the fresh field id; a stale
      // 'nulls:v' (50) would make the rule answer 100-50+1 = 51
      val df = spark.read.format("graft").load(path)
        .agg(count(col("v")).as("nv"))
      assert(df.head().getLong(0) == 1L,
        "stale null count survived DROP + re-ADD")
      // rename that reuses the old name: v2 -> v must not inherit the
      // dead v's stats either
      t.renameColumn("v", "v2")
      t.renameColumn("u", "v")
      val renamed = spark.read.format("graft").load(path)
        .agg(count(col("v")).as("nv"))
      assert(renamed.head().getLong(0) == 101L,
        "stale null count survived a rename into the old name")
    }
  }

  test("manifests predating row counts fall back to the scan") {
    import graft.plans.SnapshotTable.FileEntry
    val withRows = FileEntry("a.parquet",
      Map(FileEntry.RowsKey -> ("L:10", "L:0")))
    val old = FileEntry("b.parquet", Map.empty)
    assert(SnapshotTable.metadataRowCount(Seq(withRows)) == Some(10L))
    assert(SnapshotTable.metadataRowCount(Seq(withRows, old)).isEmpty)
    assert(SnapshotTable.metadataRowCount(Nil) == Some(0L))
  }

  test("manifests predating null counts refuse count(col)") {
    import graft.plans.SnapshotTable.FileEntry
    val full = FileEntry("a.parquet",
      Map(FileEntry.RowsKey -> ("L:10", "L:0"),
        FileEntry.nullsStat("v", 3L)))
    val noNulls = FileEntry("b.parquet",
      Map(FileEntry.RowsKey -> ("L:5", "L:0")))
    assert(SnapshotTable.metadataColumnCount(Seq(full), "v") == Some(7L))
    assert(SnapshotTable.metadataColumnCount(Seq(full, noNulls), "v").isEmpty,
      "one null-countless file must refuse the whole answer")
    assert(SnapshotTable.metadataColumnCount(Seq(full), "w").isEmpty,
      "an unrecorded column must refuse")
    assert(SnapshotTable.metadataColumnCount(Nil, "v") == Some(0L))
  }
}
