package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Conservative bound derivation from DML predicates: what is emitted,
  * what is refused, and that the derived boxes actually prune manifest
  * candidates. */
class PredicateBoundsSpec extends SparkSpec {

  import spark.implicits._

  test("comparison shapes derive the expected boxes") {
    assert(PredicateBounds.derive(col("k") === 5) == Seq(("k", 5, 5)))
    assert(PredicateBounds.derive(lit(5) === col("k")) == Seq(("k", 5, 5)))
    assert(PredicateBounds.derive(col("k") <=> 5) == Seq(("k", 5, 5)))
    assert(PredicateBounds.derive(col("k") > 10L) ==
      Seq(("k", 10L, Long.MaxValue)))
    assert(PredicateBounds.derive(col("k") <= 20) ==
      Seq(("k", Long.MinValue, 20)))
    assert(PredicateBounds.derive(lit(3) < col("k")) ==
      Seq(("k", 3, Long.MaxValue)))
    assert(PredicateBounds.derive(col("k") > 10 && col("k") <= 20) ==
      Seq(("k", 10, Long.MaxValue), ("k", Long.MinValue, 20)))
    assert(PredicateBounds.derive(col("x") < 2.5d) ==
      Seq(("x", Double.NegativeInfinity, 2.5d)))
    assert(PredicateBounds.derive(col("s") <= "m") == Seq(("s", "", "m")))
    // IN → the hull of its values
    assert(PredicateBounds.derive(col("k").isin(7, 3, 5)) ==
      Seq(("k", 3, 7)))
    // date/timestamp literals canonicalize into the one datetime unit
    // ("T:" micros); decimals keep their own scale (java BigDecimal)
    import SnapshotTable.FileEntry.{Micros, MicrosPerDay}
    val jun1 = java.sql.Date.valueOf("2020-06-01")
    val jun1us = Micros(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(jun1) *
        MicrosPerDay)
    assert(PredicateBounds.derive(col("d") === lit(jun1)) ==
      Seq(("d", jun1us, jun1us)))
    assert(PredicateBounds.derive(
      col("t") < lit(java.time.LocalDateTime.of(2020, 6, 1, 12, 30))) ==
      Seq(("t", Micros(Long.MinValue), Micros(
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .localDateTimeToMicros(
            java.time.LocalDateTime.of(2020, 6, 1, 12, 30))))))
    assert(PredicateBounds.derive(
      col("price") >= lit(new java.math.BigDecimal("12.34"))) ==
      Seq(("price", new java.math.BigDecimal("12.34"),
        new java.math.BigDecimal("1E+39"))))
    // conjunction with an opaque side keeps the transparent side
    val gated = udf(() => true)
    assert(PredicateBounds.derive(gated() && col("k") === 9) ==
      Seq(("k", 9, 9)))
  }

  test("unsound shapes derive NOTHING") {
    // OR: a row can satisfy either arm — no single box is implied
    assert(PredicateBounds.derive(col("k") === 1 || col("k") === 9).isEmpty)
    assert(PredicateBounds.derive(!(col("k") === 1)).isEmpty)
    // an upper-open STRING bound has no finite top — dropped
    assert(PredicateBounds.derive(col("s") >= "m").isEmpty)
    // arithmetic over the attribute is opaque
    assert(PredicateBounds.derive(col("k") % 2 === 0).isEmpty)
    // IN mixing literal families has no orderable hull
    assert(PredicateBounds.derive(col("k").isin(1, "x")).isEmpty)
  }

  test("deriveFor drops bounds whose column's type is in a different stat family") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("price", DecimalType(10, 2)),
      StructField("x", DoubleType), StructField("d", DateType),
      StructField("s", StringType)))
    def d(c: org.apache.spark.sql.Column) =
      PredicateBounds.deriveFor(c, Some(schema))
    // long column + int literal: same L family, kept
    assert(d(col("k") === 5) == Seq(("k", 5, 5)))
    assert(d(col("s") <= "m") == Seq(("s", "", "m")))
    // DECIMAL column + integral literal: legal SQL, but L-tagged
    // stats for a decimal column are UNSCALED — pruning on them would
    // silently skip matching rows. Must derive nothing.
    assert(d(col("price") < 10).isEmpty)
    assert(d(col("price") < 10.0).isEmpty)
    // double column + int literal: family mismatch (useless bound)
    assert(d(col("x") === 5).isEmpty)
    // a date column keeps DATETIME-family literals ("T:") and drops
    // plain-number ones — a bare Int is not provably days
    assert(d(col("d") === 18000).isEmpty)
    import SnapshotTable.FileEntry.{Micros, MicrosPerDay}
    assert(d(col("d") >= lit(java.sql.Date.valueOf("1970-01-03"))) ==
      Seq(("d", Micros(2 * MicrosPerDay), Micros(Long.MaxValue))))
    // a decimal column keeps decimal literals ("C:")
    assert(d(col("price") === lit(new java.math.BigDecimal("9.99"))) ==
      Seq(("price", new java.math.BigDecimal("9.99"),
        new java.math.BigDecimal("9.99"))))
    // unknown column or no schema: nothing
    assert(d(col("nope") === 1).isEmpty)
    assert(PredicateBounds.deriveFor(col("k") === 5, None).isEmpty)
  }

  test("point-predicate DML prunes with per-file blooms beyond min/max") {
    val path = Files.createTempDirectory("graft_pbbloom").toString + "/t"
    // ids INTERLEAVED across files so min/max ranges keep everything:
    // only the bloom can narrow a point delete
    val t = SnapshotTable(spark, path, "id",
      partitionCol = Some("part"), bloomCols = Seq("uid"),
      bloomExpectedItems = 1000L)
    t.create((1 to 400).map(i => (i, i * 37 % 1000, s"p${i % 4}"))
      .toDF("id", "uid", "part"))
    val probe = 37 * 123 % 1000 // exists in exactly one row (id=123)
    val rangeOnly = t.candidateFiles(("uid", probe, probe)).size
    val withBloom = t.candidateFilesEq(("uid", probe)).size
    assert(withBloom <= rangeOnly)
    assert(withBloom < t.candidateFiles().size,
      "bloom pruned nothing on an interleaved key")
    // the DELETE takes the same narrowed path (derived point box +
    // bloom) and stays exact
    val before = t.read.count()
    t.delete(col("uid") === probe)
    assert(t.read.count() == before - 1)
    assert(t.read.filter(col("uid") === probe).count() == 0)
  }

  test("readMatching prunes files from the predicate and stays exact") {
    val path = Files.createTempDirectory("graft_pbread").toString + "/t"
    val t = SnapshotTable(spark, path, "id",
      statsCols = Seq("id"), clusterBy = Seq("id"), clusterFiles = 8)
    t.create((1 to 400).map(i => (i, s"v$i")).toDF("id", "val"))
    val pruned = t.readMatching(col("id") > 350 && col("id") <= 380)
    assert(pruned.inputFiles.length < t.read.inputFiles.length,
      "predicate-pruned read planned every file")
    assert(pruned.orderBy("id").collect().map(_.getInt(0)).toSeq ==
      (351 to 380))
    // an unanalyzable predicate still answers correctly (no pruning)
    assert(t.readMatching(col("id") % 100 === 0).count() == 4)
    // all-pruned predicates return the typed empty frame, and it
    // LOOKS all-pruned: zero planned files, not read.limit(0)'s full
    // list (pruning checks must see the best case as pruned)
    val none = t.readMatching(col("id") > 1000)
    assert(none.count() == 0)
    assert(none.inputFiles.isEmpty,
      s"all-pruned read reports planned files: ${none.inputFiles.length}")
    assert(none.schema == t.read.schema)
  }

  test("derived boxes prune manifest candidates end-to-end") {
    val path = Files.createTempDirectory("graft_pbound").toString + "/t"
    val t = SnapshotTable(spark, path, "id",
      statsCols = Seq("id"), clusterBy = Seq("id"), clusterFiles = 8)
    t.create((1 to 400).map(i => (i, s"v$i")).toDF("id", "val"))
    val all = t.candidateFiles().size
    val box = PredicateBounds.derive(col("id") <= 50)
    val pruned = t.candidateFiles(box: _*).size
    assert(pruned < all, s"derived box pruned nothing ($pruned of $all)")
    // and the DELETE itself stays correct with the auto-derived box
    t.delete(col("id") <= 50)
    assert(t.read.count() == 350)
    assert(t.read.agg(min("id")).head.getInt(0) == 51)
  }
}
