package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.SnapshotTable

/** Morton interleave correctness and the property that justifies the
  * operator: under a box predicate, z-order clustering prunes files on
  * BOTH dimensions while a linear sort prunes only its leading one. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zValue interleaves bits: bit b of column i lands at b*k+i") {
    // frame [0,3] with bits=2 makes bucket == raw value
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (3, 3))
      .toDF("x", "y")
    val z = df.select(ZOrder.zValue(
      Seq((col("x"), 0.0, 3.0), (col("y"), 0.0, 3.0)), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x bit b -> 2b, y bit b -> 2b+1
    assert(z == Seq(0L, 1L, 2L, 3L, 14L, 15L))
  }

  test("box predicate: z-order prunes where a linear sort cannot") {
    val n = 4096
    // two independent uniform dims — the adversarial case for linear sort
    val data = spark.range(n.toLong).select(
      (col("id") * 2654435761L % n).as("x"),
      (col("id") * 40503L % n).as("y"))
    def build(tag: String, df: org.apache.spark.sql.DataFrame) = {
      val t = SnapshotTable(spark,
        Files.createTempDirectory(s"graft_$tag").toString + "/t", "x",
        statsCols = Seq("x", "y"))
      t.create(df)
      t
    }
    val zt = build("zbox", ZOrder.cluster(data, Seq("x", "y"), numFiles = 16))
    val lt = build("lbox", data.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x"))
    val box = Seq(("x", 0L, (n / 4).toLong), ("y", 0L, (n / 4).toLong))
    val (zTotal, lTotal) = (zt.candidateFiles().size, lt.candidateFiles().size)
    assert(zTotal >= 8 && lTotal >= 8, s"expected ~16 files, got $zTotal/$lTotal")
    // y-only filter: linear-by-x can never prune, z-order must
    val yOnly = ("y", 0L, (n / 4).toLong)
    assert(lt.candidateFiles(yOnly).size == lTotal, "x-sorted files should all overlap y")
    assert(zt.candidateFiles(yOnly).size < zTotal, "z-order failed to prune on y")
    // the 2-dim box prunes harder than either engine's single dim
    assert(zt.candidateFiles(box: _*).size < zTotal / 2,
      "z-order box pruning too weak")
    // and the pruned read is still exact
    val expected = data.filter(col("x") <= n / 4 && col("y") <= n / 4).count()
    assert(zt.readWhere(box: _*).count() == expected)
    assert(lt.readWhere(box: _*).count() == expected)
  }

  test("date × key z-order: both dimensions prune via the T:/L: stats") {
    val n = 4096
    val day0 = java.time.LocalDate.of(2021, 1, 1)
    val toDate = udf((i: Long) => java.sql.Date.valueOf(day0.plusDays(i)))
    // independent uniform date and key dims, as a sessions table would be
    val data = spark.range(n.toLong).select(
      toDate(col("id") * 2654435761L % 365).as("d"),
      (col("id") * 40503L % n).as("k"),
      col("id"))
    val t = SnapshotTable(spark,
      Files.createTempDirectory("graft_zdate").toString + "/t", "id",
      statsCols = Seq("d", "k"))
    t.create(ZOrder.cluster(data, Seq("d", "k"), numFiles = 16))
    val total = t.candidateFiles().size
    assert(total >= 8, s"expected ~16 files, got $total")
    val dBox = ("d", java.sql.Date.valueOf(day0),
      java.sql.Date.valueOf(day0.plusDays(90)))
    val kBox = ("k", 0L, (n / 4).toLong)
    assert(t.candidateFiles(dBox).size < total, "no date-dim pruning")
    assert(t.candidateFiles(kBox).size < total, "no key-dim pruning")
    val expected = data.filter(
      col("d") <= lit(java.sql.Date.valueOf(day0.plusDays(90))) &&
        col("k") <= n / 4).count()
    assert(t.readWhere(dBox, kBox).count() == expected)
  }
}
