package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Incremental materialized aggregates: additive fold from the change
  * feed, dirty-group recompute for non-additive measures, exactly-once
  * watermarking, group deletion, and the O(changes) cost contract. */
class MaterializedAggSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString

  private def mkSrc(path: String): SnapshotTable =
    SnapshotTable(spark, s"$path/src", "id", Some("grp"))

  /** Views cluster by their synthesized key: the refresh merge is then
    * stats-scoped to the files holding touched groups — the same
    * O(touched) contract as any clustered upsert. */
  private def mkView(path: String): SnapshotTable =
    SnapshotTable(spark, s"$path/view", MaterializedAgg.KeyCol,
      statsCols = Seq(MaterializedAgg.KeyCol),
      clusterBy = Seq(MaterializedAgg.KeyCol), clusterFiles = 4)

  private def rows(t: (Int, Int, String)*) =
    t.toDF("id", "amount", "grp")

  private def viewState(v: SnapshotTable): Map[String, (Long, Long)] =
    v.read.collect().map(r => r.getAs[String]("grp") ->
      (r.getAs[Long]("total"), r.getAs[Long](MaterializedAgg.CountCol)))
      .toMap

  /** Full recompute the MV should equal after any refresh. */
  private def expected(src: SnapshotTable): Map[String, (Long, Long)] =
    src.read.groupBy("grp")
      .agg(sum("amount").as("t"), count(lit(1)).as("c"))
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("t"), r.getAs[Long]("c"))).toMap

  private val sums = Seq("total" -> col("amount").cast("long"))

  test("additive: create, fold updates+inserts+deletes, drop emptied groups") {
    val base = tmp("mvadd")
    val src = mkSrc(base); val view = mkView(base)
    src.create(rows((1, 10, "a"), (2, 20, "a"), (3, 5, "b"), (4, 7, "c")))
    MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    assert(viewState(view) == expected(src))
    assert(view.properties(MaterializedAgg.SourceVersionProp) == "1")

    // update (2: 20→25), insert (5 into b), then empty group c entirely
    src.upsert(rows((2, 25, "a"), (5, 3, "b")))
    src.delete(col("grp") === "c")
    MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    assert(viewState(view) == expected(src))
    assert(!viewState(view).contains("c"), "emptied group must leave the view")
    assert(view.properties(MaterializedAgg.SourceVersionProp) == "3")

    // re-refresh with nothing new: version AND watermark unchanged
    val vBefore = view.currentVersion
    MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    assert(view.currentVersion == vBefore, "no-op refresh must not commit")
  }

  test("additive: a refresh spanning a source-widening commit folds " +
      "narrow and wide change images exactly") {
    import org.apache.spark.sql.types.LongType
    val base = tmp("mvwiden")
    val src = mkSrc(base); val view = mkView(base)
    src.create(rows((1, 10, "a"), (2, 20, "a"), (3, 5, "b"))) // int amount
    MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    assert(viewState(view) == expected(src))
    // widen the measure column mid-history, then land values beyond the
    // narrow range; one refresh folds the span that crosses the
    // widening commit — narrow before-images against wide after-images
    src.widenColumn("amount", LongType)
    src.upsert(Seq((2, 1L << 40, "a"), (4, 7L, "c"))
      .toDF("id", "amount", "grp"))
    MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    assert(viewState(view) == expected(src))
    assert(viewState(view)("a")._1 == 10L + (1L << 40))
  }

  test("additive: compaction-only source churn folds to zero group changes") {
    val base = tmp("mvcompact")
    val src = mkSrc(base); val view = mkView(base)
    src.create(rows((1, 1, "a"), (2, 2, "a")))
    src.append(rows((3, 3, "b")))
    MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    val stateBefore = viewState(view)
    src.compact(minFiles = 2) // rewrites files, changes no rows
    MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    assert(viewState(view) == stateBefore)
    // the watermark still advanced past the compaction commit
    assert(view.properties(MaterializedAgg.SourceVersionProp) ==
      src.currentVersion.get.toString)
  }

  test("additive: NULL group keys and null measures fold correctly") {
    val base = tmp("mvnull")
    val src = mkSrc(base); val view = mkView(base)
    src.create(Seq((1, Some(10), None: Option[String]),
      (2, None, Some("a")), (3, Some(4), Some("a")))
      .toDF("id", "amount", "grp"))
    MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    val st = view.read.collect().map(r =>
      Option(r.getAs[String]("grp")) ->
        (r.getAs[Long]("total"), r.getAs[Long](MaterializedAgg.CountCol)))
      .toMap
    assert(st == Map(None -> (10L, 1L), Some("a") -> (4L, 2L)))
    // delete the null-group row: the NULL group must empty out
    src.delete(col("grp").isNull)
    MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    assert(view.read.filter(col("grp").isNull).count() == 0)
  }

  test("recompute: min/max stay exact under deletes; vanished groups leave") {
    val base = tmp("mvminmax")
    val src = mkSrc(base)
    val view = mkView(base)
    val aggs = Seq("lo" -> min(col("amount")), "hi" -> max(col("amount")))
    src.create(rows((1, 10, "a"), (2, 20, "a"), (3, 5, "b")))
    MaterializedAgg.refreshRecompute(src, view, Seq("grp"), aggs)
    def st() = view.read.collect().map(r => r.getAs[String]("grp") ->
      (r.getAs[Int]("lo"), r.getAs[Int]("hi"))).toMap
    assert(st() == Map("a" -> ((10, 20)), "b" -> ((5, 5))))
    // delete the max of a — an ADDITIVE fold could never recover this
    src.delete(col("id") === 2)
    src.delete(col("grp") === "b") // vanish b entirely
    MaterializedAgg.refreshRecompute(src, view, Seq("grp"), aggs)
    assert(st() == Map("a" -> ((10, 10))))
    // untouched groups are NOT recomputed: seed a new group, refresh,
    // and confirm the a-row's file carried over by reference
    src.append(rows((9, 1, "z")))
    val before = view.candidateFiles().map(_.path).toSet
    MaterializedAgg.refreshRecompute(src, view, Seq("grp"), aggs)
    val after = view.candidateFiles().map(_.path).toSet
    assert((before & after).nonEmpty,
      "refresh rewrote untouched groups' files — not O(changed groups)")
    assert(st() == Map("a" -> ((10, 10)), "z" -> ((1, 1))))
  }

  test("defined views refresh from their logged definition alone") {
    val base = tmp("mvdef")
    val src = mkSrc(base); val view = mkView(base)
    src.create(rows((1, 10, "a"), (2, 20, "b")))
    MaterializedAgg.defineAdditive(src, view, Seq("grp"),
      Seq("total" -> "CAST(amount AS BIGINT)"))
    assert(viewState(view) == expected(src))
    // mutate, then refresh through a handle that knows NOTHING but
    // the view path — definition comes from the logged properties
    src.upsert(rows((3, 7, "a")))
    src.delete(col("grp") === "b")
    val bare = SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol)
    MaterializedAgg.refreshByDefinition(bare)
    assert(viewState(view) == expected(src))
    // a view with no definition refuses
    val base2 = tmp("mvdef2")
    val src2 = mkSrc(base2); val view2 = mkView(base2)
    src2.create(rows((1, 1, "a")))
    MaterializedAgg.refreshAdditive(src2, view2, Seq("grp"), sums)
    val e = intercept[IllegalStateException] {
      MaterializedAgg.refreshByDefinition(view2)
    }
    assert(e.getMessage.contains("not a DEFINED materialized view"))
    // recompute-mode definitions round-trip too
    val base3 = tmp("mvdef3")
    val src3 = mkSrc(base3); val view3 = mkView(base3)
    src3.create(rows((1, 10, "a"), (2, 20, "a")))
    MaterializedAgg.defineRecompute(src3, view3, Seq("grp"),
      Seq("hi" -> "max(amount)"))
    src3.delete(col("id") === 2)
    MaterializedAgg.refreshByDefinition(
      SnapshotTable(spark, s"$base3/view", MaterializedAgg.KeyCol))
    assert(view3.read.select("hi").head.getInt(0) == 10)
  }

  test("watermark safety: missing prop and ahead-of-head both fail loudly") {
    val base = tmp("mvguard")
    val src = mkSrc(base); val view = mkView(base)
    src.create(rows((1, 1, "a")))
    // a view NOT created through refresh: refuses to fold onto it
    view.create(Seq(("k", "a", 1L, 1L))
      .toDF(MaterializedAgg.KeyCol, "grp", "total", MaterializedAgg.CountCol))
    val e1 = intercept[IllegalStateException] {
      MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    }
    assert(e1.getMessage.contains("not a maintained view"))
    // watermark ahead of source head (source recreated): fail loudly
    val base2 = tmp("mvahead")
    val src2 = mkSrc(base2); val view2 = mkView(base2)
    src2.create(rows((1, 1, "a"))); src2.append(rows((2, 2, "a")))
    MaterializedAgg.refreshAdditive(src2, view2, Seq("grp"), sums)
    val src2b = SnapshotTable(spark,
      s"${tmp("mvfresh")}/src", "id", Some("grp"))
    src2b.create(rows((9, 9, "z"))) // head v1 < watermark v2
    val e2 = intercept[IllegalStateException] {
      MaterializedAgg.refreshAdditive(src2b, view2, Seq("grp"), sums)
    }
    assert(e2.getMessage.contains("ahead of source head"))
  }

  // ---- star-join views ------------------------------------------------

  private def mkFact(path: String): SnapshotTable =
    SnapshotTable(spark, s"$path/fact", "id", Some("grp"))

  private def mkDim(path: String): SnapshotTable =
    SnapshotTable(spark, s"$path/dim", "fk")

  private def factRows(t: (Int, Int, Int)*) =
    t.toDF("id", "amount", "fk").withColumn("grp", col("fk").cast("string"))

  /** Star recompute the join view should equal after any refresh. */
  private def starExpected(fact: SnapshotTable, dim: SnapshotTable)
      : Map[String, (Long, Long)] =
    fact.read.join(dim.read, "fk").groupBy("name")
      .agg(sum("amount").as("t"), count(lit(1)).as("c"))
      .collect().map(r => r.getAs[String]("name") ->
        (r.getAs[Long]("t"), r.getAs[Long]("c"))).toMap

  private def starState(v: SnapshotTable): Map[String, (Long, Long)] =
    v.read.collect().map(r => r.getAs[String]("name") ->
      (r.getAs[Long]("total"), r.getAs[Long](MaterializedAgg.CountCol)))
      .toMap

  test("additive join: star fold, dim pinning, emptied groups, dim-change fold") {
    val base = tmp("mvjoin")
    val fact = mkFact(base); val dim = mkDim(base); val view = mkView(base)
    dim.create(Seq((1, "x"), (2, "y"), (3, "z")).toDF("fk", "name"))
    val dims = Seq(MaterializedAgg.DimSpec(dim, "fk", "fk"))
    // NB: factKey and dimKey share the name "fk" — the dim-side copy is
    // dropped after the join, so grouping/summing stays unambiguous
    fact.create(factRows((1, 10, 1), (2, 20, 1), (3, 5, 2), (4, 7, 3)))
    MaterializedAgg.refreshAdditiveJoin(fact, dims, view, Seq("name"), sums)
    assert(starState(view) == starExpected(fact, dim))
    assert(view.properties(MaterializedAgg.dimVersionProp(0)) == "1",
      "dim version must be pinned on the view")
    // catch-up span: update + insert + empty group z entirely
    fact.upsert(factRows((2, 25, 1), (5, 3, 2)))
    fact.delete(col("fk") === 3)
    MaterializedAgg.refreshAdditiveJoin(fact, dims, view, Seq("name"), sums)
    assert(starState(view) == starExpected(fact, dim))
    assert(!starState(view).contains("z"), "emptied group must leave the view")
    // a dim ATTRIBUTE change (SCD overwrite, y -> y2): the whole
    // group must MOVE — every fk=2 fact row leaves "y" and lands in
    // "y2" — with no fact span at all
    dim.upsert(Seq((2, "y2")).toDF("fk", "name"))
    MaterializedAgg.refreshAdditiveJoin(fact, dims, view, Seq("name"), sums)
    assert(starState(view) == starExpected(fact, dim))
    assert(!starState(view).contains("y") && starState(view).contains("y2"),
      s"dim rename must move the group: ${starState(view)}")
    assert(view.properties(MaterializedAgg.dimVersionProp(0)) == "2",
      "dim pin must advance with the fold")
    // fact AND dim change in the SAME span: both terms of the delta
    // expansion fold into one commit
    fact.upsert(factRows((6, 100, 1), (7, 11, 2)))
    dim.upsert(Seq((1, "x2")).toDF("fk", "name"))
    MaterializedAgg.refreshAdditiveJoin(fact, dims, view, Seq("name"), sums)
    assert(starState(view) == starExpected(fact, dim))
    // dim-KEY delete: fk=2 facts orphan out of the view entirely
    dim.delete(col("fk") === 2)
    MaterializedAgg.refreshAdditiveJoin(fact, dims, view, Seq("name"), sums)
    assert(starState(view) == starExpected(fact, dim))
    assert(!starState(view).contains("y2"),
      "orphaned facts must leave the view with their deleted dim")
    // a view folded to EMPTY keeps its pins: deleting every dim row
    // empties the view, and a later dim re-add must fold the owed
    // span — a row-presence pin proxy would silently reset the pins
    // and no-op here forever
    dim.delete(lit(true))
    MaterializedAgg.refreshAdditiveJoin(fact, dims, view, Seq("name"), sums)
    assert(starState(view).isEmpty, "all facts orphaned -> empty view")
    dim.upsert(Seq((1, "xr")).toDF("fk", "name"))
    MaterializedAgg.refreshAdditiveJoin(fact, dims, view, Seq("name"), sums)
    assert(starState(view) == starExpected(fact, dim))
    assert(starState(view).contains("xr"),
      s"re-added dim must repopulate the emptied view: ${starState(view)}")
    // a plain additive view refuses a JOIN refresh (no dim pins logged)
    val base2 = tmp("mvjoin2")
    val src2 = mkSrc(base2); val view2 = mkView(base2)
    src2.create(rows((1, 1, "a")))
    MaterializedAgg.refreshAdditive(src2, view2, Seq("grp"), sums)
    src2.append(rows((2, 2, "a")))
    val dim2 = mkDim(base2)
    dim2.create(Seq((1, "x")).toDF("fk", "name"))
    val e2 = intercept[IllegalStateException] {
      MaterializedAgg.refreshAdditiveJoin(src2,
        Seq(MaterializedAgg.DimSpec(dim2, "id", "fk")), view2,
        Seq("name"), sums)
    }
    assert(e2.getMessage.contains("not an additive JOIN view"), e2.getMessage)
  }

  test("snowflake chain: changes anywhere in the dim chain fold exactly") {
    val base = tmp("mvsnow")
    val fact = mkFact(base)
    // chain: fact.fk -> mid.fk (carries gk) -> leaf.gk (carries name)
    val mid = SnapshotTable(spark, s"$base/mid", "fk")
    val leaf = SnapshotTable(spark, s"$base/leaf", "gk")
    val view = mkView(base)
    mid.create(Seq((1, 10), (2, 10), (3, 20)).toDF("fk", "gk"))
    leaf.create(Seq((10, "north"), (20, "south")).toDF("gk", "name"))
    val dims = Seq(
      MaterializedAgg.DimSpec(mid, "fk", "fk"),
      MaterializedAgg.DimSpec(leaf, "gk", "gk"))
    def recompute(): Map[String, (Long, Long)] =
      fact.read.join(mid.read, "fk").join(leaf.read, "gk").groupBy("name")
        .agg(sum(col("amount").cast("long")).as("t"), count(lit(1)).as("c"))
        .collect().map(r => r.getAs[String]("name") ->
          (r.getAs[Long]("t"), r.getAs[Long]("c"))).toMap
    fact.create(factRows((1, 5, 1), (2, 6, 2), (3, 7, 3), (4, 8, 3)))
    MaterializedAgg.refreshAdditiveJoin(fact, dims, view, Seq("name"), sums)
    assert(starState(view) == recompute())
    // MID-chain change: fk=2 moves region 10 -> 20. The delta term for
    // `mid` cannot prune the fact up front (it can) — but the LEAF term
    // shape (factKey gk lives on mid, not the fact) is exercised below
    mid.upsert(Seq((2, 20)).toDF("fk", "gk"))
    MaterializedAgg.refreshAdditiveJoin(fact, dims, view, Seq("name"), sums)
    assert(starState(view) == recompute())
    // LEAF change (factKey is a MID column — the no-up-front-prune
    // path) plus a concurrent fact insert, folded in one span
    leaf.upsert(Seq((20, "south2")).toDF("gk", "name"))
    fact.append(factRows((5, 9, 1)))
    MaterializedAgg.refreshAdditiveJoin(fact, dims, view, Seq("name"), sums)
    assert(starState(view) == recompute())
    assert(starState(view).contains("south2") &&
      !starState(view).contains("south"))
    // all three tables changing at once: three expansion terms, one commit
    fact.delete(col("fk") === 1)
    mid.upsert(Seq((3, 10)).toDF("fk", "gk"))
    leaf.upsert(Seq((10, "north2")).toDF("gk", "name"))
    MaterializedAgg.refreshAdditiveJoin(fact, dims, view, Seq("name"), sums)
    assert(starState(view) == recompute())
  }

  test("recompute join: non-additive star aggregates under fact deletes, " +
      "SCD moves, and dim-key deletes") {
    val base = tmp("mvrjoin")
    val fact = mkFact(base); val dim = mkDim(base); val view = mkView(base)
    dim.create(Seq((1, "x"), (2, "y"), (3, "z")).toDF("fk", "name"))
    val dims = Seq(MaterializedAgg.DimSpec(dim, "fk", "fk"))
    val aggs = Seq("lo" -> min(col("amount")), "hi" -> max(col("amount")))
    def recompute(): Map[String, (Int, Int, Long)] =
      fact.read.join(dim.read, "fk").groupBy("name")
        .agg(min("amount").as("lo"), max("amount").as("hi"),
          count(lit(1)).as("c"))
        .collect().map(r => r.getAs[String]("name") ->
          ((r.getAs[Int]("lo"), r.getAs[Int]("hi"), r.getAs[Long]("c"))))
        .toMap
    def st(): Map[String, (Int, Int, Long)] =
      view.read.collect().map(r => r.getAs[String]("name") ->
        ((r.getAs[Int]("lo"), r.getAs[Int]("hi"),
          r.getAs[Long](MaterializedAgg.CountCol)))).toMap
    fact.create(factRows((1, 10, 1), (2, 20, 1), (3, 5, 2), (4, 7, 3)))
    MaterializedAgg.refreshRecomputeJoin(fact, dims, view, Seq("name"), aggs)
    assert(st() == recompute())
    assert(view.properties(MaterializedAgg.dimVersionProp(0)) == "1",
      "dim version must be pinned on the view")
    // delete the MAX of group x — the invariant no additive fold can
    // recover: the group must recompute down to its surviving rows
    fact.delete(col("id") === 2)
    MaterializedAgg.refreshRecomputeJoin(fact, dims, view, Seq("name"), aggs)
    assert(st() == recompute())
    assert(st()("x") == ((10, 10, 1L)),
      s"deleted max must lower the group's hi: ${st()}")
    // SCD move: fk=1 facts move x -> x2. BOTH sides must dirty — the
    // OLD group (x) empties out of the view, the NEW group (x2)
    // appears with the moved facts' extremes
    dim.upsert(Seq((1, "x2")).toDF("fk", "name"))
    MaterializedAgg.refreshRecomputeJoin(fact, dims, view, Seq("name"), aggs)
    assert(st() == recompute())
    assert(!st().contains("x") && st().contains("x2"),
      s"SCD move must dirty old AND new groups: ${st()}")
    // dim-KEY delete: fk=2 facts orphan out of the inner join — the
    // group recomputes to zero rows and leaves the view
    dim.delete(col("fk") === 2)
    MaterializedAgg.refreshRecomputeJoin(fact, dims, view, Seq("name"), aggs)
    assert(st() == recompute())
    assert(!st().contains("y"),
      s"deleted dim key must empty its group: ${st()}")
    // fact delete emptying a whole group: every fk=3 row goes — the
    // dirty key's recompute finds no rows and deletes the group
    fact.delete(col("fk") === 3)
    MaterializedAgg.refreshRecomputeJoin(fact, dims, view, Seq("name"), aggs)
    assert(st() == recompute())
    assert(!st().contains("z"),
      s"group-emptying fact delete must leave the view: ${st()}")
    // fact AND dim churn in ONE catch-up span: both expansion terms
    // contribute dirty keys, one commit
    fact.upsert(factRows((5, 50, 1), (6, 2, 1)))
    dim.upsert(Seq((1, "x3")).toDF("fk", "name"))
    MaterializedAgg.refreshRecomputeJoin(fact, dims, view, Seq("name"), aggs)
    assert(st() == recompute())
    assert(st()("x3") == ((2, 50, 3L)), st().toString)
    // no-op refresh: neither version nor watermark moves
    val vBefore = view.currentVersion
    MaterializedAgg.refreshRecomputeJoin(fact, dims, view, Seq("name"), aggs)
    assert(view.currentVersion == vBefore, "no-op refresh must not commit")
    // compaction-only fact churn NETS to zero dirty keys: the
    // watermark advances as metadata, no group recomputes
    val stBefore = st()
    val filesBefore = view.candidateFiles().map(_.path).toSet
    fact.compact(minFiles = 2)
    MaterializedAgg.refreshRecomputeJoin(fact, dims, view, Seq("name"), aggs)
    assert(st() == stBefore)
    assert(view.candidateFiles().map(_.path).toSet == filesBefore,
      "rewrite-only fact churn must not rewrite any view file")
    assert(view.properties(MaterializedAgg.SourceVersionProp) ==
      fact.currentVersion.get.toString)
  }

  test("recompute join tolerates a fact/dim shared non-key column name") {
    // DimSpec documents fact/dim name-disjointness, but a contract
    // slip on a NON-key column must not die in an ambiguous-reference
    // error inside the dirty-key netting — positions disambiguate
    // exactly where names cannot
    val base = tmp("mvrjdup")
    val fact = SnapshotTable(spark, s"$base/fact", "id")
    fact.create(Seq((1, 10, 1, "ft"), (2, 20, 1, "ft"), (3, 5, 2, "ft"))
      .toDF("id", "amount", "fk", "tag"))
    val dim = SnapshotTable(spark, s"$base/dim", "fk")
    dim.create(Seq((1, "x", "dt"), (2, "y", "dt"))
      .toDF("fk", "name", "tag")) // "tag" collides with the fact's
    val view = mkView(base)
    val dims = Seq(MaterializedAgg.DimSpec(dim, "fk", "fk"))
    val aggs = Seq("hi" -> max(col("amount")))
    def st(): Map[String, Int] =
      view.read.collect().map(r =>
        r.getAs[String]("name") -> r.getAs[Int]("hi")).toMap
    MaterializedAgg.refreshRecomputeJoin(fact, dims, view, Seq("name"), aggs)
    assert(st() == Map("x" -> 20, "y" -> 5))
    fact.delete(col("id") === 2) // x's max vanishes; netting must run
    MaterializedAgg.refreshRecomputeJoin(fact, dims, view, Seq("name"), aggs)
    assert(st() == Map("x" -> 10, "y" -> 5))
  }

  test("defined recompute-join views refresh by definition and " +
      "stream-maintain") {
    val base = tmp("mvrjdef")
    val fact = mkFact(base); val dim = mkDim(base); val view = mkView(base)
    dim.create(Seq((1, "x"), (2, "y")).toDF("fk", "name"))
    val dims = Seq(MaterializedAgg.DimSpec(dim, "fk", "fk"))
    def recompute(): Map[String, (Int, Long)] =
      fact.read.join(dim.read, "fk").groupBy("name")
        .agg(max("amount").as("hi"), count(lit(1)).as("c"))
        .collect().map(r => r.getAs[String]("name") ->
          ((r.getAs[Int]("hi"), r.getAs[Long]("c")))).toMap
    def st(): Map[String, (Int, Long)] =
      view.read.collect().map(r => r.getAs[String]("name") ->
        ((r.getAs[Int]("hi"),
          r.getAs[Long](MaterializedAgg.CountCol)))).toMap
    fact.create(factRows((1, 10, 1), (2, 20, 1), (3, 5, 2)))
    MaterializedAgg.defineRecomputeJoin(fact, dims, view, Seq("name"),
      Seq("hi" -> "max(amount)"))
    assert(st() == recompute())
    // refresh through a handle that knows NOTHING but the view path:
    // mode recomputeJoin dispatches off the logged definition
    fact.delete(col("id") === 2) // x's max vanishes
    dim.upsert(Seq((2, "y2")).toDF("fk", "name")) // SCD move
    MaterializedAgg.refreshByDefinition(
      SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol))
    assert(st() == recompute())
    assert(st()("x") == ((10, 1L)) && st().contains("y2") &&
      !st().contains("y"), st().toString)
    // STREAMING maintenance, same handle-only contract: the fact feed
    // drives dirty-key recompute, a dim-only residue catches up after
    fact.upsert(factRows((4, 99, 2), (5, 1, 1)))
    graft.streaming.StreamingView.maintainByDefinition(
      SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol),
      s"$base/ckpt")
    assert(st() == recompute())
    assert(st()("y2") == ((99, 2L)), st().toString)
    // dim-ONLY span (fact stream silent): the catch-up covers it
    dim.upsert(Seq((1, "x2")).toDF("fk", "name"))
    graft.streaming.StreamingView.maintainByDefinition(
      SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol),
      s"$base/ckpt")
    assert(st() == recompute())
    assert(st().contains("x2") && !st().contains("x"), st().toString)
    // replay safety: a maintain with nothing new commits nothing
    val v0 = view.currentVersion
    graft.streaming.StreamingView.maintainByDefinition(
      SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol),
      s"$base/ckpt")
    assert(view.currentVersion == v0, "no-op maintain must not commit")
  }

  test("defined join views refresh by definition and stream-maintain") {
    val base = tmp("mvjoindef")
    val fact = mkFact(base); val dim = mkDim(base); val view = mkView(base)
    dim.create(Seq((1, "x"), (2, "y")).toDF("fk", "name"))
    val dims = Seq(MaterializedAgg.DimSpec(dim, "fk", "fk"))
    fact.create(factRows((1, 10, 1), (2, 5, 2)))
    MaterializedAgg.defineAdditiveJoin(fact, dims, view, Seq("name"),
      Seq("total" -> "CAST(amount AS BIGINT)"))
    assert(starState(view) == starExpected(fact, dim))
    // refresh through a handle that knows nothing but the view path
    fact.upsert(factRows((3, 7, 1)))
    fact.delete(col("fk") === 2)
    MaterializedAgg.refreshByDefinition(
      SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol))
    assert(starState(view) == starExpected(fact, dim))
    // STREAMING maintenance, same handle-only contract: fact churn
    // and a dim change land together, the fact stream drives the fold
    fact.upsert(factRows((4, 20, 2), (1, 11, 1)))
    dim.upsert(Seq((1, "x2")).toDF("fk", "name"))
    graft.streaming.StreamingView.maintainByDefinition(
      SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol),
      s"$base/ckpt")
    assert(starState(view) == starExpected(fact, dim))
    assert(starState(view).contains("x2") && !starState(view).contains("x"),
      s"streamed dim change must move the group: ${starState(view)}")
    // dim-ONLY span (fact stream silent): the catch-up fold covers it
    dim.upsert(Seq((2, "y2")).toDF("fk", "name"))
    graft.streaming.StreamingView.maintainByDefinition(
      SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol),
      s"$base/ckpt")
    assert(starState(view) == starExpected(fact, dim))
    assert(starState(view).contains("y2"), starState(view).toString)
    // replay safety: a THIRD maintain with nothing new commits nothing
    val v0 = view.currentVersion
    graft.streaming.StreamingView.maintainByDefinition(
      SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol),
      s"$base/ckpt")
    assert(view.currentVersion == v0, "no-op maintain must not commit")
  }

  test("broadcast fallback: over-threshold changed-group sets shuffle, same result") {
    try {
      spark.conf.set("graft.mv.broadcastMaxGroups", "5")
      val base = tmp("mvbigdelta")
      val src = mkSrc(base); val view = mkView(base)
      src.create((1 to 200).map(i => (i, i, s"g${i % 40}"))
        .toDF("id", "amount", "grp"))
      MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
      // catch-up span dirtying all 40 groups — far past the 5-group cap
      src.upsert((1 to 200).map(i => (i, i * 2, s"g${i % 40}"))
        .toDF("id", "amount", "grp"))
      MaterializedAgg.broadcastDecisions.clear()
      MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
      val mergeDecisions = MaterializedAgg.broadcastDecisions.toArray
        .map(_.asInstanceOf[(String, Long, Boolean)])
        .filter(_._1.startsWith("merge."))
      assert(mergeDecisions.nonEmpty)
      assert(mergeDecisions.forall(d => !d._3 && d._2 == 40L),
        s"over-cap delta still broadcast: ${mergeDecisions.mkString(", ")}")
      assert(viewState(view) == expected(src))
      // recompute path: all 40 groups dirty on a CATCH-UP span (the
      // initial fold takes the no-dirty-set materialization fast path
      // and logs no decisions) → both its joins shuffle too
      val base2 = tmp("mvbigdirty")
      val src2 = mkSrc(base2); val view2 = mkView(base2)
      val aggs = Seq("hi" -> max(col("amount")))
      src2.create((1 to 200).map(i => (i, i, s"g${i % 40}"))
        .toDF("id", "amount", "grp"))
      MaterializedAgg.refreshRecompute(src2, view2, Seq("grp"), aggs)
      src2.upsert((1 to 200).map(i => (i, i * 3, s"g${i % 40}"))
        .toDF("id", "amount", "grp"))
      MaterializedAgg.broadcastDecisions.clear()
      MaterializedAgg.refreshRecompute(src2, view2, Seq("grp"), aggs)
      val recompute = MaterializedAgg.broadcastDecisions.toArray
        .map(_.asInstanceOf[(String, Long, Boolean)])
        .filter(_._1.startsWith("recompute."))
      assert(recompute.nonEmpty && recompute.forall(!_._3),
        s"over-cap dirty set still broadcast: ${recompute.mkString(", ")}")
      assert(view2.read.count() == 40)
      assert(view2.read.filter(col("grp") === "g1").select("hi")
        .head.getInt(0) == 161 * 3, "catch-up recompute folded wrong")
      // back under the cap: a small delta broadcasts again
      spark.conf.set("graft.mv.broadcastMaxGroups", "1000")
      src.upsert(rows((1, 999, "g1")))
      MaterializedAgg.broadcastDecisions.clear()
      MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
      val small = MaterializedAgg.broadcastDecisions.toArray
        .map(_.asInstanceOf[(String, Long, Boolean)])
        .filter(_._1.startsWith("merge."))
      assert(small.nonEmpty && small.forall(_._3),
        s"steady-state delta no longer broadcasts: ${small.mkString(", ")}")
      assert(viewState(view) == expected(src))
    } finally spark.conf.unset("graft.mv.broadcastMaxGroups")
  }

  test("refresh reads O(changes): the feed span, not the source table") {
    val base = tmp("mvcost")
    val src = mkSrc(base); val view = mkView(base)
    src.create((1 to 400).map(i => (i, i, s"g${i % 40}"))
      .toDF("id", "amount", "grp"))
    MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    // a one-partition touch: the fold's scan must plan ONLY the files
    // of the rewritten partition (the change-feed diff), never all 40
    val v0 = src.currentVersion.get
    src.upsert(rows((1, 999, "g1")))
    val fed = src.changesDelta(v0, src.currentVersion.get)
    val files = fed.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).filter(_.nonEmpty)
    assert(files.forall(_.contains("grp=g1")),
      s"feed read outside the touched partition: ${files.mkString(", ")}")
    MaterializedAgg.refreshAdditive(src, view, Seq("grp"), sums)
    assert(viewState(view) == expected(src))
  }
}
