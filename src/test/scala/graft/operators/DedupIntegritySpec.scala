package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

class DedupIntegritySpec extends SparkSpec {

  import spark.implicits._

  test("arbitrary dedup: exactly one row per key survives") {
    val df = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f"))
      .toDF("k", "v")
    val out = Dedup.arbitrary(df, Seq("k"))
    assert(out.count() == 3)
    assert(out.select("k").distinct().count() == 3)
  }

  test("deterministic dedup: first row under tiebreak wins") {
    val df = Seq((1, 5, "late"), (1, 1, "early"), (2, 9, "only"))
      .toDF("k", "seq", "v")
    val out = Dedup.deterministic(df, Seq("k"), Seq(col("seq")))
      .orderBy("k").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("early", "only"))
  }

  test("property: dedup output is always key-unique and a subset of input") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 20), Gen.alphaStr))
    (0 until 10).foreach { i =>
      val pairs = gen.pureApply(Gen.Parameters.default, Seed(42L + i))
      val df = pairs.toDF("k", "v")
      val out = Dedup.deterministic(df, Seq("k"), Seq(col("v")))
      val keys = out.select("k").collect().map(_.getInt(0))
      assert(keys.distinct.length == keys.length)
      assert(keys.toSet.subsetOf(pairs.map(_._1).toSet))
      assert(keys.toSet == pairs.map(_._1).toSet)
    }
  }

  test("RI split: orphans are exactly the injected dangling keys") {
    val dim = Seq((1, "p1"), (2, "p2")).toDF("pk", "name")
    val fact = Seq((10, 1), (11, 2), (12, 999), (13, 1), (14, -5))
      .toDF("id", "fk")
    val (kept, orphans) = Integrity.split(fact, dim, "fk", "pk")
    assert(kept.select("id").as[Int].collect().sorted.toSeq == Seq(10, 11, 13))
    assert(orphans.select("id").as[Int].collect().sorted.toSeq == Seq(12, 14))
  }

  test("RI split partitions the fact exactly (kept + orphans = fact)") {
    val dim = spark.range(0, 50).toDF("pk")
    val fact = spark.range(0, 200).toDF("fk")
    val (kept, orphans) = Integrity.split(fact, dim, "fk", "pk")
    assert(kept.count() + orphans.count() == 200)
    assert(kept.count() == 50)
  }

  test("broadcast hint survives into the physical plan") {
    val dim = spark.range(0, 10).toDF("pk")
    val fact = spark.range(0, 100).toDF("fk")
    val plan = Integrity.existing(fact, dim, "fk", "pk", broadcastDim = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
