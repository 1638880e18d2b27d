package graft.operators

import graft.SparkSpec

/** Min-label components: transitive chains collapse to one cluster,
  * disjoint clusters stay apart, and convergence is reached on shapes
  * deeper than one hop (the case pairwise dedup gets wrong). */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.minLabelComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, clique and disjoint pair resolve to min-id components") {
    // 1-2-3 is a CHAIN (1~3 never emitted), 10-11-12 a clique, 20-21 a pair
    val got = comps(Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)))
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long path converges within the diameter bound") {
    // path 0-1-2-...-9: worst case for label propagation
    val got = comps((0L until 9L).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 9L).toSet)
  }

  test("edge direction does not matter") {
    assert(comps(Seq((5L, 2L), (2L, 7L))) ==
      Map(2L -> 2L, 5L -> 2L, 7L -> 2L))
  }
}
