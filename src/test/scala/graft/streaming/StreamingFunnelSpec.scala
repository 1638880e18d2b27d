package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.streaming.TestGroupState
import graft.SparkSpec

/** The stateful funnel transition as a pure function: slot fill across
  * batches, within-batch sorting, tie semantics, and the monotone
  * depth emission. */
class StreamingFunnelSpec extends SparkSpec {

  private val steps = Seq("view", "click", "purchase")

  private def ev(sec: Int, et: String) = StreamingFunnel.StepEvent(
    1L, Timestamp.valueOf(s"2020-01-01 00:00:${"%02d".format(sec)}"), et)

  private def drain(batches: Seq[Seq[StreamingFunnel.StepEvent]]): Seq[Int] = {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.GroupStateTimeout
    def mk(prev: Option[Array[Long]]) = TestGroupState.create[Array[Long]](
      prev.map(Optional.of[Array[Long]]).getOrElse(Optional.empty()),
      GroupStateTimeout.NoTimeout(), 0L, Optional.empty[Long](), false)
    var state = mk(None)
    batches.map { b =>
      val out = StreamingFunnel.transition(steps)(1L, b.iterator, state).toSeq
      state = mk(state.getOption)
      out.head.depth
    }
  }

  test("slots fill across micro-batches; depth is monotone") {
    val depths = drain(Seq(
      Seq(ev(1, "view"), ev(2, "error")),          // depth 1
      Seq(ev(3, "purchase")),                       // purchase before click: 1
      Seq(ev(4, "click")),                          // depth 2
      Seq(ev(5, "purchase"))))                      // depth 3
    assert(depths == Seq(1, 1, 2, 3))
  }

  test("within-batch disorder is sorted; same-ts events keep batch tie order") {
    // click arrives (in batch order) before the view, but sorting by
    // (ts, type) restores event-time order -> both fill in one batch
    val depths = drain(Seq(Seq(ev(5, "click"), ev(1, "view"))))
    assert(depths == Seq(2))
    // click at the SAME instant as the first view: not strictly after
    val tie = drain(Seq(Seq(ev(1, "view"), ev(1, "click"))))
    assert(tie == Seq(1))
  }

  test("non-step types never fill and a later batch cannot refill a slot") {
    val depths = drain(Seq(
      Seq(ev(2, "view")),
      // earlier-ts stray view in a later batch: slot 0 already filled,
      // stays at its recorded time; click at 3 still converts
      Seq(ev(1, "view"), ev(3, "click"))))
    assert(depths == Seq(1, 2))
  }
}
