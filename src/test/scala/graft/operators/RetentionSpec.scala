package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed cohort matrix: cohorting by first day, once-per-offset
  * counting, offset cap, and rate arithmetic. */
class RetentionSpec extends SparkSpec {

  import spark.implicits._

  test("retention matrix matches a hand-computed fixture") {
    // cohort 01-01: users 1,2. cohort 01-02: user 3.
    // u1 active d0, d1 (twice — counts once), d2
    // u2 active d0 only; u3 active d0 and d2 (offset 2)
    val events = Seq(
      (1L, "2024-01-01 09:00:00"), (1L, "2024-01-02 10:00:00"),
      (1L, "2024-01-02 23:00:00"), (1L, "2024-01-03 01:00:00"),
      (2L, "2024-01-01 12:00:00"),
      (3L, "2024-01-02 08:00:00"), (3L, "2024-01-04 20:00:00")
    ).toDF("user_id", "ts")
    val out = Retention.cohorts(events, "user_id",
        col("ts").cast("timestamp"), maxOffsetDays = 30)
      .orderBy("cohort_day", "day_offset")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-01", 2, 1L, 2L, 0.5),
      ("2024-01-02", 0, 1L, 1L, 1.0),
      ("2024-01-02", 2, 1L, 1L, 1.0)))
  }

  test("offset cap bounds the matrix") {
    val events = Seq(
      (1L, "2024-01-01 09:00:00"), (1L, "2024-03-01 09:00:00")
    ).toDF("user_id", "ts")
    val out = Retention.cohorts(events, "user_id",
      col("ts").cast("timestamp"), maxOffsetDays = 7).collect()
    assert(out.map(_.getInt(1)).forall(_ <= 7))
    assert(out.length == 1) // only day 0 survives the cap
  }
}
