package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp

/** As-of join edge cases: no prior right row, equal-timestamp inclusion
  * ("<=", right row at the same instant is visible), and carry-forward.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000L)

  test("lastValue picks the latest right value at or before each left ts") {
    val left = Seq((1L, t(10), "e1"), (1L, t(20), "e2"), (1L, t(5), "e0"),
                   (2L, t(10), "e3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, t(10), 100.0), (1L, t(15), 150.0), (2L, t(11), 300.0))
      .toDF("k", "ts", "value")
    val got = AsOfJoin.lastValue(left, right, "k", "ts", "value")
      .select("name", "asof_value").as[(String, Option[Double])]
      .collect().toMap
    assert(got("e0") === None)        // nothing at or before t=5
    assert(got("e1") === Some(100.0)) // equal timestamp counts (<=)
    assert(got("e2") === Some(150.0)) // carried forward
    assert(got("e3") === None)        // right row for k=2 is after t=10
  }

  test("right-side timestamp ties resolve deterministically to the max value") {
    val left = Seq((1L, t(20), "e")).toDF("k", "ts", "name")
    val right = Seq((1L, t(10), 5.0), (1L, t(10), 9.0)).toDF("k", "ts", "value")
    val v = AsOfJoin.lastValue(left, right, "k", "ts", "value")
      .select("asof_value").as[Double].head()
    assert(v === 9.0)
  }

  test("lastValueWithin nulls matches older than the tolerance, keeps the boundary") {
    val left = Seq((1L, t(100), "in"), (1L, t(200), "boundary"), (1L, t(300), "out"),
                   (2L, t(50), "none"))
      .toDF("k", "ts", "name")
    // one right row at t=90 for k=1; left rows probe at increasing distance
    val right = Seq((1L, t(90), 7.0)).toDF("k", "ts", "value")
    val got = AsOfJoin.lastValueWithin(left, right, "k", "ts", "value", toleranceSec = 110L)
      .select("name", "asof_value").as[(String, Option[Double])]
      .collect().toMap
    assert(got("in") === Some(7.0))       // 10s old, within 110s
    assert(got("boundary") === Some(7.0)) // exactly 110s old: boundary kept (>=)
    assert(got("out") === None)           // 210s old: tolerance exceeded
    assert(got("none") === None)          // no prior right row at all
  }

  test("nextValue picks the earliest right value at or after each left ts") {
    val left = Seq((1L, t(10), "e1"), (1L, t(16), "e2"), (1L, t(30), "e3"),
                   (2L, t(12), "e4"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, t(10), 100.0), (1L, t(15), 150.0), (2L, t(11), 300.0))
      .toDF("k", "ts", "value")
    val got = AsOfJoin.nextValue(left, right, "k", "ts", "value")
      .select("name", "asof_value").as[(String, Option[Double])]
      .collect().toMap
    assert(got("e1") === Some(100.0)) // equal timestamp counts (>=)
    assert(got("e2") === None)        // latest right for k=1 is t=15 < 16
    assert(got("e3") === None)        // nothing at or after t=30
    assert(got("e4") === None)        // right row for k=2 is before t=12
  }

  test("nextValue right-side ties resolve deterministically to the min value") {
    val left = Seq((1L, t(5), "e")).toDF("k", "ts", "name")
    val right = Seq((1L, t(10), 9.0), (1L, t(10), 5.0)).toDF("k", "ts", "value")
    val v = AsOfJoin.nextValue(left, right, "k", "ts", "value")
      .select("asof_value").as[Double].head()
    assert(v === 5.0)
  }
}
