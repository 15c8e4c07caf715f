package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsOfSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("lastEventBefore: latest ref at-or-before each query, per key") {
    // user 1: signup@10, purchase@20 (ref 10), signup@30, purchase@40 (ref 30)
    // user 2: purchase@5 (no ref) — null ref_ts_us
    val events = Seq(
      (1L, 100L, 10L, "signup"), (1L, 101L, 20L, "purchase"),
      (1L, 102L, 30L, "signup"), (1L, 103L, 40L, "purchase"),
      (2L, 200L, 5L, "purchase"),
      (1L, 104L, 15L, "click") // other types ignored
    ).toDF("user_id", "event_id", "ts_us", "event_type")
    val res = AsOf.lastEventBefore(events, "signup", "purchase")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(res == Map(101L -> 10L, 103L -> 30L, 200L -> -1L))
  }

  test("lastEventBefore: simultaneous ref wins (at-or-before, ref sorts first)") {
    val events = Seq(
      (1L, 1L, 50L, "signup"), (1L, 2L, 50L, "purchase")
    ).toDF("user_id", "event_id", "ts_us", "event_type")
    val res = AsOf.lastEventBefore(events, "signup", "purchase").collect()
    assert(res.length == 1 && res.head.getLong(2) == 50L)
  }

  test("asofJoin attaches the latest right value per key") {
    val trades = Seq(("A", 10L), ("A", 25L), ("B", 10L)).toDF("sym", "t")
    val quotes = Seq(("A", 5L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0))
      .toDF("sym", "t", "px")
    // output columns: (sym, t, px)
    val res = AsOf.asofJoin(trades, quotes, "sym", "t", "px")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toSet
    assert(res.contains(("A", 10L, 1.0)))
    assert(res.contains(("A", 25L, 2.0)))
    assert(res.exists(t => t._1 == "B" && t._2 == 10L && t._3.isNaN))
  }

  test("asofJoin breaks right-side (key, time) ties deterministically") {
    val trades = Seq(("A", 10L)).toDF("sym", "t")
    val quotes = Seq(("A", 5L, 2.0), ("A", 5L, 1.0), ("A", 5L, 3.0))
      .toDF("sym", "t", "px")
    // greatest value among tied rows wins, every run
    (1 to 3).foreach { _ =>
      val px = AsOf.asofJoin(trades, quotes, "sym", "t", "px").head.getDouble(2)
      assert(px == 3.0)
    }
  }

  test("asofJoin preserves all left columns and lets a null-valued latest row win") {
    val trades = Seq(("A", 10L, 100L, 7), ("A", 25L, 101L, 9))
      .toDF("sym", "t", "trade_id", "qty")
    // latest quote before t=25 has a NULL px — as-of must return that null,
    // not reach back to the older non-null quote
    val quotes = Seq(("A", 5L, Some(1.0)), ("A", 20L, None))
      .toDF("sym", "t", "px")
    val out = AsOf.asofJoin(trades, quotes, "sym", "t", "px")
    assert(out.columns.toSeq == Seq("sym", "t", "trade_id", "qty", "px"))
    val byId = out.collect().map(r => r.getAs[Long]("trade_id") ->
      (r.getAs[Int]("qty"), if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    assert(byId(100L) == ((7, 1.0)))
    assert(byId(101L)._1 == 9 && byId(101L)._2.isNaN)
  }
}
