package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SkewSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows on skewed data") {
    // 1000 rows of hot key 1, a few of others
    val probe = ((1 to 1000).map(i => (1L, s"p$i")) ++ Seq((2L, "x"), (3L, "y")))
      .toDF("k", "pv")
    val build = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched")).toDF("k", "bv")
    val plain = probe.join(build, "k").select("k", "pv", "bv")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(probe, build, "k", nSalt = 4)
      .select("k", "pv", "bv").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == 1001)
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin actually spreads a hot key over multiple salts") {
    val probe = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val salted = probe.withColumn("__salt", (rand(42L) * 4).cast("int"))
    val distinctSalts = salted.select("__salt").distinct().count()
    assert(distinctSalts == 4)
  }

  test("saltedCount equals plain count per key") {
    val df = ((1 to 500).map(_ => 7L) ++ Seq(8L, 8L, 9L)).toDF("k")
    val got = Skew.saltedCount(df, "k", nSalt = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 500L, 8L -> 2L, 9L -> 1L))
  }
}
