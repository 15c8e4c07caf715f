package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SnapshotSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val prev = Seq(
    (1L, "alpha", "a"), (2L, "beta", "a"), (3L, "gamma", "b"))
    .toDF("id", "text", "src")
  private val next = Seq(
    (2L, "beta", "a"), (3L, "gamma REVISED", "b"), (4L, "delta", "b"))
    .toDF("id", "text", "src")

  test("diff classifies added / removed / changed / unchanged") {
    val d = Snapshot.diff(prev, next, "id", "text", "src")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(d == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("diff carries the group from whichever side has the row") {
    val d = Snapshot.diff(prev, next, "id", "text", "src")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d(1L) == "a") // removed: only the old side knows it
    assert(d(4L) == "b") // added: only the new side
  }

  test("NULL content marks presence, not absence: null→text is changed, null→null unchanged") {
    val o = Seq((1L, Option.empty[String], "a"), (2L, Option.empty[String], "a"),
      (3L, Option("x"), "a")).toDF("id", "text", "src")
    val n = Seq((1L, Option("now set"), "a"), (2L, Option.empty[String], "a"),
      (3L, Option.empty[String], "a")).toDF("id", "text", "src")
    val d = Snapshot.diff(o, n, "id", "text", "src")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(d == Map(1L -> "changed", 2L -> "unchanged", 3L -> "changed"))
  }

  test("diffSummary counts per (group, status)") {
    val s = Snapshot.diffSummary(prev, next, "id", "text", "src")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(s == Map(
      ("a", "removed") -> 1L, ("a", "unchanged") -> 1L,
      ("b", "changed") -> 1L, ("b", "added") -> 1L))
  }

  test("applyChangelog: latest wins, equal-version delete beats upsert, insert and no-op delete") {
    val base = Seq((1L, "alpha", "a"), (2L, "beta", "a"), (3L, "gamma", "b"),
      (4L, "delta", "b")).toDF("id", "text", "src")
    val changes = Seq(
      (2L, 1L, "upsert", "beta v1", "a"),   // superseded by v2
      (2L, 2L, "upsert", "beta v2", "a"),   // latest wins
      (3L, 1L, "delete", null, "b"),        // removes id 3
      (4L, 5L, "upsert", "delta v5", "b"),  // conflict pair at v5…
      (4L, 5L, "delete", null, "b"),        // …delete wins the tie
      (9L, 1L, "upsert", "new nine", "c"),  // insert of an absent id
      (8L, 1L, "delete", null, "c"))        // delete of an absent id: no-op
      .toDF("id", "version", "op", "text", "src")
    val got = Snapshot.applyChangelog(base, changes, "id", "version", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, "alpha", "a"),       // untouched base row passes through
      (2L, "beta v2", "a"),
      (9L, "new nine", "c")))
  }

  test("applyChangelog rejects an unknown op at execution") {
    val base = Seq((1L, "alpha")).toDF("id", "text")
    val changes = Seq((1L, 1L, "replace", "x")).toDF("id", "version", "op", "text")
    val e = intercept[Exception] {
      Snapshot.applyChangelog(base, changes, "id", "version", "op").collect()
    }
    assert(e.getMessage.contains("upsert|delete") ||
      Option(e.getCause).exists(_.getMessage.contains("upsert|delete")))
  }

  test("applyChangelog requires the changelog to carry every base column") {
    val base = Seq((1L, "alpha", "a")).toDF("id", "text", "src")
    val changes = Seq((1L, 1L, "upsert", "x")).toDF("id", "version", "op", "text")
    val e = intercept[IllegalArgumentException] {
      Snapshot.applyChangelog(base, changes, "id", "version", "op")
    }
    assert(e.getMessage.contains("src"))
  }
}
