package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RedactionSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def run(texts: String*) =
    texts.toDF("text")
      .select(col("text") +: Redaction.scrub(col("text")).as("red") +:
        Redaction.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("golden redactions: each PII type replaced by its placeholder") {
    val got = run(
      "mail bob.smith+x@corp.example.org now",
      "call 25-989-741-2988 today",
      "host 192.168.0.1 up",
      "no pii here at all")
    assert(got("mail bob.smith+x@corp.example.org now") == (("mail <EMAIL> now", 1L, 0L, 0L)))
    assert(got("call 25-989-741-2988 today") == (("call <PHONE> today", 0L, 1L, 0L)))
    assert(got("host 192.168.0.1 up") == (("host <IP> up", 0L, 0L, 1L)))
    assert(got("no pii here at all") == (("no pii here at all", 0L, 0L, 0L)))
  }

  test("an email whose domain embeds an IP-shaped run redacts as ONE email") {
    // if the IP pass ran first it would tear the address into admin@<IP>.net
    // and the email pass could no longer match — order is load-bearing
    val t = "ping admin@10.0.0.1.net ok"
    val got = run(t)(t)
    assert(got._1 == "ping <EMAIL> ok")
    // counts are diagnostic on the raw text: the IP matcher does see the run
    assert((got._2, got._3, got._4) == ((1L, 0L, 1L)))
  }

  test("word boundaries: digit runs embedded in longer tokens do not match") {
    val t = "id 925-989-741-29881 and x10.0.0.1y stay"
    val got = run(t)(t)
    // 5-digit tail breaks the phone's trailing \b; 'x1'/'1y' are both word
    // chars so the IP never gets a boundary — nothing matches
    assert(got._1 == t)
  }

  test("multiple matches in one document all redact and count") {
    val t = "a@b.co c@d.org 10.1.1.1 10.2.2.2 25-111-222-3333"
    val got = run(t)(t)
    assert(got._1 == "<EMAIL> <EMAIL> <IP> <IP> <PHONE>")
    assert((got._2, got._3, got._4) == ((2L, 1L, 2L)))
  }
}
