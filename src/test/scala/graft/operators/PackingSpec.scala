package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Concat-and-chunk sequence packing: bins follow the running token offset
  * within each group, documents may straddle a boundary, groups pack
  * independently.
  */
class PackingSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("bin is the chunk the document's first token lands in") {
    // offsets: 0, 4, 8, 12 with seqLen 10 → bins 0, 0, 0, 1; the doc
    // starting at 8 straddles the boundary but belongs to bin 0
    val d = Seq(("g", 1L, 4L), ("g", 2L, 4L), ("g", 3L, 4L), ("g", 4L, 4L))
      .toDF("src", "id", "n_tok")
    val got = Packing.packBins(d, "src", "id", "n_tok", seqLen = 10)
      .orderBy("id").select("offset", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 0L), (4L, 0L), (8L, 0L), (12L, 1L)))
  }

  test("groups pack independently — each group restarts at offset 0") {
    val d = Seq(("a", 1L, 7L), ("a", 2L, 7L), ("b", 1L, 7L), ("b", 2L, 7L))
      .toDF("src", "id", "n_tok")
    val got = Packing.packBins(d, "src", "id", "n_tok", seqLen = 10)
      .orderBy("src", "id").select("src", "offset", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 0L, 0L), ("a", 7L, 0L), ("b", 0L, 0L), ("b", 7L, 0L)))
  }

  test("duplicate order keys still produce a running sum (explicit ROWS frame)") {
    // with the default RANGE frame both rows would see the peer-summed
    // offset 10; the ROWS frame keeps the stream strictly running
    val d = Seq(("g", 1L, 5L), ("g", 1L, 5L)).toDF("src", "id", "n_tok")
    val offsets = Packing.packBins(d, "src", "id", "n_tok", seqLen = 100)
      .select("offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(offsets == Seq(0L, 5L))
  }

  test("shardReport: every doc lands in [0, n), volumes add up, report is deterministic") {
    val d = (0L until 300L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n_tok")
    val rep = Packing.shardReport(d, "doc_id", "n_tok", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rep.map(_._1).toSet == (0L until 8L).toSet, "every shard reports, even empty ones")
    assert(rep.map(_._2).sum == 300L)
    assert(rep.map(_._3).sum == (0L until 300L).map(i => 10L + i % 7).sum)
    // rel_dev is each shard's tokens vs the uniform ideal
    val total = rep.map(_._3).sum.toDouble
    rep.foreach { case (_, _, tok, dev) =>
      assert(math.abs(dev - (tok / (total / 8) - 1.0)) < 1e-6)
    }
    val again = Packing.shardReport(d, "doc_id", "n_tok", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rep.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    intercept[IllegalArgumentException](Packing.shardReport(d, "doc_id", "n_tok", 0))
  }

  test("an EMPTY shard surfaces as rel_dev = -1, the worst-skew signal — never vanishes") {
    val tiny = Seq((1L, 10L), (2L, 10L)).toDF("doc_id", "n_tok")
    val rep = Packing.shardReport(tiny, "doc_id", "n_tok", nShards = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(rep.length == 16)
    val empty = rep.filter(_._2 == 0L)
    assert(empty.nonEmpty && empty.forall(_._3 == -1.0))
  }

  test("guards: positive seqLen, no silent offset/bin clobber") {
    val d = Seq(("g", 1L, 5L)).toDF("src", "id", "n_tok")
    intercept[IllegalArgumentException](Packing.packBins(d, "src", "id", "n_tok", 0))
    val clash = d.withColumn("bin", lit(9))
    val e = intercept[IllegalArgumentException](
      Packing.packBins(clash, "src", "id", "n_tok", 10))
    assert(e.getMessage.contains("bin"))
  }
}
