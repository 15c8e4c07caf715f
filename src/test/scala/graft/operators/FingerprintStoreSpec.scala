package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.ImageCorpus

/** Persisted fingerprint-store lifecycle (ext121): successive deliveries
  * probe the parquet table and merge their survivors, so later deliveries
  * drop against earlier deliveries' KEPT rows; final store contents equal
  * init ∪ every delivery's survivors.
  */
class FingerprintStoreSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"fpstore-$tag").toString + "/store"

  test("a later delivery drops against an earlier delivery's kept rows (the merge step)") {
    // families of 3: {0,1,2}, {3,4,5}, {6,7,8}, {9,10,11}
    val hashes = ImageDedup.hashes(
      ImageCorpus.forIds((0L until 12L).toDF("doc_id"), "doc_id"),
      "png", "doc_id").localCheckpoint(true)
    val dir = freshDir("merge")
    // init: family {0,1,2} only
    FingerprintStore.init(hashes.filter($"id" < 3), dir)
    // delivery 1: ids 3,4 (fresh family -> 3 kept, 4 dropped_within) and
    // id 2's family sibling is ALREADY stored? no - bring id 6 (fresh)
    val v1 = FingerprintStore.ingest(spark, dir,
      hashes.filter($"id".isin(3L, 4L, 6L)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("verdict")).toMap
    assert(v1 == Map(3L -> "kept", 4L -> "dropped_within", 6L -> "kept"),
      s"delivery 1: $v1")
    // delivery 2: id 5 duplicates delivery 1's KEPT id 3 (not in init!),
    // id 7 duplicates kept id 6, id 9 is fresh, id 1 duplicates the init
    val v2 = FingerprintStore.ingest(spark, dir,
      hashes.filter($"id".isin(5L, 7L, 9L, 1L)))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("verdict"),
          Option(r.getAs[java.lang.Long]("matched_id")).map(_.longValue))).toMap
    assert(v2(5L)._1 == "dropped_existing" && v2(5L)._2.contains(3L),
      s"id 5 must drop against delivery 1's kept id 3: ${v2(5L)}")
    assert(v2(7L)._1 == "dropped_existing" && v2(7L)._2.contains(6L))
    assert(v2(9L)._1 == "kept")
    assert(v2(1L)._1 == "dropped_existing" &&
      v2(1L)._2.exists(m => m == 0L || m == 2L),
      s"id 1 must drop against the init store: ${v2(1L)}")
    // final store == init ∪ kept1 ∪ kept2
    val stored = FingerprintStore.read(spark, dir)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(stored == Set(0L, 1L, 2L, 3L, 6L, 9L), s"store: $stored")
  }

  test("ingest into an empty-but-initialized store keeps everything fresh") {
    val hashes = ImageDedup.hashes(
      ImageCorpus.forIds((30L until 36L).toDF("doc_id"), "doc_id"),
      "png", "doc_id").localCheckpoint(true)
    val dir = freshDir("empty")
    FingerprintStore.init(hashes.filter($"id" < 0), dir) // empty store
    val v = FingerprintStore.ingest(spark, dir, hashes)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("verdict")).toMap
    // two families of 3: min-id member of each kept, rest dropped_within
    assert(v == Map(30L -> "kept", 31L -> "dropped_within",
      32L -> "dropped_within", 33L -> "kept", 34L -> "dropped_within",
      35L -> "dropped_within"), s"verdicts: $v")
    assert(FingerprintStore.read(spark, dir).count() == 2)
  }
}
