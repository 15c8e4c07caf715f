package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cv.Png

/** Deterministic synthetic PNG corpus keyed by document id — the offline
  * stand-in for the engine's own image side-outputs (the A10 PNG sink):
  * the container has no real image dataset, so the multimodal entries
  * render one 64×64 PNG per id with KNOWN near-duplicate structure and
  * run the real binary-column plumbing (encode → binary column → decode →
  * perceptual hash) end to end.
  *
  * Structure: ids form families of three (`id / 3`); every member of a
  * family renders the same 8×8-block noise pattern (splitmix-style hash of
  * (family, block)), and the member index (`id % 3`) perturbs that many
  * single pixels by a small delta — visually identical within a family
  * (dHash Hamming ≈ 0), uncorrelated across families (Hamming ≈ 32).
  * Everything is a pure function of the id: re-running any SF yields the
  * identical corpus, so the dedup entries are deterministic without
  * shipping image fixtures.
  */
object ImageCorpus {

  val Side = 64
  private val Block = 8

  /** One PNG per input id: (doc_id, png BINARY). The render runs
    * map-side (a UDF over the id column) — at corpus scale this is the
    * same shape as decoding real blobs off a binaryFile/parquet scan.
    */
  def forIds(ids: DataFrame, idCol: String): DataFrame =
    ids.select(col(idCol).cast("long").as("doc_id"))
      .withColumn("png", renderUdf(col("doc_id")))

  private val renderUdf = udf { id: Long => render(id) }.asNondeterministic()

  /** Deterministic 64×64 grayscale-as-BGR PNG for `id`. */
  def render(id: Long): Array[Byte] = {
    val family = id / 3
    val variant = (id % 3).toInt
    val px = new Array[Byte](Side * Side * 3)
    var r = 0
    while (r < Side) {
      var c = 0
      while (c < Side) {
        val v = (mix(family, (r / Block).toLong * 31 + (c / Block)) & 0xffL).toInt
        val o = (r * Side + c) * 3
        px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
        c += 1
      }
      r += 1
    }
    // variant-many single-pixel bumps (+6 luma): far below the 8×8 block
    // mean resolution dHash sees, so family members stay near-identical
    var k = 0
    while (k < variant) {
      val pos = ((mix(family, 1000L + k) & 0x7fffffffL) % (Side * Side)).toInt
      val o = pos * 3
      val bumped = math.min(255, (px(o) & 0xff) + 6)
      px(o) = bumped.toByte; px(o + 1) = bumped.toByte; px(o + 2) = bumped.toByte
      k += 1
    }
    Png.encodeBytes(px, Side, Side, 3)
  }

  /** splitmix64-style stateless mix of (a, b) — public-domain constant
    * schedule (Steele et al., "Fast splittable pseudorandom number
    * generators", OOPSLA 2014). */
  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9e3779b97f4a7c15L + b
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
