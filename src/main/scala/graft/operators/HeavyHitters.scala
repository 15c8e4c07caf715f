package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heavy hitters (frequent items) over a token stream — the vocabulary
  * question every corpus audit starts with: which items exceed a share
  * threshold of the whole corpus?
  *
  * Two paths, the q13/q13b pattern:
  *   - [[exact]]: two hash aggregates (map-side partials) + a 1-row total
  *     cross-joined in — oracle-checkable, and already scale-safe because
  *     the first aggregate reduces to |vocab| rows before anything global
  *     happens.
  *   - [[sketch]]: a distributed Misra–Gries summary (fixed k counters per
  *     partition, merged associatively), for the regime where even |vocab|
  *     rows is a shuffle worth avoiding and an ε-approximate answer is
  *     enough. Guarantee (Misra–Gries 1982; merge rule from Agarwal et al.,
  *     "Mergeable Summaries", PODS 2012): every item with true count
  *     > N/(k+1) survives, and each reported estimate undercounts by at
  *     most N/(k+1). The spec pins both bounds against [[exact]].
  */
object HeavyHitters {

  /** Items whose share of all rows is >= `minShare`, with exact counts.
    * Output: (item, n, share) — share rounded to 6 dp for cross-engine
    * comparison. One aggregate keyed by item (partial+final), one scalar
    * count aggregated FROM the item counts (no second scan), one
    * broadcastable 1-row cross join.
    */
  def exact(items: DataFrame, itemCol: String, minShare: Double): DataFrame = {
    require(minShare > 0 && minShare <= 1, s"minShare in (0,1], got $minShare")
    val counts = items.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    counts.crossJoin(total)
      .where(col("n") >= col("total") * minShare)
      .select(col("item"), col("n"),
        round(col("n") / col("total"), 6).as("share"))
  }

  /** Misra–Gries buffer: at most k survivor counters plus the total row
    * count seen (needed to report the error bound). Kept as a case class of
    * a map so the buffer encoder is a product encoder, same as every other
    * Aggregator in this codebase.
    */
  final case class MgBuf(counters: Map[String, Long], n: Long)

  /** The classic decrement step: when a (k+1)-th distinct key arrives,
    * subtract 1 from every counter and drop zeros (the arriving item's own
    * +1 cancels against the shared −1). O(k) on each overflowing arrival;
    * with skewed input most arrivals hit an existing counter instead.
    */
  private[graft] def mgReduce(k: Int)(b: MgBuf, item: String): MgBuf = {
    if (item == null) return b
    val c = b.counters
    c.get(item) match {
      case Some(v) => MgBuf(c.updated(item, v + 1), b.n + 1)
      case None if c.size < k => MgBuf(c.updated(item, 1L), b.n + 1)
      case None =>
        // decrement all by 1 (the arriving item's own count cancels to 0)
        MgBuf(c.flatMap { case (key, v) =>
          if (v > 1) Some(key -> (v - 1)) else None
        }, b.n + 1)
    }
  }

  /** Mergeable-summaries combine: add counters pointwise, then if more than
    * k survive, subtract the (k+1)-th largest value from all and drop
    * non-positives — preserves the N/(k+1) undercount bound (Agarwal et
    * al. 2012, Thm. 1).
    */
  private def mgMerge(k: Int)(a: MgBuf, b: MgBuf): MgBuf = {
    val summed = b.counters.foldLeft(a.counters) { case (acc, (key, v)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + v)
    }
    val trimmed =
      if (summed.size <= k) summed
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (key, v) =>
          if (v > cut) Some(key -> (v - cut)) else None
        }
      }
    MgBuf(trimmed, a.n + b.n)
  }

  /** Typed Misra–Gries aggregator with k counters. The buffer is O(k)
    * regardless of input size, so Spark runs it as partial aggregation —
    * each partition reduces locally, the shuffle moves at most k counters
    * per partition, and the final merge is one task.
    */
  def mgAggregator(k: Int): Aggregator[String, MgBuf, MgBuf] = {
    require(k >= 1, s"k must be >= 1, got $k")
    new Aggregator[String, MgBuf, MgBuf] {
      override def zero: MgBuf = MgBuf(Map.empty, 0L)
      override def reduce(b: MgBuf, item: String): MgBuf = mgReduce(k)(b, item)
      override def merge(a: MgBuf, b: MgBuf): MgBuf = mgMerge(k)(a, b)
      override def finish(b: MgBuf): MgBuf = b
      override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
      override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    }
  }

  /** Approximate heavy hitters: one pass, O(k) state. Output one row per
    * surviving counter: (item, est_n, n_total, max_undercount) where
    * `est_n <= true count <= est_n + max_undercount` and every item with
    * true count > max_undercount is guaranteed present.
    */
  def sketch(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val summary = items.select(col(itemCol).cast("string"))
      .as[String]
      .select(mgAggregator(k).toColumn) // typed select: Dataset[MgBuf]
    summary.select(explode(col("counters")).as(Seq("item", "est_n")),
        col("n").as("n_total"))
      .withColumn("max_undercount", floor(col("n_total") / (k + 1)))
  }

  // ------------------------------------------------------------ Count-Min

  /** Count-Min buffer: depth×width cells flattened row-major, plus the
    * stream length (needed to report the ε·N bound). Mutable-array buffer,
    * the [[graft.operators.Similarity.VecSumBuf]] convention.
    */
  final case class CmBuf(var cells: Array[Long], var n: Long)

  /** Row-seeded cell index — plain JVM Murmur3 (the sketch never needs to
    * be engine-portable; its CONTRACT, not its cell values, is what the
    * spec and the exact twin pin).
    */
  private[graft] def cmCell(item: String, row: Int, width: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(item, 0x9747b28c + row), width)

  /** Count-Min sketch aggregator (Cormode & Muthukrishnan 2005) — the
    * point-frequency complement of the Misra–Gries top-k summary: AFTER
    * one pass, the estimate for ANY item is min over rows of its cell,
    * with est ≥ true always (counters only ever add) and
    * est ≤ true + ⌈e/width·N⌉ with probability ≥ 1 − e^(−depth) per
    * probe. O(depth·width) state regardless of stream size, associatively
    * mergeable (pointwise sum) → partial aggregation, one constant-size
    * buffer per partition over the shuffle.
    */
  def cmAggregator(depth: Int, width: Int): Aggregator[String, CmBuf, CmBuf] = {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2; got $depth×$width")
    new Aggregator[String, CmBuf, CmBuf] {
      override def zero: CmBuf = CmBuf(new Array[Long](depth * width), 0L)
      override def reduce(b: CmBuf, item: String): CmBuf = {
        if (item != null) {
          var j = 0
          while (j < depth) { b.cells(j * width + cmCell(item, j, width)) += 1; j += 1 }
          b.n += 1
        }
        b
      }
      override def merge(a: CmBuf, b: CmBuf): CmBuf = {
        var i = 0
        while (i < a.cells.length) { a.cells(i) += b.cells(i); i += 1 }
        a.n += b.n
        a
      }
      override def finish(b: CmBuf): CmBuf = b
      override def bufferEncoder: Encoder[CmBuf] = Encoders.product[CmBuf]
      override def outputEncoder: Encoder[CmBuf] = Encoders.product[CmBuf]
    }
  }

  /** Build the sketch in one distributed pass, then grade it against the
    * exact counts of the `probes` items (caller-bounded — an audit set,
    * e.g. the exact top-k): one row per probe with
    * (item, exact_n, est_n, overcount, bound) where overcount = est−exact
    * is ≥ 0 BY CONSTRUCTION and bound = ⌈e/width·N⌉ is the per-probe
    * ε·N guarantee. The finished sketch is depth·width longs —
    * bounded-by-construction driver state, broadcast into a map-side
    * lookup (the same adjudication as the k-means centroid collect).
    */
  def cmEstimates(items: DataFrame, itemCol: String, probes: DataFrame,
      probeCol: String, depth: Int = 4, width: Int = 512): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val strs = items.select(col(itemCol).cast("string").as("item"))
    val buf = strs.as[String].select(cmAggregator(depth, width).toColumn).head()
    val (cells, n) = (buf.cells, buf.n)
    val estUdf = udf((item: String) => {
      var best = Long.MaxValue
      var j = 0
      while (j < depth) {
        val v = cells(j * width + cmCell(item, j, width))
        if (v < best) best = v
        j += 1
      }
      best
    })
    val bound = math.ceil(math.E / width * n).toLong
    val exact = strs.groupBy("item").agg(count(lit(1)).as("exact_n"))
    probes.select(col(probeCol).cast("string").as("item")).distinct()
      .join(exact, Seq("item"), "left")
      .select(col("item"), coalesce(col("exact_n"), lit(0L)).as("exact_n"),
        estUdf(col("item")).as("est_n"))
      .withColumn("overcount", col("est_n") - col("exact_n"))
      .withColumn("bound", lit(bound))
  }
}
