package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LayoutSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("interleaveBits golden values") {
    val r = Seq((3L, 2L)).toDF("x", "y")
      .select(
        Layout.interleaveBits(col("x"), col("y"), 2).as("z32"),
        Layout.interleaveBits(col("x"), col("y"), 8).as("z8"),
        Layout.interleaveBits(lit(0L), lit(0L), 16).as("zero"),
        Layout.interleaveBits(lit(0xFFFFL), lit(0xFFFFL), 16).as("all"))
      .head()
    // x=0b11 at even positions, y=0b10 at odd: 1 + 4 + 8 = 13
    assert(r.getLong(0) == 13L)
    assert(r.getLong(1) == 13L) // higher width, same low bits
    assert(r.getLong(2) == 0L)
    assert(r.getLong(3) == (1L << 32) - 1) // 32 set bits
  }

  // a 32×32 grid: ids 0..1023, x = id mod 32, y = id div 32
  private def grid = spark.range(1024)
    .select(col("id"), (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))

  test("zorder preserves the row set") {
    val out = Layout.zorder(grid, "x", "y", nParts = 8)
    assert(out.count() == 1024)
    assert(out.select("id").distinct().count() == 1024)
  }

  test("z-ordered partitions are narrow in BOTH dimensions; a single-column sort is not") {
    val z = Layout.zorderAudit(grid, "x", "y", nParts = 8).collect()
    assert(z.length >= 2, "expected multiple non-empty partitions")
    def avg(xs: Seq[Double]) = xs.sum / xs.length
    val zx = avg(z.map(_.getAs[Double]("x_span_frac")).toSeq)
    val zy = avg(z.map(_.getAs[Double]("y_span_frac")).toSeq)
    assert(zx <= 0.6, s"z-order avg x span $zx should be narrow")
    assert(zy <= 0.6, s"z-order avg y span $zy should be narrow")
    // the single-column layout prunes x but reads ~every partition for a
    // y predicate — that contrast is the point of the operator
    val xSorted = grid.repartitionByRange(8, col("x"))
      .select(spark_partition_id().as("pid"), col("y").cast("double").as("y"))
      .groupBy("pid").agg(((max("y") - min("y")) / 31.0).as("span"))
      .collect().map(_.getAs[Double]("span")).toSeq
    assert(avg(xSorted) >= 0.9, s"x-sorted layout should have ~full y spans, got ${avg(xSorted)}")
  }

  /** Files of `dir` whose parquet FOOTER stats admit `lo <= c <= hi` for
    * every (c, lo, hi) — i.e. the files a min/max-pruning reader (parquet
    * row-group pruning, Delta/Iceberg file skipping) must actually read;
    * counted straight off the footers with parquet-hadoop, independent of
    * any engine's scan path. A file is skippable only when EVERY row
    * group excludes the box on SOME predicate column. */
  private def filesTouched(dir: String, preds: (String, Long, Long)*): (Int, Int) = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(parts.nonEmpty, s"no parquet part files under $dir")
    var files = 0
    var groups = 0
    parts.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getPath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val touched = reader.getFooter.getBlocks.asScala.count { block =>
          val stats = block.getColumns.asScala
            .map(c => c.getPath.toDotString -> c.getStatistics).toMap
          preds.forall { case (name, lo, hi) =>
            val s = stats(name)
            val min = s.genericGetMin.asInstanceOf[java.lang.Long].longValue
            val max = s.genericGetMax.asInstanceOf[java.lang.Long].longValue
            max >= lo && min <= hi
          }
        }
        if (touched > 0) files += 1
        groups += touched
      } finally reader.close()
    }
    (files, groups)
  }

  test("file skipping is REAL: footer min/max pruning reads strictly fewer files from the Z-ordered layout") {
    // write BOTH layouts of the same 32×32 grid as parquet (one file per
    // range partition — the shape a writer ships) and count, from the
    // parquet footers alone, the files a min/max-pruning reader must
    // touch for the same selective predicates. This is the claim the
    // span-fraction audit (ext65) only proxies: the narrow-in-both-dims
    // partitions become SKIPPED FILES at the storage layer.
    val base = graft.ScratchDir.dir("layout-skip")
    Layout.zorder(grid, "x", "y", nParts = 8)
      .write.parquet(s"$base/z")
    grid.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$base/x")

    // predicate on the NON-sort dimension, the case single-column layout
    // cannot prune: y BETWEEN 4 AND 7 (x unconstrained)
    val (zFilesY, zGroupsY) = filesTouched(s"$base/z", ("y", 4L, 7L))
    val (xFilesY, _) = filesTouched(s"$base/x", ("y", 4L, 7L))
    assert(xFilesY == 8,
      s"the x-sorted layout must read EVERY file for a y predicate: $xFilesY")
    assert(zFilesY < xFilesY,
      s"z-order must skip files on y: z=$zFilesY x=$xFilesY")
    assert(zFilesY <= 4, s"expected <= half the z files touched, got $zFilesY")
    assert(zGroupsY <= 4, s"row groups follow files here: $zGroupsY")

    // the two-dimensional box x∈[4,7] ∧ y∈[4,7]: an aligned quad is
    // Morton-contiguous, so the z layout pins it to ONE file; the
    // x-sorted layout also prunes (on x alone) — z must never be worse
    val (zFilesBox, _) = filesTouched(s"$base/z", ("x", 4L, 7L), ("y", 4L, 7L))
    val (xFilesBox, _) = filesTouched(s"$base/x", ("x", 4L, 7L), ("y", 4L, 7L))
    assert(zFilesBox == 1,
      s"an aligned Morton quad must land in one z file: $zFilesBox")
    assert(zFilesBox <= xFilesBox,
      s"z-order must not lose to the single-column sort on its own " +
        s"dimension: z=$zFilesBox x=$xFilesBox")

    // and on the sorted dimension alone the z layout still prunes (the
    // x-sorted layout is optimal here; z must stay within 4× of it)
    val (zFilesX, _) = filesTouched(s"$base/z", ("x", 4L, 7L))
    val (xFilesX, _) = filesTouched(s"$base/x", ("x", 4L, 7L))
    assert(xFilesX == 1 && zFilesX <= 4,
      s"x-sorted optimal on x ($xFilesX); z bounded on x ($zFilesX)")
  }
}
