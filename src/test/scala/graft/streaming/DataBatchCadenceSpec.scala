package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[DataBatchCadence]] — the "every N DATA-BEARING micro-batches"
  * counter behind writeBackCompactEvery / compactLandedEvery (r14
  * verdict #5): no-data batches consume no slot, the count survives
  * restarts (fresh instance, same checkpoint), and a replayed batch
  * re-fires the same decision instead of double-counting. */
class DataBatchCadenceSpec extends AnyFunSuite with SparkTestSession {

  private def conf = spark.sparkContext.hadoopConfiguration

  test("no-data batches never consume a slot; fires every N data batches") {
    graft.ScratchDir.withDir("cadence") { base =>
      val c = new DataBatchCadence(s"$base/ckpt")
      new java.io.File(s"$base/ckpt").mkdirs()
      // wave shape: data b0, no-data b1 (watermark advance), data b2..b5
      assert(!c.fires(conf, 2, 0L, hasData = true))  // n=1
      assert(!c.fires(conf, 2, 1L, hasData = false)) // no slot consumed
      assert(c.fires(conf, 2, 2L, hasData = true))   // n=2 -> fires
      assert(!c.fires(conf, 2, 3L, hasData = true))  // n=3
      assert(c.fires(conf, 2, 4L, hasData = true))   // n=4 -> fires
    }
  }

  test("the count is durable across restarts and exactly-once under replay") {
    graft.ScratchDir.withDir("cadence") { base =>
      new java.io.File(s"$base/ckpt").mkdirs()
      assert(!new DataBatchCadence(s"$base/ckpt")
        .fires(conf, 2, 0L, hasData = true)) // n=1
      // restart: a FRESH instance on the same checkpoint continues the
      // count instead of restarting it (each ext134 wave is a new query)
      val c2 = new DataBatchCadence(s"$base/ckpt")
      assert(c2.fires(conf, 2, 1L, hasData = true)) // n=2 -> fires
      // replay of the same batch id (foreachBatch is at-least-once):
      // not re-counted, and the SAME decision re-fires so a fold that
      // crashed mid-flight heals forward on the re-run
      assert(c2.fires(conf, 2, 1L, hasData = true))
      assert(new DataBatchCadence(s"$base/ckpt")
        .fires(conf, 2, 1L, hasData = true), "replay after restart too")
      // and the next fresh batch counts from where the replay left off
      assert(!c2.fires(conf, 2, 2L, hasData = true)) // n=3
    }
  }

  test("every <= 0 disables the cadence without touching the checkpoint") {
    graft.ScratchDir.withDir("cadence") { base =>
      val c = new DataBatchCadence(s"$base/ckpt")
      assert(!c.fires(conf, 0, 0L, hasData = true))
      assert(!new java.io.File(s"$base/ckpt/.graft_data_batches").exists())
    }
  }
}
