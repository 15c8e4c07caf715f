package graft.util

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The r14 filesystem probes: [[CommittedTable]]'s structural-emptiness
  * decision (the shared replacement for Try-as-removed) and
  * [[AtomicPublish]]'s never-published fast-fail with its in-flight
  * temp-sibling evidence.
  */
class PublishProbesSpec extends AnyFunSuite with SparkTestSession {

  private def conf = spark.sparkContext.hadoopConfiguration

  test("CommittedTable.hasData: missing dir, marker-only dir and _temporary-only dir are structurally empty; a committed file is data") {
    val base = graft.ScratchDir.dir("committed")
    assert(!CommittedTable.hasData(spark, s"$base/nope"),
      "missing dir has never held rows")
    // _SUCCESS alone: the all-rejected-stream shape — exists, no data
    val markerOnly = new java.io.File(s"$base/markers")
    assert(markerOnly.mkdirs())
    java.nio.file.Files.write(markerOnly.toPath.resolve("_SUCCESS"),
      Array.empty[Byte])
    assert(!CommittedTable.hasData(spark, markerOnly.toString))
    // _temporary staging alone: the crash-mid-first-write shape — a data
    // file under _temporary is NOT committed
    val tornDir = new java.io.File(s"$base/torn/_temporary/0")
    assert(tornDir.mkdirs())
    java.nio.file.Files.write(
      tornDir.toPath.resolve("part-00000.snappy.parquet"), Array[Byte](1))
    assert(!CommittedTable.hasData(spark, s"$base/torn"))
    // a part file under ANY hidden ancestor — e.g. a crash-orphaned
    // compaction staging dir — is not committed data either (r14
    // ADVICE: this predicate and TableCompaction's must agree during a
    // compaction crash window; plain Spark readers skip it too)
    val orphan = new java.io.File(s"$base/crash/.compact_staging_ab12/b=0")
    assert(orphan.mkdirs())
    java.nio.file.Files.write(
      orphan.toPath.resolve("part-00000.snappy.parquet"), Array[Byte](1))
    assert(!CommittedTable.hasData(spark, s"$base/crash"),
      "a staged-but-unpublished compaction file must not read as data")
    // a real write — including a partitioned layout — is data
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "source")
      .write.partitionBy("source").parquet(s"$base/t")
    assert(CommittedTable.hasData(spark, s"$base/t"),
      "a committed partitioned write must read as data")
  }

  test("FNF gate is behavioral: rethrow on the first attempt when the probe answers never-published, full retry budget when it answers in-flight") {
    // asserted on ATTEMPT COUNTS, not wall-clock — the repo's own bench
    // notes document 2-4x timing swings under neighbor-VM load, so a
    // `took < Nms` assert here would be flaky by design
    var attempts = 0
    intercept[java.io.FileNotFoundException] {
      AtomicPublish.withReadRetries(retryFnfIf = () => false) { () =>
        attempts += 1
        throw new java.io.FileNotFoundException("never published")
      }
    }
    assert(attempts == 1,
      s"never-published must rethrow on the FIRST attempt, made $attempts")
    attempts = 0
    intercept[java.io.FileNotFoundException] {
      AtomicPublish.withReadRetries(maxAttempts = 3,
          retryFnfIf = () => true) { () =>
        attempts += 1
        throw new java.io.FileNotFoundException("mid-blink")
      }
    }
    assert(attempts == 3,
      s"an in-flight absence must burn the whole budget, made $attempts")
    // the probe is consulted AT failure time (not at entry): a no-
    // evidence verdict on the first failure rethrows immediately —
    // there is no stale entry-time verdict to keep retrying on
    attempts = 0
    intercept[java.io.FileNotFoundException] {
      AtomicPublish.withReadRetries(maxAttempts = 3,
          retryFnfIf = () => attempts > 1) { () =>
        attempts += 1
        throw new java.io.FileNotFoundException("x")
      }
    }
    assert(attempts == 1, "first failure with no evidence rethrows")
  }

  test("readFile wires the gate to confirmedAbsent: never-published throws FNF; a fresh temp sibling reads as in-flight; an aged orphan does not") {
    val base = graft.ScratchDir.dir("pubprobe")
    val target = new Path(s"$base/index.bin")
    intercept[java.io.FileNotFoundException] {
      AtomicPublish.readFile(conf, target)(_.readLong())
    }
    val fs = target.getFileSystem(conf)
    // absence is only trusted through TWO consecutive listings
    // (confirmedAbsent) — a single readdir racing a temp→target rename
    // can miss both names of a durably published file; the stable-state
    // verdicts of the pair must match the single-listing probe's
    assert(AtomicPublish.confirmedAbsent(fs, target),
      "a never-published target is confirmed absent")
    // a FRESH in-flight publish's dot-temp sibling (AtomicPublish
    // .tmpFor's naming) flips the probe: absence now reads as the
    // delete-then-rename blink
    val tmp = java.nio.file.Paths.get(base, ".index.bin.deadbeefdead.tmp")
    java.nio.file.Files.write(tmp, Array[Byte](1))
    assert(AtomicPublish.existsOrInFlight(fs, target))
    assert(!AtomicPublish.confirmedAbsent(fs, target),
      "an in-flight temp sibling must block the absence verdict")
    // an ORPHANED temp (hard-killed publisher, older than the horizon)
    // stops counting as in-flight evidence — without the age-out one
    // orphan would tax every probe of this target forever
    java.nio.file.Files.setLastModifiedTime(tmp,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - AtomicPublish.OrphanTempHorizonMs - 60000))
    assert(!AtomicPublish.existsOrInFlight(fs, target),
      "an aged orphan temp must not read as an in-flight publish")
    assert(AtomicPublish.confirmedAbsent(fs, target),
      "an orphan-only target is confirmed absent")
  }

  test("readFile still absorbs a concurrent re-publish: the file existed at entry, so mid-blink FNF retries") {
    val base = graft.ScratchDir.dir("pubrace")
    val target = new Path(s"$base/value.bin")
    def save(v: Long): Unit =
      AtomicPublish.file(conf, target)(_.writeLong(v))
    save(1L)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = new Thread(() => {
      var v = 2L
      while (!stop.get()) { save(v); v += 1 }
    })
    writer.start()
    try {
      // 40 loads against a tight re-save loop: every read must land a
      // complete value, never FNF/checksum leakage from the blink
      (1 to 40).foreach { _ =>
        val got = AtomicPublish.readFile(conf, target)(_.readLong())
        assert(got >= 1L)
      }
    } finally { stop.set(true); writer.join() }
  }

  test("RACING publishers of one target never fail on the overwrite-" +
      "rename window; last complete value wins") {
    // local/Checksum FileContext implements rename(OVERWRITE) as
    // validate → delete → plain rename with no lock across the steps, so
    // two concurrent publishes can interleave a rename into the other's
    // delete→rename window — surfacing (pre-fix) as
    // FileAlreadyExistsException despite OVERWRITE (caught live by
    // FingerprintStoreSpec's racing-writers run). Two hammering threads
    // reproduce the window with good probability; the publish must
    // absorb it and the target must always read as ONE complete value.
    graft.ScratchDir.withDir("pub-race") { base =>
      val target = new Path(s"$base/state")
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 2).map { t =>
        new Thread(() =>
          try (1 to 150).foreach { i =>
            AtomicPublish.file(conf, target)(_.writeLong(t * 1000L + i))
          } catch { case e: Throwable => errors.add(e): Unit })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errors.isEmpty, s"racing publish threw: ${errors.peek()}")
      val v = AtomicPublish.readFile(conf, target)(_.readLong())
      assert(v == 1150L || v == 2150L, s"unexpected final value $v")
    }
  }
}
