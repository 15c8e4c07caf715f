package graft.operators

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for the LANDED corpus tables — the last table in
  * the ingest estate with no maintenance story: the audited landing sinks
  * ([[graft.streaming.CorpusIngest.writeAudited]] and siblings) append one
  * parquet file per source-partition per micro-batch, which at ingest
  * cadence is the classic small-files trajectory (a year of 30-second
  * micro-batches is ~10⁶ files per source dir; every downstream scan pays
  * a task per file and the namenode pays an entry). The fingerprint store
  * (manifest fold), the graduated markers (rewrite), the sweep watermark
  * (fold-compact) and the ANN index (generation swap) all already compact;
  * this closes the set for the plain-parquet landing table WITHOUT giving
  * it a manifest — the landing table's value is that any engine (the
  * DuckDB oracle included) reads it as a plain partitioned dir, so the
  * protocol must leave it a plain partitioned dir at every committed
  * state.
  *
  * What it does: per partition directory, first-fit-decreasing bin-packs
  * the committed data files SMALLER than `targetBytes` into bins of at
  * most `targetBytes` total, rewrites each bin of ≥ `minBinFiles` files
  * into ONE fresh-named file in the same directory, and deletes the bin's
  * sources. Files already ≥ `targetBytes` are never read, never rewritten,
  * never moved — byte-identical after every run (the ext73 untouched-
  * partition discipline), so the rewrite cost is bounded by the small-file
  * bytes, never the table. Bins are rewritten by one Spark job per
  * distinct PER-DIRECTORY schema — one job total for a fixed-schema
  * landing table, and never a job that unions schemas across partition
  * dirs (a dir whose files don't carry some optional column must not gain
  * a null-filled copy of it from a sibling dir's bin riding the same
  * write). Within a job the binned files are read as an explicit file
  * list (`recursiveFileLookup` so no hive-partition inference re-adds the
  * dir-encoded columns into the data files), each row routed to its bin
  * map-side by matching `input_file_name()` against a broadcast literal
  * map keyed by the scan's own path rendering
  * (`SparkPath.fromFileStatus(_).urlEncoded` — exact on every filesystem,
  * authority and percent-encoding included; an unmapped file ⇒
  * `raise_error`, never a silently mis-binned row), then ONE shuffle
  * partitioned by bin id writes one file per bin (dynamic `partitionBy`
  * under a dot-prefixed staging dir that plain readers cannot see,
  * `maxRecordsPerFile` pinned off so a session default cannot split a
  * bin). The shuffle moves only the small-file bytes.
  *
  * Crash contract — heal FORWARD, never lose, duplicate only inside the
  * crash window: after ALL bins are staged, a journal naming every
  * (target, staged, sources) triple is atomically published
  * ([[graft.util.AtomicPublish.file]]); only then does the swap run, per
  * bin: rename the staged file to its fresh target name, THEN delete that
  * bin's sources. Every [[compactLanded]] call heals a leftover journal
  * first: target already published → delete the bin's remaining sources;
  * staged still present → finish the rename, then delete; neither (the
  * journal's write raced a crash impossibly early) → verify every source
  * still present and skip, sources intact. A crash before the journal
  * orphans only the dot-invisible staging dir (reclaimed by the next
  * heal); a crash between a bin's rename and its source deletes leaves
  * that bin transiently DUPLICATED — never missing — until the next run
  * heals it: the at-least-once posture every landing-side component here
  * chooses (the sweep watermark's "a crash can only re-sweep, never
  * silently skip"). Rewriting row-to-file identity is safe for THESE
  * tables because the landing path's idempotence is content-based (the
  * digest anti-join in the graduation, the k:/r: dedup keys at the
  * stream), never file-based; a table whose exactly-once story PINS file
  * names — a streaming file-sink output with a `_spark_metadata` log,
  * where readers resolve the file list through the log — must NOT be
  * compacted underneath its log, and this operator REFUSES it loudly.
  *
  * Concurrency contract: single-writer maintenance window, the same class
  * contract as [[graft.streaming.CorpusIngest.compactGraduated]] — run
  * between micro-batches (or in foreachBatch's exclusive window); a plain
  * reader concurrent with the swap can observe a bin's rows twice for the
  * instants between its rename and its deletes (documented above), and a
  * reader concurrent with nothing (the normal case) sees only committed
  * plain-parquet states.
  *
  * Driver-memory bound at extreme file counts: the plan (one recursive
  * listing, the FFD bins, the file→bin literal map) is driver-side
  * metadata sized by the files THIS run touches — fine at maintenance
  * cadence, but a years-neglected table's 10⁶-small-file backlog would
  * make one run's listing and bin-route literal driver-heavy. The
  * bound is structural: `table` may be ANY directory, and the journal,
  * staging and heal are all per-root, so runs over disjoint subtrees
  * compose — each heals only its own protocol state — while the
  * single-writer contract shrinks to the subtree each run owns.
  * [[compactBacklog]] (r14 verdict #6) applies that bound
  * automatically: it probes the file count with an EARLY-EXIT listing
  * (never more than `budgetFiles`+1 entries held), and a subtree over
  * budget recurses into its visible child directories — healing any
  * journal a prior differently-sharded run left at the intermediate
  * root, then compacting the root's own direct files as one scoped
  * leaf — so a 10⁶-file backlog becomes many bounded per-subtree runs
  * inside one call, driver metadata never exceeding one leaf's share.
  * (A single FLAT directory over budget cannot shard below its own
  * file count — it compacts as one leaf, the same cost as
  * [[compactLanded]] today.)
  */
object TableCompaction {

  /** One compaction run's accounting: committed data files before/after,
    * bins rewritten (including zero-row delete-only bins), source bytes
    * rewritten, and journal bins healed forward from a prior crash. */
  final case class CompactStats(
      filesBefore: Long,
      filesAfter: Long,
      binsWritten: Long,
      bytesRewritten: Long,
      healedBins: Long)

  /** The one default fold target, shared with the streaming cadence
    * knobs so the in-stream fold and the out-of-band operator cannot
    * silently drift apart. */
  val DefaultTargetBytes: Long = 128L << 20

  private val JournalName = ".compact_journal"
  private val JournalMagic = "GRAFT_COMPACT_JOURNAL_V1"
  private val StagingPrefix = ".compact_staging_"
  private val BinCol = "__graft_bin"

  /** target == "" marks a DELETE-ONLY bin: every source was verified
    * zero-row before journaling (dynamic partitionBy writes no file for
    * an empty bin), so the heal/swap just removes the empty files. */
  private final case class Move(
      target: String, staged: String, sources: Seq[String])

  /** Filesystem + QUALIFIED root for `table`, resolved once at every
    * public entry: a relative table path would otherwise make the
    * hidden-ancestor walk compare relative against absolute (every file
    * silently classified hidden under a dotted cwd) and the journal
    * relativization throw. */
  private def fsAndRoot(
      spark: SparkSession, table: String): (FileSystem, Path) = {
    val p = new Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(p))
  }

  /** A committed, visible data file: parquet, not a `_`/`.` marker, not
    * under a committer's `_temporary/` staging, not under any hidden
    * (dot-prefixed) directory such as our own staging. Same predicate
    * family as [[graft.util.CommittedTable.hasData]] — including the
    * hidden-ancestor walk, since r14 ADVICE (the two must agree inside
    * a compaction crash window). */
  private def isCommittedDataFile(root: Path, f: FileStatus): Boolean = {
    val n = f.getPath.getName
    def hiddenAncestor(p: Path): Boolean = {
      var cur = p.getParent
      while (cur != null && cur.toUri.getPath != root.toUri.getPath) {
        val cn = cur.getName
        if (cn.startsWith(".") || cn.startsWith("_")) return true
        cur = cur.getParent
      }
      false
    }
    f.isFile && n.endsWith(".parquet") &&
      !n.startsWith("_") && !n.startsWith(".") &&
      !hiddenAncestor(f.getPath)
  }

  /** Committed data files grouped by their immediate parent dir (the
    * partition leaf for `partitionBy` layouts; the root itself for flat
    * tables), PLUS every `.compact_journal` found strictly BELOW the
    * root (r15 ADVICE: a crashed CHILD-scoped run — a [[compactBacklog]]
    * shard, or a user's own per-subtree maintenance — leaves its journal
    * at the child, where a later run scoped at THIS root would neither
    * heal it nor see that the child's published bins and stale undeleted
    * sources are half of one swap; planning over that listing re-bins
    * the duplicates as data, permanently). ONE recursive listing — the
    * run's only full walk of a table whose motivating problem is file
    * count. The listing ALSO refuses a `_spark_metadata` file-sink log
    * found BELOW the root (r15): the ancestor walk at the public entries
    * only looks UP, so a sink table nested inside the given root would
    * otherwise have its part files rewritten — same desync, opposite
    * direction. The log's own files surface it here (its dir holds batch
    * files the recursive listing visits), one O(depth) walk per listed
    * file, the walk [[isCommittedDataFile]] pays anyway. */
  private def listCommitted(
      fs: FileSystem, root: Path): (Map[Path, Seq[FileStatus]], Seq[Path]) = {
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer[FileStatus]()
    val journals = scala.collection.mutable.ArrayBuffer[Path]()
    while (it.hasNext) {
      val f = it.next()
      var cur = f.getPath.getParent
      while (cur != null && cur.toUri.getPath != root.toUri.getPath) {
        require(cur.getName != "_spark_metadata",
          s"${cur.getParent} (under $root) is a streaming file-sink " +
            "table (_spark_metadata): its readers resolve the file list " +
            "through the log — compact the sink's OUTPUT only via a " +
            "log-aware rewrite, not this operator")
        cur = cur.getParent
      }
      if (f.getPath.getName == JournalName &&
          f.getPath.getParent.toUri.getPath != root.toUri.getPath)
        journals += f.getPath
      if (isCommittedDataFile(root, f)) buf += f
    }
    (buf.toSeq.groupBy(_.getPath.getParent), journals.toSeq)
  }

  private def dataFilesByDir(
      fs: FileSystem, root: Path): Map[Path, Seq[FileStatus]] =
    listCommitted(fs, root)._1

  /** Count of committed data files — the dial the lifecycle entry emits. */
  def committedDataFiles(spark: SparkSession, table: String): Long = {
    val (fs, root) = fsAndRoot(spark, table)
    if (!fs.exists(root)) 0L
    else dataFilesByDir(fs, root).valuesIterator.map(_.size.toLong).sum
  }

  /** First-fit-decreasing over the files smaller than `targetBytes`:
    * descending by size, each file lands in the first bin it fits (sum ≤
    * `targetBytes`) or opens a new one; bins that end up with fewer than
    * `minBinFiles` files are dropped (rewriting one file buys nothing). */
  private def planBins(files: Seq[FileStatus], targetBytes: Long,
      minBinFiles: Int): Seq[Seq[FileStatus]] = {
    final class Bin { var size = 0L
      val members = scala.collection.mutable.ArrayBuffer[FileStatus]() }
    val bins = scala.collection.mutable.ArrayBuffer[Bin]()
    for (f <- files.filter(_.getLen < targetBytes).sortBy(-_.getLen)) {
      val bin = bins.find(_.size + f.getLen <= targetBytes).getOrElse {
        val b = new Bin; bins += b; b
      }
      bin.size += f.getLen
      bin.members += f
    }
    bins.toSeq.map(_.members.toSeq).filter(_.size >= minBinFiles)
  }

  /** The scan-side rendering of a file path — the EXACT string
    * `input_file_name()` reports for rows read from this file
    * (`FileScanRDD` publishes `PartitionedFile.urlEncodedPath`, built by
    * `SparkPath.fromFileStatus` during listing), so the file→bin map
    * joins on identity with no normalization to get wrong across
    * schemes, authorities, or percent-encoded names. */
  private def scanKey(f: FileStatus): String =
    org.apache.spark.paths.SparkPath.fromFileStatus(f).urlEncoded

  private def relativize(root: Path, p: Path): String = {
    val r = root.toUri.getPath.stripSuffix("/") + "/"
    val c = p.toUri.getPath
    require(c.startsWith(r), s"$p is not under $root")
    c.substring(r.length)
  }

  private def readMoves(
      conf: org.apache.hadoop.conf.Configuration,
      journal: Path): Seq[Move] =
    graft.util.AtomicPublish.readFile(conf, journal,
      Some(JournalMagic)) { in =>
      Seq.fill(in.readInt()) {
        val target = in.readUTF()
        val staged = in.readUTF()
        Move(target, staged, Seq.fill(in.readInt())(in.readUTF()))
      }
    }

  /** Heal a leftover journal FORWARD (class doc), then reclaim orphaned
    * staging dirs. Returns the number of journal bins processed; 0 when
    * no journal existed. Runs first in every [[compactLanded]]. */
  private[graft] def healJournal(
      spark: SparkSession, table: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val (fs, root) = fsAndRoot(spark, table)
    if (!fs.exists(root)) return 0L
    val journal = new Path(root, JournalName)
    val moves: Seq[Move] =
      if (graft.util.AtomicPublish.confirmedAbsent(fs, journal)) Seq.empty
      else readMoves(conf, journal)
    for (m <- moves) {
      val sources = m.sources.map(new Path(root, _))
      if (m.target.isEmpty) {
        // delete-only bin: sources were verified zero-row pre-journal
        sources.foreach(s => fs.delete(s, false): Unit)
      } else {
        val target = new Path(root, m.target)
        val staged = new Path(root, m.staged)
        if (fs.exists(target)) ()            // published; finish the deletes
        else if (fs.exists(staged))
          require(fs.rename(staged, target), // finish the swap first
            s"compaction heal: failed to publish $staged -> $target")
        else {
          // the journal is written only after ALL bins are staged, so
          // this state is unreachable by the protocol — defend anyway:
          // with every source still present, skipping loses nothing;
          // with a source missing, rows may be gone — surface, never
          // guess
          require(sources.forall(fs.exists),
            s"compaction heal: bin for ${m.target} has neither staged " +
              "nor published file and some sources are missing — " +
              "manual recovery required")
        }
        if (fs.exists(target))
          sources.foreach(s => fs.delete(s, false): Unit)
      }
    }
    if (moves.nonEmpty) fs.delete(journal, false): Unit
    // any staging dir is now an orphan (single-writer window): a crash
    // before its journal left sources intact; after, the heal above
    // consumed what it needed
    Option(fs.globStatus(new Path(root, s"$StagingPrefix*")))
      .getOrElse(Array.empty)
      .foreach(st => fs.delete(st.getPath, true): Unit)
    moves.size.toLong
  }

  /** Run one compaction pass over `table` (class doc for the protocol,
    * crash and concurrency contracts). No-op — beyond healing any
    * leftover journal — when no directory holds ≥ `minBinFiles` files
    * smaller than `targetBytes`, so the pass is idempotent: a second run
    * over an already-compacted table rewrites nothing and every file is
    * byte-identical. */
  def compactLanded(
      spark: SparkSession,
      table: String,
      targetBytes: Long = DefaultTargetBytes,
      minBinFiles: Int = 2): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(minBinFiles >= 2,
      "minBinFiles < 2 would rewrite lone files for no layout gain")
    val (fs, root) = fsAndRoot(spark, table)
    refuseFileSinkAncestors(fs, root)
    compactScoped(spark, fs, root, targetBytes, minBinFiles)
  }

  /** [[compactLanded]] with an automatic driver-memory bound (r14
    * verdict #6, class doc): when the committed-file count under `table`
    * exceeds `budgetFiles` (probed with an early-exit listing that never
    * holds more than `budgetFiles`+1 entries), the run recurses per
    * visible child directory — partition subtrees in a `partitionBy`
    * layout — and compacts each bounded subtree as its own scoped run
    * (own journal, own staging, own heal; they compose by construction).
    * An intermediate root's leftover journal from a prior
    * differently-sharded run is healed on the way down, and its DIRECT
    * files (rare outside flat tables) compact as one leaf at that root.
    * Equivalent to [[compactLanded]] when under budget; a FLAT
    * over-budget directory cannot shard below its own file count and
    * compacts as one leaf. Same single-writer window — one call, many
    * scoped runs, each owning its subtree. */
  def compactBacklog(
      spark: SparkSession,
      table: String,
      targetBytes: Long = DefaultTargetBytes,
      minBinFiles: Int = 2,
      budgetFiles: Int = 100000): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(minBinFiles >= 2,
      "minBinFiles < 2 would rewrite lone files for no layout gain")
    require(budgetFiles >= 1, s"budgetFiles must be >= 1, got $budgetFiles")
    val (fs, root) = fsAndRoot(spark, table)
    refuseFileSinkAncestors(fs, root)
    shardOne(spark, fs, root, targetBytes, minBinFiles, budgetFiles)
  }

  private def shardOne(
      spark: SparkSession, fs: FileSystem, root: Path,
      targetBytes: Long, minBinFiles: Int, budgetFiles: Int): CompactStats = {
    if (!fs.exists(root)) return CompactStats(0L, 0L, 0L, 0L, 0L)
    if (!committedFilesExceed(fs, root, budgetFiles))
      return compactScoped(spark, fs, root, targetBytes, minBinFiles)
    // over budget: heal THIS root's protocol state first (a prior
    // unsharded — or differently-budgeted — run may have crashed with
    // its journal here; subtree runs heal only their own roots), then
    // recurse per visible child dir and finish with the root's direct
    // files as one scoped leaf
    val healed = healJournal(spark, root.toString)
    val children = fs.listStatus(root)
      .filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
      .sortBy(_.getPath.getName)
    val fromChildren = children.map { child =>
      // a streaming file-sink table NESTED below the given root would be
      // waved through by the ancestor walk (it only looks up) — refuse
      // it here with the same contract before recursing into it
      require(!fs.exists(new Path(child.getPath, "_spark_metadata")),
        s"${child.getPath} carries a streaming file-sink log " +
          "(_spark_metadata): its readers resolve the file list through " +
          "the log — compact the sink's OUTPUT only via a log-aware " +
          "rewrite, not this operator")
      shardOne(spark, fs, child.getPath, targetBytes, minBinFiles,
        budgetFiles)
    }
    val direct = fs.listStatus(root)
      .filter(st => isCommittedDataFile(root, st)).toSeq
    val fromDirect =
      if (direct.isEmpty) CompactStats(0L, 0L, 0L, 0L, 0L)
      else compactFrom(spark, fs, root, Map(root -> direct), targetBytes,
        minBinFiles, healedAtRoot = 0L)
    (fromChildren :+ fromDirect).foldLeft(
      CompactStats(0L, 0L, 0L, 0L, healed)) { (a, b) =>
      CompactStats(a.filesBefore + b.filesBefore,
        a.filesAfter + b.filesAfter, a.binsWritten + b.binsWritten,
        a.bytesRewritten + b.bytesRewritten, a.healedBins + b.healedBins)
    }
  }

  /** True iff more than `budgetFiles` committed data files live under
    * `root` — an EARLY-EXIT count: the listing iterator stops at
    * budget+1, so probing a 10⁶-file backlog against a 10⁴ budget holds
    * 10⁴+1 entries, never the backlog. */
  private def committedFilesExceed(
      fs: FileSystem, root: Path, budgetFiles: Int): Boolean = {
    val it = fs.listFiles(root, true)
    var n = 0
    while (it.hasNext) {
      if (isCommittedDataFile(root, it.next())) {
        n += 1
        if (n > budgetFiles) return true
      }
    }
    false
  }

  /** The refusal walk shared by every public entry: no `_spark_metadata`
    * file-sink log at the root or ANY ancestor — the class doc
    * recommends per-partition-subtree runs, and a subtree of a sink
    * table carries the log at an ANCESTOR, so a root-only probe would
    * wave the subtree through and desync the log's exactly-once readers
    * all the same. The walk errs in the SAFE direction (r14 ADVICE): an
    * unrelated sink cohabiting a shared ancestor (a _spark_metadata
    * directly under /tmp or a bucket root) refuses unrelated tables
    * beneath it too — a false-positive DENIAL, named in the message so
    * the operator points at the fix (move the table out from under the
    * sink) instead of reading as its own bug. */
  private def refuseFileSinkAncestors(fs: FileSystem, root: Path): Unit = {
    var probe: Path = root
    while (probe != null) {
      require(!fs.exists(new Path(probe, "_spark_metadata")),
        s"$probe carries a streaming file-sink log (_spark_metadata): " +
          "its readers resolve the file list through the log, so " +
          "rewriting files underneath it desyncs exactly-once reads — " +
          "compact the sink's OUTPUT only via a log-aware rewrite, not " +
          "this operator. (If this log belongs to an UNRELATED sink " +
          s"cohabiting a shared ancestor of $root, the refusal is a " +
          "deliberate false positive — relocate the table outside the " +
          "sink's tree.)")
      probe = probe.getParent
    }
  }

  /** One scoped run at `root`: heal, list, compact — [[compactLanded]]
    * minus the ancestor refusal (done once per public call), shared by
    * [[compactBacklog]]'s bounded leaves. Any `.compact_journal` the
    * listing finds BELOW the root is a crashed NARROWER-scoped run's
    * protocol state (a backlog shard, a per-subtree maintenance run):
    * heal each at ITS OWN root first — deepest first, each heal is
    * confined to its subtree — and re-list, so half-swapped child state
    * (published bin + stale sources + live journal) is never planned
    * over as committed data (r15 ADVICE: re-binning both halves
    * duplicates the rows permanently, and the surviving stale journal
    * resurrects them again at the next child-scoped heal). */
  private def compactScoped(
      spark: SparkSession, fs: FileSystem, root: Path,
      targetBytes: Long, minBinFiles: Int): CompactStats = {
    var healed = healJournal(spark, root.toString)
    if (!fs.exists(root))
      return CompactStats(0L, 0L, 0L, 0L, healed)
    var (byDir, nested) = listCommitted(fs, root)
    if (nested.nonEmpty) {
      nested.sortBy(-_.toUri.getPath.length)
        .foreach(j => healed += healJournal(spark, j.getParent.toString))
      val again = listCommitted(fs, root)
      // healJournal deletes every journal it processes, so a survivor
      // means an unreadable/empty journal — surface it, never plan over
      // a subtree whose protocol state can't be resolved
      require(again._2.isEmpty,
        s"compaction: nested journal(s) survive healing under $root: " +
          s"${again._2.mkString(", ")} — manual recovery required")
      byDir = again._1
    }
    compactFrom(spark, fs, root, byDir, targetBytes,
      minBinFiles, healed)
  }

  /** The plan → stage → journal → swap tail over an explicit `byDir`
    * listing (class doc for the protocol and crash contract). */
  private def compactFrom(
      spark: SparkSession, fs: FileSystem, root: Path,
      byDir: Map[Path, Seq[FileStatus]], targetBytes: Long,
      minBinFiles: Int, healedAtRoot: Long): CompactStats = {
    val filesBefore = byDir.valuesIterator.map(_.size.toLong).sum
    stageAndJournal(spark, root, byDir, targetBytes, minBinFiles) match {
      case None =>
        CompactStats(filesBefore, filesBefore, 0L, 0L, healedAtRoot)
      case Some((moves, rewrittenBytes, staging)) =>
        for (m <- moves) {
          if (m.target.nonEmpty) {
            val target = new Path(root, m.target)
            require(fs.rename(new Path(root, m.staged), target),
              s"compactLanded: failed to publish ${m.staged} -> ${m.target}")
          }
          m.sources.foreach(s => fs.delete(new Path(root, s), false): Unit)
        }
        fs.delete(new Path(root, JournalName), false): Unit
        fs.delete(staging, true): Unit
        // accounting off the run's own moves, not a second full listing
        // (the table's motivating problem IS its file count): every
        // source deleted, every non-empty target published
        CompactStats(
          filesBefore = filesBefore,
          filesAfter = filesBefore -
            moves.iterator.map(_.sources.size.toLong).sum +
            moves.count(_.target.nonEmpty).toLong,
          binsWritten = moves.size.toLong,
          bytesRewritten = rewrittenBytes,
          healedBins = healedAtRoot)
    }
  }

  /** The plan → stage → journal prefix of the protocol, shared verbatim
    * between [[compactLanded]] and the spec's crash-injection seam
    * [[stageAndJournalOnly]] (there is no way to crash a JVM
    * mid-protocol from ScalaTest, so the spec needs the exact production
    * prefix, stopped at the exact crash point — a restated copy would
    * drift). None when no directory holds a qualifying bin; otherwise
    * the journaled moves, the source bytes they rewrite, and the staging
    * dir. On return the journal is PUBLISHED and the live table is still
    * untouched — the swap (or a heal) can always complete forward. */
  private def stageAndJournal(
      spark: SparkSession, root: Path,
      byDir: Map[Path, Seq[FileStatus]], targetBytes: Long,
      minBinFiles: Int): Option[(Seq[Move], Long, Path)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    val bins: Seq[(Int, Seq[FileStatus])] = byDir.toSeq
      .sortBy { case (dir, _) => dir.toUri.getPath }
      .flatMap { case (_, files) => planBins(files, targetBytes, minBinFiles) }
      .zipWithIndex.map(_.swap)
    if (bins.isEmpty) return None

    val runId = java.util.UUID.randomUUID().toString.take(12)
    val staging = new Path(root, s"$StagingPrefix$runId")

    // one staging job per distinct PER-DIR schema (class doc): a dir's
    // bins ride a job whose schema is the merge of exactly that dir's
    // binned files, so no bin's rewrite can absorb a column from a
    // SIBLING dir's schema drift; for the fixed-schema landing tables
    // this is one group — one job — total
    val binnedByDir: Map[Path, Seq[FileStatus]] = bins.flatMap(_._2)
      .groupBy(_.getPath.getParent)
    val dirSchema: Map[Path, org.apache.spark.sql.types.StructType] =
      binnedByDir.map { case (dir, members) =>
        dir -> spark.read
          .option("recursiveFileLookup", "true")
          .option("mergeSchema", "true")
          .parquet(members.map(_.getPath.toString): _*)
          .schema
      }
    val groups: Seq[Seq[(Int, Seq[FileStatus])]] = bins
      .groupBy { case (_, members) =>
        dirSchema(members.head.getPath.getParent).json
      }
      .toSeq.sortBy(_._1).map(_._2)
    for (group <- groups) {
      val schema = dirSchema(group.head._2.head.getPath.getParent)
      require(!schema.fieldNames.contains(BinCol),
        s"compactLanded: table carries a column named $BinCol, which " +
          "the bin-routing write would overwrite and then drop — " +
          "rename the column or compact this table another way")
      val pathToBin: Map[String, Int] = group.flatMap { case (i, members) =>
        members.map(f => scanKey(f) -> i)
      }.toMap
      spark.read
        .option("recursiveFileLookup", "true")
        .schema(schema)
        .parquet(group.flatMap(_._2).map(_.getPath.toString): _*)
        .withColumn(BinCol,
          element_at(typedlit(pathToBin), input_file_name()))
        .withColumn(BinCol,
          when(col(BinCol).isNull,
            raise_error(concat(lit("compactLanded: unmapped input file "),
              input_file_name())))
            .otherwise(col(BinCol)))
        .repartition(group.size, col(BinCol))
        .write.partitionBy(BinCol).mode("append")
        // a session-level maxRecordsPerFile would split a large bin into
        // several staged parts and wedge the one-file-per-bin invariant
        .option("maxRecordsPerFile", 0)
        .parquet(staging.toString)
    }

    // resolve each bin's single staged part file; a bin whose files were
    // all zero-row produced none (dynamic partitionBy writes only
    // partitions with rows) — verify that emptiness from the actual
    // bytes, then journal it delete-only
    val moves: Seq[Move] = bins.map { case (i, members) =>
      val binDir = new Path(staging, s"$BinCol=$i")
      val parts = Option(fs.globStatus(new Path(binDir, "part-*.parquet")))
        .getOrElse(Array.empty)
      val sources = members.map(f => relativize(root, f.getPath))
      if (parts.isEmpty) {
        require(spark.read
            .option("recursiveFileLookup", "true")
            .parquet(members.map(_.getPath.toString): _*).isEmpty,
          s"compactLanded: bin $i staged no file but its sources hold rows")
        Move("", "", sources)
      } else {
        require(parts.length == 1,
          s"compactLanded: bin $i staged ${parts.length} files (expected 1)")
        val dir = members.head.getPath.getParent
        Move(
          relativize(root, new Path(dir, s"compacted-$runId-$i.parquet")),
          relativize(root, parts.head.getPath),
          sources)
      }
    }

    // intent journal AFTER all bins are staged, BEFORE any mutation of
    // the live table — the heal can always complete forward from here
    graft.util.AtomicPublish.file(conf, new Path(root, JournalName),
      Some(JournalMagic)) { out =>
      out.writeInt(moves.size)
      moves.foreach { m =>
        out.writeUTF(m.target); out.writeUTF(m.staged)
        out.writeInt(m.sources.size); m.sources.foreach(out.writeUTF)
      }
    }
    Some((moves, bins.iterator.flatMap(_._2).map(_.getLen).sum, staging))
  }

  /** The staging + journal half of [[compactLanded]] WITHOUT the swap —
    * the crash-injection seam the spec drives to pin the heal paths.
    * Returns the journaled moves' target names ("" for delete-only
    * bins). Production code never calls this. */
  private[graft] def stageAndJournalOnly(
      spark: SparkSession, table: String, targetBytes: Long,
      minBinFiles: Int = 2): Seq[String] = {
    val (fs, root) = fsAndRoot(spark, table)
    val staged = stageAndJournal(spark, root,
      dataFilesByDir(fs, root), targetBytes, minBinFiles)
    require(staged.nonEmpty, "stageAndJournalOnly: nothing to stage")
    staged.get._1.map(_.target)
  }

  /** Execute the first `n` journaled swaps' RENAME half only (no source
    * deletes; delete-only bins have nothing to rename and are skipped) —
    * the partial-swap crash shape the spec injects. */
  private[graft] def renameFirstJournaled(
      spark: SparkSession, table: String, n: Int): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val (fs, root) = fsAndRoot(spark, table)
    readMoves(conf, new Path(root, JournalName))
      .filter(_.target.nonEmpty).take(n).foreach { m =>
        require(fs.rename(new Path(root, m.staged), new Path(root, m.target)),
          s"renameFirstJournaled: $m")
      }
  }
}
