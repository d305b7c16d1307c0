package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for persisted single-table artifacts. */
object Artifacts {

  /** THE `_SUCCESS`-gated parquet read every single-table artifact
    * store shares (`Dedup.readMinhashSignatures`, `Classify`'s model
    * tables): a crashed overwrite deletes the target before the job
    * commits, so a store without its job-commit marker may be a
    * committer-dependent partial state — and these tables feed joins
    * where partial or empty input is SILENTLY wrong (missed
    * duplicates, empty scored batches), so the read must refuse, not
    * degrade. One definition so a future fix to the gate (URI
    * normalization, marker convention) cannot leave one reader's
    * crash behavior silently diverged from another's.
    *
    * `who` names the calling reader in the error; `hint` says how to
    * rebuild the artifact.
    */
  def gatedRead(spark: SparkSession, dir: String, who: String,
      hint: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")),
      s"$who: no _SUCCESS job-commit marker under $dir — the artifact " +
        s"was never completely written; $hint")
    spark.read.parquet(dir)
  }

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** THE versioned-dir listing/seal/prune core, shared by the
    * single-table model stores here (`seal = "_SUCCESS"` — the
    * table's own job-commit marker) and the multi-table IVFADC index
    * (`seal = "meta/_SUCCESS"` — meta written last seals the whole
    * version; [[graft.ops.VectorOps]]). One implementation so the two
    * stores' version-resolution and prune rules cannot silently
    * drift — the gatedRead single-definition rationale applied to the
    * versioning contract.
    */
  private[graft] def versionDirs(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case s if s.matches("v=\\d+") => s.stripPrefix("v=").toLong }
  }

  private[graft] def isCompleteVersion(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, v: Long, seal: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=$v/$seal"))

  /** The prune rule: keep the newest `keep` COMPLETE versions, delete
    * older complete ones and incomplete versions BELOW the newest
    * complete (crashed writes a later one superseded); an incomplete
    * version ABOVE the newest complete may be in flight and survives.
    * Returns the kept complete versions (callers with per-version
    * inner state — the index's codes appends — sweep those next).
    */
  private[graft] def pruneVersionDirs(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, keep: Int, seal: String): Seq[Long] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val all = versionDirs(fs, dir).sorted
    val complete = all.filter(isCompleteVersion(fs, dir, _, seal))
    if (complete.isEmpty) return Seq.empty
    val keepSet = complete.takeRight(keep).toSet
    all.filter(v =>
        (complete.contains(v) && !keepSet(v)) ||
        (!complete.contains(v) && v < complete.max))
      .foreach(v => fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v=$v"), true))
    keepSet.toSeq.sorted
  }

  private def versions(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[Long] = versionDirs(fs, dir)

  private def isComplete(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, v: Long): Boolean =
    isCompleteVersion(fs, dir, v, "_SUCCESS")

  /** VERSIONED single-table model write — the `writeIvfPqIndex` scheme
    * specialized to one table: each refresh lands in a fresh `v=<n+1>/`
    * whose own `_SUCCESS` job-commit marker seals it, and
    * [[readLatestVersioned]] resolves the highest complete version. A
    * crashed refresh therefore leaves the PREVIOUS model serving
    * (safe-and-serving), where the flat overwrite-in-place scheme left
    * a loud refusal until retrain (safe-but-unavailable) — r10 verdict
    * stretch #9. Old versions are reclaimed deliberately with
    * [[pruneModelVersions]], never by the write.
    */
  def writeVersioned(df: DataFrame, dir: String): Unit = {
    val fs = fsOf(df.sparkSession, dir)
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/v=${(0L +: versions(fs, dir)).max + 1}")
  }

  /** Resolve-and-read the highest COMPLETE model version; a dir with
    * no complete version falls back to the legacy flat layout through
    * the same [[gatedRead]] `_SUCCESS` gate (old artifacts stay
    * readable; a torn flat dir still refuses loudly).
    */
  def readLatestVersioned(spark: SparkSession, dir: String, who: String,
      hint: String): DataFrame = {
    val fs = fsOf(spark, dir)
    val complete = versions(fs, dir).filter(isComplete(fs, dir, _))
    if (complete.nonEmpty) spark.read.parquet(s"$dir/v=${complete.max}")
    else gatedRead(spark, dir, who, hint)
  }

  /** Deliberate model-version cleanup — [[pruneVersionDirs]] with the
    * single-table seal marker.
    */
  def pruneModelVersions(spark: SparkSession, dir: String,
      keep: Int = 1): Unit = {
    pruneVersionDirs(fsOf(spark, dir), dir, keep, "_SUCCESS")
    ()
  }

  // ------------------------------------------------------------------ //
  // Replay-safe BATCH-FOLDED count stores (streaming maintenance for
  // the count-level model statistics — nbCounts/dsirCounts).
  //
  // A count fold (union + re-sum) is NOT idempotent: foreachBatch can
  // redeliver a micro-batch after a crash, and re-folding it would
  // silently double its counts — the additive cousin of the duplicate
  // codes rows the IVFADC stream markers guard against. So every fold
  // version carries an `_ABSORBED` marker file holding the absorbed
  // WATERMARK map (one `writer|maxBatchId` line per writer — bounded
  // at O(writers), since a serial writer's replay can only redeliver
  // ids at or below its last committed one), written atomically AFTER
  // the parquet job commits:
  //
  //   * a replayed batch (id <= its writer's watermark) SKIPS —
  //     counts never double;
  //   * a crash between the parquet commit and the marker leaves a
  //     version with data but no marker: the NEXT fold treats it as
  //     torn (not a legal base), re-folds the same batch from the
  //     newest MARKED version, and produces content identical to the
  //     torn version (fold determinism) — while serving readers
  //     ([[readLatestVersioned]]) may keep reading the torn version
  //     safely, since its DATA is valid (it correctly includes the
  //     batch; only the replay-dedup evidence is missing);
  //   * the seed write stamps an EMPTY marker, so a marker-less
  //     version is always a torn fold, never ambiguous.
  //
  // Serial writer per store, like every maintenance path here.
  // ------------------------------------------------------------------ //

  private val AbsorbedMarker = "_ABSORBED"

  /** THE small-marker-file primitives, shared with the IVFADC stream
    * markers ([[graft.ops.VectorOps]] delegates here) — one definition
    * so a fix to the I/O (like the atomic write below) cannot land in
    * one store's markers and not the other's.
    */
  private[graft] def writeSmallFile(fs: org.apache.hadoop.fs.FileSystem,
      path: String, content: String): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private[graft] def readSmallFile(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  /** Atomic small-file write: temp + rename, so a crash mid-write can
    * never leave a PRESENT-but-truncated file (a truncated absorbed
    * marker would seal a version with replay evidence missing —
    * silently double-counted replays). Rename is atomic on HDFS and
    * local filesystems; the leftover temp of a crashed write is inert
    * (never read) and swept with its version dir.
    */
  private[graft] def writeSmallFileAtomic(fs: org.apache.hadoop.fs.FileSystem,
      path: String, content: String): Unit = {
    val tmp = s"$path.tmp"
    writeSmallFile(fs, tmp, content)
    val dst = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(dst)) fs.delete(dst, false)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"writeSmallFileAtomic: rename $tmp -> $path failed")
  }

  /** Seed a batch-folded count store: version 1 + an EMPTY absorbed
    * marker (the marker's presence is what lets the fold path tell a
    * legal base from a torn fold).
    */
  def seedFoldedStore(df: DataFrame, dir: String): Unit = {
    val fs = fsOf(df.sparkSession, dir)
    writeVersioned(df, dir)
    val v = versionDirs(fs, dir).filter(isCompleteVersion(fs, dir, _, "_SUCCESS")).max
    writeSmallFileAtomic(fs, s"$dir/v=$v/$AbsorbedMarker", "")
  }

  /** The newest version that is BOTH job-committed and marker-sealed —
    * the only legal fold base — with its absorbed watermark map
    * (writer → highest folded batch id; BOUNDED at O(writers) because
    * a serial writer's replay can only redeliver ids at or below its
    * last committed one, so the per-writer maximum is the whole
    * evidence). None on an empty/unseeded store.
    */
  private def latestMarkedVersion(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Option[(Long, Map[String, Long])] =
    versionDirs(fs, dir).sorted.reverse
      .find(v => isCompleteVersion(fs, dir, v, "_SUCCESS") &&
        isCompleteVersion(fs, dir, v, AbsorbedMarker))
      .map { v =>
        val path = s"$dir/v=$v/$AbsorbedMarker"
        (v, readSmallFile(fs, path)
          .map(_.linesIterator.filter(_.nonEmpty).map { line =>
            val i = line.lastIndexOf('|')
            // a malformed line is a pre-atomic-write crash artifact:
            // REFUSE loudly — treating a truncated marker as a valid
            // partial watermark map could understate a watermark and
            // let a replay silently double-count
            require(i > 0 && line.drop(i + 1).nonEmpty &&
                line.drop(i + 1).forall(_.isDigit),
              s"corrupt absorbed marker line '$line' in $path (a " +
                "pre-atomic marker write crashed mid-file); verify the " +
                "version's content against its writers, rewrite the " +
                "marker, or delete the version dir")
            line.take(i) -> line.drop(i + 1).toLong
          }.toSeq
            // max per writer, not last-line-wins: robust to a marker
            // holding several lines for one writer (the pre-watermark
            // per-batch format), where lexical order would understate
            // the watermark and let a replay double-count
            .groupMapReduce(_._1)(_._2)(math.max))
          .getOrElse(Map.empty))
      }

  private def renderMarker(m: Map[String, Long]): String =
    m.toSeq.sorted.map { case (w, b) => s"$w|$b" }.mkString("\n")

  /** Version write that CARRIES the fold base's absorbed watermarks —
    * for non-batch (caller-managed, e.g. one-shot backfill) folds on a
    * store that batch folds also maintain. The caller passes the
    * `absorbed` map it got from [[readLatestFoldBase]] — PINNING the
    * base it actually merged from, instead of re-resolving here: a
    * stream fold landing between the caller's read and this write
    * would otherwise advance the marker past a batch whose counts the
    * caller's frame does not contain, and that batch's redelivery
    * would skip on the carried watermark — counts silently lost.
    */
  def writeVersionedCarryMarker(df: DataFrame, dir: String,
      absorbed: Map[String, Long]): Unit = {
    val fs = fsOf(df.sparkSession, dir)
    writeVersioned(df, dir)
    val v = versionDirs(fs, dir)
      .filter(isCompleteVersion(fs, dir, _, "_SUCCESS")).max
    writeSmallFileAtomic(fs, s"$dir/v=$v/$AbsorbedMarker", renderMarker(absorbed))
  }

  /** The (frame, absorbed watermarks) every ONE-SHOT fold must merge
    * from: the newest MARKER-SEALED version — never a torn fold
    * version, whose data validly serves readers but whose replay
    * evidence died with the crash. And because a one-shot caller has
    * NO checkpoint to redeliver a torn version's batch (unlike the
    * stream path, where the redelivery re-folds it), a torn fold
    * version sitting ABOVE the marked base REFUSES loudly here:
    * superseding it silently would discard that batch's counts
    * forever. The operator re-runs the crashed batch fold (heals it
    * into a marked version) or deletes the torn dir deliberately.
    * Falls back to the plain versioned/legacy read (empty watermarks)
    * when the store has no marked version at all.
    */
  def readLatestFoldBase(spark: SparkSession, dir: String, who: String,
      hint: String): (DataFrame, Map[String, Long]) = {
    val fs = fsOf(spark, dir)
    latestMarkedVersion(fs, dir) match {
      case Some((v, absorbed)) =>
        val tornAbove = versionDirs(fs, dir)
          .filter(u => u > v && isCompleteVersion(fs, dir, u, "_SUCCESS") &&
            !isCompleteVersion(fs, dir, u, AbsorbedMarker))
        require(tornAbove.isEmpty,
          s"$who: version(s) ${tornAbove.sorted.mkString(",")} under $dir " +
            "are torn batch folds (data committed, watermark marker crashed) " +
            "ABOVE the marked base v=" + v + " — a one-shot fold from the " +
            "base would silently discard their batches' counts (no " +
            "checkpoint exists to redeliver them). Re-run the crashed batch " +
            "fold to heal, or delete the torn version dir(s) deliberately")
        (spark.read.parquet(s"$dir/v=$v"), absorbed)
      case None => (readLatestVersioned(spark, dir, who, hint), Map.empty)
    }
  }

  /** This writer's absorbed watermark on a folded store, if any — the
    * fresh-incarnation guard's input ([[graft.streaming.DocStream
    * .nbCountsOnIngest]] refuses to start a fresh checkpoint whose
    * ids would be silently skipped as replays).
    */
  def writerWatermark(spark: SparkSession, dir: String,
      writerId: String): Option[Long] =
    latestMarkedVersion(fsOf(spark, dir), dir).flatMap(_._2.get(writerId))

  /** Prune for a BATCH-FOLDED store: completeness = the absorbed
    * marker (written last, and implying `_SUCCESS`), so a torn fold
    * version above the newest marked one survives as in-flight and —
    * crucially — the newest MARKED base is never deleted in its favor.
    * [[pruneModelVersions]] (seal = `_SUCCESS`) must NOT be used on a
    * folded store: it would count a torn fold as complete and could
    * reclaim the only legal fold base under it.
    */
  def pruneFoldedStore(spark: SparkSession, dir: String,
      keep: Int = 1): Unit = {
    pruneVersionDirs(fsOf(spark, dir), dir, keep, AbsorbedMarker)
    ()
  }

  /** The next safe batch id for a NEW writer incarnation on a folded
    * store: one above every absorbed watermark. A recreated checkpoint
    * at the SAME path restarts foreachBatch ids at 0, and those ids
    * are indistinguishable from replays of the old incarnation's
    * batches — they would be silently skipped (the store cannot tell
    * content apart, only identity; same limitation as the IVFADC
    * stream markers). Streams restarted on a fresh checkpoint MUST
    * pass `baseBatchId = nextBatchId(...)`.
    */
  def nextBatchId(spark: SparkSession, dir: String): Long =
    latestMarkedVersion(fsOf(spark, dir), dir)
      .map(_._2.values.foldLeft(-1L)(math.max) + 1).getOrElse(0L)

  /** Replay-safe fold of one micro-batch's `delta` counts into the
    * store: skip when `batchId` is at or below this writer's absorbed
    * watermark (a serial writer's replay can only redeliver such ids);
    * otherwise merge (union + re-sum over `keyCols`, exact integer
    * arithmetic) from the marker-sealed base into a fresh version
    * carrying the advanced watermark. Returns whether a fold ran
    * (false = replay skip).
    */
  def foldCountsBatch(spark: SparkSession, dir: String, delta: DataFrame,
      keyCols: Seq[String], batchId: Long, writerId: String): Boolean = {
    import org.apache.spark.sql.functions.{col, sum}
    require(writerId.nonEmpty && !writerId.contains("|") && !writerId.contains("\n"),
      s"foldCountsBatch: writerId must be non-empty without '|'/newlines, got '$writerId'")
    val fs = fsOf(spark, dir)
    val (baseV, absorbed) = latestMarkedVersion(fs, dir).getOrElse(
      throw new IllegalArgumentException(
        s"foldCountsBatch: $dir has no marker-sealed base version — seed the " +
          "store with seedFoldedStore (a plain writeVersioned store cannot " +
          "prove which batches it already contains)"))
    if (absorbed.get(writerId).exists(batchId <= _)) return false
    val merged = spark.read.parquet(s"$dir/v=$baseV")
      .unionByName(delta)
      .groupBy(keyCols.map(col): _*).agg(sum(col("cnt")).as("cnt"))
    writeVersioned(merged, dir)
    val vnew = versionDirs(fs, dir)
      .filter(isCompleteVersion(fs, dir, _, "_SUCCESS")).max
    writeSmallFileAtomic(fs, s"$dir/v=$vnew/$AbsorbedMarker",
      renderMarker(absorbed.updated(writerId, batchId)))
    true
  }
}
