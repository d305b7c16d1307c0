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

  /** One listing of a `<prefix>=<n>` sealed-dir family — (id, sealed?)
    * pairs, id-sorted; sealed = the dir's own `_SUCCESS` job-commit
    * marker. Shared by the IVFADC codes appends / deletion tombstones
    * ([[graft.ops.VectorOps]]) and the dedup state's tombstones
    * ([[graft.ops.Dedup]]) so the dir-naming and sealing convention —
    * and therefore torn-write invisibility — lives in one place.
    */
  private[graft] def sealedFamilyDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: String, prefix: String): Seq[(Long, Boolean)] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.matches(s"$prefix=\\d+") =>
        s.stripPrefix(s"$prefix=").toLong }
      .sorted
      .map(a => (a, fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/$prefix=$a/_SUCCESS"))))
  }

  // ------------------------------------------------------------------ //
  // Crash-safe IN-PLACE rewrite of one directory-shaped artifact part
  // (a partition of a partitioned store) — for maintenance that must
  // REWRITE an existing dir's content (tombstone materialization in the
  // dedup signature store / cluster-assignment heal), where neither
  // append-then-delete (content must shrink, not grow) nor whole-store
  // versioning (the store's layout is the partition dirs themselves)
  // applies. Protocol, with every crash window recoverable:
  //
  //   1. write the new content to `_rw_tmp_<name>` (parquet job commit
  //      seals it with its own _SUCCESS; the `_` prefix hides it from
  //      Spark's file listing, so readers never see it);
  //   2. rename `<name>` -> `_rw_old_<name>`   (atomic park);
  //   3. rename `_rw_tmp_<name>` -> `<name>`   (atomic swap-in);
  //   4. delete `_rw_old_<name>`.
  //
  // A crash before 2 leaves the original serving (stale tmp swept by
  // [[healRewrites]]); between 2 and 3 the original is parked and the
  // sealed tmp is the sole complete copy (healRewrites completes the
  // swap); after 3 only the park remains to sweep. The ONLY dangerous
  // window for a reader is 2->3, where `<name>` is missing and a plain
  // read would silently see a shrunken store — which is why every
  // reader of a rewrite-maintained store must refuse while a
  // `_rw_old_*` park exists ([[rewriteParks]]). Serial-writer contract:
  // a rewrite must not race another writer of the same dir.
  // ------------------------------------------------------------------ //

  private[graft] def rewriteDirInPlace(fs: org.apache.hadoop.fs.FileSystem,
      root: String, name: String)(write: String => Unit): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$root/_rw_tmp_$name")
    val park = new org.apache.hadoop.fs.Path(s"$root/_rw_old_$name")
    val cur = new org.apache.hadoop.fs.Path(s"$root/$name")
    require(!fs.exists(park),
      s"rewriteDirInPlace: leftover park $park from a crashed rewrite — " +
        "run healRewrites first")
    fs.delete(tmp, true) // stale tmp of a crashed pre-swap attempt
    write(tmp.toString)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$tmp/_SUCCESS")),
      s"rewriteDirInPlace: $tmp has no _SUCCESS after write — the writer " +
        "must commit a job marker before the swap")
    require(fs.rename(cur, park), s"rewriteDirInPlace: rename $cur -> $park failed")
    require(fs.rename(tmp, cur), s"rewriteDirInPlace: rename $tmp -> $cur failed")
    fs.delete(park, true)
  }

  /** The `_rw_old_*` parks under `root` — non-empty means a rewrite
    * crashed in its only reader-dangerous window (original parked, swap
    * not yet completed) OR just before its final cleanup; readers of a
    * rewrite-maintained store must REFUSE while any exist (a plain read
    * would silently miss the parked dir's rows) and point the operator
    * at the maintenance op that heals ([[healRewrites]]).
    */
  private[graft] def rewriteParks(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_rw_old_")).sorted
  }

  /** Heal crashed [[rewriteDirInPlace]] attempts under `root`: complete
    * a swap whose original is parked (the sealed tmp is the sole
    * complete copy — roll FORWARD), sweep parks whose swap completed,
    * and sweep stale pre-swap tmps (original intact — the rewrite
    * simply re-runs). Idempotent; run on entry of every maintenance op
    * that uses the protocol.
    */
  private[graft] def healRewrites(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Unit = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootP)) return
    val entries = fs.listStatus(rootP).toSeq.map(_.getPath.getName)
    entries.filter(_.startsWith("_rw_old_")).foreach { parkName =>
      val name = parkName.stripPrefix("_rw_old_")
      val cur = new org.apache.hadoop.fs.Path(s"$root/$name")
      val tmp = new org.apache.hadoop.fs.Path(s"$root/_rw_tmp_$name")
      if (!fs.exists(cur)) {
        // crashed between park and swap-in: the tmp was sealed BEFORE
        // the park happened (protocol order), so it is the complete
        // new content — roll forward
        require(fs.exists(new org.apache.hadoop.fs.Path(s"$tmp/_SUCCESS")),
          s"healRewrites: $root/$parkName is parked but $tmp is missing or " +
            "unsealed — state violates the protocol order; restore the park " +
            s"manually (rename $parkName back to $name)")
        require(fs.rename(tmp, cur), s"healRewrites: rename $tmp -> $cur failed")
      }
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$parkName"), true)
    }
    entries.filter(_.startsWith("_rw_tmp_")).foreach { tmpName =>
      val name = tmpName.stripPrefix("_rw_tmp_")
      // sole remaining case after the park sweep above: original intact,
      // swap never started — the tmp is stale (its content may predate
      // later deletes); the rewrite re-runs from the original
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$root/$name")))
        fs.delete(new org.apache.hadoop.fs.Path(s"$root/$tmpName"), true)
    }
  }

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

  // ------------------------------------------------------------------ //
  // MAINTENANCE WRITER LEASE (r12 verdict #3): the serial-writer
  // contract every maintenance op documents ("run between batches,
  // never concurrently"), made MECHANICAL. A lease is a small marker
  // `_MAINT_LEASE` under the state root holding `writerId|expiresAt`;
  // an op takes it at entry and releases at exit, and a second
  // concurrent invocation REFUSES loudly instead of interleaving
  // park/swap rewrites (the protocol heals crashes, not live
  // contention — two writers racing rewriteDirInPlace on one dir can
  // strand a park). A crashed holder heals by epoch timeout (the TTL)
  // or the explicit [[breakMaintenanceLease]]. Acquisition uses
  // create-exclusive (atomic on HDFS and local filesystems) — this
  // guards the OPERATOR-ERROR case of overlapping crons, which is the
  // likely failure, not Byzantine multi-writer coordination.
  // ------------------------------------------------------------------ //

  private val LeaseName = "_MAINT_LEASE"

  /** Run `body` holding the root's maintenance lease; refuse if a live
    * lease is held (a crashed holder's expired lease is swept). The
    * lease releases on BOTH success and failure — a failed op already
    * refused loudly and the state gates protect its artifacts; only a
    * process crash leaves the lease for the TTL/break heal.
    *
    * Race windows, addressed (review findings, r13):
    *   - create-then-write gap: a concurrent reader seeing the freshly
    *     created EMPTY file must not sweep it as "torn" — unparseable
    *     content is treated as expired only once the file's mtime is
    *     older than a grace period, so an in-flight claim (ms) is
    *     never swept while a genuinely torn crashed write (hours old)
    *     still heals;
    *   - release stomping: the lease content carries a per-claim NONCE
    *     and release deletes only if the content still names THIS
    *     claim — after a TTL overrun a successor may have legitimately
    *     swept and re-acquired, and deleting theirs would re-open the
    *     hazard. The same verify runs right after acquisition, so the
    *     one remaining delete-then-claim interleaving (two sweepers of
    *     the same expired lease) aborts before touching any state.
    *     (POSIX rename REPLACES an existing destination, so a
    *     rename-based claim would silently stomp a live lease on local
    *     filesystems — create-exclusive plus verify is the portable
    *     shape.)
    */
  /** Parse the lease at `p` to (holder, expiresAtMillis); None when no
    * lease exists. Parsing is TOTAL: unparseable content is a mid-claim
    * write (young — reads as live for a grace period, so the
    * create-then-write window is never swept by a concurrent reader)
    * or a crashed holder's torn write (old — reads as expired).
    */
  private def leaseState(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[(String, Long)] = {
    val tornGraceMs = 10 * 60 * 1000L
    // a file that VANISHES anywhere in this read (exists -> open ->
    // stat) is a released lease, not a torn one (r13 ADVICE):
    // FileNotFoundException must read as "no lease" — stamping it with
    // a fresh mtime would spuriously refuse the caller for the whole
    // grace window after a legitimate release raced this read
    val content = try {
      if (!fs.exists(p)) return None
      readSmallFile(fs, p.toString)
    } catch { case _: java.io.FileNotFoundException => return None }
    content.map(_.trim.split('|')) match {
      case Some(Array(h, e, _*)) if e.nonEmpty && e.forall(_.isDigit) =>
        Some((h, e.toLong))
      case _ =>
        // unparseable: a mid-claim write (young — live for the grace
        // period so the create-then-write window is never swept) or a
        // crashed holder's torn write (old — reads as expired)
        val mtime = try fs.getFileStatus(p).getModificationTime
          catch {
            case _: java.io.FileNotFoundException => return None
            case _: java.io.IOException => System.currentTimeMillis()
          }
        Some(("<torn lease>", mtime + tornGraceMs))
    }
  }

  /** Read-only guard for non-maintenance writers (the ingest paths): a
    * LIVE lease means a maintenance op may be mid-rewrite of the very
    * dirs this writer reads and overwrites — refuse the batch rather
    * than interleave. Expired/torn-old leases are ignored here (the
    * next maintenance op sweeps them; an ingest must not delete
    * another writer's marker).
    */
  private[graft] def requireNoLiveMaintenanceLease(
      fs: org.apache.hadoop.fs.FileSystem, root: String, who: String): Unit =
    leaseState(fs, new org.apache.hadoop.fs.Path(s"$root/$LeaseName"))
      .foreach { case (holder, expires) =>
        require(expires < System.currentTimeMillis(),
          s"$who: $root is under maintenance by '$holder' (lease expires " +
            s"${java.time.Instant.ofEpochMilli(expires)}) — run the batch " +
            "after the maintenance window, or breakMaintenanceLease(dir) " +
            "if the holder is known dead")
      }

  private[graft] def withMaintenanceLease[T](fs: org.apache.hadoop.fs.FileSystem,
      root: String, who: String, ttlMs: Long = 2 * 60 * 60 * 1000L)(body: => T): T =
    withMaintenanceLeaseRefresh(fs, root, who, ttlMs)(_ => body)

  /** [[withMaintenanceLease]] handing the body a `refresh` heartbeat
    * (r13 stretch #8): the TTL is the only crash detector, so a
    * legitimately slow maintenance op (a mega-cluster heal) could
    * outlive its lease and be swept MID-REWRITE by the next cron.
    * Calling `refresh()` at phase boundaries re-stamps the expiry
    * (same claim nonce) while the holder is provably alive — a
    * long-running holder making progress is never swept, while a
    * FROZEN one stops refreshing and still heals by TTL. If the lease
    * was already lost (TTL lapsed and a successor swept and claimed),
    * refresh refuses LOUDLY instead of letting two writers interleave
    * park/swap rewrites — the crashed-holder recovery path, surfaced
    * as an error at the first phase boundary instead of as corruption.
    * The re-stamp OVERWRITES in place (never delete+recreate: an
    * absent-file window would let a contender claim mid-refresh); a
    * reader racing the overwrite sees either token or an unparseable
    * tear, and a young tear reads as LIVE for the grace period — the
    * safe direction. A refresh arriving at (or within a skew margin
    * of) its own expiry REFUSES rather than re-stamps: past the TTL a
    * contender may legitimately sweep-and-claim between the token
    * check and the overwrite, and re-stamping would clobber the
    * successor — the residual clobber window is cross-host clock skew
    * beyond the margin, the irreducible limit of a TTL lease on a
    * filesystem without compare-and-swap (a post-write verify narrows
    * it further to the create→read gap).
    */
  private[graft] def withMaintenanceLeaseRefresh[T](
      fs: org.apache.hadoop.fs.FileSystem, root: String, who: String,
      ttlMs: Long = 2 * 60 * 60 * 1000L)(body: (() => Unit) => T): T = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$LeaseName")
    fs.mkdirs(new org.apache.hadoop.fs.Path(root))
    leaseState(fs, p).foreach { case (holder, expires) =>
      require(expires < System.currentTimeMillis(),
        s"$who: $root is under maintenance by '$holder' (lease expires " +
          s"${java.time.Instant.ofEpochMilli(expires)}). Concurrent " +
          "maintenance writers violate the serial-writer contract — wait, " +
          "or breakMaintenanceLease(dir) if the holder is known dead")
      fs.delete(p, false) // expired: crashed holder, heal by timeout
    }
    val nonce = System.nanoTime()
    var token = s"$who|${System.currentTimeMillis() + ttlMs}|$nonce"
    val out = try fs.create(p, false) catch {
      case e: java.io.IOException => throw new IllegalArgumentException(
        s"$who: could not acquire the maintenance lease on $root " +
          s"(${e.getMessage}) — if another writer took it concurrently, " +
          "retry after it finishes")
    }
    try out.write(token.getBytes("UTF-8")) finally out.close()
    // two sweepers of the same expired lease can interleave
    // delete/create; exactly one token survives — only its writer runs
    require(readSmallFile(fs, p.toString).exists(_.trim == token),
      s"$who: lost the maintenance-lease race on $root — another writer " +
        "claimed it concurrently; retry after it finishes")
    def refresh(): Unit = {
      require(readSmallFile(fs, p.toString).exists(_.trim == token),
        s"$who: the maintenance lease on $root was lost mid-run (TTL " +
          "lapsed and another writer claimed it) — aborting before this " +
          "op's next phase can interleave with the successor's rewrites; " +
          "re-run after the successor finishes")
      // A LAPSED lease must never be re-stamped (r14 review): past the
      // TTL a contender may legitimately sweep-and-claim between our
      // token read above and the overwrite below, and the overwrite
      // would silently clobber the successor — the exact interleave
      // this function promises to refuse. Refusing at (expiry − a
      // safety margin) bounds the residual race to cross-host clock
      // skew beyond the margin, the irreducible limit of a TTL lease
      // without compare-and-swap.
      val ownExpiry = token.split('|')(1).toLong
      val margin = math.min(ttlMs / 4, 10 * 60 * 1000L)
      require(System.currentTimeMillis() < ownExpiry - margin,
        s"$who: the maintenance lease on $root has lapsed (or is within " +
          s"${margin}ms of lapsing) — refusing to re-stamp it, since a " +
          "contender may already be sweeping; abort and re-run after the " +
          "TTL window")
      token = s"$who|${System.currentTimeMillis() + ttlMs}|$nonce"
      val o = fs.create(p, true)
      try o.write(token.getBytes("UTF-8")) finally o.close()
      // best-effort post-write verify: a contender that wrote between
      // our create and this read surfaces here instead of at the next
      // phase boundary
      require(readSmallFile(fs, p.toString).exists(_.trim == token),
        s"$who: the maintenance lease on $root changed hands during a " +
          "refresh — aborting before interleaving with the successor")
    }
    try body(() => refresh()) finally {
      if (readSmallFile(fs, p.toString).exists(_.trim == token))
        fs.delete(p, false)
    }
  }

  /** Explicitly break a dead holder's maintenance lease (the operator
    * event for a crashed maintenance process whose TTL has not yet
    * lapsed). Never call it on a LIVE holder — that re-opens the
    * concurrent-writer hazard the lease exists to close.
    */
  def breakMaintenanceLease(spark: SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$LeaseName"), false)
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
    *
    * REFUSES on a store that already has a marked version: re-seeding
    * stamps a fresh EMPTY marker, silently discarding every writer's
    * replay watermark — a stream resumed on its old checkpoint would
    * then re-fold already-absorbed batches and DOUBLE their counts.
    * A deliberate rebuild passes `overwrite = true` and owns the
    * consequence: every writer must restart on a fresh checkpoint
    * (or the rebuild must not include the batches those checkpoints
    * would redeliver).
    */
  def seedFoldedStore(df: DataFrame, dir: String,
      overwrite: Boolean = false): Unit = {
    val fs = fsOf(df.sparkSession, dir)
    if (!overwrite)
      latestMarkedVersion(fs, dir).foreach { case (v, absorbed) =>
        throw new IllegalArgumentException(
          s"seedFoldedStore: $dir already holds marker-sealed version v=$v " +
            s"with ${absorbed.size} writer watermark(s) — re-seeding would " +
            "reset them to empty and let a stream resumed on its old " +
            "checkpoint double-count its replayed batches. Pass " +
            "overwrite=true only for a deliberate rebuild whose writers " +
            "all restart on fresh checkpoints")
      }
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
      keyCols: Seq[String], batchId: Long, writerId: String): Boolean =
    foldBatch(spark, dir, delta, keyCols, batchId, writerId, negate = false)

  /** Replay-safe RETRACTION fold — [[foldCountsBatch]] with the batch's
    * counts SUBTRACTED: the takedown / bad-batch-scrub path of a
    * maintained count store (r11 verdict #2). Integer counts are as
    * associative under subtraction as under addition, so
    * add-batch-then-retract-batch is bit-identical to never-added —
    * the declared q_nb_retracted / q_dsir_retracted put that equality
    * behind the from-scratch oracle hash. Two guards addition never
    * needs:
    *
    *   - a key whose merged count would go NEGATIVE refuses loudly
    *     (the retraction does not match what was added — silently
    *     clamping would corrupt every later fold);
    *   - keys whose count reaches exactly ZERO are dropped (a
    *     from-scratch fit over the scrubbed corpus has no row at all
    *     for them, and the zero row would otherwise shift smoothing
    *     denominators derived from row counts).
    *
    * Replay machinery is the SAME absorbed-watermark map — a retraction
    * writer (use a DISTINCT writerId from the ingest stream, e.g.
    * `"<checkpoint>#retract"`) skips redelivered retractions exactly as
    * an ingest writer skips redelivered adds, so the scrub is
    * replay-safe in both directions.
    */
  def retractCountsBatch(spark: SparkSession, dir: String, delta: DataFrame,
      keyCols: Seq[String], batchId: Long, writerId: String): Boolean =
    foldBatch(spark, dir, delta, keyCols, batchId, writerId, negate = true)

  private def foldBatch(spark: SparkSession, dir: String, delta: DataFrame,
      keyCols: Seq[String], batchId: Long, writerId: String,
      negate: Boolean): Boolean = {
    import org.apache.spark.sql.functions.{col, sum}
    val who = if (negate) "retractCountsBatch" else "foldCountsBatch"
    require(writerId.nonEmpty && !writerId.contains("|") && !writerId.contains("\n"),
      s"$who: writerId must be non-empty without '|'/newlines, got '$writerId'")
    val fs = fsOf(spark, dir)
    val (baseV, absorbed) = latestMarkedVersion(fs, dir).getOrElse(
      throw new IllegalArgumentException(
        s"$who: $dir has no marker-sealed base version — seed the " +
          "store with seedFoldedStore (a plain writeVersioned store cannot " +
          "prove which batches it already contains)"))
    if (absorbed.get(writerId).exists(batchId <= _)) return false
    val signed =
      if (negate) delta.withColumn("cnt", -col("cnt")) else delta
    val merged0 = spark.read.parquet(s"$dir/v=$baseV")
      .unionByName(signed)
      .groupBy(keyCols.map(col): _*).agg(sum(col("cnt")).as("cnt"))
    val merged =
      if (!negate) merged0
      else {
        // the guards need the merged frame twice (negative probe +
        // zero-drop write) — materialize the model-sized result once
        val m = merged0.localCheckpoint(true)
        val bad = m.filter(col("cnt") < 0).limit(1).collect()
        require(bad.isEmpty,
          s"$who: retraction would drive key " +
            s"${bad.headOption.map(_.toString).getOrElse("")} in $dir " +
            "NEGATIVE — the retracted batch does not match what was added " +
            "(wrong batch content, or it was already retracted); refusing " +
            "rather than clamping")
        m.filter(col("cnt") > 0)
      }
    writeVersioned(merged, dir)
    val vnew = versionDirs(fs, dir)
      .filter(isCompleteVersion(fs, dir, _, "_SUCCESS")).max
    writeSmallFileAtomic(fs, s"$dir/v=$vnew/$AbsorbedMarker",
      renderMarker(absorbed.updated(writerId, batchId)))
    true
  }
}
