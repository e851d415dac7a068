package graft.layout

import org.apache.hadoop.fs.{FileSystem, Path}

/** The snapshot-swap protocol's cross-process PRIMITIVES, extracted from
  * [[graft.catalog.Catalog]] as their own reviewable unit (VERDICT r9
  * #8): the version-log directory layout, the `_current` pointer commit,
  * and the recovery epoch — the three signals every reader/writer/healer
  * in the repo coordinates through. The crash-healing STATE MACHINE that
  * consumes them (retire → stage-in → pointer advance; read-side heal;
  * aborted-swap rollback) lives with the bucketed layout in
  * [[graft.merge.PartitionedMerge]] and is fuzzed by CrashHealProps;
  * flat-snapshot commits drive the same primitives from
  * `Catalog.overwritePath`/`commitSwap`.
  */
object SwapProtocol {

  /** Atomic PUT-IF-ABSENT publish of a fully-staged small file — the
    * primitive claims and manifests need. A plain `rename(staged,
    * target)` is NOT it on the local FS: `ChecksumFileSystem.rename`
    * implements fail-on-existing-file as an `exists` CHECK followed by
    * the POSIX `rename(2)` (which silently REPLACES an existing
    * destination), so two racers can interleave between check and act
    * and both report success — found by PipelineEpochSpec's 4-way
    * commit race, the same hazard class as the r11 swap-claim TOCTOU.
    * On `file://` this uses `link(2)` instead: hard-linking is
    * kernel-atomic (`EEXIST` if the target appears first) AND the
    * target materializes with its full staged content — no partial
    * visibility window. Non-local stores fall back to rename, whose
    * HDFS/object-store contracts genuinely fail on an existing
    * destination. Returns true iff THIS caller's staged file became
    * the target; the staged file is consumed either way. */
  /** Count of publishes that degraded to the NON-atomic exists+rename
    * path (link unsupported or persistently failing). Zero on a healthy
    * local FS; a nonzero value means epoch/claim uniqueness is running
    * on the racy fallback and the store should be looked at. */
  private[graft] val nonAtomicPublishes =
    new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def publishIfAbsent(f: FileSystem, staged: Path,
      target: Path): Boolean = {
    val scheme = Option(f.getUri.getScheme).getOrElse("file")
    def renameFallback(why: String): Boolean = {
      if (scheme == "file") {
        // on file:// the rename path is NOT put-if-absent (exists-check
        // + replacing rename(2) — the TOCTOU this function closes);
        // flag the degradation instead of silently reintroducing it
        nonAtomicPublishes.incrementAndGet()
        System.err.println(s"[graft] WARN publishIfAbsent: hard link " +
          s"unavailable ($why) — degrading to non-atomic rename for " +
          s"$target; concurrent-publish uniqueness is not guaranteed " +
          "on this filesystem")
      }
      if (f.exists(target)) { f.delete(staged, false); false }
      else if (f.rename(staged, target)) true
      else { f.delete(staged, false); false }
    }
    if (scheme == "file") {
      val s = java.nio.file.Paths.get(staged.toUri.getPath)
      val t = java.nio.file.Paths.get(target.toUri.getPath)
      // bounded retry: a transient IOException (NFS hiccup, interrupted
      // syscall) must not flip a correctness primitive onto the racy
      // path — only a PERSISTENT link failure may, and observably
      var attempt = 0
      var lastErr: java.io.IOException = null
      while (attempt < 3) {
        try {
          java.nio.file.Files.createLink(t, s)
          f.delete(staged, false)
          return true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            f.delete(staged, false); return false
          case _: UnsupportedOperationException =>
            return renameFallback("link(2) unsupported")
          case e: java.io.IOException =>
            // a racer's link can land between our failure and this
            // check — target existing IS the absent→present answer
            if (f.exists(target)) { f.delete(staged, false); return false }
            lastErr = e; attempt += 1
            if (attempt < 3) {
              // an interrupt must not escape with the staged file
              // un-consumed (the documented contract): restore the flag
              // and settle through the fallback, which deletes or
              // renames the staged file on every path
              try Thread.sleep(5L << attempt)
              catch {
                case _: InterruptedException =>
                  Thread.currentThread().interrupt()
                  return renameFallback("interrupted during link retry")
              }
            }
        }
      }
      renameFallback(s"link failed 3x: ${lastErr.getMessage}")
    } else renameFallback("non-local scheme")
  }

  private[graft] def historyDir(dir: String) = new Path(dir + ".history")
  private[graft] def versionDir(dir: String, v: Int) =
    new Path(historyDir(dir), f"v$v%05d")
  private def pointerFile(dir: String) = new Path(historyDir(dir), "_current")

  private[graft] def readSmallFile(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](64)
      var n = in.read(b)
      while (n > 0) { buf.write(b, 0, n); n = in.read(b) }
      new String(buf.toByteArray, "UTF-8").trim
    } finally in.close()
  }

  /** The live snapshot's version: the `_current` pointer when present;
    * a pointer-less existing dir is version 1 (created outside the swap,
    * e.g. first-load `create`); 0 when the table doesn't exist.
    *
    * The pointer commit is delete-then-rename (local-FS rename cannot
    * overwrite), so a concurrent reader can catch the file ABSENT or
    * vanishing between exists() and open() — a transient window, never a
    * state. Retry through it; only when the pointer stays gone (a writer
    * crashed inside its own window) derive the value from the version
    * log: retired entries run v1..v{cur-1}, so live = max logged + 1. */
  private[graft] def readPointer(f: FileSystem, dir: String): Int = {
    val p = pointerFile(dir)
    var i = 0
    while (i < 100) {
      try {
        if (f.exists(p)) return readSmallFile(f, p).toInt
        else if (!f.exists(historyDir(dir)))
          return if (f.exists(new Path(dir))) 1 else 0
      } catch {
        case _: java.io.FileNotFoundException => ()
        // same transient window as FileNotFound, via the OTHER sidecar:
        // ChecksumFileSystem renames a file and its .crc in two steps,
        // so a reader landing between the pointer swap's delete and the
        // second rename can see new bytes against a stale/absent crc.
        // Retrying reads a settled pair (r15: surfaced by
        // ConcurrencySpec's optimistic-overwrite race, ~1/15 runs —
        // the loser failed with ChecksumException instead of the typed
        // conflict).
        case _: org.apache.hadoop.fs.ChecksumException => ()
      }
      i += 1
      Thread.sleep(2)
    }
    val logged = f.listStatus(historyDir(dir)).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).nonEmpty &&
        n.drop(1).forall(_.isDigit)).map(_.drop(1).toInt)
    (if (logged.isEmpty) 0 else logged.max) + 1
  }

  private[graft] def writePointer(f: FileSystem, dir: String, v: Int): Unit = {
    val p = pointerFile(dir)
    // unique tmp name: pointer writes for different versions are already
    // serialized by the retire rename, but a shared tmp would let a
    // crashed attempt's leftover be renamed as a LATER writer's value
    val tmp = new Path(historyDir(dir),
      "_current.tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new IllegalStateException(s"could not commit version pointer $p")
    // every protocol commit lands here — drop the read-probe cache so a
    // reader thread in this JVM can't see the new version through the
    // previous version's DV/layout answers
    ReadProbeCache.invalidate(dir)
  }

  /** Recovery-epoch file: the one cross-process signal for the protocol's
    * single same-version mutation. `recoverAbortedSwap` moves bucket dirs
    * (and their `_dv` sidecars) back WITHOUT a pointer advance, so the
    * (path, version) probe key alone cannot tell other JVMs their cached
    * probe now describes the crashed writer's half-swapped state. Recovery
    * that actually restores a bucket bumps this file (fresh UUID,
    * tmp+rename — same atomicity as the pointer); [[ReadProbeCache]]
    * folds its content into the cache key, so every process re-derives on
    * the first probe after a recovery. Absent file = "never recovered"
    * (the common case: one `exists` per probe). */
  private def recoveryEpochFile(dir: String) =
    new Path(historyDir(dir), "_recovery_epoch")

  /** A bump's tmp older than this is a CRASHED bump's leftover, not an
    * in-flight delete-then-rename window (that window is milliseconds;
    * the gate is generous for FS timestamp granularity). Without the
    * gate a stranded tmp makes every read spin the full retry budget and
    * return a unique "unreadable-" epoch — probes on the table would be
    * permanently uncacheable (ADVICE r10). */
  private val StaleBumpMs = 10000L

  private[graft] def readRecoveryEpoch(f: FileSystem, dir: String): String = {
    val p = recoveryEpochFile(dir)
    var i = 0
    while (i < 100) {
      try {
        if (f.exists(p)) return readSmallFile(f, p)
        // ABSENT is ambiguous: "never recovered" (the common case), or a
        // concurrent bump's delete-then-rename window — in which a probe
        // returning "" would cache a pre-recovery answer under the
        // never-recovered epoch (ADVICE r9). The bump's unique tmp file is
        // visible for exactly that window: if a FRESH one exists, retry;
        // if none does AND the epoch is still absent, it genuinely never
        // existed. Stale tmps (a bump that crashed between create and
        // rename) are age-gated out so they cannot wedge the read path.
        val hist = historyDir(dir)
        val now = System.currentTimeMillis()
        val bumpInFlight = f.exists(hist) && f.listStatus(hist)
          .exists(s => s.getPath.getName.startsWith("_recovery_epoch.tmp-")
            && now - s.getModificationTime < StaleBumpMs)
        if (!bumpInFlight && !f.exists(p)) return ""
      } catch {
        // listing/read races with a concurrent bump: transient, retry
        case _: java.io.FileNotFoundException => ()
      }
      i += 1
      Thread.sleep(2)
    }
    // epoch unreadable after the retry budget — return a unique value so
    // the caller treats the probe as uncacheable rather than stale
    "unreadable-" + java.util.UUID.randomUUID().toString
  }

  private[graft] def bumpRecoveryEpoch(f: FileSystem, dir: String): Unit = {
    val p = recoveryEpochFile(dir)
    val tmp = new Path(historyDir(dir),
      "_recovery_epoch.tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val out = f.create(tmp, true)
    try out.write(java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
    finally out.close()
    // Delete-then-rename has an absent window a concurrent
    // readRecoveryEpoch must not mistake for "never recovered"; the
    // reader disambiguates by the tmp file this bump leaves visible for
    // exactly that window (see readRecoveryEpoch). A FileContext
    // overwrite-rename would close the window writer-side, but on the
    // checksummed local FS its 3-arg renameInternal bypasses ChecksumFs
    // and strands the destination's stale .crc — measured as
    // ChecksumException on the next pointer read.
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new IllegalStateException(s"could not commit recovery epoch $p")
    // reclaim tmps stranded by a CRASHED earlier bump (this bump's own
    // tmp was just renamed away; a concurrent live bump's tmp is younger
    // than the reader's staleness gate by construction)
    try {
      val cutoff = System.currentTimeMillis() - StaleBumpMs
      f.listStatus(historyDir(dir))
        .filter(s => s.getPath.getName.startsWith("_recovery_epoch.tmp-")
          && s.getModificationTime < cutoff)
        .foreach(s => f.delete(s.getPath, false))
    } catch { case _: java.io.FileNotFoundException => () }
  }
}
