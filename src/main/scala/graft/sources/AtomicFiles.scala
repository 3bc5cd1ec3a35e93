package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** The no-torn-artifact publish idiom, shared by every driver-side
  * sink (r19, extending the reader-side policy of r18's
  * SourceChaosProbe to the writers): produce the artifact at a sibling
  * temp path, then PROMOTE with an atomic rename — a failure at any
  * point before the promote leaves the published path either absent or
  * holding its previous complete content, never a partial file the
  * next pipeline step would silently ingest.
  *
  * Per the `Files.move` contract, options other than ATOMIC_MOVE are
  * ignored when it is present, and atomically replacing an existing
  * target is implementation-specific (Linux rename(2) replaces; other
  * filesystems may throw). The promote therefore tries the atomic
  * rename alone and falls back to a plain REPLACE_EXISTING move where
  * the platform refuses it — the torn-artifact guarantee degrades only
  * where the filesystem offers no atomic replace at all.
  */
object AtomicFiles {

  /** Rename `tmp` over `dest` (atomic where the platform allows).
    *
    * The fallback catches IOException broadly, not just
    * FileAlreadyExists/AtomicMoveNotSupported: the Files.move javadoc
    * says an ATOMIC_MOVE over an existing target fails with an
    * IMPLEMENTATION-SPECIFIC IOException (a generic FileSystemException
    * on some NFS/Windows stacks) — the narrow catch would turn every
    * re-publish over an existing artifact into a hard failure there
    * (r19 review). Guarded on the temp still existing: if the rename
    * already consumed it, the failure is not a refused-replace.
    *
    * The fallback itself stays within the absent-or-complete contract:
    * delete dest, then retry the ATOMIC rename — never a non-atomic
    * REPLACE_EXISTING, whose delete-then-copy window on such platforms
    * could leave a PARTIAL dest if the second step dies (r19 review,
    * second pass). The artifact is momentarily absent, which the
    * contract explicitly allows; where the platform offers no atomic
    * rename at all the final plain move may degrade, as documented.
    *
    * Two guards keep the fallback from converting TRANSIENT errors
    * into data loss (r19 advisor): the atomic rename is retried once
    * BEFORE dest is touched (an EIO/NFS hiccup that clears on retry
    * never reaches the delete), and the delete-dest path is taken only
    * when dest actually EXISTS — a refused replace requires an
    * existing target; any other failure shape propagates with the
    * previous artifact intact.
    */
  def promote(tmp: Path, dest: Path): Unit =
    try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.io.IOException if Files.exists(tmp) =>
        try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
        catch {
          // no atomic rename on this platform and nothing to replace:
          // the documented plain-move degradation
          case _: java.nio.file.AtomicMoveNotSupportedException
              if Files.exists(tmp) && !Files.exists(dest) =>
            Files.move(tmp, dest)
          case _: java.io.IOException
              if Files.exists(tmp) && Files.exists(dest) =>
            Files.deleteIfExists(dest)
            try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
            catch {
              case _: java.nio.file.AtomicMoveNotSupportedException =>
                Files.move(tmp, dest)
            }
        }
    }

  /** Default-creation permissions (0666 & ~umask), probed once: what a
    * direct `Files.write` to the destination would have produced.
    * `Files.createTempFile` forces 0600 on POSIX, so without this the
    * atomic route silently publishes owner-only artifacts (EACCES for
    * a web server / group pipeline reading the publish dir — r19
    * review); forcing a fixed rw-r--r-- instead would WIDEN perms
    * under a restrictive umask (second-pass finding). None on
    * non-POSIX filesystems — they keep their defaults.
    */
  private lazy val defaultCreatePerms
      : Option[java.util.Set[java.nio.file.attribute.PosixFilePermission]] =
    try {
      val dir = Files.createTempDirectory("graft_perm_probe")
      try {
        val f = Files.createFile(dir.resolve("probe")) // default attrs, umask-honoring
        try Some(Files.getPosixFilePermissions(f))
        finally Files.deleteIfExists(f)
      } finally Files.deleteIfExists(dir)
    } catch { case _: UnsupportedOperationException => None }

  /** Create a `.writing` sibling temp for `dest` carrying the
    * default-creation permissions (see [[defaultCreatePerms]]) — the
    * single temp-creation path for every sink, so no promote site can
    * reintroduce the 0600 publish regression.
    */
  def publishTemp(dest: Path): Path = {
    val dir = Option(dest.toAbsolutePath.getParent).getOrElse(
      throw new IllegalArgumentException(s"$dest has no parent directory"))
    val tmp = Files.createTempFile(dir, dest.getFileName.toString, ".writing")
    // the probe ran in java.io.tmpdir; the DESTINATION filesystem may
    // be non-POSIX even when tmpdir is POSIX — fall back to the temp's
    // own default perms instead of failing every publish (r19 advisor)
    defaultCreatePerms.foreach { perms =>
      try Files.setPosixFilePermissions(tmp, perms)
      catch { case _: UnsupportedOperationException => () }
    }
    tmp
  }

  /** Write `bytes` at `dest` via a sibling temp + atomic promote. The
    * temp is created NEXT TO the destination (same directory, so the
    * rename never crosses a filesystem boundary) and deleted on any
    * failure.
    */
  def write(dest: Path, bytes: Array[Byte]): Unit = {
    val tmp = publishTemp(dest)
    try {
      Files.write(tmp, bytes)
      promote(tmp, dest)
    } finally Files.deleteIfExists(tmp)
  }

  /** Run `body` against a sibling temp path, promoting to `dest` only
    * if it completes; the temp is deleted on any failure. For sinks
    * that STREAM to a writer instead of materializing bytes
    * (writeGeoJson's feature iterator).
    */
  def writeVia[A](dest: Path)(body: Path => A): A = {
    val tmp = publishTemp(dest)
    try {
      val r = body(tmp)
      promote(tmp, dest)
      r
    } finally Files.deleteIfExists(tmp)
  }
}
