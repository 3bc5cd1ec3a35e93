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
    */
  def promote(tmp: Path, dest: Path): Unit =
    try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.io.IOException if Files.exists(tmp) =>
        Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING)
    }

  /** `Files.createTempFile` creates 0600 on POSIX; published artifacts
    * must stay world-readable like the direct writes they replaced
    * (a web server or group-shared pipeline dir reading the .geojson /
    * manifest would EACCES otherwise — r19 review). rw-r--r--, the
    * conventional publish mode; non-POSIX filesystems keep their
    * defaults.
    */
  private def publishPerms(tmp: Path): Path = {
    try Files.setPosixFilePermissions(tmp,
      java.nio.file.attribute.PosixFilePermissions.fromString("rw-r--r--"))
    catch { case _: UnsupportedOperationException => }
    tmp
  }

  /** Write `bytes` at `dest` via a sibling temp + atomic promote. The
    * temp is created NEXT TO the destination (same directory, so the
    * rename never crosses a filesystem boundary) and deleted on any
    * failure.
    */
  def write(dest: Path, bytes: Array[Byte]): Unit = {
    val dir = Option(dest.toAbsolutePath.getParent).getOrElse(
      throw new IllegalArgumentException(s"$dest has no parent directory"))
    val tmp = publishPerms(
      Files.createTempFile(dir, dest.getFileName.toString, ".writing"))
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
    val dir = Option(dest.toAbsolutePath.getParent).getOrElse(
      throw new IllegalArgumentException(s"$dest has no parent directory"))
    val tmp = publishPerms(
      Files.createTempFile(dir, dest.getFileName.toString, ".writing"))
    try {
      val r = body(tmp)
      promote(tmp, dest)
      r
    } finally Files.deleteIfExists(tmp)
  }
}
