package graft

/** JVM-exit cleanup for the engine's scratch directories.
  *
  * Layout memos (LSH / semDedup cell layouts, compaction scratch,
  * streaming fixture stages) live under `java.io.tmpdir`, which this
  * project points at RAM-backed storage — so "temp" files that outlive
  * the session are resident memory, and `File.deleteOnExit()` is a
  * silent no-op for non-empty directories (it only unlinks empty ones).
  * One registry + one shutdown hook deletes registered roots
  * recursively, best-effort (cleanup must never turn a successful run
  * into a failing exit).
  */
object TempDirs {
  private val roots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  Runtime.getRuntime.addShutdownHook(
    new Thread(() => roots.forEach(deleteRecursively(_)), "graft-tempdir-cleanup"))

  /** Register a directory root for deletion at JVM exit; returns it. */
  def register(p: java.nio.file.Path): java.nio.file.Path = { roots.add(p); p }

  /** Delete ONE registered root now — the spec hook (a spec cannot
    * observe a JVM exit from inside the JVM, and it must not purge the
    * whole registry: other suites in the same JVM still read their
    * staged dirs — draining globally deleted StreamingTwins' staged
    * events file out from under two later suites when this was a
    * purge-everything method).
    */
  private[graft] def deleteNow(p: java.nio.file.Path): Unit = {
    deleteRecursively(p)
    // unregister only when the tree is actually gone: a partial delete
    // (a streaming query still holding files open) used to forfeit the
    // shutdown-hook retry, leaking the remainder on RAM-backed tmpfs
    // past JVM exit (r20 review)
    if (!java.nio.file.Files.exists(p)) roots.remove(p)
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder()).forEach { q =>
          try java.nio.file.Files.deleteIfExists(q)
          catch { case _: Throwable => () }
        } finally walk.close()
      }
    } catch { case _: Throwable => () }
}
