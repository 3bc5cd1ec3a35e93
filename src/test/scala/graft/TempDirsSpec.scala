package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scratch-dir registry must actually remove NON-EMPTY trees —
  * the `deleteOnExit` calls it replaces silently failed on those, which
  * is how repeated sessions accumulated layout directories in
  * RAM-backed tmp storage (r14 advice).
  */
class TempDirsSpec extends AnyFunSuite {

  test("delete removes a registered non-empty tree, tolerates missing roots") {
    // deleteNow targets ONLY this spec's roots — a global purge here
    // would delete other suites' staged dirs mid-JVM (it did: the x51
    // stream stage vanished under two later suites)
    val root = java.nio.file.Files.createTempDirectory("tempdirs_spec_")
    val sub = java.nio.file.Files.createDirectories(root.resolve("cell=3"))
    java.nio.file.Files.write(sub.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    TempDirs.register(root)
    TempDirs.deleteNow(root)
    assert(!java.nio.file.Files.exists(root), s"$root survived the delete")

    // a root that vanished before exit must not break the cleanup
    val gone = java.nio.file.Files.createTempDirectory("tempdirs_gone_")
    TempDirs.register(gone)
    java.nio.file.Files.delete(gone)
    TempDirs.deleteNow(gone)

    // idempotent on an already-deleted root
    TempDirs.deleteNow(root)
  }
}
