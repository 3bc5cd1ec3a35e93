package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Directory analog of [[AtomicFiles]] for the Spark-native sinks
  * (r20, extending the r19 writer-side no-torn-artifact contract):
  * `DataFrameWriter.mode("overwrite")` DELETES the destination before
  * the job commits, so a mid-job failure leaves the previous dataset
  * destroyed and nothing in its place — the exact loss the driver-side
  * sinks were hardened against, and doubly wrong for compaction, whose
  * whole point is rewriting a LIVE table.
  *
  * Idiom: the job writes to a hidden sibling staging directory
  * (`.{name}.writing-{tag}` — the dot prefix keeps Spark/Hadoop
  * listings of the PARENT from picking it up as data), then the swap
  * renames previous → `.{name}.replaced-{tag}`, staging → dest, and
  * deletes the stash. Failure anywhere in the job leaves dest
  * untouched; failure between the two renames restores the previous
  * directory before propagating, so the only absence window is the
  * sub-millisecond pair of metadata renames — the same
  * absent-or-complete contract [[AtomicFiles.promote]] documents.
  *
  * Rename atomicity is the filesystem's: local and HDFS renames are
  * atomic metadata ops; object stores that fake renames by
  * copy-and-delete (plain S3A without a committer) degrade exactly as
  * the file-level idiom does there, and should publish through a
  * manifest/committer layer instead.
  */
object AtomicDirs {

  /** Run `body` against a staging directory path, swapping it over
    * `dest` only if body completes. The staging dir lives NEXT TO the
    * destination (same parent, so renames never cross a filesystem
    * boundary) and is deleted on any failure.
    */
  def writeVia[A](spark: SparkSession, dest: String)(body: String => A): A = {
    val fs = new HPath(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qDest = fs.makeQualified(new HPath(dest))
    val parent = Option(qDest.getParent).getOrElse(
      throw new IllegalArgumentException(s"$dest has no parent directory"))
    fs.mkdirs(parent)
    // unique tag per publish: two concurrent writers to the same dest
    // never write into each other's STAGING directory; the publish
    // rename itself re-checks dest (below) so a lost race fails loudly
    // instead of nesting one writer's staging inside the other's
    // published dataset
    val tag = java.util.UUID.randomUUID().toString.substring(0, 8)
    val staging = new HPath(parent, s".${qDest.getName}.writing-$tag")
    val replaced = new HPath(parent, s".${qDest.getName}.replaced-$tag")
    try {
      val r = body(staging.toString)
      // a body that wrote nothing is a broken sink, not an empty
      // dataset — an empty DataFrame still writes a dir with _SUCCESS
      require(fs.exists(staging),
        s"sink body completed without writing anything at $staging")
      val hadDest = fs.exists(qDest)
      if (hadDest && !fs.rename(qDest, replaced))
        throw new java.io.IOException(
          s"atomic publish: could not stash previous $qDest aside")
      try {
        // Hadoop rename onto an EXISTING directory moves the source
        // INTO it (silently nesting the staging dir inside someone
        // else's published dataset) — if dest reappeared since the
        // stash-out, a concurrent publish won the race: fail loudly,
        // never rename onto an existing dir
        if (fs.exists(qDest))
          throw new java.io.IOException(
            s"atomic publish: $qDest reappeared mid-swap (concurrent " +
              "publish?) — refusing to nest the staging directory into it")
        if (!fs.rename(staging, qDest))
          throw new java.io.IOException(
            s"atomic publish: could not promote $staging over $qDest")
      } catch {
        case e: Throwable =>
          // restore the previous dataset before propagating: the
          // promote failed, but the stash is the complete prior
          // content. A restore that can't happen (dest occupied by a
          // concurrent winner, or the rename itself fails) must NOT
          // pass silently — the data would sit invisible in the stash
          // while the error only described the promote.
          if (hadDest) {
            val restored = !fs.exists(qDest) && fs.rename(replaced, qDest)
            if (!restored)
              throw new java.io.IOException(
                s"atomic publish: promote failed AND the previous " +
                  s"dataset could not be restored — recover it manually " +
                  s"from $replaced", e)
          }
          throw e
      }
      // stash cleanup is best-effort: the new dataset is fully live at
      // dest, so a transient delete failure must not report the
      // publish itself as failed — the stash is inert (hidden name)
      if (hadDest) {
        // NonFatal, not just IOException: Hadoop FS implementations
        // surface RuntimeException wrappers (S3A client errors,
        // IllegalArgumentException), and any of them escaping here
        // would report a COMPLETED publish as failed — the exact
        // inversion this block exists to prevent
        try fs.delete(replaced, true)
        catch {
          case scala.util.control.NonFatal(e) =>
            org.slf4j.LoggerFactory.getLogger("graft.sources.AtomicDirs")
              .warn(s"publish succeeded but the previous-dataset stash " +
                s"$replaced could not be deleted: $e")
        }
      }
      r
    } finally {
      if (fs.exists(staging)) fs.delete(staging, true)
    }
  }
}
