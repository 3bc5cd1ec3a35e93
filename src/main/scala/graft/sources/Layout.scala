package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB path (SURVEY §4): how data
  * should be WRITTEN so downstream plans avoid shuffles and scans
  * prune.
  *
  *  - `writePartitioned`: hive-style directory partitioning — partition
  *    pruning turns full scans into a few directory reads (date- or
  *    cell-partitioned facts, IVF cells, LSH buckets).
  *  - `writeBucketed`: pre-shuffled bucket layout registered in the
  *    catalog — equi-joins and aggregations on the bucket keys plan
  *    with NO Exchange on either side (verified by `PlanQualitySpec`).
  */
object Layout {

  // Every directory sink below publishes through
  // [[AtomicDirs.writeVia]] (r20): a bare mode("overwrite") deletes
  // the destination BEFORE the job commits, so a mid-job failure
  // destroyed the previous dataset — the staging-dir + rename swap
  // keeps the previous content readable until the new one is complete.

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    AtomicDirs.writeVia(df.sparkSession, path) { staging =>
      df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(staging)
    }

  def writeBucketed(
      df: DataFrame, table: String,
      bucketCols: Seq[String], buckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    // catalog-level staging swap (the table analog of the AtomicDirs
    // idiom): a direct mode("overwrite").saveAsTable DROPS the live
    // table before writing, so a mid-job failure left neither old nor
    // new data. Writing to a per-publish-tagged staging table first
    // keeps the live table fully readable for the whole job (and two
    // concurrent publishes never share a staging table); the swap then
    // mirrors AtomicDirs — live → stash, staging → live, drop stash —
    // so the previous data is NEVER dropped before the new table is
    // in place: a failure between the renames restores the stash, and
    // a restore that can't happen propagates with the stash named for
    // manual recovery. Managed-table RENAME moves data with the
    // definition (bucket spec included), so the published table keeps
    // its Exchange-free join/agg planning.
    val spark = df.sparkSession
    def quoted(name: String): String =
      name.split('.').map(p => s"`${p.replace("`", "``")}`").mkString(".")
    def exists(name: String): Boolean = spark.catalog.tableExists(name)
    val tag = java.util.UUID.randomUUID().toString.substring(0, 8)
    val staging = s"${table}__writing_$tag"
    val stash = s"${table}__replaced_$tag"
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    try {
      sorted.format("parquet").saveAsTable(staging)
      val hadDest = exists(table)
      if (hadDest)
        spark.sql(s"ALTER TABLE ${quoted(table)} RENAME TO ${quoted(stash)}")
      try spark.sql(s"ALTER TABLE ${quoted(staging)} RENAME TO ${quoted(table)}")
      catch {
        case e: Throwable =>
          if (hadDest) {
            val restored =
              try {
                if (!exists(table)) {
                  spark.sql(
                    s"ALTER TABLE ${quoted(stash)} RENAME TO ${quoted(table)}")
                  true
                } else false
              } catch { case _: Throwable => false }
            if (!restored)
              throw new java.io.IOException(
                s"table publish: promote failed AND the previous table " +
                  s"could not be restored — recover it manually from " +
                  s"$stash", e)
          }
          throw e
      }
      // stash cleanup is best-effort, mirroring AtomicDirs: the new
      // table is fully live, so a transient metastore/FS hiccup on the
      // drop must not report a completed publish as failed — the stash
      // is inert under its tagged name and can be dropped manually
      if (hadDest) {
        try spark.sql(s"DROP TABLE IF EXISTS ${quoted(stash)}")
        catch {
          case scala.util.control.NonFatal(e) =>
            org.slf4j.LoggerFactory.getLogger("graft.sources.Layout")
              .warn(s"table publish succeeded but the previous-table " +
                s"stash $stash could not be dropped: $e")
        }
      }
    } finally {
      // in-JVM failure cleanup. A JVM CRASH mid-saveAsTable can still
      // orphan the staging table's warehouse DIRECTORY without a
      // catalog entry (nothing here can drop it later); residue is
      // name-tagged (`__writing_<tag>`) for an out-of-band sweep — an
      // automatic sweep at publish time would race a CONCURRENT
      // publisher's live staging table, which the tags exist to protect
      if (exists(staging)) spark.sql(s"DROP TABLE IF EXISTS ${quoted(staging)}")
    }
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integral columns — the clustering key behind
    * multi-dimensional data skipping. Pure built-in bit arithmetic
    * (`2·bits` shift/mask terms OR-folded), so it stays inside
    * whole-stage codegen and is reproducible in any engine.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    // cast to long FIRST: on IntegerType inputs shiftleft is 32-bit, so
    // bits=16 already lands a bit in the int sign position (negative z
    // splits the curve at the wrap) and bits > 16 shifts by >= 32,
    // which Java reduces mod 32 — distinct cells silently alias
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` clustered by the Z-order of two dimension columns:
    * range-partitioned and sorted by the interleaved key, so each
    * output file (and row group) covers a small rectangle in (a, b)
    * space — a pushed range predicate on EITHER or both dimensions then
    * prunes most row groups via parquet min/max stats, which a
    * single-column sort can only offer for its leading column. The
    * standard lakehouse layout trick for two-dimensional access
    * patterns (`ZOrderSpec` pins the scan-output-rows win vs an
    * unclustered write).
    */
  def writeZOrdered(
      df: DataFrame, path: String, a: String, b: String,
      files: Int, bits: Int = 16): Unit = {
    val z = zValue(col(a), col(b), bits)
    AtomicDirs.writeVia(df.sparkSession, path) { staging =>
      df.repartitionByRange(files, z)
        .sortWithinPartitions(z)
        .write.mode("overwrite").parquet(staging)
    }
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈bytes/targetBytes⌉ files — the maintenance job every streaming or
    * micro-batch ingest needs, because thousands of KB-sized files turn
    * scan planning and file listing into the bottleneck long before the
    * data itself does.
    *
    * Content-preserving (same rows, any order), one shuffle
    * (`repartition(n)` — round-robin, so output files are evenly sized
    * regardless of input skew). Sizing reads ONLY the file listing; at
    * 100 TB the job is bounded by one read+write pass of the directory,
    * which is what compaction is. Returns the output file count.
    */
  def compact(
      spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: a hive-partitioned directory has only
    // subdirectories at the top level, so a flat listStatus measured 0
    // bytes and funneled the whole (recursively read) dataset through
    // repartition(1) — the opposite of compaction
    val it = fs.listFiles(p, true)
    var bytes = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !st.getPath.getName.startsWith("_")) bytes += st.getLen
    }
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // hive-partitioned input keeps its layout: a plain rewrite would
    // fold the partition columns into the data files and DESTROY the
    // date=…/ directory structure — partition pruning reverts to full
    // scans and path-addressed readers find nothing (r20 review).
    // Detection is schema-diff: recursiveFileLookup disables partition
    // discovery, so columns present only under discovery are exactly
    // the partition columns.
    val full = spark.read.parquet(inDir)
    val leafCols = spark.read.option("recursiveFileLookup", "true")
      .parquet(inDir).columns.toSet
    val partCols = full.columns.filterNot(leafCols).toSeq
    // the staging swap also makes IN-PLACE compaction (outDir == inDir)
    // safe: the job only READS inDir while writing to the staging
    // sibling, and the live directory is replaced wholesale after the
    // job commits — which is the actual maintenance shape (rewriting a
    // LIVE table, not producing a copy)
    AtomicDirs.writeVia(spark, outDir) { staging =>
      if (partCols.isEmpty)
        full.repartition(n).write.mode("overwrite").parquet(staging)
      else
        // hash-cluster on the partition columns so each value's rows
        // land in ONE task → one output file per partition directory
        // (the small-file fix); an over-targetBytes single value stays
        // one file — splitting it needs a second write pass and is not
        // this maintenance job's contract
        full.repartition(n, partCols.map(col): _*)
          .write.mode("overwrite").partitionBy(partCols: _*).parquet(staging)
    }
    n
  }
}
