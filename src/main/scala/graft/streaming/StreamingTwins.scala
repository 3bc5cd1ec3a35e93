package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming twins of the batch extension queries
  * (SURVEY §2.11): the reference is batch-only, so the streaming
  * surface mirrors Q31 (tumbling window) and Q32 (sessionization) over
  * the `events` table, plus watermarked streaming dedup. Batch
  * equivalence is testable because a single micro-batch over a static
  * file must reproduce the batch answers (`StreamingTwinsSpec`).
  */
object StreamingTwins {

  // single-file inputs staged into their own directory, memoized per
  // source path so bench reps don't re-copy; the value records the
  // source (dir, length, mtime, content fingerprint) OBSERVED at
  // staging time so the staleness check does not depend on the temp
  // filesystem preserving attributes on copy
  private val staged =
    scala.collection.concurrent.TrieMap.empty[String, (String, Long, Long, Long)]

  /** Cheap content fingerprint for the staging staleness check: FNV-1a
    * over the FIRST and LAST 64 KiB blocks, mixed with the length —
    * two page-cache reads, independent of file size. First+last is the
    * right pair for parquet specifically: the footer (last block)
    * carries the row-group offsets and column statistics, so any
    * regeneration that changes row content perturbs it even when the
    * byte LENGTH happens to coincide. Closes the one staleness case
    * the (length, mtime) pair waves through — a source regenerated at
    * identical byte length with its timestamp restored (r17 advisor
    * residual). Not cryptographic and not full-content: a collision
    * needs identical length, identical first and last 64 KiB, AND a
    * restored mtime — at that point the snapshot is the same file for
    * every purpose this harness adapter has.
    */
  private[graft] def contentFingerprint(f: java.io.File): Long = {
    val block = 64 * 1024
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      val len = raf.length
      var h = 0xcbf29ce484222325L // FNV-1a 64-bit offset basis
      val buf = new Array[Byte](block)
      def mix(n: Int): Unit = {
        var i = 0
        while (i < n) { h ^= (buf(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      }
      // fill loop, not one read(): a single read may legally return
      // short (network mounts), and a fingerprint that depends on read
      // sizes would spuriously invalidate the stage on every check
      // (r18 review). Returns bytes actually read (EOF-safe).
      def readBlock(from: Long): Int = {
        raf.seek(from)
        var got = 0
        var n = 0
        while (got < block && n >= 0) {
          n = raf.read(buf, got, block - got)
          if (n > 0) got += n
        }
        got
      }
      val n1 = readBlock(0L)
      if (n1 > 0) mix(n1)
      // last block, overlapping the first when len <= 2 blocks (full
      // coverage of small files); skip when the first read saw it all
      if (len > n1 && n1 > 0) {
        val n2 = readBlock(math.max(0L, len - block))
        if (n2 > 0) mix(n2)
      }
      h ^ len
    } finally raf.close()
  }

  // footer-probed schema memoized per STAGED dir for the same reason:
  // the probe is a batch read (file listing + footer parse) that the
  // bench streaming entries would otherwise repeat every rep. Staged
  // dirs are immutable snapshots, so that memo cannot go stale — but a
  // caller-supplied DIRECTORY input has no staleness machinery at all
  // (none of the length/mtime/fingerprint legs apply), so memoizing it
  // would serve a stale schema after an in-place regeneration: exactly
  // the ÷1000-on-µs corruption readEvents' probe exists to prevent
  // (r20 review). Directories re-probe every call.
  private val probedSchema =
    scala.collection.concurrent.TrieMap.empty[String, StructType]

  private def schemaOf(
      spark: SparkSession, dir: String, memoize: Boolean): StructType =
    if (memoize) probedSchema.getOrElseUpdate(dir, spark.read.parquet(dir).schema)
    else spark.read.parquet(dir).schema

  /** The file stream source reads DIRECTORIES; a single-file path is
    * staged (copied once) into a temp directory. Only a local-harness
    * adapter — a production stream tails a landing directory anyway.
    */
  private[graft] def streamableDir(path: String): String = {
    val f = new java.io.File(path)
    if (!f.isFile) return path
    // self-heal a vanished stage (external tmp cleanup, RAM-backed tmp
    // cleared): a memo pointing at a deleted dir must re-stage, not
    // fail every later stream with PATH_NOT_FOUND
    staged.get(path).foreach { case (d, srcLen, srcMtime, srcFp) =>
      val copy = new java.io.File(d, f.getName)
      // stale if vanished OR the source was regenerated in place (size
      // or mtime CHANGED vs what staging OBSERVED): serving the old
      // snapshot would silently stream the previous corpus generation
      // while batch oracles read the new. Comparing against the
      // recorded source stats (not the copy's own mtime) catches a
      // restored snapshot / rsync'd file whose preserved timestamp is
      // equal-or-OLDER than the staging-time source — the case a <
      // comparison waves through — without depending on the temp
      // filesystem preserving attributes on copy.
      // copy.length != srcLen is the COPY-integrity leg: a staged file
      // truncated in place (RAM-backed tmp pressure) still exists but
      // must re-stage, not silently stream a torn snapshot.
      // contentFingerprint is the LAST leg (short-circuit: two 64 KiB
      // reads only when every cheap leg passes) and closes the
      // identical-length + restored-mtime regeneration the stat pair
      // cannot see (r17 advisor residual).
      if (!copy.isFile || copy.length != srcLen || srcLen != f.length ||
          srcMtime != f.lastModified ||
          contentFingerprint(f) != srcFp) {
        staged.remove(path)
        // reclaim the abandoned snapshot NOW: its memoized schema must
        // never serve again, and the dir itself (one full parquet copy
        // per regeneration, typically on RAM-backed tmp) would
        // otherwise live until the JVM-exit TempDirs sweep (r20
        // review). Best-effort — a running stream may still hold the
        // old files open; the exit sweep remains the backstop.
        probedSchema.remove(d)
        try {
          val p = java.nio.file.Paths.get(d)
          if (java.nio.file.Files.exists(p)) {
            val s = java.nio.file.Files.walk(p)
            try s.sorted(java.util.Comparator.reverseOrder())
              .forEach(q => java.nio.file.Files.deleteIfExists(q))
            finally s.close()
          }
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    staged.getOrElseUpdate(path, {
      // deleteOnExit can't remove a non-empty dir — TempDirs deletes
      // the whole staged root recursively at JVM exit
      val dir = graft.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_stream_"))
      val dst = dir.resolve(f.getName)
      // record the source stats BEFORE the copy: a source regenerated
      // mid-copy then reads as changed on the next call and re-stages
      val len = f.length
      val mtime = f.lastModified
      val fp = contentFingerprint(f)
      java.nio.file.Files.copy(f.toPath, dst)
      (dir.toString, len, mtime, fp)
    })._1
  }

  /** Open the events table as a stream, `ts` normalized to a µs
    * TimestampType column. `path` may be a directory or a single
    * parquet file. The physical `ts` type has varied across driver
    * testdata generations (see `Tables.events`): probe the footer via a
    * batch read and dispatch, instead of pinning the legacy ns-long
    * shape — pinning LongType against a TIMESTAMP(MICROS) file silently
    * reads raw µs and the ÷1000 then compresses event time 1000×,
    * wrecking every watermark/window downstream.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    // nanosAsLong must be on BEFORE the footer probe (a TIMESTAMP(NANOS)
    // footer fails the batch probe without it) — but it is session-
    // global and changes how UNRELATED parquet reads see NANOS columns,
    // so restore the prior value whenever this file turns out not to
    // need it. When the file IS nanos the flag must stay set for the
    // stream's whole lifetime (files are read incrementally), which is
    // the one case the permanent flip is deliberate.
    // Tables.nanosConfLock serializes the set/probe/restore with
    // eventsImpl's identical section: without the SHARED lock, a
    // readEvents racing a Tables.events on the same session could
    // capture prior=Some("true") mid-flight and "restore" the flag to
    // permanently set for a micros-generation file.
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val (dir, diskSchema) = graft.Tables.nanosConfLock.synchronized {
      val prior = spark.conf.getOption(confKey)
      spark.conf.set(confKey, "true")
      def restore(): Unit = prior match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
      // EVERYTHING after the set runs under the restore guard:
      // streamableDir does real IO (stage copy, fingerprint reads) and
      // the ts-field lookup throws on a ts-less table — an escape from
      // either used to leak the flag session-wide, silently turning
      // every later NANOS column in unrelated parquet into raw longs
      // (r20 review). Only the deliberate keep-set path (a nanos file,
      // success) leaves the flag on.
      try {
        val d = streamableDir(path)
        val s = schemaOf(spark, d, memoize = d != path)
        if (s("ts").dataType != LongType) restore()
        (d, s)
      } catch { case e: Throwable => restore(); throw e }
    }
    val stream = spark.readStream.schema(diskSchema).parquet(dir)
    diskSchema("ts").dataType match {
      case LongType =>          // legacy TIMESTAMP(NANOS) as ns-long
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>  // TIMESTAMP(MICROS) naive: wall values
        // are the oracle's values; UTC session makes the LTZ cast
        // wall-preserving (same contract as Tables.events)
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "readEvents: timestamp_ntz → timestamp cast requires UTC session tz")
        stream.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType =>     // UTC-adjusted instants already
        stream
      case other =>
        throw new IllegalStateException(
          s"events.ts: unexpected parquet-inferred type $other")
    }
  }

  /** Open any parquet table as a stream, schema probed from the
    * footer (single-file paths staged like [[readEvents]]).
    *
    * The probe runs with `nanosAsLong` temporarily set (and ALWAYS
    * restored), so a TIMESTAMP(NANOS) table probes deterministically
    * instead of pass-or-crash depending on whether a prior readEvents
    * happened to memoize the schema (r20 review). Actually STREAMING a
    * nanos table still needs the flag for the incremental file reads —
    * that is [[readEvents]]' keep-set contract; event-time tables go
    * through it, not here.
    */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val (dir, schema) = graft.Tables.nanosConfLock.synchronized {
      val prior = spark.conf.getOption(confKey)
      spark.conf.set(confKey, "true")
      try {
        val d = streamableDir(path)
        (d, schemaOf(spark, d, memoize = d != path))
      } finally prior match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Q31 twin: watermarked tumbling 1-hour aggregate. Late events
    * beyond 10 minutes are dropped — at scale this bounds state.
    *
    * Group by the window STRUCT and extract `start` AFTER the
    * aggregate: grouping by `window(...).getField("start")` strips the
    * watermark metadata from the grouping key (verified on this Spark
    * build — the output attribute loses spark.watermarkDelayMs), so the
    * aggregation would run UN-watermarked: state never evicted, late
    * events never dropped, Append mode rejected — the opposite of this
    * doc's contract.
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("__w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .select(col("__w.start").as("w"), col("event_type"), col("n"), col("v"))

  /** Streaming exact dedup (the streaming face of §2.12 exact dedup).
    * State semantics, precisely: `ts` is NOT part of the dedup key, so
    * Spark's dedup state holds EVERY event_id ever seen and the
    * watermark evicts nothing — duplicates are dropped forever (an id
    * arriving days later is still dropped), and state grows with
    * distinct-id cardinality. That is the exact-dedup contract; the
    * strictly state-BOUNDED variant for an unbounded stream is
    * [[dedupEventsWithinWatermark]].
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates(Seq("event_id"))

  /** The same dedup on the newer `dropDuplicatesWithinWatermark` API
    * (Spark 3.5+): unlike [[dedupEvents]] — whose state holds every key
    * seen with the event-time column only bounding via watermark
    * expiry of the TIME column in the key — this variant guarantees
    * state eviction once the watermark passes each key's first-seen
    * event time plus the delay, without `ts` participating in the key.
    * Same single-batch answer; different (strictly bounded) state
    * contract — the one to use on an unbounded 100 TB/day stream.
    */
  def dedupEventsWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Streaming spatial enrichment (geofencing): a point stream joined
    * stream-static against a polygon layer on `st_intersects`. The
    * static side is planned per micro-batch, so the spatial planner
    * strategy applies inside the stream: each batch runs the STRtree
    * broadcast index join, not a nested loop. The streaming face of the
    * engine's spatial surface — at scale, one broadcast of the fence
    * layer per executor and a partition-preserving probe per batch.
    */
  def geofence(
      points: DataFrame, pointGeom: String,
      fences: DataFrame, fenceGeom: String): DataFrame =
    points.join(fences,
      graft.geom.GeomFunctions.st_intersects(col(pointGeom), col(fenceGeom)))

  /** Stream-stream attribution join: each click matched to every
    * purchase by the same user within `[click, click + horizon]` —
    * the canonical funnel/conversion join, and the engine's
    * stream-STREAM face (geofence/ingest are stream-static). Both
    * sides carry watermarks and the join condition is an event-time
    * range, so Spark derives a state-retention bound per side
    * (watermark + horizon) and evicts — without the range condition
    * the join state grows forever. At scale: both streams hash-
    * exchange on `user_id` once; per-key state is bounded by event
    * rate × (delay + horizon).
    *
    * Timestamps are µs-truncated on ingest ([[readEvents]]), so the
    * `[0, horizon]` window test equals the oracle's integer-µs
    * `epoch_us` comparison exactly.
    */
  def attribution(
      clicks: DataFrame, purchases: DataFrame,
      horizon: String = "30 minutes", delay: String = "1 hour"): DataFrame =
    attributionJoin(clicks, purchases, horizon, delay, "inner")

  /** One body for the inner and left-outer attribution variants: their
    * watermark wiring, join condition, and projection MUST stay
    * identical (the docs promise identical state/shuffle shape), so a
    * shared helper instead of two drifting copies.
    */
  private def attributionJoin(
      clicks: DataFrame, purchases: DataFrame,
      horizon: String, delay: String, joinType: String): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", delay)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", delay)
    c.join(p,
        col("p_user") === col("user_id") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr(s"INTERVAL $horizon"),
        joinType)
      .select(col("click_id"), col("purchase_id"), col("user_id"))
  }

  /** LEFT OUTER stream-stream attribution: [[attribution]]'s matches
    * PLUS a null-purchase row for every click whose match window
    * expired unmatched — the "abandoned funnel" readout, and the
    * semantics that make outer streaming joins subtle: a null row may
    * only be emitted once the watermark proves no future purchase can
    * join it, so unmatched clicks surface with a delay of
    * `delay + horizon`, and clicks still inside the window when the
    * stream pauses stay in state, unemitted, rather than producing a
    * retractable false negative.
    *
    * State and shuffle are identical to the inner join (one hash
    * exchange per side on user, eviction at watermark + horizon); the
    * only addition is the evict-time null emission, which is why the
    * outer variant costs nothing extra at 100 TB.
    */
  def attributionOuter(
      clicks: DataFrame, purchases: DataFrame,
      horizon: String = "30 minutes", delay: String = "1 hour"): DataFrame =
    attributionJoin(clicks, purchases, horizon, delay, "leftOuter")

  /** Streaming corpus ingestion — the batch cleaning pipeline's
    * streaming face (§2.12 meets §2.11): exact dedup on the content
    * key (STATEFUL `dropDuplicates`; with an event-time column,
    * `dropDuplicatesWithinWatermark` bounds the state), eval-set
    * decontamination, and the quality gate (both stateless, so they
    * inline into each micro-batch's codegen).
    *
    * `evalGrams` is the benchmark gram set — benchmark-sized by
    * definition, so it inlines as an array literal probed with the
    * built-in `arrays_overlap`, keeping the whole gate inside
    * whole-stage codegen (the previous broadcast-set UDF forced an
    * interpreted eval boundary into every micro-batch's hot path;
    * `arrays_overlap` hashes the SMALLER side per row, and the per-doc
    * gram array is typically the smaller one anyway). For eval sets
    * too big to inline, the bloom-filter variant is
    * `Decontaminate.contaminatedIdsBloom`.
    *
    * Gate ORDER matters for determinism: quality and decontamination
    * are row-local, so they run BEFORE dedup — then the surviving
    * content-key set is independent of which duplicate arrives first
    * (raw-text quality can differ within a dup group, e.g. trailing
    * whitespace; gating after dedup would make the outcome
    * arrival-order-dependent). Filtering first is also the cheap
    * order: junk never reaches the dedup state store.
    *
    * `eventTimeCol` bounds the dedup state: when set, the stream is
    * watermarked on it and `dropDuplicatesWithinWatermark` ages keys
    * out; unset (the default, for sources with no event time) keeps
    * one state entry per distinct content key for the stream's life.
    */
  def ingestCorpus(
      docs: DataFrame, evalGrams: Seq[String],
      n: Int = 8, minQuality: Double = 0.3,
      eventTimeCol: Option[String] = None,
      watermark: String = "10 minutes"): DataFrame = {
    // coalesce pins the UDF's null contract: a null gram array hit
    // nothing (kept), while bare arrays_overlap would return null and
    // the negated filter would drop the row
    val hitsEval = coalesce(
      arrays_overlap(graft.operators.TextAnalysis.tokenNgrams(col("text"), n),
        typedLit(evalGrams)),
      lit(false))
    val gated = docs
      .withColumn("quality", graft.operators.TextAnalysis.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
      .filter(!hitsEval)
      .withColumn("__k", graft.operators.Dedup.contentKey(col("text")))
    val deduped = eventTimeCol match {
      case Some(ts) => gated.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(Seq("__k"))
      case None => gated.dropDuplicates("__k")
    }
    deduped.drop("__k")
  }

  final case class Para(pid: Long, pos: Int, para: String, h: String,
      ts: java.sql.Timestamp)
  final case class ParaKept(pid: Long, pos: Int, para: String,
      ts: java.sql.Timestamp)

  /** Streaming paragraph/boilerplate dedup — the streaming face of
    * `Dedup.paragraphDedup` (§2.12, x37): each distinct paragraph
    * survives only at its first occurrence; documents are reassembled
    * from their surviving paragraphs (empty string if every paragraph
    * was boilerplate, same as the batch twin).
    *
    * State is one boolean per distinct paragraph hash, keyed by
    * `flatMapGroupsWithState` in Append mode (which permits the
    * downstream per-document reassembly aggregation). "First" means
    * min-(id, pos) within a micro-batch and first-arrival across
    * batches — identical to the batch twin when the corpus is one
    * batch (`StreamingTwinsSpec` pins that equality).
    *
    * Losing occurrences emit a (pid, -1) marker so all-boilerplate
    * documents still materialize with empty text instead of vanishing.
    *
    * Unbounded streams: pass `eventTimeCol` to bound BOTH state
    * stores. (1) Paragraph-hash state ages out `stateTtl` past the
    * paragraph's last-seen EVENT time (EventTimeTimeout keyed to the
    * group's max event time, never the bare watermark — basing the
    * deadline on the watermark would stamp first-batch state with an
    * epoch-1970 deadline and expire everything at the next batch); a
    * paragraph unseen that long is re-admitted, the bounded-state
    * trade `ingestCorpus` makes with `dropDuplicatesWithinWatermark`.
    * (2) Reassembly groups by (event-time window, doc) under the
    * watermark, so document state is evicted once the watermark passes
    * the window; documents arriving later than the watermark are
    * dropped (standard late-data semantics).
    *
    * The timed path requires the session conf
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`:
    * Spark's conservative checker rejects ANY fMGWS feeding a
    * watermarked stateful aggregation. Here fMGWS only re-emits rows
    * of the current batch with their own event times (never older
    * buffered state), so the flagged late-row hazard cannot occur —
    * but the conf is session-global, so flipping it is the CALLER's
    * decision, not a hidden side effect of building this plan.
    *
    * Per-batch memory is bounded by the duplicate mass of one
    * paragraph hash within one batch (the group iterator is buffered
    * to pick the min-rank winner).
    */
  def paragraphDedup(
      docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n",
      eventTimeCol: Option[String] = None,
      watermark: String = "10 minutes",
      stateTtl: java.time.Duration = java.time.Duration.ofHours(1)): DataFrame = {
    import docs.sparkSession.implicits._
    // fail fast on a non-integral id (the Para encoder needs a Long):
    // cast("long") on a string GUID yields NULL and the primitive
    // encoder then kills the QUERY at runtime with an opaque
    // null-in-non-nullable error — an analysis-time message instead.
    // Deliberately NARROWER than the batch twin (which also accepts
    // DecimalType for its decimal rank arithmetic): this face casts
    // the id to long for the typed row, so a decimal id wider than 18
    // digits would silently truncate — integral only here.
    require(Set[org.apache.spark.sql.types.DataType](LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType)
        .contains(docs.schema(idCol).dataType),
      s"streaming paragraphDedup needs an integral $idCol (got " +
        s"${docs.schema(idCol).dataType})")
    val sepRegex = java.util.regex.Pattern.quote(sep)
    val tsCol = eventTimeCol.map(col).getOrElse(lit(null).cast("timestamp"))
    // coalesce(text, ''): the batch twin's contract is "NULL text also
    // comes back empty" (its left-join restores the doc) — a streaming
    // plan cannot join back, so a NULL doc must flow through as the
    // empty document instead of vanishing (split(NULL) explodes to
    // zero rows). On the timed path, rows with NULL event time cannot
    // be placed on the timeline (and NPE'd the state deadline): they
    // are dropped, the standard watermark-op contract.
    // ... and a NULL id VALUE (legal in an integral column) would die
    // the same way in the Para encoder: dropped, the typedEvents
    // corrupt-row policy — a document with no id cannot be
    // reassembled, and one corrupt row must not kill the stream
    val idDocs = docs.filter(col(idCol).isNotNull)
    val timedDocs = eventTimeCol match {
      case Some(ts) => idDocs.filter(col(ts).isNotNull)
      case None => idDocs
    }
    val parasDf = timedDocs
      .select(col(idCol).cast("long").as("pid"), tsCol.as("ts"),
        posexplode(split(coalesce(col(textCol), lit("")), sepRegex))
          .as(Seq("pos", "para")))
      .withColumn("h", md5(col("para")))
    val paras = (eventTimeCol match {
      case Some(_) => parasDf.withWatermark("ts", watermark)
      case None    => parasDf
    }).as[Para]

    val timed = eventTimeCol.isDefined
    val ttlMs = stateTtl.toMillis
    def keepFirst(
        h: String, rows: Iterator[Para],
        state: GroupState[java.lang.Boolean]): Iterator[ParaKept] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val all = rows.toVector
      val out =
        if (state.exists) all.map(r => ParaKept(r.pid, -1, "", r.ts))
        else {
          state.update(java.lang.Boolean.TRUE)
          val best = all.minBy(r => (r.pid, r.pos))
          ParaKept(best.pid, best.pos, best.para, best.ts) +:
            all.filter(r => (r.pid, r.pos) != ((best.pid, best.pos)))
              .map(r => ParaKept(r.pid, -1, "", r.ts))
        }
      if (timed) {
        // deadline = last-seen EVENT time + TTL, clamped above the
        // current watermark (setTimeoutTimestamp rejects deadlines the
        // watermark has already passed — possible with very late data)
        val maxTs = all.map(_.ts.getTime).max
        state.setTimeoutTimestamp(
          math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }
    val timeout =
      if (timed) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    val kept = paras.groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(keepFirst)

    val reassemble = array_join(
      transform(
        array_sort(collect_list(when(col("pos") >= 0,
          struct(col("pos"), col("para"))))),
        s => s.getField("para")), sep).as(textCol)
    val rebuilt =
      if (timed)
        // all paragraphs of a doc share the doc's event time, so each
        // (window, pid) group is exactly one document; the watermark
        // evicts the group's state once its window closes
        kept.toDF().withWatermark("ts", watermark)
          .groupBy(window(col("ts"), s"$ttlMs milliseconds"), col("pid"))
          .agg(reassemble)
          .drop("window")
      else kept.toDF().groupBy(col("pid")).agg(reassemble)
    rebuilt.withColumnRenamed("pid", idCol)
  }

  final case class ScoredRow(g: String, score: Double, id: Long)
  final case class GroupTopK(g: String, top: Seq[(Double, Long)])

  /** Streaming bounded top-k-per-group — the streaming face of
    * `functions.TopKAgg` (x40): per-group state is the current top-k
    * (score desc, id asc tiebreak — the same ordering contract), so
    * state is O(k) per group no matter how long the stream runs, and
    * each batch emits the updated top-k for groups that changed
    * (Update mode). A single micro-batch reproduces the batch
    * aggregate exactly (`StreamingTwinsSpec`). Per-batch memory is
    * bounded by one group's rows within one batch plus k.
    */
  def topKPerGroup(rows: Dataset[ScoredRow], k: Int): Dataset[GroupTopK] = {
    import rows.sparkSession.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    def upd(
        g: String, it: Iterator[ScoredRow],
        state: GroupState[Seq[(Double, Long)]]): Iterator[GroupTopK] = {
      val merged = (state.getOption.getOrElse(Nil) ++ it.map(r => (r.score, r.id)))
        .sortBy(p => (-p._1, p._2)).take(k)
      state.update(merged)
      Iterator.single(GroupTopK(g, merged))
    }
    rows.groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(upd)
  }

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  final case class UserSessions(user_id: Long, sessions: Long)
  final case class SessionState(lastTsMicros: Long, sessions: Long)

  /** Typed event projection for the sessionize family: rows missing
    * event id, event time, or user id are DROPPED. An event with no
    * user or no time cannot be sessionized, and the primitive-field
    * `EventRow` encoder otherwise kills the whole stream with an opaque
    * `NOT_NULL_ASSERT_VIOLATION` task error on the FIRST corrupt row —
    * at 100 TB/day one bad record must not take down the query
    * (StreamChaosSpec pins both the drop and the clean-data identity).
    */
  def typedEvents(events: DataFrame): Dataset[EventRow] =
    events.select(col("event_id"), col("ts"), col("user_id"))
      // explicit per-column isNotNull, NOT na.drop: na.drop compiles to
      // AtLeastNNonNulls, which parquet cannot push (DataFilters only);
      // the conjunction reaches PushedFilters, so at 100 TB row-group
      // null-count stats can skip and the scan stays minimal
      .filter(col("event_id").isNotNull && col("ts").isNotNull &&
        col("user_id").isNotNull)
      .as[EventRow](org.apache.spark.sql.Encoders.product[EventRow])

  /** Typed projection for [[topKPerGroup]] over columns (g, score, id):
    * rows with a null score or id are DROPPED (a null score cannot
    * rank; the primitive encoder would otherwise kill the stream). A
    * null GROUP is kept — `g` is a reference field, and the batch
    * aggregate it twins groups nulls together the same way.
    */
  def typedScored(rows: DataFrame): Dataset[ScoredRow] =
    rows.select(col("g"), col("score"), col("id"))
      // explicit isNotNull for pushdown — see typedEvents
      .filter(col("score").isNotNull && col("id").isNotNull)
      .as[ScoredRow](org.apache.spark.sql.Encoders.product[ScoredRow])

  /** Q32 twin: stateful sessionization with a 30-minute gap via
    * `flatMapGroupsWithState`. State per user is (last-seen ts, session
    * count); emits the updated count every batch (Update mode).
    */
  /** The ONE session fold both state APIs run — sessionize (fMGWS) and
    * SessionizeProcessor (transformWithState) are pinned to the same
    * oracle (x51/x95) and must never drift, so the sort key, the
    * Long.MinValue cold-start sentinel, and the gap comparison live
    * here exactly once (the attributionJoin device, applied to the
    * sessionize twins — r20 review).
    *
    * Its own tiny Serializable object, NOT methods on StreamingTwins:
    * the executor-side closures call it, and a lambda calling an
    * enclosing-module method captures that module — StreamingTwins
    * (TrieMap caches and all) is not Serializable and must never ride
    * a task.
    */
  private[streaming] object SessionMath extends Serializable {
    // exact µs, not getTime*1000: getTime is ms-truncated, and the
    // events corpus carries sub-ms µs components — a gap within 1 ms
    // of exactly `gapSeconds` (or a same-ms ordering tie) would
    // otherwise classify differently from the batch twin's
    // unix_micros comparison
    def micros(ts: java.sql.Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

    /** None = the micro-batch carried no rows for this key: emit
      * nothing, leave state untouched.
      */
    def fold(rows: Iterator[EventRow], init: SessionState,
        gapSeconds: Long): Option[SessionState] = {
      val sorted = rows.toSeq.sortBy(r => (micros(r.ts), r.event_id))
      if (sorted.isEmpty) None
      else {
        var st = init
        sorted.foreach { r =>
          val us = micros(r.ts)
          val isNew = st.lastTsMicros == Long.MinValue ||
            (us - st.lastTsMicros) > gapSeconds * 1000000L
          st = SessionState(us, if (isNew) st.sessions + 1 else st.sessions)
        }
        Some(st)
      }
    }
  }

  def sessionize(events: Dataset[EventRow], gapSeconds: Long = 1800): Dataset[UserSessions] = {
    import events.sparkSession.implicits._

    def update(
        userId: Long,
        rows: Iterator[EventRow],
        state: GroupState[SessionState]): Iterator[UserSessions] =
      SessionMath.fold(rows,
          state.getOption.getOrElse(SessionState(Long.MinValue, 0L)),
          gapSeconds) match {
        case None => Iterator.empty
        case Some(st) =>
          state.update(st)
          Iterator.single(UserSessions(userId, st.sessions))
      }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }

  /** TWS queries require the RocksDB state-store provider; set it for
    * the duration of `body` and restore after (the same restore-after-
    * processAllAvailable contract as the partition sizing — the stream
    * thread reads the conf asynchronously after start()).
    */
  def withRocksDbProvider[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  /** Q32's sessionization AGAIN, on Spark 4's `transformWithState`
    * arbitrary-state API — the successor to `flatMapGroupsWithState`
    * that [[sessionize]] uses: typed `ValueState` handles from a
    * `StatefulProcessor` instead of one opaque `GroupState` blob, with
    * per-state TTL and timers available (neither needed here). Must
    * produce the identical answer, so both APIs are pinned to the same
    * oracle (x51 / x95). One processor serves the cold-start path
    * ([[sessionizeTws]] — `handleInitialState` simply never fires) and
    * the warm-start path ([[sessionizeTwsBootstrap]] — a batch snapshot
    * seeds each user's (last-ts, sessions) before the first
    * micro-batch, so a session spanning the snapshot boundary is
    * classified exactly as the continuous run would). Requires the
    * RocksDB state-store provider ([[withRocksDbProvider]]).
    */
  final class SessionizeProcessor(gapSeconds: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, EventRow, UserSessions, SessionState] {
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var st: ValueState[SessionState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInitialState(userId: Long, initial: SessionState,
        tv: TimerValues): Unit =
      st.update(initial)

    override def handleInputRows(userId: Long, rows: Iterator[EventRow],
        tv: TimerValues): Iterator[UserSessions] =
      // the shared fold ([[SessionMath.fold]]): both state APIs answer
      // the same oracle, so the session arithmetic exists exactly once
      SessionMath.fold(rows,
          if (st.exists()) st.get() else SessionState(Long.MinValue, 0L),
          gapSeconds) match {
        case None => Iterator.empty
        case Some(s) =>
          st.update(s)
          Iterator.single(UserSessions(userId, s.sessions))
      }
  }

  def sessionizeTws(events: Dataset[EventRow], gapSeconds: Long = 1800): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor(gapSeconds),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update)
  }

  /** [[SessionizeProcessor]] warm-started from a batch snapshot — the
    * operational bootstrap pattern: a long-lived sessionizer restarts
    * (or first deploys) against history already summarized in batch,
    * and the stream continues from that state instead of replaying
    * 100 TB of history.
    */
  def sessionizeTwsBootstrap(
      events: Dataset[EventRow],
      snapshot: Dataset[(Long, SessionState)],
      gapSeconds: Long = 1800): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor(gapSeconds),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update,
        snapshot.groupByKey(_._1).mapValues(_._2))
  }
}
