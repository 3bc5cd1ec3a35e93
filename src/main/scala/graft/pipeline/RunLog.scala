package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.collection.mutable.ArrayBuffer

/** Run logging + alert channel (OP-53, `logging_and_alerts.py:13-67`,
  * `config.py:183-210`): the reference fans every `bunnyhop` log record
  * out to three handlers — console, a rotating file
  * (`maxBytes=4096, backupCount=2`), and an in-memory keeper whose
  * records become a GitHub issue when the run finishes ("on success,
  * create an issue then close it immediately; on failure, create the
  * issue with a scary title, leave it open and assign it",
  * `logging_and_alerts.py:2-8`).
  *
  * Same shape here, zero-egress like every other live edge in the
  * engine: the console sink, the clock, and the issue `post` transport
  * are injected (production wires stdout / `System.currentTimeMillis` /
  * `java.net.http`; tests wire buffers and a fixed clock). Posting is
  * additionally gated by `fileGithubIssues`, mirroring
  * `FILE_GITHUB_ISSUES = False` (`config.py:21`) — with the flag off,
  * `flush` still RETURNS the payload (the reference's
  * `GenericLogger.flush` docstring leaves the send undecided; returning
  * the built issue keeps the driver in charge of the side effect).
  *
  * This is driver-side orchestration plumbing, not a query operator —
  * nothing here touches a DataFrame, so it carries a spec
  * (`RunLogSpec`), not an oracle entry.
  */
object RunLog {

  /** Record levels, Python `logging` names and ordering. */
  sealed abstract class Level(val name: String, val rank: Int)
  case object Debug extends Level("DEBUG", 10)
  case object Info extends Level("INFO", 20)
  case object Warning extends Level("WARNING", 30)
  case object Error extends Level("ERROR", 40)

  final case class Record(tsMillis: Long, level: Level, logger: String, message: String)

  /** The issue a finished run files — the driver decides whether it
    * reaches GitHub (see `post` + `fileGithubIssues`).
    */
  final case class Issue(
      title: String,
      body: String,
      state: String,          // "closed" on success, "open" on failure
      assignees: Seq[String]) // empty on success; the on-call on failure

  /** `%(asctime)s %(levelname)-8s %(name)-15s %(message)s` with
    * `datefmt=%Y-%m-%d %H:%M:%S` (`logging_and_alerts.py:33-35`),
    * rendered in UTC so the line is machine-independent.
    */
  def format(r: Record): String = {
    val ts = java.time.Instant.ofEpochMilli(r.tsMillis)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    f"$ts ${r.level.name}%-8s ${r.logger}%-15s ${r.message}"
  }
}

/** One run's logger. Not thread-safe by design — the reference logs
  * from a single driver thread; Spark executor-side logging stays on
  * log4j2.
  *
  * @param logFile        rotating file target (`logs/run_log.txt`)
  * @param console        console sink (production: `println`)
  * @param clock          epoch-millis source
  * @param level          threshold, records below it are dropped
  * @param maxBytes       rotation trigger (reference: 4096)
  * @param backupCount    kept backups `<file>.1..<file>.N` (reference: 2)
  */
final class RunLog(
    logFile: Path,
    console: String => Unit = Console.println(_),
    clock: () => Long = () => System.currentTimeMillis(),
    level: RunLog.Level = RunLog.Debug,
    maxBytes: Long = 4096,
    backupCount: Int = 2,
    name: String = "graft") {

  import RunLog._

  private val kept = new ArrayBuffer[Record]

  // config_logging makes the log directory first (`config.py:185`)
  Option(logFile.getParent).foreach(Files.createDirectories(_))

  def debug(msg: String): Unit = log(Debug, msg)
  def info(msg: String): Unit = log(Info, msg)
  def warning(msg: String): Unit = log(Warning, msg)
  def error(msg: String): Unit = log(Error, msg)

  /** All records the in-memory keeper holds (`GenericLogger._records`). */
  def records: Seq[Record] = kept.toSeq

  private def log(lvl: Level, msg: String): Unit = {
    if (lvl.rank < level.rank) return
    val rec = Record(clock(), lvl, name, msg)
    val line = format(rec)
    console(line)
    // file-handler failures never propagate — CPython's
    // RotatingFileHandler.emit routes them through handleError and
    // keeps going. A disk-full/unwritable log file aborting the RUN
    // would also suppress the failure alert this module exists to
    // deliver (flush() builds the issue from `kept`, which still gets
    // the record) — r20 review.
    try writeRotating(line + "\n")
    catch {
      case scala.util.control.NonFatal(e) =>
        console(s"--- logging to $logFile failed: $e")
    }
    kept += rec
  }

  /** Python `RotatingFileHandler` semantics: if appending the record
    * would reach or pass `maxBytes` (`pos + len(msg) >= maxBytes`,
    * `shouldRollover`), roll first (`.1`→`.2`, current→`.1`), then
    * write to a fresh file — a single record longer than `maxBytes`
    * still lands whole, an EMPTY file never rolls (CPython
    * gh-116263), and `maxBytes <= 0` DISABLES rotation entirely
    * (CPython's shouldRollover returns false then; without the guard,
    * 0 would instead roll on every write, shredding the audit trail
    * into one-line backups).
    */
  private def writeRotating(line: String): Unit = {
    val bytes = line.getBytes(UTF_8)
    val size = if (Files.exists(logFile)) Files.size(logFile) else 0L
    if (maxBytes > 0 && size > 0 && size + bytes.length >= maxBytes) {
      var i = backupCount - 1
      while (i >= 1) {
        val src = backup(i)
        if (Files.exists(src)) Files.move(src, backup(i + 1),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        i -= 1
      }
      if (backupCount > 0) Files.move(logFile, backup(1),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      else Files.delete(logFile)
    }
    Files.write(logFile, bytes, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def backup(i: Int): Path = Paths.get(s"${logFile.toString}.$i")

  /** End-of-run alert (`GenericLogger.flush` + the module docstring's
    * protocol): build the issue from the kept records; success ⇒
    * closed immediately, failure ⇒ scary title, open, assigned. Sends
    * through `post` only when `fileGithubIssues` — and returns the
    * payload either way so the driver owns the side effect.
    */
  def flush(
      success: Boolean,
      post: RunLog.Issue => Unit = _ => (),
      fileGithubIssues: Boolean = false,
      assignee: String = ""): RunLog.Issue = {
    val body = kept.map(format).mkString("\n")
    val issue =
      if (success) Issue(s"[$name] run succeeded", body, "closed", Seq.empty)
      else Issue(s"[$name] RUN FAILED — needs attention", body, "open",
        if (assignee.nonEmpty) Seq(assignee) else Seq.empty)
    if (fileGithubIssues) post(issue)
    issue
  }
}
