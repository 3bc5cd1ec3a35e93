package graft.pipeline

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

/** OP-53 (`logging_and_alerts.py:13-67`): three-way fan-out, rotating
  * file semantics, and the success/failure issue protocol.
  */
class RunLogSpec extends AnyFunSuite {

  private def tempLog() = {
    val dir = Files.createTempDirectory("runlog")
    dir.resolve("logs").resolve("run_log.txt")
  }

  private def fixedClock(start: Long = 1700000000000L): () => Long = {
    var t = start
    () => { t += 1000; t }
  }

  test("records fan out to console, file, and the in-memory keeper") {
    val console = new ArrayBuffer[String]
    val file = tempLog()
    val log = new RunLog(file, console += _, fixedClock())
    log.info("Logging configured")
    log.debug("workspace ready")

    assert(console.size == 2)
    assert(log.records.map(_.message) == Seq("Logging configured", "workspace ready"))
    val onDisk = new String(Files.readAllBytes(file), "UTF-8")
    assert(onDisk.contains("Logging configured") && onDisk.contains("workspace ready"))
    // %(asctime)s %(levelname)-8s %(name)-15s %(message)s
    assert(console.head.matches(
      """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} INFO {5}graft {11}Logging configured"""))
  }

  test("a failing file handler never aborts the run; the keeper still alerts") {
    // CPython RotatingFileHandler.emit routes write errors through
    // handleError and keeps going — a disk-full log file aborting the
    // run would also suppress the failure alert flush() builds from
    // the in-memory keeper (r20 review)
    val dir = Files.createTempDirectory("runlog_ro")
    val blocked = dir.resolve("as_dir.txt")
    Files.createDirectories(blocked) // a DIRECTORY at the log path: every write fails
    val console = new ArrayBuffer[String]
    val log = new RunLog(blocked, console += _, fixedClock())
    log.info("still running")
    log.error("the actual failure")
    assert(log.records.map(_.message) == Seq("still running", "the actual failure"),
      "the keeper must hold every record despite the dead file handler")
    // the handler failure is surfaced on the console fan-out
    assert(console.exists(_.contains("logging to")), console.mkString("\n"))
  }

  test("level threshold drops records below it") {
    val console = new ArrayBuffer[String]
    val log = new RunLog(tempLog(), console += _, fixedClock(), level = RunLog.Warning)
    log.debug("hidden"); log.info("hidden too"); log.error("kept")
    assert(console.size == 1 && log.records.map(_.message) == Seq("kept"))
  }

  test("rotation keeps backupCount files and never splits a record") {
    val file = tempLog()
    val log = new RunLog(file, _ => (), fixedClock(), maxBytes = 120, backupCount = 2)
    (1 to 12).foreach(i => log.info(s"record number $i with some padding to force rotation"))

    val b1 = Paths.get(file.toString + ".1")
    val b2 = Paths.get(file.toString + ".2")
    val b3 = Paths.get(file.toString + ".3")
    assert(Files.exists(file) && Files.exists(b1) && Files.exists(b2))
    assert(!Files.exists(b3), "backupCount=2 must cap the chain")
    // every surviving line is whole (starts with a timestamp), none split
    Seq(file, b1, b2).foreach { p =>
      new String(Files.readAllBytes(p), "UTF-8").linesIterator.foreach(l =>
        assert(l.matches("""\d{4}-\d{2}-\d{2} .*"""), s"split record in $p: $l"))
    }
    // newest data is in the live file
    assert(new String(Files.readAllBytes(file), "UTF-8").contains("record number 12"))
  }

  test("rollover boundary matches CPython: >= maxBytes rolls, empty file never does") {
    // record that lands the file at EXACTLY maxBytes must roll first
    // (shouldRollover uses pos + len(msg) >= maxBytes)
    val file = tempLog()
    val log = new RunLog(file, _ => (), fixedClock(), maxBytes = 100, backupCount = 1)
    // format() prefix is 36 chars ("yyyy-MM-dd HH:mm:ss LEVEL---8 name--15 "), so
    // size the messages via the observed on-disk length instead of hardcoding
    log.info("a")
    val lineLen = Files.size(file)
    // second record would land at exactly 2*lineLen; set up a fresh log
    // with maxBytes == 2*lineLen — equality must trigger the roll
    val file2 = tempLog()
    val log2 = new RunLog(file2, _ => (), fixedClock(),
      maxBytes = 2 * lineLen, backupCount = 1)
    log2.info("a"); log2.info("a")
    assert(Files.exists(Paths.get(file2.toString + ".1")),
      "append reaching exactly maxBytes must rotate (CPython >= boundary)")
    assert(Files.size(file2) == lineLen)
    // a single over-long record on an empty file lands whole, no roll
    val file3 = tempLog()
    val log3 = new RunLog(file3, _ => (), fixedClock(), maxBytes = 10, backupCount = 1)
    log3.info("much longer than ten bytes")
    assert(!Files.exists(Paths.get(file3.toString + ".1")))
    assert(Files.size(file3) > 10)
    // maxBytes = 0 DISABLES rotation (CPython shouldRollover returns
    // false): it used to roll on every write, shredding the audit
    // trail into one-line backups
    val file4 = tempLog()
    val log4 = new RunLog(file4, _ => (), fixedClock(), maxBytes = 0, backupCount = 1)
    (1 to 5).foreach(i => log4.info(s"unrotated record $i"))
    assert(!Files.exists(Paths.get(file4.toString + ".1")),
      "maxBytes=0 must disable rotation")
    val content4 = new String(Files.readAllBytes(file4), "UTF-8")
    assert((1 to 5).forall(i => content4.contains(s"unrotated record $i")))
  }

  test("flush on success: issue created closed, no assignee, body carries the log") {
    val log = new RunLog(tempLog(), _ => (), fixedClock())
    log.info("step one"); log.info("step two")
    val posted = new ArrayBuffer[RunLog.Issue]
    val issue = log.flush(success = true, posted += _, fileGithubIssues = true)
    assert(issue.state == "closed" && issue.assignees.isEmpty)
    assert(issue.title.contains("succeeded"))
    assert(issue.body.contains("step one") && issue.body.contains("step two"))
    assert(posted == Seq(issue))
  }

  test("flush on failure: scary title, open, assigned") {
    val log = new RunLog(tempLog(), _ => (), fixedClock())
    log.error("retrieval blew up")
    val issue = log.flush(success = false, assignee = "oncall")
    assert(issue.state == "open" && issue.assignees == Seq("oncall"))
    assert(issue.title.toUpperCase.contains("FAILED"))
    assert(issue.body.contains("retrieval blew up"))
  }

  test("FILE_GITHUB_ISSUES=false gates the post but still returns the payload") {
    val log = new RunLog(tempLog(), _ => (), fixedClock())
    log.info("quiet run")
    var posts = 0
    val issue = log.flush(success = true, _ => posts += 1, fileGithubIssues = false)
    assert(posts == 0 && issue.body.contains("quiet run"))
  }
}
