package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** Continuously verifies the verification TOOLING itself by running
  * `tools/selftest.sh` — the hermetic exercise of every adjudication
  * and failure path the round gates depend on: baseline_check.py's
  * full exit-code contract (keep/adopt/committed-invalid plus each
  * "clean" taint leg) against fixtures in a throwaway git repo,
  * golden_ext.recall_audit's ok/missed/refuse/skip decisions under
  * both python3 and python3 -O (the assert-stripping hazard), the
  * end-to-end GRAFT_AUDIT_FLOP_CAP hook, and check_oracle.py's
  * detection of every corruption class (value / row count / physical
  * type / column name / missing output).
  *
  * A gate whose failure mode only ever ran by hand in one session is
  * itself unverified; wiring the script here makes `sbt test` re-pin
  * it on every round instead. Cancels (not fails) when the driver-side
  * python toolchain is absent — the tooling can't run there anyway.
  */
class GateToolingSpec extends AnyFunSuite {

  test("gate tooling selftest: every adjudication and failure path pins") {
    val script = new java.io.File("tools/selftest.sh")
    assume(script.isFile, s"tools/selftest.sh not under ${new java.io.File(".").getAbsolutePath}")
    // everything selftest.sh's sections can import: B needs numpy,
    // C needs duckdb, D needs duckdb + pyarrow + pandas (check_oracle)
    val pyProbe = Process(
      Seq("python3", "-c", "import numpy, duckdb, pyarrow, pandas"))
      .!(ProcessLogger(_ => ()))
    assume(pyProbe == 0,
      "driver-side python toolchain (numpy/duckdb/pyarrow/pandas) absent")

    val out = new StringBuilder
    val rc = Process(Seq("bash", script.getPath))
      .!(ProcessLogger(l => out.synchronized { out.append(l).append('\n') }))
    assert(rc == 0, s"selftest.sh exited $rc:\n$out")
    val passed = "selftest: (\\d+) checks pass".r
      .findFirstMatchIn(out.toString).map(_.group(1).toInt)
    // 20 = sections A+B (always-hermetic); C+D add 11 when testdata is
    // present. Pin the floor, not the exact count, so the spec holds in
    // an environment without /root/testdata.
    assert(passed.exists(_ >= 20),
      s"expected >=20 checks, got $passed:\n${out.toString.linesIterator.toSeq.takeRight(8).mkString("\n")}")
  }
}
