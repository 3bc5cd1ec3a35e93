package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins every [[SourceChaosProbe]] scenario's adjudication: each
  * hostile FILE fed to a from-spec reader must fail LOUDLY with the
  * file/URL context (verdict Loud) — never parse garbage (Garbage),
  * never die with a context-free low-level error (Opaque), never with
  * a message missing the expected diagnostic token (WrongMessage).
  * One test per scenario so a regression names the exact reader and
  * corruption that went quiet. Pure JVM — no SparkSession.
  */
class SourceChaosSpec extends AnyFunSuite {

  SourceChaosProbe.scenarios().foreach { s =>
    test(s"${s.reader}: ${s.name} fails loudly") {
      SourceChaosProbe.adjudicate(s) match {
        case SourceChaosProbe.Loud(_) => // pinned policy upheld
        case SourceChaosProbe.Garbage(r) =>
          fail(s"reader returned data from a corrupt file: $r")
        case SourceChaosProbe.Opaque(e) =>
          fail(s"opaque low-level error (no file context): " +
            s"${e.getClass.getName}: ${e.getMessage}")
        case SourceChaosProbe.WrongMessage(m, wanted) =>
          fail(s"loud but missing the diagnostic token '$wanted': $m")
      }
    }
  }

}
