package graft.tools

/** Pins every [[SinkChaosProbe]] scenario's adjudication: a sink whose
  * publish fails mid-write must leave the destination either ABSENT or
  * holding its PREVIOUS COMPLETE content (never a partial artifact),
  * with no `.writing` temp residue — and the success scenarios must
  * still produce round-trippable artifacts. One test per scenario so a
  * regression names the exact sink and failure mode that tore.
  */
class SinkChaosSpec extends graft.SparkTestBase {

  // scenarios are thunks (each builds its own fixtures and adjudicates
  // its own filesystem postconditions); materialize the outcomes once
  private lazy val outcomes = SinkChaosProbe.scenarios(spark).map(_())

  // the scenario LIST is stable, so the test names can enumerate it —
  // but outcomes compute lazily inside the tests, after spark is up
  // 8 driver-side file sinks (r19) + 10 Spark-native directory+table sinks
  // (r20: the mode("overwrite") delete-before-commit loss class)
  (0 until 18).foreach { i =>
    test(s"sink chaos scenario $i upholds the no-torn-artifact contract") {
      val o = outcomes(i)
      assert(o.ok,
        s"[${o.scenario.sink}] ${o.scenario.name}: ${o.verdict} — ${o.detail}")
    }
  }

  test("scenario count matches the pinned battery") {
    assert(outcomes.size == 18, s"expected 18 sink scenarios, got ${outcomes.size}")
  }
}
