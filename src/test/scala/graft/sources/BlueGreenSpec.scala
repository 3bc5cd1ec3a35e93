package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

/** OP-10 swap tail (`_services.py`, `swap_services.py`): topology
  * assembly, swap planning from live state, promote-all, drift guard.
  */
class BlueGreenSpec extends AnyFunSuite {

  import BlueGreen._

  // the reference's shape: 3 types × (2 backing services, 2 views)
  private val backing = Seq(
    ("cities-blue", 2), ("cities-green", 2),
    ("counties-blue", 1), ("counties-green", 1),
    ("overlap-blue", 3), ("overlap-green", 3))
  private val views = Seq(
    ("cities-view", 2), ("counties-view", 1), ("overlap-view", 3))

  test("makeBlueGreen pairs each view with its type's backing pair in order") {
    val svc = makeBlueGreen(views, backing)
    assert(svc == Seq(
      Service("cities-view", "cities-blue", "cities-green"),
      Service("counties-view", "counties-blue", "counties-green"),
      Service("overlap-view", "overlap-blue", "overlap-green")))
  }

  test("a type with other-than-two backing services is a config error") {
    intercept[IllegalArgumentException](
      makeBlueGreen(Seq(("v", 9)), backing))
    intercept[IllegalArgumentException](
      makeBlueGreen(views, backing :+ ("cities-third", 2)))
  }

  test("planSwaps stages the opposite color of whatever is live") {
    val svc = makeBlueGreen(views, backing)
    val live = Map(
      "cities-view" -> "cities-blue",
      "counties-view" -> "counties-green",
      "overlap-view" -> "overlap-blue")
    val swaps = planSwaps(svc, live)
    assert(swaps.map(s => s.view -> s.staging) == Seq(
      "cities-view" -> "cities-green",
      "counties-view" -> "counties-blue",
      "overlap-view" -> "overlap-green"))
  }

  test("a view live on an undeclared backing is drift, not a silent swap") {
    val svc = makeBlueGreen(views, backing)
    intercept[IllegalStateException](
      planSwaps(svc, Map("cities-view" -> "some-old-item").withDefault(
        v => svc.find(_.view == v).get.blue)))
  }

  test("promoteAll repoints every view to its staging backing — and a second run flips back") {
    val svc = makeBlueGreen(views, backing)
    var live = Map(
      "cities-view" -> "cities-blue",
      "counties-view" -> "counties-blue",
      "overlap-view" -> "overlap-green")
    val repoints = new ArrayBuffer[(String, String)]
    val applied = promoteAll(svc, live, (v, t) => { repoints += (v -> t); live += (v -> t) })
    assert(repoints.toSeq == Seq(
      "cities-view" -> "cities-green",
      "counties-view" -> "counties-green",
      "overlap-view" -> "overlap-blue"))
    assert(applied.map(_.live) == Seq("cities-blue", "counties-blue", "overlap-green"))
    // blue/green is an involution: promoting again restores the start
    promoteAll(svc, live, (v, t) => live += (v -> t))
    assert(live == Map(
      "cities-view" -> "cities-blue",
      "counties-view" -> "counties-blue",
      "overlap-view" -> "overlap-green"))
  }

  test("report prints live + staging per view (backing_service_report)") {
    val svc = makeBlueGreen(views, backing).take(1)
    val lines = report(svc, Map("cities-view" -> "cities-green"))
    assert(lines == Seq("view cities-view: live=cities-green staging=cities-blue"))
  }
}
