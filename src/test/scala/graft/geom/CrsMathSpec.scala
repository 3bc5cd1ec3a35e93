package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** G5/G8-adjacent pure-math checks for the hand-rolled CRS formulas
  * (SURVEY §2.14, §7.4 hard-part #5). No Spark needed.
  */
class CrsMathSpec extends AnyFunSuite {

  test("pseudo-mercator pins the published world-edge constant") {
    val (x, _) = CrsMath.lonLatToMercator(180.0, 0.0)
    assert(math.abs(x - 20037508.342789244) < 1e-6)
    val (x2, y2) = CrsMath.lonLatToMercator(0.0, 0.0)
    assert(math.abs(x2) < 1e-9 && math.abs(y2) < 1e-9)
  }

  test("albers CA origin maps to (0, -4000000)") {
    val (x, y) = CrsMath.lonLatToAlbersCA(-120.0, 0.0)
    assert(math.abs(x - 0.0) < 1e-6)
    assert(math.abs(y - (-4000000.0)) < 1e-6)
  }

  test("central meridian stays at x=0 for all latitudes") {
    for (lat <- Seq(32.0, 34.0, 37.0, 40.5, 42.0)) {
      val (x, _) = CrsMath.lonLatToAlbersCA(-120.0, lat)
      assert(math.abs(x) < 1e-6, s"lat=$lat x=$x")
    }
  }

  test("round trips are identity to 1e-9 degrees") {
    val pts = Seq((-124.4, 40.44), (-120.0, 37.0), (-114.1, 32.6), (-118.24, 34.05))
    for ((lon, lat) <- pts) {
      val (ax, ay) = CrsMath.lonLatToAlbersCA(lon, lat)
      val (lon2, lat2) = CrsMath.albersCAToLonLat(ax, ay)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"albers rt ($lon,$lat) -> ($lon2,$lat2)")
      val (mx, my) = CrsMath.lonLatToMercator(lon, lat)
      val (lon3, lat3) = CrsMath.mercatorToLonLat(mx, my)
      assert(math.abs(lon3 - lon) < 1e-9 && math.abs(lat3 - lat) < 1e-9)
      val (cx, cy) = CrsMath.transformPoint(ax, ay, 3310, 3857)
      val (bx, by) = CrsMath.transformPoint(cx, cy, 3857, 3310)
      assert(math.abs(bx - ax) < 1e-6 && math.abs(by - ay) < 1e-6)
    }
  }

  test("albers is equal-area: projected area matches ellipsoidal authalic area") {
    // 1°x1° cell at 37..38N, -120..-119E, densified so the projected
    // polygon tracks the true edge curves. Independent oracle: the
    // authalic area formula A = a²·Δλ·(q(φ2)-q(φ1))/2 (Snyder 3-12),
    // a different derivation path than the projection itself.
    val a = 6378137.0
    val f = 1.0 / 298.257222101
    val e2 = f * (2 - f); val e = math.sqrt(e2)
    def q(latDeg: Double): Double = {
      val s = math.sin(math.toRadians(latDeg))
      (1 - e2) * (s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    val truth = a * a * math.toRadians(1.0) * (q(38) - q(37)) / 2.0

    val n = 200
    val ring = new scala.collection.mutable.ArrayBuffer[(Double, Double)]
    for (i <- 0 to n) ring += ((-120.0 + i * (1.0 / n), 37.0))   // south edge
    for (i <- 0 to n) ring += ((-119.0, 37.0 + i * (1.0 / n)))   // east edge
    for (i <- 0 to n) ring += ((-120.0 + (n - i) * (1.0 / n), 38.0)) // north
    for (i <- 0 to n) ring += ((-120.0, 38.0 - i * (1.0 / n)))   // west
    val proj = ring.map { case (lon, lat) => CrsMath.lonLatToAlbersCA(lon, lat) }
    // shoelace
    var area = 0.0
    for (i <- proj.indices) {
      val (x1, y1) = proj(i)
      val (x2, y2) = proj((i + 1) % proj.size)
      area += x1 * y2 - x2 * y1
    }
    area = math.abs(area) / 2.0
    assert(math.abs(area - truth) / truth < 1e-6,
      s"projected=$area authalic=$truth rel=${math.abs(area - truth) / truth}")
  }

  test("Mercator rejects out-of-domain latitude loudly instead of emitting Inf/NaN") {
    for (lat <- Seq(90.0, -90.0, 91.0, -123.0, Double.NaN)) {
      val e = intercept[IllegalArgumentException] {
        CrsMath.lonLatToMercator(0.0, lat)
      }
      assert(e.getMessage.contains("EPSG:3857 domain"), s"lat=$lat: ${e.getMessage}")
    }
    // the open interval still admits extreme-but-valid latitudes
    val (_, y) = CrsMath.lonLatToMercator(0.0, 89.999999)
    assert(!y.isNaN && !y.isInfinite && y > 0, y)
    val (_, ys) = CrsMath.lonLatToMercator(0.0, -89.999999)
    assert(!ys.isNaN && !ys.isInfinite && ys < 0, ys)
  }

  test("G8: keep-list constant geometries round-trip 3310→3857→3310 (config.py:60-66)") {
    val farallon = Seq((-281052.0, -16085.0), (-257873.0, -16085.0),
      (-257873.0, -38503.0), (-281052.0, -38503.0))
    val alcatraz = Seq((-212926.0, -18383.0))
    val angel = Seq((-212938.0, -14187.0), (-211711.0, -14187.0),
      (-211711.0, -15762.0), (-212938.0, -15762.0))
    for ((x, y) <- farallon ++ alcatraz ++ angel) {
      val (mx, my) = CrsMath.transformPoint(x, y, 3310, 3857)
      val (bx, by) = CrsMath.transformPoint(mx, my, 3857, 3310)
      assert(math.abs(bx - x) < 1e-6 && math.abs(by - y) < 1e-6, s"($x,$y)")
    }
  }
}
