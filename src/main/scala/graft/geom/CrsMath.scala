package graft.geom

import org.locationtech.jts.geom.{Coordinate, Geometry}
import org.locationtech.jts.geom.util.GeometryTransformer
import org.locationtech.jts.geom.CoordinateSequence
import org.locationtech.jts.geom.impl.CoordinateArraySequence

/** Coordinate-reference-system math for the three CRS the reference uses
  * (`config.py:48,49,54,60` — EPSG:4326, EPSG:3857, EPSG:3310). No
  * proj4j is available in the jars, so the projections are implemented
  * from the published formulas:
  *
  *  - EPSG:3857 (WGS84 Pseudo-Mercator): spherical Mercator on the
  *    WGS84 semi-major axis, geodetic latitude used directly.
  *  - EPSG:3310 (NAD83 / California Albers): Albers Equal-Area Conic on
  *    the GRS80 ellipsoid, standard parallels 34° and 40.5°, central
  *    meridian -120°, latitude of origin 0°, false northing -4,000,000 m
  *    (Snyder, "Map Projections – A Working Manual", USGS PP 1395,
  *    pp. 101–102). WGS84↔NAD83 datum shift is sub-meter and treated as
  *    identity, the standard approximation at cartographic scale.
  *
  * All functions are pure math on doubles — safe to call per-coordinate
  * inside executor-side geometry transforms.
  */
object CrsMath {

  // GRS80 / WGS84 semi-major axis (meters) and GRS80 flattening
  private val A  = 6378137.0
  private val F  = 1.0 / 298.257222101
  private val E2 = F * (2.0 - F)          // eccentricity squared
  private val E  = math.sqrt(E2)

  // --- EPSG:3857 (spherical pseudo-Mercator) -------------------------

  def lonLatToMercator(lon: Double, lat: Double): (Double, Double) = {
    // Mercator is undefined at the poles: tan(π/4+φ/2) → ∞ at φ = 90°
    // and goes negative past it (log → NaN). Without this guard an
    // out-of-domain latitude (a corrupt vertex, or exactly ±90) silently
    // produced an Infinity/NaN coordinate that poisoned every downstream
    // predicate and area; PROJ-based references error here, so fail
    // loudly. abs(NaN) < 90 is false, so NaN latitudes are caught too.
    require(math.abs(lat) < 90.0,
      s"lonLatToMercator: latitude $lat outside the EPSG:3857 domain (-90, 90)")
    val x = A * math.toRadians(lon)
    val y = A * math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0))
    (x, y)
  }

  def mercatorToLonLat(x: Double, y: Double): (Double, Double) = {
    val lon = math.toDegrees(x / A)
    val lat = math.toDegrees(2.0 * math.atan(math.exp(y / A)) - math.Pi / 2.0)
    (lon, lat)
  }

  // --- EPSG:3310 (Albers Equal-Area Conic, GRS80) --------------------

  private val Phi1 = math.toRadians(34.0)
  private val Phi2 = math.toRadians(40.5)
  private val Phi0 = 0.0
  private val Lam0 = math.toRadians(-120.0)
  private val FalseE = 0.0
  private val FalseN = -4000000.0

  /** Snyder 3-12: authalic q for geodetic latitude. */
  private def qOf(phi: Double): Double = {
    val s = math.sin(phi)
    (1.0 - E2) * (s / (1.0 - E2 * s * s) -
      (1.0 / (2.0 * E)) * math.log((1.0 - E * s) / (1.0 + E * s)))
  }

  /** Snyder 14-15: m = cosφ / sqrt(1 - e² sin²φ). */
  private def mOf(phi: Double): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1.0 - E2 * s * s)
  }

  private val m1 = mOf(Phi1)
  private val m2 = mOf(Phi2)
  private val q0 = qOf(Phi0)
  private val q1 = qOf(Phi1)
  private val q2 = qOf(Phi2)
  private val n  = (m1 * m1 - m2 * m2) / (q2 - q1)   // Snyder 14-14
  private val C  = m1 * m1 + n * q1                   // Snyder 14-13
  private val rho0 = A * math.sqrt(C - n * q0) / n    // Snyder 14-12a

  def lonLatToAlbersCA(lon: Double, lat: Double): (Double, Double) = {
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon)
    val q   = qOf(phi)
    val rho = A * math.sqrt(C - n * q) / n            // Snyder 14-12
    val theta = n * (lam - Lam0)                      // Snyder 14-4
    val x = rho * math.sin(theta) + FalseE
    val y = rho0 - rho * math.cos(theta) + FalseN
    (x, y)
  }

  def albersCAToLonLat(x: Double, y: Double): (Double, Double) = {
    val xr = x - FalseE
    val yr = rho0 - (y - FalseN)
    val rho = math.sqrt(xr * xr + yr * yr)
    val theta = math.atan2(xr, yr)                    // n > 0 for California
    val q = (C - rho * rho * n * n / (A * A)) / n     // Snyder 14-19
    // iterate Snyder 3-16 for φ; q/(1-e²) ≈ sin of authalic-ish latitude
    var phi = math.asin(math.min(1.0, math.max(-1.0, q / 2.0)))
    var delta = 1.0
    var i = 0
    while (delta > 1e-13 && i < 15) {
      val s = math.sin(phi)
      val oneMinus = 1.0 - E2 * s * s
      val corr = (oneMinus * oneMinus) / (2.0 * math.cos(phi)) *
        (q / (1.0 - E2) - s / oneMinus +
          (1.0 / (2.0 * E)) * math.log((1.0 - E * s) / (1.0 + E * s)))
      phi += corr
      delta = math.abs(corr)
      i += 1
    }
    val lam = Lam0 + theta / n
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  // --- generic point + geometry transform ----------------------------

  /** Transform one coordinate between any pair of {4326, 3857, 3310}. */
  def transformPoint(x: Double, y: Double, fromSrid: Int, toSrid: Int): (Double, Double) = {
    if (fromSrid == toSrid) return (x, y)
    val (lon, lat) = fromSrid match {
      case 4326 => (x, y)
      case 3857 => mercatorToLonLat(x, y)
      case 3310 => albersCAToLonLat(x, y)
      case other => throw new IllegalArgumentException(s"unsupported SRID $other")
    }
    toSrid match {
      case 4326 => (lon, lat)
      case 3857 => lonLatToMercator(lon, lat)
      case 3310 => lonLatToAlbersCA(lon, lat)
      case other => throw new IllegalArgumentException(s"unsupported SRID $other")
    }
  }

  /** Transform every coordinate of a JTS geometry. */
  def transformGeometry(g: Geometry, fromSrid: Int, toSrid: Int): Geometry = {
    if (fromSrid == toSrid) return g
    val tr = new GeometryTransformer {
      override def transformCoordinates(
          cs: CoordinateSequence, parent: Geometry): CoordinateSequence = {
        val out = new Array[Coordinate](cs.size())
        var i = 0
        while (i < cs.size()) {
          val (nx, ny) = CrsMath.transformPoint(cs.getX(i), cs.getY(i), fromSrid, toSrid)
          out(i) = new Coordinate(nx, ny)
          i += 1
        }
        new CoordinateArraySequence(out)
      }
    }
    val res = tr.transform(g)
    // in-memory JTS convenience only: the engine carries SRID as a
    // separate column, and GeomCodec's 2D WKB writer drops the SRID on
    // persist — do not rely on it surviving a WKB round trip
    res.setSRID(toSrid)
    res
  }

  /** m² → mi² divisor used by OP-46 (`bunny.py:500-506`, SQUARE_MILES_INT). */
  val SquareMetersPerSquareMile: Double = 2589988.110336
}
