package graft.pipeline

import graft.geom.{CrsMath, GeomCodec}

/** Pipeline constants mirroring the reference's `config.py:24-148`. */
object BunnyHopConfig {

  /** `config.py:25-38` FIELD_NAMES. */
  val City = "CDTFA_CITY"
  val Copri = "CDTFA_COPRI"
  val County = "CDTFA_COUNTY"
  val PlaceName = "CENSUS_PLACE_NAME"
  val Geoid = "CENSUS_GEOID"
  val PlaceType = "CENSUS_PLACE_TYPE"
  val Population = "CENSUS_POPULATION"
  val LegalPlaceName = "GNIS_PLACE_NAME"
  val GnisId = "GNIS_ID"
  val PlaceAbbr = "CDT_CITY_ABBR"
  val CntyAbbr = "CDT_COUNTY_ABBR"
  val NameShort = "CDT_NAME_SHORT"
  val PrimaryDomain = "PRIMARY_DOMAIN"
  val Coastal = "OFFSHORE"
  val GnisJoinName = "GNIS_JOIN_NAME"

  /** `config.py:40-44` CDTFA_FIELD_MAP. */
  val CdtfaFieldMap: Map[String, String] =
    Map("COPRI" -> Copri, "COUNTY" -> County, "CITY" -> City)

  /** `config.py:115-123` GNIS_ADJUSTMENTS (applied to GNIS_JOIN_NAME). */
  val GnisAdjustments: Map[String, String] = Map(
    "El Paso de Robles" -> "Paso Robles",
    "San Buenaventura" -> "Ventura",
    "Saint Helena" -> "St. Helena",
    "California City" -> "California")

  /** `config.py:140-148` CENSUS_ADJUSTMENTS (applied to Area_Name). */
  val CensusAdjustments: Map[String, String] = Map(
    "La Ca±ada Flintridge city" -> "La Cañada Flintridge city",
    "El Paso de Robles (Paso Robles) city" -> "Paso Robles city",
    "San Buenaventura (Ventura) city" -> "Ventura city",
    "California City city" -> "California city")

  /** `config.py:91-99` CDTFA_ADJUST: coincident-city/county patches. */
  val CdtfaAdjust: Seq[(String, String, String, String)] = Seq(
    // (checkField, checkValue, updateField, updateValue)
    (PlaceName, "San Francisco County", Copri, "38000"),
    (PlaceName, "San Francisco County", LegalPlaceName, "San Francisco County"))

  /** `config.py:75` minimum CDTFA record count guard. */
  val CdtfaMinRecords = 500

  /** `config.py:56-59` coastline exclusion + sliver threshold. */
  val CoastlineExclude: Seq[String] = Seq("ocean", "bay")
  val SliverThresholdM2 = 100000.0

  /** Working/service CRS (web mercator), output CRS (CA Albers),
    * sliver-check CRS (`config.py:48,60`).
    */
  val ServiceSrid = 3857
  val OutputSrid = 3310
  val SliverCheckSrid = 3857

  /** `config.py:62-66` keep-list fragment geometries, authored in 3310
    * and projected to the 3857 check CRS (Farallons box, Alcatraz
    * point, Angel Island box).
    */
  lazy val KeepFragmentsWkb3857: Seq[Array[Byte]] = {
    def poly(pts: Seq[(Double, Double)]): Array[Byte] = {
      val g = GeomCodec.factory.createPolygon(
        (pts :+ pts.head).map { case (x, y) =>
          new org.locationtech.jts.geom.Coordinate(x, y)
        }.toArray)
      GeomCodec.write(CrsMath.transformGeometry(g, 3310, 3857))
    }
    def point(x: Double, y: Double): Array[Byte] = {
      val g = GeomCodec.factory.createPoint(new org.locationtech.jts.geom.Coordinate(x, y))
      GeomCodec.write(CrsMath.transformGeometry(g, 3310, 3857))
    }
    Seq(
      poly(Seq((-281052.0, -16085.0), (-257873.0, -16085.0),
        (-257873.0, -38503.0), (-281052.0, -38503.0))),
      point(-212926.0, -18383.0),
      poly(Seq((-212938.0, -14187.0), (-211711.0, -14187.0),
        (-211711.0, -15762.0), (-212938.0, -15762.0))))
  }
}
