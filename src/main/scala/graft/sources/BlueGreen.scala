package graft.sources

/** Blue/green publish topology + swap plan (the OP-10 tail:
  * `scripts/_services.py:1-31`, `scripts/swap_services.py:4-11`,
  * `scripts/backing_service_report.py:4-10`). Each public VIEW is
  * backed by two services; one is LIVE (the view points at it), the
  * other is STAGING. A publish run writes the fresh layer to staging,
  * then "promote_staging" repoints the view — readers never see a
  * half-written service.
  *
  * The reference drives this through an external `AGOLBlueGreen`
  * class whose network half (item lookup, view repoint) lives outside
  * its repo too; what IS in-repo is the topology assembly
  * (`make_bluegreen`: pair each view with the two backing services of
  * its type) and the promote-all / report-all loops. Those are what
  * this object re-expresses — as pure data plus an injected
  * `liveOf: view → itemId` resolver, so the swap DECISION (which
  * backing to publish to, which repoint to issue) is computed and
  * testable offline and the driver script keeps only the two HTTP
  * calls. Output plugs into [[Writers.LayerManifest.blueGreen]].
  */
object BlueGreen {

  /** One view's topology row (`BLUEGREEN_SERVICES` element). */
  final case class Service(view: String, blue: String, green: String)

  /** The computed swap: publish the new layer to `staging`, then
    * repoint `view` from `live` to `staging` (= promote_staging).
    */
  final case class Swap(view: String, live: String, staging: String)

  /** `make_bluegreen` (`_services.py:24-31`): pair each view with the
    * backing services sharing its type key, in declaration order
    * (blue first, green second — the reference relies on list order).
    * Views whose type has no exactly-two backing set are a config
    * error, not a silent skip.
    */
  def makeBlueGreen(
      views: Seq[(String, Int)],
      services: Seq[(String, Int)]): Seq[Service] =
    views.map { case (view, typeKey) =>
      services.filter(_._2 == typeKey).map(_._1) match {
        case Seq(blue, green) => Service(view, blue, green)
        case other => throw new IllegalArgumentException(
          s"view $view (type $typeKey) needs exactly 2 backing services, " +
            s"found ${other.size}")
      }
    }

  /** The swap each service needs, given which backing each view is
    * live on right now (`liveOf` is the injected lookup — production
    * asks the catalog, tests pass a map). A view live on neither
    * declared backing is drift the swap must not paper over.
    */
  def planSwaps(services: Seq[Service], liveOf: String => String): Seq[Swap] =
    services.map { s =>
      liveOf(s.view) match {
        case s.blue  => Swap(s.view, live = s.blue, staging = s.green)
        case s.green => Swap(s.view, live = s.green, staging = s.blue)
        case other => throw new IllegalStateException(
          s"view ${s.view} is live on $other, which is neither its blue " +
            s"(${s.blue}) nor green (${s.green}) backing")
      }
    }

  /** `swap_all` (`swap_services.py:4-8`): promote staging everywhere.
    * `repoint(view, target)` is the one network call the driver owns;
    * returns the applied swaps for the run log.
    */
  def promoteAll(
      services: Seq[Service],
      liveOf: String => String,
      repoint: (String, String) => Unit): Seq[Swap] = {
    val swaps = planSwaps(services, liveOf)
    swaps.foreach(s => repoint(s.view, s.staging))
    swaps
  }

  /** `print_report` (`backing_service_report.py:4-10`): one line per
    * view — which backing is live, which is staged next.
    */
  def report(services: Seq[Service], liveOf: String => String): Seq[String] =
    planSwaps(services, liveOf).map(s =>
      s"view ${s.view}: live=${s.live} staging=${s.staging}")
}
