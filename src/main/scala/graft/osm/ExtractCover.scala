package graft.osm

import org.locationtech.jts.geom.Geometry

/** Extract auto-discovery: cover a query geometry with the smallest set of
  * downloadable extracts — Scala+JTS port of the reference's greedy IoU
  * cover (/root/reference/quackosm/osm_extracts/__init__.py:962-1193,
  * SURVEY §3.2). Driver-side only (extract indexes are tiny).
  */
object ExtractCover {

  /** §3.2 end-to-end: cover the query geometry with extracts, fetch each
    * (caller-supplied `fetch` — a local path lookup, an HTTP download via
    * [[GeoParquet.downloadPbf]], whatever the deployment offers; the
    * network layer stays out of the engine), then run the multi-file
    * conversion with the geometry filter applied and cross-extract
    * feature dedup (J3) built in. Returns the features plus the
    * conversion's cut handle (release after consuming).
    *
    * Mirrors `convert_geometry_to_parquet`
    * (/root/reference/quackosm/functions.py:1039 →
    * pbf_file_reader.py:635,446-534). */
  def convertGeometry(spark: org.apache.spark.sql.SparkSession,
      queryWkt: String, index: Seq[Extract], fetch: Extract => String,
      opts: OsmPipeline.Options = OsmPipeline.Options(),
      iouThreshold: Double = 0.01)
      : (org.apache.spark.sql.DataFrame, OsmPipeline.ConversionCuts) = {
    val query = new org.locationtech.jts.io.WKTReader().read(queryWkt)
    val chosen = cover(query, index, iouThreshold)
    val paths = chosen.map(fetch)
    OsmPipeline.featuresWithCuts(spark, paths,
      opts.copy(geometryWkt = Some(queryWkt)))
  }

  /** [[convertGeometry]] with the index loaded from a local file
    * (Geofabrik-style GeoJSON or cached index parquet — see
    * [[ExtractIndex.load]]), completing the reference's
    * geometry→extracts→features path minus only the network fetch. */
  def convertGeometryFromIndex(spark: org.apache.spark.sql.SparkSession,
      queryWkt: String, indexPath: String, fetch: Extract => String,
      opts: OsmPipeline.Options = OsmPipeline.Options(),
      iouThreshold: Double = 0.01)
      : (org.apache.spark.sql.DataFrame, OsmPipeline.ConversionCuts) =
    convertGeometry(spark, queryWkt, ExtractIndex.load(spark, indexPath),
      fetch, opts, iouThreshold)

  /** Convert one NAMED extract resolved against the index — the
    * reference's `convert_osm_extract_to_parquet` (functions.py; query
    * resolution in `osm_extracts/__init__.py:283-380` via
    * [[ExtractIndex.findByQuery]]). */
  def convertNamedExtract(spark: org.apache.spark.sql.SparkSession,
      query: String, index: Seq[Extract], fetch: Extract => String,
      opts: OsmPipeline.Options = OsmPipeline.Options(),
      selectFirstMatch: Boolean = true)
      : (org.apache.spark.sql.DataFrame, OsmPipeline.ConversionCuts) = {
    val extract = ExtractIndex.findByQuery(index, query, selectFirstMatch)
    OsmPipeline.featuresWithCuts(spark, Seq(fetch(extract)), opts)
  }

  /** One row of an extract index (extract.py:77 expected columns). */
  final case class Extract(id: String, name: String, fileName: String,
      parent: String, area: Double, url: String, geometry: Geometry)

  /** Greedy cover: repeatedly pick the extract with the highest IoU
    * against the still-uncovered part of the query geometry, tie-broken by
    * smaller area; discard weak matches below `iouThreshold` except the
    * first pick; stop when covered (within `coverageTolerance`). */
  def cover(query: Geometry, index: Seq[Extract],
      iouThreshold: Double = 0.01,
      coverageTolerance: Double = 1e-9): Seq[Extract] = {
    require(!query.isEmpty, "empty query geometry")
    // zero-area query (POINT / LINESTRING filters are legal in the
    // reference): the IoU loop below would terminate immediately with an
    // empty cover — greedily take the smallest intersecting extract until
    // the geometry is exhausted instead (one extract for a point, several
    // for a line crossing extract boundaries)
    if (query.getArea <= coverageTolerance) {
      var remaining = query
      val chosen = scala.collection.mutable.ArrayBuffer.empty[Extract]
      val available = scala.collection.mutable.ArrayBuffer(index: _*)
      while (!remaining.isEmpty) {
        val hits = available.filter(_.geometry.intersects(remaining))
        if (hits.isEmpty)
          throw new IllegalStateException(
            "geometry not coverable by available extracts")
        val best = hits.minBy(_.area)
        chosen += best
        available -= best
        remaining = remaining.difference(best.geometry)
      }
      return chosen.toSeq
    }
    var remaining = query
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Extract]
    val available = scala.collection.mutable.ArrayBuffer(index: _*)
    while (remaining.getArea > coverageTolerance && available.nonEmpty) {
      val scored = available.flatMap { e =>
        if (!e.geometry.intersects(remaining)) None
        else {
          val inter = e.geometry.intersection(remaining).getArea
          val union = e.geometry.union(remaining).getArea
          val iou = if (union > 0) inter / union else 0.0
          if (inter <= 0) None else Some((e, iou, inter))
        }
      }
      if (scored.isEmpty) {
        throw new IllegalStateException(
          s"geometry not coverable: ${remaining.getArea} area uncovered " +
            "(reference: GeometryNotCoveredError)")
      }
      // highest IoU first; smaller area breaks ties (:962-1037)
      val best = scored.maxBy { case (e, iou, _) => (iou, -e.area) }._1
      // weak-match cutoff applies after the first pick (:944-959)
      if (chosen.nonEmpty) {
        val iou = best.geometry.intersection(remaining).getArea /
          best.geometry.union(remaining).getArea
        if (iou < iouThreshold) {
          // still take it if it contributes real coverage, else stop
          if (best.geometry.intersection(remaining).getArea <= coverageTolerance)
            return simplify(query, chosen.toSeq)
        }
      }
      chosen += best
      available -= best
      remaining = remaining.difference(best.geometry)
    }
    if (remaining.getArea > coverageTolerance)
      throw new IllegalStateException(
        "geometry not coverable by available extracts")
    simplify(query, chosen.toSeq)
  }

  /** Remove redundant extracts: drop any whose removal still leaves the
    * query covered (:1040-1193). */
  private def simplify(query: Geometry, chosen: Seq[Extract]): Seq[Extract] = {
    val keep = scala.collection.mutable.ArrayBuffer(chosen: _*)
    var i = 0
    while (i < keep.length) {
      val without = keep.zipWithIndex.filter(_._2 != i).map(_._1)
      if (without.nonEmpty) {
        val covered = without.map(_.geometry).reduce(_.union(_))
        if (query.difference(covered).getArea <= 1e-9) {
          keep.remove(i)
        } else i += 1
      } else i += 1
    }
    keep.toSeq
  }
}
