package graft.osm

import org.apache.spark.sql.SparkSession

/** Deterministic result-path caching for conversions — the reference's
  * `_generate_result_file_path` + `ignore_cache` behavior
  * (pbf_file_reader.py:459-461,1294-1340): the output path encodes every
  * conversion parameter, so re-running the same conversion returns the
  * existing file instantly and any parameter change lands elsewhere. */
object ResultCache {

  private def sha8(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString

  /** Mirrors the reference's naming:
    * {stems}_{filterhash|nofilter}_{geomhash|noclip}_{exploded|compact}
    * {_idshash}{_sorted}{_wkt}.parquet */
  def resultFilePath(workDir: String, pbfPaths: Seq[String],
      opts: OsmPipeline.Options, explodeTags: Boolean = false,
      sortResult: Boolean = true, wktResult: Boolean = false): String = {
    val stems = pbfPaths.map(p =>
      new org.apache.hadoop.fs.Path(p).getName.stripSuffix(".osm.pbf"))
      .mkString("_")
    val filterPart =
      if (opts.tagsFilter.isEmpty && opts.groupedFilter.isEmpty &&
        opts.customSqlFilter.isEmpty) "nofilter"
      else {
        val canonical =
          opts.tagsFilter.map(_.toSeq.sortBy(_._1).toString).getOrElse("") +
            opts.groupedFilter.map(_.toSeq.sortBy(_._1).toString).getOrElse("") +
            opts.customSqlFilter.getOrElse("")
        sha8(canonical) + (if (opts.keepAllTags) "_alltags" else "")
      }
    val geomPart = opts.geometryWkt.map(sha8).getOrElse("noclip")
    val tagsPart = if (explodeTags) "exploded" else "compact"
    val idsPart =
      if (opts.osmIds.isEmpty) ""
      else "_" + sha8(opts.osmIds.sorted.distinct.mkString(","))
    val sortPart = if (sortResult) "_sorted" else ""
    val wktPart = if (wktResult) "_wkt" else ""
    s"$workDir/${stems}_${filterPart}_${geomPart}_$tagsPart$idsPart$sortPart$wktPart.parquet"
  }

  /** Convert with caching: if the deterministic result path already holds
    * a finished conversion and `ignoreCache` is false, return it without
    * touching Spark. Returns the result path. */
  def convert(spark: SparkSession, pbfPaths: Seq[String],
      opts: OsmPipeline.Options = OsmPipeline.Options(),
      workDir: String = "files", explodeTags: Boolean = false,
      sortResult: Boolean = true, wktResult: Boolean = false,
      ignoreCache: Boolean = false, sortAlgorithm: String = "str"): String = {
    val out = resultFilePath(workDir, pbfPaths, opts, explodeTags,
      sortResult, wktResult)
    // marker through the Hadoop FileSystem, mirroring how GeoParquet.write
    // resolves paths — caching works for hdfs://, s3a://, … workDirs too
    val marker = new org.apache.hadoop.fs.Path(out, "_SUCCESS_GRAFT")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    // reference parity: the path encodes WHETHER the result is sorted, not
    // the algorithm — a warm cache serves whichever algorithm wrote it,
    // exactly like the reference (pbf_file_reader.py:1294-1340)
    if (!ignoreCache && fs.exists(marker)) return out
    var (features, cuts) = OsmPipeline.featuresWithCuts(spark, pbfPaths, opts)
    try {
      if (explodeTags)
        features = OsmPipeline.dropEmptyColumns(OsmPipeline.explodeTags(features))
      if (wktResult) GeoParquet.writeWkt(features, out)
      else GeoParquet.write(features, out, sortSpatially = sortResult,
        sortAlgorithm = sortAlgorithm)
    } finally cuts.release()
    fs.create(marker, true).close()
    out
  }
}
