package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared mechanics of GENERATIONAL on-disk indexes — used by both the
  * lexical postings index ([[RetrievalOps]]) and the IVF-PQ vector
  * index ([[IvfPq]]):
  *
  *  - a `CURRENT` pointer file at the index path names the served
  *    generation (`generations/g<k>`); its absence means the plain
  *    single-generation layout at the path itself — so indexes built
  *    before their first in-place compaction need no migration;
  *  - the pointer flips ATOMICALLY (write `CURRENT.tmp`, then
  *    `FileContext.rename(OVERWRITE)` — atomic where the filesystem
  *    supports one: HDFS, local), so a reader sees the old target or
  *    the new, never a torn file;
  *  - a `folded_max` high-water mark inside each generation records the
  *    highest batchId any compaction ever folded into it, keeping
  *    at-least-once append replays idempotent ACROSS compactions (the
  *    replayed batch's own appends directory no longer exists to
  *    overwrite — without the mark it would re-append its rows);
  *  - generations OLDER than the one just superseded retire at flip
  *    time: one superseded generation of grace lets in-flight readers
  *    that resolved it finish against intact files.
  *
  * Single-writer contract throughout: appends and compactions must be
  * sequenced by one writer (a foreachBatch loop); readers need no
  * coordination — they resolve the pointer per query. */
private[operators] object IndexLayout {

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def readSmall(spark: SparkSession,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fsOf(spark, p).open(p)
    try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
    finally in.close()
  }

  /** The generation `path` currently serves (see object doc). */
  def activeRoot(spark: SparkSession, path: String): String = {
    val cur = new org.apache.hadoop.fs.Path(s"$path/CURRENT")
    if (!fsOf(spark, cur).exists(cur)) path
    else s"$path/${readSmall(spark, cur)}"
  }

  /** The active generation's NUMBER (0 = the un-compacted base). */
  def currentGen(path: String, root: String): Long =
    if (root == path) 0L
    else root.substring(root.lastIndexOf("/g") + 2).toLong

  /** Highest batchId ever folded into `root` (−1 when none). */
  def foldedMax(spark: SparkSession, root: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$root/folded_max")
    if (!fsOf(spark, p).exists(p)) -1L
    else readSmall(spark, p).toLong
  }

  /** The folded mark `dest` must carry: every numeric batch generation
    * being folded, plus whatever a previous compaction already folded
    * into `root`'s base. `genNames` are append directory names
    * (`batch=<id>`); non-numeric (UUID) generations never replay and
    * carry no mark. */
  def foldedMarkFor(spark: SparkSession, root: String,
      genNames: Seq[String]): Long =
    (foldedMax(spark, root) +: genNames
      .map(_.stripPrefix("batch="))
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .map(_.toLong)).max

  /** Write `dest/folded_max` (no-op for −1: nothing ever folded). */
  def writeFoldedMax(spark: SparkSession, dest: String, v: Long): Unit =
    if (v >= 0L) {
      val p = new org.apache.hadoop.fs.Path(s"$dest/folded_max")
      val out = fsOf(spark, p).create(p, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    }

  /** Atomically point `path/CURRENT` at `rel` (see object doc). */
  def flipCurrent(spark: SparkSession, path: String, rel: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val cur = new org.apache.hadoop.fs.Path(s"$path/CURRENT")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/CURRENT.tmp")
    val out = cur.getFileSystem(conf).create(tmp, true)
    try out.write(rel.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(cur.toUri, conf)
      .rename(tmp, cur, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Retire everything OLDER than the generation just superseded:
    * `generations/g<j>` for j < curGen, and — once any generation
    * supersedes the base — the base layout's own data directories
    * (`baseDirs`, index-kind specific). */
  def retireOlder(spark: SparkSession, path: String, curGen: Long,
      baseDirs: Seq[String]): Unit = {
    val gens = new org.apache.hadoop.fs.Path(s"$path/generations")
    val fs = fsOf(spark, gens)
    fs.listStatus(gens).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("g") && nm.drop(1).forall(_.isDigit) &&
        nm.drop(1).toLong < curGen)
        fs.delete(st.getPath, true): Unit
    }
    if (curGen >= 1L) baseDirs.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$d"), true): Unit
    }
  }
}
