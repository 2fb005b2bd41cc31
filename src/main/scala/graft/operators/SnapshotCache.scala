package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared (session, corpus-snapshot) → persisted-index cache backing the
  * build-once / probe-many serving gates (x15 IVF-PQ, x21/x27 BM25
  * postings, x23 positional postings).
  *
  * One copy of the snapshot-key logic instead of three divergent ones:
  *  - the session key is a per-session random UUID held in a weak map
  *    (`System.identityHashCode` — the previous key — can collide after
  *    GC reuses an address);
  *  - the corpus snapshot is the input's file listing (name/len/mtime),
  *    so a changed corpus REBUILDS instead of serving a stale index;
  *  - a rebuild DELETES the replaced index's temp directory — a
  *    long-lived process re-indexing over a changing corpus holds at
  *    most one live index per (session, purpose), not one per snapshot
  *    ever seen.
  */
private[graft] object SnapshotCache {

  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private def sessionId(s: SparkSession): String = {
    val got = sessionIds.get(s)
    if (got != null) got
    else {
      val fresh = java.util.UUID.randomUUID().toString
      val prior = sessionIds.putIfAbsent(s, fresh)
      if (prior != null) prior else fresh
    }
  }

  private final case class Entry(snapshot: String, tmpRoot: String,
      path: String)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** The file-listing fingerprint of a parquet path (file or directory). */
  def snapshotOf(inputPath: String): String = {
    val f = new java.io.File(inputPath)
    if (!f.exists()) "missing"
    else if (f.isFile) s"${f.getName}:${f.length}:${f.lastModified}"
    else f.listFiles().sortBy(_.getName)
      .map(x => s"${x.getName}:${x.length}:${x.lastModified}").mkString("|")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }

  private val memos =
    new java.util.concurrent.ConcurrentHashMap[String, (String, AnyRef)]()

  /** Snapshot-validated DRIVER-VALUE memo — the in-memory sibling of
    * [[resolve]] for parameter-sized artifacts (a vocabulary, a stats
    * row) that several gates derive from the same corpus: computed once
    * per (session, purpose, inputPath) while the file listing is
    * unchanged, recomputed when it moves. Values must be bounded (they
    * live on the driver for the session). */
  def memo[T <: AnyRef](s: SparkSession, purpose: String,
      inputPath: String)(compute: => T): T = {
    val key = s"${sessionId(s)}#$purpose#$inputPath"
    val snap = snapshotOf(inputPath)
    memos.compute(key, (_, old) => {
      if (old != null && old._1 == snap) old else (snap, compute)
    })._2.asInstanceOf[T]
  }

  /** The persisted-index path for (session, purpose, inputPath) over
    * the corpus at `inputPath`: cached while the corpus snapshot is
    * current; on a changed snapshot the stale index directory is
    * deleted and `build` re-runs into a fresh temp path. `build`
    * receives the output path and must write the complete index there.
    *
    * The key includes `inputPath`, so two corpora served alternately in
    * one session each keep their own live index (keying on purpose
    * alone would rebuild — and delete the other's files — per call);
    * deletion happens only when THE SAME corpus path's listing changed,
    * where any still-lazy frame over the old index was already stale.
    * Temp roots are always driver-local (createTempDirectory), so the
    * java.io recursive delete is the right tool here. */
  def resolve(s: SparkSession, purpose: String, inputPath: String)(
      build: String => Unit): String = {
    val key = s"${sessionId(s)}#$purpose#$inputPath"
    val snap = snapshotOf(inputPath)
    entries.compute(key, (_, old) => {
      if (old != null && old.snapshot == snap) old
      else {
        if (old != null) deleteRecursively(new java.io.File(old.tmpRoot))
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_$purpose").toString
        val out = s"$root/idx"
        // a failed build must not orphan its half-written directory (the
        // entry is not recorded, so nothing would ever delete it)
        try build(out)
        catch { case t: Throwable =>
          deleteRecursively(new java.io.File(root)); throw t
        }
        Entry(snap, root, out)
      }
    }).path
  }
}
