package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The generational layout's writer lease ([[IndexLayout
  * .withWriterLease]]) and exclusive lineage binding
  * ([[IndexLayout.writeAtomicExclusive]]): the single-writer contract
  * is ENFORCED — a second interleaved writer fails loudly naming the
  * holder — while the sequential mutations the streaming loops issue
  * are unaffected. */
class IndexLayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def corpus = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "apple banana banana banana"),
    (3L, "cherry cherry cherry cherry")
  ).toDF("doc_id", "text")

  test("two interleaved writers: the second throws NAMING the holder, " +
      "and the loser's mutation leaves no trace") {
    val path = tmp("lease") + "/idx"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 4)
    val delta = Seq((10L, "fig grape")).toDF("doc_id", "text")
    IndexLayout.withWriterLease(spark, path, "writer-one") {
      // writer two arrives mid-mutation: a manual appendToPostings
      // racing the lease holder must fail loudly, not interleave
      val e = intercept[IllegalStateException] {
        RetrievalOps.appendToPostings(delta, "doc_id", "text", path)
      }
      assert(e.getMessage.contains("writer-one"), e.getMessage)
      assert(e.getMessage.contains("another writer holds the lease"),
        e.getMessage)
      // so does a concurrent compaction
      val e2 = intercept[IllegalStateException] {
        RetrievalOps.compactInPlace(spark, path)
      }
      assert(e2.getMessage.contains("writer-one"), e2.getMessage)
    }
    // the loser wrote nothing: probing still serves the 3-doc base
    val (n, _, _) = RetrievalOps.frozenStats(spark, path, Seq("apple"))
    assert(n == 3L, s"corpus size $n")
  }

  test("the lease releases on success AND on failure, so the " +
      "sequential mutations of one loop are unaffected") {
    val path = tmp("leaseseq") + "/idx"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 4)
    val wp = new org.apache.hadoop.fs.Path(s"$path/WRITER")
    val fs = wp.getFileSystem(spark.sessionState.newHadoopConf())
    // the exact call sequence indexArrivals issues per micro-batch:
    // append, then maybeCompact — each under its own lease, back to back
    RetrievalOps.appendToPostings(Seq((10L, "fig grape"))
      .toDF("doc_id", "text"), "doc_id", "text", path, batchId = Some(0L))
    assert(!fs.exists(wp), "lease must release after a successful append")
    assert(RetrievalOps.maybeCompact(spark, path, maxGenerations = 1))
    assert(!fs.exists(wp), "lease must release after a compaction")
    val (n, _, _) = RetrievalOps.frozenStats(spark, path, Seq("apple"))
    assert(n == 4L, s"corpus size $n")
    // a failing body releases too (the geometry check throws mid-write)
    intercept[Exception] {
      IndexLayout.withWriterLease(spark, path, "boom") {
        throw new RuntimeException("boom")
      }
    }
    assert(!fs.exists(wp), "lease must release when the body throws")
  }

  test("a CRASHED writer's expired lease is broken and taken over; a " +
      "live one's is not") {
    val path = tmp("leasettl") + "/idx"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 4)
    val wp = new org.apache.hadoop.fs.Path(s"$path/WRITER")
    val fs = wp.getFileSystem(spark.sessionState.newHadoopConf())
    // a crashed writer: lease file standing, mtime past the TTL (a
    // live writer heartbeats every ttl/3, so a stale mtime means death)
    val out = fs.create(wp, true)
    out.write("dead-writer appendToPostings".getBytes("UTF-8"))
    out.close()
    val ttl = spark.conf.get("graft.index.writerLeaseTtlMs", "600000")
      .toLong
    fs.setTimes(wp, System.currentTimeMillis() - ttl - 1000L, -1)
    // the next mutation breaks the expired lease and proceeds
    RetrievalOps.appendToPostings(Seq((10L, "fig grape"))
      .toDF("doc_id", "text"), "doc_id", "text", path, batchId = Some(0L))
    assert(!fs.exists(wp))
    val (n, _, _) = RetrievalOps.frozenStats(spark, path, Seq("apple"))
    assert(n == 4L)
    // whereas a FRESH foreign lease (live writer) still blocks
    val out2 = fs.create(wp, true)
    out2.write("live-writer compactInPlace".getBytes("UTF-8"))
    out2.close()
    val e = intercept[IllegalStateException] {
      RetrievalOps.appendToPostings(Seq((11L, "kiwi"))
        .toDF("doc_id", "text"), "doc_id", "text", path,
        batchId = Some(1L))
    }
    assert(e.getMessage.contains("live-writer"), e.getMessage)
    fs.delete(wp, false)
  }

  test("builds/rebuilds are lease-guarded too, and a rebuild's retract " +
      "does not drop its own held lease") {
    val path = tmp("leasebuild") + "/idx"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 4)
    val wp = new org.apache.hadoop.fs.Path(s"$path/WRITER")
    val fs = wp.getFileSystem(spark.sessionState.newHadoopConf())
    // the build completed and released: no lease file left behind
    // (retract must not have needed to sweep it — TTL covers stale)
    assert(!fs.exists(wp))
    // an in-place REBUILD racing a held lease fails loudly like any
    // other mutation — a rebuild deletes the served layout, the worst
    // possible interleave with a live appender
    IndexLayout.withWriterLease(spark, path, "stream-loop") {
      val e = intercept[IllegalStateException] {
        RetrievalOps.indexCorpus(corpus, "doc_id", "text", path,
          nBuckets = 4)
      }
      assert(e.getMessage.contains("stream-loop"), e.getMessage)
      // the lease file survived the failed rebuild attempt: still ours
      assert(fs.exists(wp))
    }
    // and a SUCCESSFUL rebuild over a retracted layout releases cleanly
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 4)
    assert(!fs.exists(wp))
    val (n, _, _) = RetrievalOps.frozenStats(spark, path, Seq("apple"))
    assert(n == 3L)
  }

  test("N breakers race ONE expired lease: exactly one acquires, every " +
      "other throws naming the holder") {
    val path = tmp("leaserace") + "/idx"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(path))
    // a crashed writer's lease: standing file, mtime past the TTL
    val wp = new org.apache.hadoop.fs.Path(s"$path/WRITER")
    val out = fs.create(wp, true)
    out.write("dead-writer appendToPostings".getBytes("UTF-8"))
    out.close()
    val ttl = spark.conf.get("graft.index.writerLeaseTtlMs", "600000")
      .toLong
    fs.setTimes(wp, System.currentTimeMillis() - ttl - 1000L, -1)
    val n = 8
    val start = new java.util.concurrent.CountDownLatch(1)
    val losersDone = new java.util.concurrent.CountDownLatch(n - 1)
    val acquiredBy = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to n).map { i =>
      val t = new Thread(() => {
        start.await()
        try IndexLayout.withWriterLease(spark, path, s"racer-$i") {
          acquiredBy.add(s"racer-$i")
          // hold the lease until every loser has attempted and thrown,
          // so no second racer can acquire AFTER a legitimate release
          losersDone.await(20, java.util.concurrent.TimeUnit.SECONDS): Unit
        } catch {
          case e: IllegalStateException =>
            errors.add(e.getMessage)
            losersDone.countDown()
        }
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(30000))
    assert(acquiredBy.size == 1,
      s"exactly one racer must acquire the broken lease, got $acquiredBy")
    assert(errors.size == n - 1, s"losers: ${errors.size}")
    errors.forEach { m =>
      assert(m.contains("another writer holds the lease"), m)
      assert(m.contains("racer-"), m) // names the live winner, not the corpse
    }
    // the winner released cleanly; no aside litter left behind
    assert(!fs.exists(wp))
    val litter = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("WRITER"))
    assert(litter.isEmpty, litter.mkString(","))
  }

  test("heartbeat verifies its token: a usurped lease is NOT refreshed, " +
      "survives for the usurper, and the loss surfaces loudly") {
    val path = tmp("leasebeat") + "/idx"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(path))
    val wp = new org.apache.hadoop.fs.Path(s"$path/WRITER")
    val prevTtl = spark.conf.getOption("graft.index.writerLeaseTtlMs")
    spark.conf.set("graft.index.writerLeaseTtlMs", "300") // beat every 100 ms
    try {
      val e = intercept[IllegalStateException] {
        IndexLayout.withWriterLease(spark, path, "victim") {
          // simulate a takeover mid-body: the file stops carrying our
          // token (what a TTL expiry + another writer's break produces)
          val out = fs.create(wp, true)
          out.write("usurper compactInPlace".getBytes("UTF-8"))
          out.close()
          Thread.sleep(500) // > one heartbeat period
        }
      }
      assert(e.getMessage.contains("LOST mid-mutation"), e.getMessage)
      assert(e.getMessage.contains("victim"), e.getMessage)
      // the usurper's lease file is untouched: neither refreshed-over
      // nor deleted by the victim's release (it is not the victim's)
      val in = fs.open(wp)
      val got = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .trim finally in.close()
      assert(got == "usurper compactInPlace", got)
      fs.delete(wp, false)
      // and WITHOUT a takeover, the same short-TTL body heartbeats
      // through several periods and completes silently
      val r = IndexLayout.withWriterLease(spark, path, "steady") {
        Thread.sleep(500); 42
      }
      assert(r == 42)
      assert(!fs.exists(wp))
    } finally {
      prevTtl match {
        case Some(v) => spark.conf.set("graft.index.writerLeaseTtlMs", v)
        case None => spark.conf.unset("graft.index.writerLeaseTtlMs")
      }
    }
  }

  test("crash storm: N breakers dying mid-break strand at most N asides, " +
      "and the next successful mutation sweeps every EXPIRED one on a " +
      "path that never retracts") {
    val path = tmp("leasestorm") + "/idx"
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(root)
    val ttl = IndexLayout.writerLeaseTtlMs(spark)
    def writeFile(p: org.apache.hadoop.fs.Path, content: String,
        ageMs: Long): Unit = {
      val out = fs.create(p, true)
      out.write(content.getBytes("UTF-8")); out.close()
      fs.setTimes(p, System.currentTimeMillis() - ageMs, -1)
    }
    // a storm of 5 breakers each crashed between the claim-rename and
    // the aside delete: the rename grants the source to exactly ONE
    // breaker per expired lease, so each crash strands at most ONE
    // WRITER.broken.<uuid> — simulate the artifacts each leaves behind
    // (mtime = the yanked lease's, past the TTL; rename preserves it)
    (1 to 5).foreach { i =>
      writeFile(new org.apache.hadoop.fs.Path(
        s"$path/WRITER.broken.crash-$i"), s"dead-writer-$i append",
        ttl + 60000L)
    }
    // plus one YOUNG aside — a freshly-yanked lease a stood-down
    // breaker may still restore; the sweep must respect it
    writeFile(new org.apache.hadoop.fs.Path(
      s"$path/WRITER.broken.young"), "possibly-live append", 1000L)
    def asides: Seq[String] = fs.listStatus(root)
      .map(_.getPath.getName).toSeq.filter(_.startsWith("WRITER.broken."))
    assert(asides.size == 6)
    // an ordinary append-style mutation (NO retract in this lifecycle):
    // acquire succeeds despite the litter, and while holding the lease
    // the expired asides are swept; the young one survives
    IndexLayout.withWriterLease(spark, path, "storm-append") { () }
    assert(asides == Seq("WRITER.broken.young"),
      s"expired asides must be swept, young respected: $asides")
    // once the young aside EXPIRES, the next mutation clears it too —
    // zero garbage after the next lifecycle, the bounded-litter claim
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$path/WRITER.broken.young"),
      System.currentTimeMillis() - ttl - 60000L, -1)
    IndexLayout.withWriterLease(spark, path, "storm-append-2") { () }
    assert(asides.isEmpty, s"litter after second lifecycle: $asides")
    // and the lease file itself released cleanly both times
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/WRITER")))
  }

  test("writeAtomicExclusive: exactly one of two binders wins, the " +
      "loser sees the winner's value intact") {
    val dir = tmp("excl")
    val p = new org.apache.hadoop.fs.Path(s"$dir/stream_id")
    assert(IndexLayout.writeAtomicExclusive(spark, p, "lineage-A"))
    assert(!IndexLayout.writeAtomicExclusive(spark, p, "lineage-B"))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val got = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      .trim finally in.close()
    assert(got == "lineage-A")
    // no staging litter left behind by the loser
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSeq == Seq("stream_id"))
  }
}
