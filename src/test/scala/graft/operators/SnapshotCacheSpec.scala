package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The serving-layer cache contract: a corpus addressed by a Hadoop
  * FileSystem URI (the cluster deployment shape — `file:` here, standing
  * in for `hdfs://`/`s3a://`, which resolve through the exact same
  * `Path.getFileSystem` call) must REBUILD its index when the corpus
  * changes instead of silently serving the stale one, and builds must
  * run outside the cache's internal locks (reentrancy-safe). */
class SnapshotCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeCorpus(dir: String, rows: Seq[Long]): Unit = {
    import spark.implicits._
    rows.toDF("v").coalesce(1).write.mode("overwrite").parquet(dir)
  }

  test("a changed Hadoop-URI corpus invalidates the cached index") {
    val corpusDir = java.nio.file.Files
      .createTempDirectory("snapcorpus").toString
    // the URI form java.io.File cannot stat — the r8 implementation
    // fingerprinted this as the constant "missing" and never rebuilt
    val corpusUri = s"file:$corpusDir/c.parquet"
    writeCorpus(s"$corpusDir/c.parquet", 0L until 100L)

    var builds = 0
    def serve(): Long = {
      val p = SnapshotCache.resolve(spark, "spectest", corpusUri) { out =>
        builds += 1
        spark.read.parquet(corpusUri).write.parquet(out)
      }
      spark.read.parquet(p).count()
    }
    assert(serve() == 100L && builds == 1)
    assert(serve() == 100L && builds == 1,
      "unchanged corpus must hit the cache")

    writeCorpus(s"$corpusDir/c.parquet", 0L until 150L)
    assert(serve() == 150L,
      "changed corpus must serve fresh results, not the stale index")
    assert(builds == 2, s"changed corpus must rebuild exactly once, got $builds")
  }

  test("memo revalidates a Hadoop-URI input and recomputes on change") {
    val corpusDir = java.nio.file.Files
      .createTempDirectory("snapmemo").toString
    val uri = s"file:$corpusDir/m.parquet"
    writeCorpus(s"$corpusDir/m.parquet", 0L until 10L)
    var computes = 0
    def value(): java.lang.Long = SnapshotCache.memo(spark, "memotest", uri) {
      computes += 1
      java.lang.Long.valueOf(spark.read.parquet(uri).count())
    }
    assert(value() == 10L && computes == 1)
    assert(value() == 10L && computes == 1)
    writeCorpus(s"$corpusDir/m.parquet", 0L until 25L)
    assert(value() == 25L && computes == 2)
  }

  test("a build may reenter the cache (no recursive-update crash)") {
    val corpusDir = java.nio.file.Files
      .createTempDirectory("snapreent").toString
    writeCorpus(s"$corpusDir/r.parquet", 0L until 5L)
    val uri = s"file:$corpusDir/r.parquet"
    // an index build that derives a memoized artifact from the same
    // corpus mid-build — under the previous compute()-held-lock design
    // this threw ConcurrentHashMap's IllegalStateException
    val p = SnapshotCache.resolve(spark, "reenttest", uri) { out =>
      val n = SnapshotCache.memo(spark, "reenttest-inner", uri) {
        java.lang.Long.valueOf(spark.read.parquet(uri).count())
      }
      assert(n == 5L)
      spark.read.parquet(uri).write.parquet(out)
    }
    assert(spark.read.parquet(p).count() == 5L)
  }

  test("a SAME-KEY reentrant build errors instead of self-deadlocking") {
    val corpusDir = java.nio.file.Files
      .createTempDirectory("snapself").toString
    writeCorpus(s"$corpusDir/s.parquet", 0L until 4L)
    val uri = s"file:$corpusDir/s.parquet"
    // a build whose body resolves its OWN key would join its own
    // incomplete future — without the guard that is a silent permanent
    // hang, not an exception anything could catch
    val e = intercept[IllegalStateException] {
      SnapshotCache.resolve(spark, "selftest", uri) { out =>
        SnapshotCache.resolve(spark, "selftest", uri) { out2 =>
          spark.read.parquet(uri).write.parquet(out2)
        }
        spark.read.parquet(uri).write.parquet(out)
      }
    }
    assert(e.getMessage.contains("reentrant"))
    // the failed outer build must not poison the key: a fresh resolve works
    val p = SnapshotCache.resolve(spark, "selftest", uri) { out =>
      spark.read.parquet(uri).write.parquet(out)
    }
    assert(spark.read.parquet(p).count() == 4L)
  }

  test("a failed REBUILD leaves the superseded index directory deleted " +
      "only after its replacement exists (never before the new build)") {
    val corpusDir = java.nio.file.Files
      .createTempDirectory("snapswap").toString
    writeCorpus(s"$corpusDir/w.parquet", 0L until 6L)
    val uri = s"file:$corpusDir/w.parquet"
    var firstPath: String = null
    firstPath = SnapshotCache.resolve(spark, "swaptest", uri) { out =>
      spark.read.parquet(uri).write.parquet(out)
    }
    writeCorpus(s"$corpusDir/w.parquet", 0L until 9L)
    // rebuild that FAILS: the old index files must still be on disk at
    // the moment the build body runs (delete is deferred past success)
    intercept[RuntimeException] {
      SnapshotCache.resolve(spark, "swaptest", uri) { _ =>
        assert(new java.io.File(new java.net.URI("file://" + firstPath))
          .exists() || new java.io.File(firstPath).exists(),
          "superseded index must survive until the replacement build succeeds")
        sys.error("rebuild boom")
      }
    }
    // successful rebuild: serves fresh data and cleans the old root up
    val p2 = SnapshotCache.resolve(spark, "swaptest", uri) { out =>
      spark.read.parquet(uri).write.parquet(out)
    }
    assert(spark.read.parquet(p2).count() == 9L)
  }

  test("a failed build is not cached; the next call retries") {
    val corpusDir = java.nio.file.Files
      .createTempDirectory("snapfail").toString
    writeCorpus(s"$corpusDir/f.parquet", 0L until 3L)
    val uri = s"file:$corpusDir/f.parquet"
    var attempts = 0
    def tryServe(fail: Boolean): String =
      SnapshotCache.resolve(spark, "failtest", uri) { out =>
        attempts += 1
        if (fail) sys.error("boom")
        spark.read.parquet(uri).write.parquet(out)
      }
    intercept[RuntimeException] { tryServe(fail = true) }
    val p = tryServe(fail = false)
    assert(attempts == 2 && spark.read.parquet(p).count() == 3L)
  }

  test("concurrent resolves of one key build once; of two keys, in parallel") {
    val corpusDir = java.nio.file.Files
      .createTempDirectory("snapconc").toString
    writeCorpus(s"$corpusDir/k.parquet", 0L until 7L)
    val uri = s"file:$corpusDir/k.parquet"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            SnapshotCache.resolve(spark, s"conctest${i % 2}", uri) { out =>
              builds.incrementAndGet()
              spark.read.parquet(uri).write.parquet(out)
            }
        })
      }
      val paths = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(builds.get() == 2,
        s"two purposes → exactly two builds, got ${builds.get()}")
      assert(paths.toSet.size == 2)
    } finally pool.shutdownNow()
  }
}
