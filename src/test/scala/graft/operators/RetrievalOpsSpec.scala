package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The retrieval/mining surface ([[RetrievalOps]]): BM25 semantics on a
  * planted corpus, RRF fusion arithmetic, label exclusion in hard-negative
  * mining, MMR's diversity behavior vs plain top-k, and the BPE pair
  * statistic — plus plan-shape assertions for the scale contracts the
  * Scaladoc claims (filter-before-shuffle, WindowGroupLimit, broadcast). */
class RetrievalOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "apple banana apple cherry"),            // tf(apple)=2, dl=4
    (2L, "apple banana banana banana"),           // tf(apple)=1, dl=4
    (3L, "cherry cherry cherry cherry"),          // no apple
    (4L, "apple"),                                // tf=1 but dl=1 (short doc boost)
    (5L, "durian elderberry fig grape honeydew")  // no match at all
  ).toDF("doc_id", "text")

  test("bm25Scores: only matching docs scored; tf and length norm rank as BM25 says") {
    val got = RetrievalOps.bm25Scores(corpus, "doc_id", "text", Seq("apple"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L, 4L))         // 3 and 5 match nothing
    // same dl: higher tf wins; shorter doc beats same-tf longer doc
    assert(got(1L) > got(2L) && got(4L) > got(2L))
    assert(got.values.forall(_ > 0.0))
  }

  test("duplicate query terms never double-count, in any scorer") {
    graft.functions.TextExprs.register(spark)
    val dup = Seq("apple", "apple", "cherry")
    val distinctT = Seq("apple", "cherry")
    val a = RetrievalOps.bm25Scores(corpus, "doc_id", "text", dup)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = RetrievalOps.bm25Scores(corpus, "doc_id", "text", distinctT)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b)
    val path = java.nio.file.Files.createTempDirectory("dupidx").toString + "/idx"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 4)
    val (n, sumDl, dfs) = RetrievalOps.frozenStats(spark, path, distinctT)
    val colDup = corpus.select(col("doc_id"),
        RetrievalOps.bm25ScoreColumn(col("text"), dup, n, sumDl, dfs).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val colDis = corpus.select(col("doc_id"),
        RetrievalOps.bm25ScoreColumn(col("text"), distinctT, n, sumDl, dfs).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(colDup == colDis)
    val iDup = RetrievalOps.bm25TopKIndexed(spark, path, dup)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val iDis = RetrievalOps.bm25TopKIndexed(spark, path, distinctT)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(iDup == iDis)
  }

  test("bm25ScoreColumn: term_tfs kernel path — codegen == interpreted, " +
      "equals the aggregation scorer") {
    graft.functions.TextExprs.register(spark)
    val terms = Seq("apple", "cherry", "zzz_absent")
    val path = java.nio.file.Files.createTempDirectory("cgidx").toString + "/idx"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 4)
    val (n, sumDl, dfs) = RetrievalOps.frozenStats(spark, path, terms)
    def got() = corpus.select(col("doc_id"),
        RetrievalOps.bm25ScoreColumn(col("text"), terms, n, sumDl, dfs).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val s = spark
    try {
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = got()
      s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      assert(got() == interp)
      // a non-matching doc scores 0.0 (doc 5); matching docs carry the
      // exact scores the distributed aggregation scorer computes
      assert(interp(5L) == 0.0)
      val agg = RetrievalOps.bm25Scores(corpus, "doc_id", "text", terms)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(interp.filter(_._2 > 0.0) == agg && agg.nonEmpty)
    } finally s.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("bm25TopK: k bounds the result and ranking is (score desc, id asc)") {
    val rows = RetrievalOps.bm25TopK(corpus, "doc_id", "text",
      Seq("apple", "cherry"), k = 2).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("bm25 plan: one tokenize pass, one shared compact exchange, " +
      "no token explode") {
    // parquet-backed, not a LocalRelation: ConvertToLocalRelation would
    // fold the scoring projection away and leave nothing to assert on
    val dir = java.nio.file.Files.createTempDirectory("bm25plan").toString
    corpus.write.mode("overwrite").parquet(dir)
    // AQE off for the assertion: the static planner's ReuseExchange is
    // what the isFinalPlan=false string can show (under AQE the same
    // reuse happens at stage materialization and is invisible here)
    val plan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      RetrievalOps.bm25Scores(spark.read.parquet(dir),
          "doc_id", "text", Seq("apple"))
        .queryExecution.executedPlan.toString
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    // per-term tf counts inside the token array: no Generate (explode)
    // materializing tokens as rows
    assert(!plan.contains("Generate"), plan)
    // ONE scan of the corpus feeding ONE compact (id, dl, tf…) exchange
    // the stats aggregation reads back as a ReusedExchange — the text is
    // tokenized once per query, and the only other exchange is the 1-row
    // stats aggregation feeding the broadcast
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("ReusedExchange"), plan)
    // count Exchange OPERATOR lines (a ReusedExchange line embeds the
    // text "Exchange hashpartitioning…" as its reference — not a node)
    val shuffles = plan.linesIterator.count(l =>
      l.replaceAll("^[\\s:+-]*", "").startsWith("Exchange "))
    assert(shuffles <= 2,
      s"expected the compact corpus exchange + the 1-row stats exchange:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    // tf comes from the one-pass term_tfs kernel, not a per-token
    // higher-order lambda — and it must be a materialized column, never
    // inlined at each of the exact kernel's ~dozen references, and never
    // duplicated below the exchange by a pushed-down row-set filter (the
    // groupBy(id) barrier holds the filter above the shared exchange)
    assert(!plan.contains("lambdafunction"), plan)
    assert("term_tfs".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("apple"), "term literal should appear in the plan")
  }

  test("rrfFuse: docs in both systems outrank single-system docs; exact arithmetic") {
    val a = Seq((10L, 1L), (11L, 2L)).toDF("id", "rank")
    val b = Seq((10L, 2L), (12L, 1L)).toDF("id", "rank")
    val got = RetrievalOps.rrfFuse(a, b, "id", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp10 = BigDecimal(1.0 / 61.0 + 1.0 / 62.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) == exp10)
    assert(got(10L) > got(12L) && got(10L) > got(11L))
    assert(got.keySet == Set(10L, 11L, 12L))
  }

  private lazy val vecs = Seq(
    // 2-d toy vectors: label 0 near +x, label 1 near +y
    (0L, Array(1.0, 0.0), 0), (1L, Array(0.9, 0.1), 0),
    (2L, Array(0.0, 1.0), 1), (3L, Array(0.1, 0.9), 1),
    (4L, Array(0.7, 0.7), 1), (5L, Array(-1.0, 0.0), 0)
  ).toDF("vec_id", "v", "label")

  test("hardNegatives: same-label rows never appear; ranking by cosine desc") {
    val got = RetrievalOps.hardNegatives(vecs, "vec_id", "v", "label",
      anchorIds = Seq(0L), k = 3).collect()
    val negs = got.map(_.getLong(2)).toSet
    assert(negs.subsetOf(Set(2L, 3L, 4L)))        // only label-1 rows
    assert(got.head.getLong(2) == 4L)             // closest different-label first
    val plan = RetrievalOps.hardNegatives(vecs, "vec_id", "v", "label",
      Seq(0L), 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "anchor batch should broadcast into a theta join")
    assert(plan.contains("WindowGroupLimit"),
      "per-anchor top-k should run as WindowGroupLimit, not a full sort")
  }

  test("mmrRerank: first pick is the cosine argmax; later picks trade off diversity") {
    val q = Seq(1.0, 0.0)
    val cands = vecs.filter(col("vec_id") =!= 0L)
    val mmr = RetrievalOps.mmrRerank(cands, "vec_id", "v", q, n = 5, k = 3)
      .collect().map(_.getLong(1)).toSeq
    val plain = EmbeddingOps.cosineTopK(cands, "vec_id", "v", q, k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(mmr.head == plain.head, "step 1 must equal the plain argmax")
    assert(mmr.distinct.size == 3)
    // plain top-3 keeps both near-+x vectors (1 then 4); MMR's second pick
    // must NOT be 4's near-duplicate direction — it diversifies toward +y
    assert(plain == Seq(1L, 4L, 5L) || plain.take(2) == Seq(1L, 4L))
    assert(mmr(1) != plain(1) || mmr(2) != plain(2),
      s"MMR should reorder for diversity, got $mmr vs plain $plain")
  }

  test("mmrRerank matches the x20 gate shape on the real table") {
    val out = RetrievalOps.x20MmrRerank(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    assert(rows.map(_.getLong(1)).distinct.length == 8)
  }

  test("postings index: probe ranks identically to the full scan; partitions prune") {
    val path = java.nio.file.Files.createTempDirectory("bmidx").toString + "/idx"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 16)
    val terms = Seq("apple", "cherry")
    val scan = RetrievalOps.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val probeDf = RetrievalOps.bm25TopKIndexed(spark, path, terms, k = 10)
    val probe = probeDf.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe == scan, s"indexed $probe vs scan $scan")
    val plan = probeDf.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("pt#") && !plan.contains("PartitionFilters: []"),
      "probe must prune postings partitions on the bucket column")
  }

  test("appendToPostings: grown index serves the full corpus bit-for-bit") {
    val path = java.nio.file.Files.createTempDirectory("bmapp").toString + "/idx"
    val base = corpus.filter(col("doc_id") <= 3)
    val delta = corpus.filter(col("doc_id") > 3)
    RetrievalOps.indexCorpus(base, "doc_id", "text", path, nBuckets = 8)
    RetrievalOps.appendToPostings(delta, "doc_id", "text", path,
      batchId = Some(7L))
    val terms = Seq("apple", "cherry", "durian")
    def probe(p: String) = RetrievalOps.bm25TopKIndexed(spark, p, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the grown index must score EXACTLY like a full rebuild: df, n and
    // avgdl all reflect the union
    val rebuilt = java.nio.file.Files.createTempDirectory("bmapp").toString + "/r"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", rebuilt, nBuckets = 8)
    assert(probe(path) == probe(rebuilt))
    // a replayed batch (same batchId) overwrites its own generation —
    // scores unchanged, no duplicate rows
    RetrievalOps.appendToPostings(delta, "doc_id", "text", path,
      batchId = Some(7L))
    assert(probe(path) == probe(rebuilt))
    // a SECOND distinct batch of new docs folds in too
    val more = Seq((6L, "apple fig"), (7L, "grape grape cherry"))
      .toDF("doc_id", "text")
    RetrievalOps.appendToPostings(more, "doc_id", "text", path,
      batchId = Some(8L))
    val rebuilt2 = java.nio.file.Files.createTempDirectory("bmapp").toString + "/r2"
    RetrievalOps.indexCorpus(corpus.unionByName(more), "doc_id", "text",
      rebuilt2, nBuckets = 8)
    assert(probe(path) == probe(rebuilt2))
    // compaction folds the generations into one fresh index with
    // identical probes and no appends directory
    val dest = java.nio.file.Files.createTempDirectory("bmapp").toString + "/c"
    RetrievalOps.compactTo(spark, path, dest)
    assert(probe(dest) == probe(rebuilt2))
    assert(!new java.io.File(s"$dest/appends").exists())
    // positional geometry carries through appends: phrase probes see
    // appended occurrences
    val ppath = java.nio.file.Files.createTempDirectory("bmapp").toString + "/p"
    RetrievalOps.indexCorpus(base, "doc_id", "text", ppath, nBuckets = 4,
      withPositions = true)
    RetrievalOps.appendToPostings(
      Seq((9L, "banana apple banana apple")).toDF("doc_id", "text"),
      "doc_id", "text", ppath)
    val hits = RetrievalOps.phraseTopK(spark, ppath, Seq("banana", "apple"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hits.contains((9L, 2L)), hits.toString)
    // an EMPTY index compacts to an empty index (no postings files to
    // move — just the stats marker) and probes stay well-defined
    val epath = java.nio.file.Files.createTempDirectory("bmapp").toString + "/e"
    RetrievalOps.indexCorpus(corpus.filter(col("doc_id") < 0), "doc_id",
      "text", epath, nBuckets = 4)
    val edest = epath + "c"
    RetrievalOps.compactTo(spark, epath, edest)
    assert(RetrievalOps.bm25TopKIndexed(spark, edest, Seq("apple"))
      .count() == 0)
    // the compacted empty index carries the FULL rebuild layout: docs
    // appended to it later must probe fine (a stats-only dest would
    // report n > 0 and then crash reading the missing postings path)
    RetrievalOps.appendToPostings(
      Seq((200L, "apple apple fig")).toDF("doc_id", "text"),
      "doc_id", "text", edest, batchId = Some(0L))
    val grown = RetrievalOps.bm25TopKIndexed(spark, edest, Seq("apple"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(grown.map(_._1) == Seq(200L), grown.toString)
  }

  test("in-place auto-compaction: CURRENT flips atomically, probes stay " +
      "bit-identical, replays stay idempotent, old generations retire") {
    val path = java.nio.file.Files.createTempDirectory("bmgen").toString + "/idx"
    val terms = Seq("apple", "cherry", "durian")
    def probe(p: String) = RetrievalOps.bm25TopKIndexed(spark, p, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def rebuildOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] = {
      val r = java.nio.file.Files.createTempDirectory("bmgen").toString + "/r"
      RetrievalOps.indexCorpus(df, "doc_id", "text", r, nBuckets = 8)
      probe(r)
    }
    val base = corpus.filter(col("doc_id") <= 3)
    RetrievalOps.indexCorpus(base, "doc_id", "text", path, nBuckets = 8)
    val b0 = corpus.filter(col("doc_id") === 4)
    val b1 = corpus.filter(col("doc_id") === 5)
    // the ingestion loop's sequence: append, then maybeCompact(2)
    RetrievalOps.appendToPostings(b0, "doc_id", "text", path,
      batchId = Some(0L))
    assert(!RetrievalOps.maybeCompact(spark, path, 2),
      "1 generation < threshold 2: no compaction yet")
    RetrievalOps.appendToPostings(b1, "doc_id", "text", path,
      batchId = Some(1L))
    assert(RetrievalOps.maybeCompact(spark, path, 2))
    // the SAME path now serves the compacted generation via CURRENT
    assert(new java.io.File(s"$path/CURRENT").exists())
    assert(probe(path) == rebuildOf(corpus))
    // a foreachBatch REPLAY of an already-folded batch must not
    // duplicate its rows (its appends directory no longer exists)
    RetrievalOps.appendToPostings(b1, "doc_id", "text", path,
      batchId = Some(1L))
    assert(probe(path) == rebuildOf(corpus),
      "replay of a folded batch must no-op")
    // further ingestion appends under the NEW root and folds again
    val more = Seq((6L, "apple fig"), (7L, "grape cherry cherry"))
      .toDF("doc_id", "text")
    RetrievalOps.appendToPostings(more.filter(col("doc_id") === 6),
      "doc_id", "text", path, batchId = Some(2L))
    RetrievalOps.appendToPostings(more.filter(col("doc_id") === 7),
      "doc_id", "text", path, batchId = Some(3L))
    assert(probe(path) == rebuildOf(corpus.unionByName(more)),
      "appends on a generational index fold into scores exactly")
    assert(RetrievalOps.maybeCompact(spark, path, 2))
    assert(probe(path) == rebuildOf(corpus.unionByName(more)))
    // generation hygiene: at most the current + one superseded root
    // remain; the base layout's data dirs are retired
    val gens = new java.io.File(s"$path/generations").listFiles()
      .map(_.getName).sorted.toSeq
    assert(gens == Seq("g1", "g2"), gens.toString)
    assert(!new java.io.File(s"$path/postings").exists(),
      "base-layout postings must retire once a generation supersedes them")
    // a third cycle retires g1
    RetrievalOps.appendToPostings(
      Seq((8L, "honeydew apple")).toDF("doc_id", "text"),
      "doc_id", "text", path, batchId = Some(4L))
    assert(RetrievalOps.maybeCompact(spark, path, 1))
    val gens2 = new java.io.File(s"$path/generations").listFiles()
      .map(_.getName).sorted.toSeq
    assert(gens2 == Seq("g2", "g3"), gens2.toString)
    assert(probe(path) == rebuildOf(corpus.unionByName(more).unionByName(
      Seq((8L, "honeydew apple")).toDF("doc_id", "text"))))
    // a batch id BELOW the folded mark can only be a DIFFERENT stream
    // (a fresh checkpoint restarting ids against this index) — it must
    // throw, not silently drop the new stream's data
    val err = intercept[IllegalStateException] {
      RetrievalOps.appendToPostings(b0, "doc_id", "text", path,
        batchId = Some(0L))
    }
    assert(err.getMessage.contains("folded history"), err.getMessage)
    // an in-place REBUILD over the compacted path must retract the
    // CURRENT pointer: probes serve the NEW corpus, not the retired
    // generation the stale pointer would keep resolving
    val fresh = Seq((50L, "quince apple apple"), (51L, "cherry quince"))
      .toDF("doc_id", "text")
    RetrievalOps.indexCorpus(fresh, "doc_id", "text", path, nBuckets = 8)
    assert(!new java.io.File(s"$path/CURRENT").exists(),
      "rebuild must retract the generational pointer")
    assert(probe(path) == rebuildOf(fresh),
      "a rebuild over a compacted path must serve the rebuilt corpus")
    // and the retracted index accepts a fresh stream from batch 0
    RetrievalOps.appendToPostings(b0, "doc_id", "text", path,
      batchId = Some(0L))
    assert(probe(path) == rebuildOf(fresh.unionByName(b0)))
  }

  test("an EMPTY committed append generation never bricks the index") {
    // a streaming micro-batch whose docs all tokenize to zero words
    // commits a postings directory with NO parquet files; probes,
    // growth and compaction must all keep working (schema inference
    // over a file-less directory would throw)
    val path = java.nio.file.Files.createTempDirectory("bmemp").toString + "/idx"
    val base = corpus.filter(col("doc_id") <= 3)
    RetrievalOps.indexCorpus(base, "doc_id", "text", path, nBuckets = 8)
    RetrievalOps.appendToPostings(
      Seq((99L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text", path, batchId = Some(0L))
    val terms = Seq("apple", "cherry")
    def probe(p: String) = RetrievalOps.bm25TopKIndexed(spark, p, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the empty generation still counts its (zero-word) document in n —
    // exactly like a full rebuild over the union would
    val rebuilt = java.nio.file.Files.createTempDirectory("bmemp").toString + "/r"
    RetrievalOps.indexCorpus(
      base.unionByName(Seq((99L, "   ")).toDF("doc_id", "text")),
      "doc_id", "text", rebuilt, nBuckets = 8)
    assert(probe(path) == probe(rebuilt))
    // a real batch after the empty one folds in fine
    RetrievalOps.appendToPostings(
      Seq((100L, "apple apple")).toDF("doc_id", "text"),
      "doc_id", "text", path, batchId = Some(1L))
    assert(probe(path).nonEmpty)
    // and compaction over the mixed generations works
    val dest = java.nio.file.Files.createTempDirectory("bmemp").toString + "/c"
    RetrievalOps.compactTo(spark, path, dest)
    assert(probe(dest) == probe(path))
  }

  test("an index persisted by an older stats layout fails with the " +
      "rebuild story, not a raw field-not-found") {
    val path = java.nio.file.Files.createTempDirectory("bmold").toString + "/idx"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 4)
    // regress the stats to the pre-sum_dl layout
    val old = spark.read.parquet(s"$path/stats")
      .select(col("n"), col("avgdl"), col("n_buckets"))
    old.write.mode("overwrite").parquet(s"$path/stats_tmp")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/stats"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$path/stats_tmp"),
      new org.apache.hadoop.fs.Path(s"$path/stats"))
    val e = intercept[IllegalStateException] {
      RetrievalOps.bm25TopKIndexed(spark, path, Seq("apple")).collect()
    }
    assert(e.getMessage.contains("older layout") &&
      e.getMessage.contains("rebuild"), e.getMessage)
  }

  test("postings index: single-term probe and unknown terms behave") {
    val path = java.nio.file.Files.createTempDirectory("bmidx2").toString + "/idx"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 4)
    val unknown = RetrievalOps.bm25TopKIndexed(spark, path, Seq("zzz_nomatch"))
    assert(unknown.count() == 0)
    val one = RetrievalOps.bm25TopKIndexed(spark, path, Seq("apple"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ref = RetrievalOps.bm25TopK(corpus, "doc_id", "text", Seq("apple"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(one == ref)
  }

  test("postings index batch: each query matches its single-query probe") {
    val path = java.nio.file.Files.createTempDirectory("bmidx3").toString + "/idx"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 8)
    val queries = Seq(
      (100L, Seq("apple")),
      (101L, Seq("apple", "cherry")),
      (102L, Seq("zzz_nomatch"))
    ).toDF("qid", "terms")
    val batch = RetrievalOps.bm25TopKIndexedBatch(spark, path, queries,
      "qid", "terms", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._2).map(x => (x._3, x._4)).toSeq }
    for ((qid, terms) <- Seq(100L -> Seq("apple"), 101L -> Seq("apple", "cherry"))) {
      val single = RetrievalOps.bm25TopKIndexed(spark, path, terms, k = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == single, s"qid $qid: ${batch.get(qid)} vs $single")
    }
    assert(!batch.contains(102L), "no-match query must emit nothing")
    val plan = RetrievalOps.bm25TopKIndexedBatch(spark, path, queries,
      "qid", "terms", k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("evalRanking: hand-computed recall/MRR/nDCG on a planted ranking") {
    // query 1: relevant docs {10, 30}; ranking hits 10 at rank 2, 30 at 3
    // query 2: relevant {50}; ranking misses entirely
    val ranked = Seq(
      (1L, 1L, 20L), (1L, 2L, 10L), (1L, 3L, 30L),
      (2L, 1L, 60L), (2L, 2L, 70L)
    ).toDF("qid", "rank", "id")
    val qrels = Seq((1L, 10L), (1L, 30L), (2L, 50L)).toDF("qid", "id")
    val got = RetrievalOps.evalRanking(ranked, "qid", "rank", "id",
      qrels, "qid", "id", k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val (nRel1, hits1, recall1, mrr1, ndcg1) = got(1L)
    assert(nRel1 == 2 && hits1 == 2 && recall1 == 1.0 && mrr1 == 0.5)
    // dcg = round(1e6/log2(3)) + round(1e6/log2(4)); idcg = ranks 1,2
    val dcg = math.round(1e6 / (math.log(3.0) / math.log(2.0))) +
      math.round(1e6 / 2.0)
    val idcg = math.round(1e6 / 1.0) +
      math.round(1e6 / (math.log(3.0) / math.log(2.0)))
    val expNdcg = BigDecimal(dcg.toDouble / idcg.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ndcg1 == expNdcg, s"ndcg $ndcg1 vs $expNdcg")
    val (nRel2, hits2, recall2, mrr2, ndcg2) = got(2L)
    assert(nRel2 == 1 && hits2 == 0 && recall2 == 0.0 &&
      mrr2 == 0.0 && ndcg2 == 0.0)
  }

  test("averagePrecision: hand-computed AP on planted rankings") {
    // query 1: rel {10, 30} at ranks 2 and 3 → AP = (1/2 + 2/3) / 2
    val ranked = Seq(
      (1L, 1L, 20L), (1L, 2L, 10L), (1L, 3L, 30L),
      (2L, 1L, 60L)
    ).toDF("qid", "rank", "id")
    val qrels = Seq((1L, 10L), (1L, 30L), (2L, 50L)).toDF("qid", "id")
    val got = RetrievalOps.averagePrecision(ranked, "qid", "rank", "id",
      qrels, "qid", "id", k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val expAp = BigDecimal(
      (math.round(1e6 * 1.0 / 2.0) + math.round(1e6 * 2.0 / 3.0)) / 1e6 / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((2L, expAp)), got.toString)
    assert(got(2L) == ((1L, 0.0)))
    // perfect ranking → AP = 1
    val perfect = Seq((1L, 1L, 10L), (1L, 2L, 30L)).toDF("qid", "rank", "id")
    val p = RetrievalOps.averagePrecision(perfect, "qid", "rank", "id",
      qrels.filter(col("qid") === 1L), "qid", "id", k = 10).head()
    assert(p.getDouble(2) == 1.0)
  }

  test("evalRanking: k truncates the judged prefix") {
    val ranked = Seq((1L, 1L, 20L), (1L, 2L, 10L)).toDF("qid", "rank", "id")
    val qrels = Seq((1L, 10L)).toDF("qid", "id")
    val at1 = RetrievalOps.evalRanking(ranked, "qid", "rank", "id",
      qrels, "qid", "id", k = 1).head()
    assert(at1.getLong(2) == 0 && at1.getDouble(4) == 0.0)
  }

  test("deriveMod5SplitIndex equals the indexCorpus + appendToPostings build") {
    // zero-token docs on BOTH sides of the split (3 base, 10 append) pin
    // the n accounting: they carry no postings row but count in n
    val docs = Seq(
      (1L, "apple banana"), (2L, "banana cherry"), (3L, ""),
      (4L, "apple apple"), (5L, "cherry"),
      (10L, "   "), (12L, "apple cherry banana apple")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("derividx").toString
    val full = s"$tmp/full"
    RetrievalOps.indexCorpus(docs, "doc_id", "text", full, nBuckets = 8)
    val a = s"$tmp/ref"
    RetrievalOps.indexCorpus(docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", a, nBuckets = 8)
    RetrievalOps.appendToPostings(docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", a, batchId = Some(0L))
    val b = s"$tmp/derived"
    val nBase = docs.filter(col("doc_id") % 5 =!= 0).count()
    RetrievalOps.deriveMod5SplitIndex(spark, full, nBase, b)
    def rows(p: String) = spark.read.parquet(p)
      .select(col("id"), col("term"), col("tf"), col("dl"),
        col("pt").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(rows(s"$a/postings") == rows(s"$b/postings"))
    assert(rows(s"$a/appends/batch=0/postings") ==
      rows(s"$b/appends/batch=0/postings"))
    def stats(p: String) = spark.read.parquet(p)
      .select("n", "avgdl", "n_buckets", "sum_dl", "with_positions")
      .head().toSeq
    assert(stats(s"$a/stats") == stats(s"$b/stats"))
    assert(stats(s"$a/appends/batch=0/stats") ==
      stats(s"$b/appends/batch=0/stats"))
    val pa = RetrievalOps.bm25TopKIndexed(spark, a, Seq("apple", "cherry"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pb = RetrievalOps.bm25TopKIndexed(spark, b, Seq("apple", "cherry"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pa == pb && pa.nonEmpty)
  }

  test("phraseTopK: exact consecutive-word matching, overlaps and repeats") {
    val docs = Seq(
      (1L, "a b c a b"),      // "a b" twice
      (2L, "a a b b"),        // "a b" once (middle)
      (3L, "b a b a"),        // "a b" once
      (4L, "a c b"),          // never consecutive
      (5L, "x a b c y")       // "a b c" once
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("phidx").toString + "/idx"
    RetrievalOps.indexCorpus(docs, "doc_id", "text", path, nBuckets = 8,
      withPositions = true)
    val two = RetrievalOps.phraseTopK(spark, path, Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(two == Seq((1L, 2L), (2L, 1L), (3L, 1L), (5L, 1L)))
    val three = RetrievalOps.phraseTopK(spark, path, Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(three == Seq((1L, 1L), (5L, 1L)))
    // repeated-word phrase: "a a" only in doc 2
    val rep = RetrievalOps.phraseTopK(spark, path, Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rep == Seq((2L, 1L)))
    val plan = RetrievalOps.phraseTopK(spark, path, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []"))
    // one-scan probe: the per-term pivot aggregation replaced the m−1
    // id-equi-joins — no join operator, one pruned postings scan
    assert(!plan.contains("Join"), plan)
    assert("Scan parquet".r.findAllMatchIn(plan).length == 1, plan)
  }

  test("phraseTopK slop: proximity widens matches; slop 0 equals exact phrase") {
    val docs = Seq(
      (1L, "a b"),          // exact
      (2L, "a x b"),        // slop 1
      (3L, "a x y b"),      // slop 2 only
      (4L, "b a"),          // wrong order — never matches
      (5L, "a x b a b")     // slop 1: ends at both b's
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("slopidx").toString + "/idx"
    RetrievalOps.indexCorpus(docs, "doc_id", "text", path, nBuckets = 4,
      withPositions = true)
    def run(slop: Int) = RetrievalOps.phraseTopK(spark, path, Seq("a", "b"),
        k = 10, slop = slop)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(run(0) == Map(1L -> 1L, 5L -> 1L))
    assert(run(1) == Map(1L -> 1L, 2L -> 1L, 5L -> 2L))
    assert(run(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 2L))
  }

  test("BM25 probes skip the positions column of a positional index") {
    val path = java.nio.file.Files.createTempDirectory("phidx2").toString + "/idx"
    RetrievalOps.indexCorpus(corpus, "doc_id", "text", path, nBuckets = 8,
      withPositions = true)
    val probe = RetrievalOps.bm25TopKIndexed(spark, path, Seq("apple"))
    val scan = probe.queryExecution.executedPlan.toString
    assert(!scan.contains("positions"),
      "BM25 probe must prune the positions column from the scan")
    val ref = RetrievalOps.bm25TopK(corpus, "doc_id", "text", Seq("apple"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == ref)
  }

  test("applyMerge: greedy left-to-right non-overlapping, repeated-symbol runs") {
    graft.functions.TextExprs.register(spark)
    val docs = Seq(
      (1L, Seq("a", "a", "a", "b", "a", "b")),
      (2L, Seq("a")),
      (3L, Seq.empty[String])
    ).toDF("doc_id", "ws")
    val aa = docs.select(col("doc_id"),
        CorpusOps.applyMerge(col("ws"), "a", "a").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(aa(1L) == Seq("a a", "a", "b", "a", "b"))   // run parity: only pos 1
    assert(aa(2L) == Seq("a") && aa(3L) == Seq.empty)
    val ab = docs.select(col("doc_id"),
        CorpusOps.applyMerge(col("ws"), "a", "b").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(ab(1L) == Seq("a", "a", "a b", "a b"))
  }

  test("trainBpe: iterated arg-max merges on a planted corpus") {
    // round 1: "x y" (3 occurrences) wins; after merging, round 2's top
    // adjacent pair is ("x y", "z") (2 occurrences)
    val docs = Seq(
      (1L, "x y z q x y"),
      (2L, "x y z")
    ).toDF("doc_id", "text")
    val got = CorpusOps.trainBpe(docs, "text", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(got == Seq((1L, "x", "y", 3L), (2L, "x y", "z", 2L)), got.toString)
  }

  test("trainBpeChars: within-word merges only, classic char-BPE behavior") {
    // 'ab' appears 3 times; the cross-word pair (b</w>, a...) must never
    // merge. Round 1 best pair: ('a','b') with n=3
    val docs = Seq((1L, "ab ab"), (2L, "ab cd")).toDF("doc_id", "text")
    val got = CorpusOps.trainBpeChars(docs, "text", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(got.head == ((1L, "a", "b", 3L)), got.toString)
    // round 2: ('a b', '</w>') — the merged symbol extends to the marker
    assert(got(1) == ((2L, "a b", "</w>", 3L)), got.toString)
  }

  test("applyBpe: a trained merge table re-tokenizes new text") {
    graft.functions.TextExprs.register(spark)
    val train = Seq((1L, "x y z q x y"), (2L, "x y z")).toDF("doc_id", "text")
    val merges = CorpusOps.trainBpe(train, "text", rounds = 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val fresh = Seq((9L, Seq("x", "y", "z", "x", "y", "q")))
      .toDF("doc_id", "ws")
    val got = fresh.select(CorpusOps.applyBpe(col("ws"), merges).as("t"))
      .head().getSeq[String](0)
    // merges learned: (x,y) then (x y,z) — the unseen doc re-tokenizes
    assert(got == Seq("x y z", "x y", "q"), got.toString)
  }

  test("applyBpe table kernel equals the per-merge fold, constant plan size") {
    graft.functions.TextExprs.register(spark)
    val docs = Seq((1L, Seq("a", "b", "c", "a", "b", "a", "a", "a")))
      .toDF("id", "ws")
    // includes a chained merge ("a b" then ("a b","c")) and an aaa-run
    // (greedy-left parity) — the two delicate merge semantics
    val merges = Seq(("a", "b"), ("a b", "c"), ("a", "a"))
    val folded = docs.select(merges.foldLeft(col("ws")) {
        case (acc, (x, y)) => CorpusOps.applyMerge(acc, x, y) }.as("t"))
      .head().getSeq[String](0)
    val table = docs.select(CorpusOps.applyBpe(col("ws"), merges).as("t"))
      .head().getSeq[String](0)
    assert(table == folded && folded == Seq("a b c", "a b", "a a", "a"))
    // a real vocab: 5000 merges. Folded that is a 5000-node expression
    // (Janino-fatal); the table form stays a constant handful of nodes
    val big = (0 until 5000).map(i => (s"w$i", s"v$i"))
    val df = docs.select(CorpusOps.applyBpe(col("ws"), big).as("t"))
    val nNodes = df.queryExecution.analyzed.expressions
      .map(e => { var c = 0; e.foreach(_ => c += 1); c }).sum
    assert(nNodes < 50, s"plan carries $nNodes expression nodes")
    assert(df.head().getSeq[String](0) ==
      Seq("a", "b", "c", "a", "b", "a", "a", "a"))
  }

  test("refineVocabByUsage: prunes unused pieces, reaches a fixpoint") {
    // corpus: "abab" x3, "cd" x2. Initial vocab carries a redundant
    // piece ("bc" — never inside an optimal segmentation) and strong
    // pieces ("ab", "cd")
    val docs = Seq((1L, "abab abab abab cd cd")).toDF("doc_id", "text")
    val v0 = Seq(("ab", 10L), ("cd", 10L), ("bc", 10L),
      ("a", 1L), ("b", 1L), ("c", 1L), ("d", 1L))
    val r1 = CorpusOps.refineVocabByUsage(docs, "text", v0, rounds = 1)
    val m1 = r1.toMap
    // "abab" -> ab+ab (2 pieces beats any bc-using split), "cd" -> cd
    assert(!m1.contains("bc"), s"unused piece survived: $r1")
    assert(m1("ab") == 6L && m1("cd") == 2L, r1.toString)
    // single chars persist at usage 0 (the segmentability closure)
    assert(m1("a") == 0L && m1("d") == 0L)
    // usage re-scoring is a fixpoint here: more rounds change nothing
    val r3 = CorpusOps.refineVocabByUsage(docs, "text", v0, rounds = 5)
    assert(r3 == r1, s"not a fixpoint:\n$r1\nvs\n$r3")
    // conservation: weighted piece usage re-concatenates the corpus
    val totalChars = "abab".length * 3 + "cd".length * 2
    assert(r1.map { case (p, u) => p.length * u }.sum == totalChars)
  }

  test("d34 vocab: merges conserve content, </w> count equals word count") {
    val sf = "/root/testdata/sf0.001"
    val vocab = graft.operators.TextQueries.d34BpeVocab(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, sf)
    val nWords = docs.select(
        sum(size(call_function("split_words", col("text")))).cast("long"))
      .head().getLong(0)
    // every word still ends in exactly one (possibly merged-away) marker:
    // the summed marker occurrences across vocab symbols equal word count
    val markerCount = vocab.toSeq.map { case (s, n) =>
      n * s.split(" ").count(_ == "</w>")
    }.sum
    assert(markerCount <= nWords)
    assert(vocab.contains("</w>") || vocab.keys.exists(_.endsWith("</w>")))
  }

  test("trainBpe stops early when no pairs remain") {
    val docs = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    assert(CorpusOps.trainBpe(docs, "text", rounds = 3).count() == 0)
  }

  test("x25 sweep: both index paths bounded, raw IVF >= compressed PQ") {
    val rows = RetrievalOps.x25AnnRecall(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(rows.keySet ==
      Set(("ivf", 1L), ("ivf", 2L), ("ivfpq", 1L), ("ivfpq", 2L)))
    rows.values.foreach(r => assert(r >= 0.0 && r <= 1.0))
    // more probes never hurt the raw-IVF path (candidates only grow and
    // cosine ranking is exact), and at equal nprobe the compressed index
    // cannot beat the uncompressed one against the same ground truth
    assert(rows(("ivf", 2L)) >= rows(("ivf", 1L)))
    assert(rows(("ivf", 2L)) >= rows(("ivfpq", 2L)))
  }

  test("trained k-means IVF-PQ reaches production-grade recall " +
      "(the x25 sweep's credible operating point)") {
    // the GATE sweep uses the deterministic untrained geometry (first-k
    // donors, oracle-replayable) whose IVF-PQ row reads recall ~0.4 —
    // a floor, not the dial's real operating point. This pins what the
    // TRAINED path (Lloyd-iterated coarse centroids + trained residual
    // codebooks, IvfAnn.trainCentroids → IvfPq.build) delivers on the
    // same corpus: the number a deployment actually tunes against.
    graft.functions.VectorExprs.register(spark)
    // L2-NORMALIZE first — the production recipe for cosine ANN: on
    // unit vectors cosine order == L2 order, so the PQ's residual-L2
    // ADC ranking approximates the cosine ground truth it is scored
    // against (on raw vectors with varying norms the two orderings
    // legitimately diverge and recall measures the metric mismatch,
    // not the quantizer)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) / " +
          "sqrt(aggregate(embedding, 0D, (a, y) -> a + CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))")
          .as("v"))
    // m=32/k=64 on 64-dim = 32 bytes/vector (16× compression) —
    // measured dial on this corpus: m=16 (32×) recall@10 0.6, m=32
    // (16×) 0.8, flat across nprobe 2→8 both times (quantization-bound,
    // never routing-bound: the trained coarse cells are lossless from
    // nprobe=2). The synthetic vectors are weakly clustered, so these
    // floors are conservative for real embedding distributions.
    val idx = IvfPq.build(emb, "vec_id", "v", nCells = 8,
      m = 32, k = 64, coarseIters = 3, pqIters = 3)
    try {
      val q = emb.filter(col("vec_id") === 0L).head().getSeq[Double](1)
      val exact = emb.filter(col("vec_id") =!= 0L)
        .select(col("vec_id"),
          call_function("vec_cosine", col("v"), typedLit(q)).as("c"))
        .orderBy(col("c").desc, col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSet
      def recallAt(np: Int): Double = {
        val approx = IvfPq.topK(idx, q, topK = 10, nProbe = np,
          excludeId = Some(0L)).collect().map(_.getLong(0)).toSet
        exact.count(approx.contains) / 10.0
      }
      val r2 = recallAt(2)
      val r4 = recallAt(4)
      val r8 = recallAt(8)
      val all = s"recall@10 nprobe 2/4/8 = $r2/$r4/$r8"
      // deterministic (first-k init + fixed Lloyd rounds): the floors
      // pin the measured operating point with slack for nothing — a
      // regression in training or ADC scoring moves them
      assert(r8 >= r2 && r4 >= r2, s"more probes must not lose recall: $all")
      assert(r2 >= 0.75, all)
      assert(r8 >= 0.8, all)
    } finally idx.release()
  }

  test("x34 gate: the TRAINED sweep pins recall@10 >= 0.8 at full " +
      "probes — the operating point, now oracle-replayable") {
    val rows = RetrievalOps
      .x34TrainedRecall(spark, "/root/testdata/sf0.001").collect()
    val byNp = rows.groupBy(_.getLong(0))
    assert(byNp.keySet == Set(2L, 8L))
    byNp.values.foreach(rs => assert(rs.length == 10))
    def recall(np: Long) = byNp(np).count(_.getBoolean(4)) / 10.0
    // the portable round-6 training quantum is noise next to
    // quantization error: the trained operating point's floors hold
    // unchanged (the unrounded path's spec above pins the same 0.8)
    assert(recall(8L) >= 0.8, s"recall@8 = ${recall(8L)}")
    assert(recall(8L) >= recall(2L),
      "more probes must not lose recall")
    // ADC distances non-decreasing down each ranking
    byNp.values.foreach { rs =>
      val ds = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(ds.sliding(2).forall {
        case Array(a, b) => a <= b; case _ => true })
    }
  }

  test("trainBpe linearization: cuts bound lineage, results unchanged") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    // reference run: materialization effectively off (one long chain)
    val ref = CorpusOps.trainBpe(docs, "text", rounds = 10,
        materializeEvery = 1000)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(ref.size == 10, s"corpus went dry at ${ref.size} rounds")
    // linearized run with a tight cut cadence + per-round plan audit:
    // the analyzed plan of the CURRENT symbol relation may carry at most
    // K merge_pair nodes above its latest cut — the bounded-lineage
    // invariant that makes a 10k-merge run O(rounds·corpus/K)
    val k = 3
    var maxDepth = 0
    val got = CorpusOps.trainBpeWithHook(docs, "text", rounds = 10,
        materializeEvery = k, (_, cur) => {
          val depth = "merge_pair".r
            .findAllIn(cur.queryExecution.analyzed.toString).length
          maxDepth = math.max(maxDepth, depth)
        })
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(got == ref, s"linearized trainer diverged:\n$got\nvs\n$ref")
    assert(maxDepth <= k,
      s"lineage grew past the cut cadence: $maxDepth merge_pair nodes > $k")
  }

  test("concurrent trainers sharing one cutDir never clash, and clean up") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val solo = CorpusOps.trainBpe(docs, "text", rounds = 8,
        materializeEvery = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    // a caller-provided cutDir is a SHARED cluster location: two runs
    // writing there at once must not overwrite each other's live cut
    // (each owns a per-run UUID subdirectory, removed in finally)
    val shared = java.nio.file.Files.createTempDirectory("bpecuts").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futs = (0 until 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Seq[(Long, String, String, Long)]] {
          def call() = CorpusOps.trainBpe(docs, "text", rounds = 8,
              materializeEvery = 3, cutDir = Some(shared))
            .collect().map(r => (r.getLong(0), r.getString(1),
              r.getString(2), r.getLong(3))).toSeq.sortBy(_._1)
        })
      }
      futs.foreach { f =>
        assert(f.get(300, java.util.concurrent.TimeUnit.SECONDS) == solo)
      }
    } finally pool.shutdownNow()
    val leftovers = new java.io.File(shared).listFiles()
    assert(leftovers == null || leftovers.isEmpty,
      s"cut run dirs leaked: ${leftovers.map(_.getName).mkString(",")}")
  }

  test("index probes of an EMPTY corpus return empty, never crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("emptyidx").toString + "/idx"
    RetrievalOps.indexCorpus(empty, "doc_id", "text", path, nBuckets = 4,
      withPositions = true)
    assert(RetrievalOps.bm25TopKIndexed(spark, path, Seq("a")).count() == 0)
    assert(RetrievalOps.phraseTopK(spark, path, Seq("a", "b")).count() == 0)
    val queries = Seq((1L, Seq("a"))).toDF("qid", "terms")
    assert(RetrievalOps.bm25TopKIndexedBatch(spark, path, queries,
      "qid", "terms").count() == 0)
    assert(RetrievalOps.frozenStats(spark, path, Seq("a")) ==
      ((0L, 0L, Map.empty[String, Long])))
    // scoring arrivals against the empty snapshot: every doc scores 0.0
    // (the exact kernel's denominator would be zero — the guard returns
    // the empty-corpus score instead of raising)
    graft.functions.TextExprs.register(spark)
    val arrivals = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val scored = arrivals.select(col("doc_id"),
        RetrievalOps.bm25ScoreColumn(col("text"), Seq("a"), 0L, 0L,
          Map.empty).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(scored == Map(1L -> 0.0, 2L -> 0.0))
  }

  test("rrfFuse: fractional external ranks route to the double path, not a truncating cast") {
    // rank 1.5 is not integral — the exact-rational path would truncate
    // it to 1; the per-row route must reproduce the double formula
    val a = Seq((10L, 1.5), (11L, 2.0)).toDF("id", "rank")
    val b = Seq((10L, 2.0), (12L, 1.0)).toDF("id", "rank")
    val got = RetrievalOps.rrfFuse(a, b, "id", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp10 = BigDecimal(1.0 / 61.5 + 1.0 / 62.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp11 = BigDecimal(1.0 / 62.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) == exp10, s"fractional rank truncated: ${got(10L)}")
    // integral ranks in the same frame still take the exact path
    assert(got(11L) == exp11)
  }

  test("scoreWithModel: batch boundaries never change scores; stub is portable") {
    val cands = (1L to 23L).map(i => (0L, i, "q text", s"doc body $i"))
      .toDF("qid", "id", "q", "text")
    val a = RetrievalOps.scoreWithModel(cands, "qid", "id", "q", "text",
        batchSize = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val b = RetrievalOps.scoreWithModel(cands, "qid", "id", "q", "text",
        batchSize = 7)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(a == b && a.size == 23)
    // the stub equals the direct md5 formula (the oracle's portability)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("q textdoc body 5".getBytes("UTF-8"))
      .take(4).map(x => f"$x%02x").mkString
    val exp = (java.lang.Long.parseLong(hex.take(7), 16) % 1000000L) / 1000000.0
    assert(a(5L) == exp)
    assert(a.values.forall(v => v >= 0.0 && v < 1.0))
  }

  test("pairCounts: exact adjacent-pair counting, short docs contribute nothing") {
    val docs = Seq(
      (1L, "a b a b"),   // pairs: "a b","b a","a b"
      (2L, "a"),         // no pairs
      (3L, "")           // no pairs
    ).toDF("doc_id", "text")
    val got = CorpusOps.pairCounts(docs, "text", topK = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("a b" -> 2L, "b a" -> 1L))
  }
}
