package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataFrame-generic embedding API vs the gate twins, through renamed
  * columns and a driver-held query vector (= the vec_id 0 embedding, so
  * the gate queries are the ground truth). */
class EmbeddingOpsSpec extends AnyFunSuite {
  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val renamed = graft.Tables.embeddings(spark, Sf)
    .select(col("vec_id").as("item"), col("embedding").as("emb"))

  private lazy val query: Seq[Double] = graft.Tables.embeddings(spark, Sf)
    .filter(col("vec_id") === 0).select("embedding")
    .head().getSeq[Float](0).map(_.toDouble)

  private def rounded(df: org.apache.spark.sql.DataFrame) =
    df.select(col(df.columns.head), round(col("cosine"), 6).as("cosine"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("cosineTopK matches the x1 gate ranking") {
    val got = rounded(EmbeddingOps.cosineTopK(
      renamed.filter(col("item") =!= 0), "item", "emb", query, k = 10))
    val gate = SimilarityQueries.x1CosineTopK(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == gate && got.size == 10)
  }

  test("cosineTopKWhere: filtered search equals filter-then-rank, filter pushed") {
    val labeled = graft.Tables.embeddings(spark, Sf)
      .select(col("vec_id").as("item"), col("embedding").as("emb"), col("label"))
    val got = EmbeddingOps.cosineTopKWhere(labeled, "item", "emb", query,
      col("label") === 3 && col("item") =!= 0, k = 10)
    // equals brute-force ranking restricted to the predicate rows
    val want = rounded(EmbeddingOps.cosineTopK(
      labeled.filter(col("label") === 3 && col("item") =!= 0),
      "item", "emb", query, k = 10))
    assert(got.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == want
      && want.size == 10)
    // only label-3 rows are ever scored, and the predicate reaches the scan
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(label,3"),
      s"label predicate must be pushed to the parquet scan:\n$plan")
  }

  test("annTopK matches the x5 gate ranking (literal bucket filter)") {
    val ann = EmbeddingOps.annTopK(
      renamed.filter(col("item") =!= 0), "item", "emb", query,
      k = 10, planes = 8)
    // no join anywhere: the query bucket is a literal pushed into a filter
    assert(!ann.queryExecution.executedPlan.toString.contains("Join"))
    val gate = SimilarityQueries.x5AnnBuckets(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rounded(ann) == gate)
  }

  test("ivfTopK matches the trained-IVF gate path") {
    // train on the FULL corpus (matching the gate), ask for one extra and
    // drop the query row itself (cosine 1.0, always rank 1)
    val got = rounded(EmbeddingOps.ivfTopK(renamed, "item", "emb", query,
      k = 11).filter(col("item") =!= 0)).take(10)
    val gate = IvfAnn.ivfTrainedTopK(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == gate && got.nonEmpty)
  }

  test("dimension mismatches are rejected loudly, not truncated") {
    intercept[IllegalArgumentException] {
      EmbeddingOps.annTopK(renamed, "item", "emb", Seq(1.0, 2.0), k = 3)
    }
    intercept[IllegalArgumentException] {
      EmbeddingOps.ivfTopK(renamed, "item", "emb", Seq(1.0, 2.0), k = 3)
        .collect()
    }
  }

  test("cosineTopKBatch matches per-query single-shot results") {
    val qids = Seq(0L, 5L, 9L)
    val queries = graft.Tables.embeddings(spark, Sf)
      .filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q"), col("embedding").as("qv"))
    val batch = EmbeddingOps.cosineTopKBatch(
      renamed, "item", "emb", queries, "q", "qv", k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), math.round(r.getDouble(3) * 1e6))).toSeq)
      .toMap
    qids.foreach { qid =>
      val qv = graft.Tables.embeddings(spark, Sf)
        .filter(col("vec_id") === qid).head().getSeq[Float](1).map(_.toDouble)
      val single = EmbeddingOps.cosineTopK(renamed, "item", "emb", qv, k = 5)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
        .toSeq
      assert(batch(qid) == single, s"query $qid diverges")
    }
    // the scale claim: the rank <= k filter plans as a WindowGroupLimit
    // below the qid exchange, so the shuffle never carries Q×N rows
    val plan = EmbeddingOps.cosineTopKBatch(
      renamed, "item", "emb", queries, "q", "qv", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("ivfTopKBatch retrieves each query first and near-true neighbors") {
    val qids = Seq(0L, 5L, 9L)
    val queries = graft.Tables.embeddings(spark, Sf)
      .filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q"), col("embedding").as("qv"))
    val got = EmbeddingOps.ivfTopKBatch(
      renamed, "item", "emb", queries, "q", "qv", k = 10, nprobe = 4)
      .collect().groupBy(_.getLong(0))
    assert(got.keySet == qids.toSet)
    got.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.length <= 10 && sorted.nonEmpty)
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      // queries drawn from the corpus must retrieve themselves first
      assert(sorted.head.getLong(2) == qid, s"query $qid not self-first")
      // cosines non-increasing down the ranking
      val cs = sorted.map(_.getDouble(3))
      assert(cs.sliding(2).forall {
        case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("nearDupPairs matches the x6 gate pairs") {
    val got = EmbeddingOps.nearDupPairs(renamed, "item", "emb",
      threshold = 0.4, planes = 6)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .filter(col("cosine") > 0.4) // gate thresholds on the ROUNDED value
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val gate = SimilarityQueries.x6EmbeddingNearDup(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == gate && got.nonEmpty)
  }

  test("admitVectors: brute-force-exact decisions, and the corpus side " +
      "is STREAMED (batch broadcast), never shuffled or broadcast") {
    val existing = renamed.filter(col("item") % 5 =!= 0)
    val incoming = renamed.filter(col("item") % 5 === 0)
    val out = EmbeddingOps.admitVectors(existing, incoming,
      "item", "emb", threshold = 0.4)
    // decisions: exactly the incoming rows with NO round-6 cosine >= t
    // against any existing row (driver-side brute force)
    val ex = existing.collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map(p => p._1 * p._2).sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = incoming.collect()
      .filter(r => !ex.exists(e =>
        cos(e, r.getSeq[Float](1).map(_.toDouble).toArray) >= 0.4))
      .map(_.getLong(0)).toSet
    assert(out.select("item").collect().map(_.getLong(0)).toSet == expected
      && expected.nonEmpty && expected.size < incoming.count())
    // plan: the nested-loop's BUILD side must be the increment — built
    // from the corpus it would broadcast the 100 TB side at scale
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan)
    assert(!plan.contains("BuildLeft, Cross"), plan)
  }

  test("admitVectors planes>0: identical decisions to the exact path on " +
      "a corpus where bucket recall is provably 1.0") {
    // duplicates at cosine 1.0 — exact copies and positively scaled
    // re-crawls — have IDENTICAL sign projections, so they co-bucket at
    // ANY planes: recall 1.0 by construction, bucketed == exact.
    // Negated vectors (cosine −1 against everything) must be admitted
    // by both paths; a zero vector (NaN cosine → −2) likewise.
    import spark.implicits._
    val base = renamed.filter(col("item") < 200)
    val copies = base.filter(col("item") < 100)
      .select((col("item") + 1000L).as("item"), col("emb"))
    val scaled = base.filter(col("item") < 50).select(
      (col("item") + 2000L).as("item"),
      expr("transform(emb, x -> 3.0F * x)").as("emb"))
    val negated = base.filter(col("item") >= 100).select(
      (col("item") + 3000L).as("item"),
      expr("transform(emb, x -> -x)").as("emb"))
    val zero = Seq((4000L,
      Seq.fill(SimilarityQueries.EmbDim)(0f))).toDF("item", "emb")
    // a NaN-poisoned vector buckets deterministically (NaN projections
    // compare greatest in Spark, so every sign bit sets) and admits
    // via the NaN → −2 cosine rule — bucketed and exact must agree
    val nan = Seq((5000L,
      Float.NaN +: Seq.fill(SimilarityQueries.EmbDim - 1)(0.5f)))
      .toDF("item", "emb")
    val batch = copies.unionByName(scaled).unionByName(negated)
      .unionByName(zero).unionByName(nan)
    val exact = EmbeddingOps.admitVectors(base, batch, "item", "emb",
      threshold = 0.95)
      .select("item").collect().map(_.getLong(0)).toSet
    // every duplicate rejected; negated, zero and NaN all admitted
    assert(exact.forall(id => id >= 3000L),
      s"exact path must reject all cosine-1.0 duplicates: $exact")
    assert(exact.size == 102, exact.size.toString)
    Seq(1, 4, 8, 12).foreach { p =>
      val bucketed = EmbeddingOps.admitVectors(base, batch, "item",
        "emb", threshold = 0.95, planes = p)
        .select("item").collect().map(_.getLong(0)).toSet
      assert(bucketed == exact, s"planes=$p diverged from exact")
    }
    // OR-ed bands can only ADD candidates — still exact here
    val banded = EmbeddingOps.admitVectors(base, batch, "item", "emb",
      threshold = 0.95, planes = 8, bands = 4)
      .select("item").collect().map(_.getLong(0)).toSet
    assert(banded == exact, "bands=4 diverged from exact")
  }

  test("planesFor pins the growth policy: recommendations match the " +
      "measured flat-cost curve, grow +1 per corpus doubling, and a " +
      "recommended-planes admit keeps the recall-1.0 decisions exact") {
    import EmbeddingOps.planesFor
    // a corpus the target already covers needs no bucketing at all
    assert(planesFor(0) == 0 && planesFor(2000) == 0)
    assert(planesFor(1500, 2000) == 0)
    // the measured anchor points (PLANS.md r11/r12 vecadmitscale): the
    // 32k corpus recommends 4 planes, the 512k corpus the measured-flat
    // 8 planes — ceil(log2(rows / 2000))
    assert(planesFor(32000) == 4, planesFor(32000).toString)
    assert(planesFor(512000) == 8, planesFor(512000).toString)
    // exact power-of-two boundaries: smallest p with 2000·2^p >= rows
    assert(planesFor(2048000, 2000) == 10)
    assert(planesFor(2048001, 2000) == 11)
    // log2 growth: a doubling adds at most one plane, never more
    var prev = 0
    for (rows <- Iterator.iterate(2000L)(_ * 2).take(20)) {
      val p = planesFor(rows)
      assert(p >= prev && p <= prev + 1, s"rows=$rows p=$p prev=$prev")
      prev = p
    }
    // the Long sign-bitmask clamp
    assert(planesFor(Long.MaxValue, 1) == 62)
    // shift overflow stops the loop (conceptual cover >= 2^63 covers
    // any Long corpus): 2000·2^52 < Long.MaxValue <= 2000·2^53, so
    // the exact ceil(log2) is 53 — not a spin to the 62 clamp
    assert(planesFor(Long.MaxValue, 2000) == 53,
      planesFor(Long.MaxValue, 2000).toString)
    // and the recommendation is SAFE to follow on a new path: at the
    // recommended planes the cosine-1.0 duplicate class still rejects
    // identically to the exact sweep (identical sign projections
    // co-bucket at any planes)
    val base = renamed.filter(col("item") < 200)
    val copies = base.filter(col("item") < 100)
      .select((col("item") + 1000L).as("item"), col("emb"))
    val rec = planesFor(200, targetBucketRows = 25) // tiny corpus: 3 planes
    assert(rec == 3, rec.toString)
    val exact = EmbeddingOps.admitVectors(base, copies, "item", "emb",
      threshold = 0.95).select("item").collect().map(_.getLong(0)).toSet
    val bucketed = EmbeddingOps.admitVectors(base, copies, "item", "emb",
      threshold = 0.95, planes = rec)
      .select("item").collect().map(_.getLong(0)).toSet
    assert(exact.isEmpty && bucketed == exact,
      s"recommended planes must reject every re-crawl: $bucketed")
  }

  test("nearDupPairs bands>1: a pair meeting in several bands scores " +
      "ONCE, banded pairs are a superset of single-band pairs, and " +
      "the x6 gate's single-band default is untouched") {
    val pairsAt = (planes: Int, bands: Int) =>
      EmbeddingOps.nearDupPairs(renamed, "item", "emb",
        threshold = 0.4, planes = planes, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val single = pairsAt(6, 1)
    val multi = pairsAt(6, 4)
    // no duplicate pair rows despite multi-band meetings
    assert(multi.distinct.size == multi.size,
      "a pair meeting in several bands must emit one row")
    assert(single.toSet.subsetOf(multi.toSet),
      "OR-ed bands must only ever ADD candidate pairs")
    assert(multi.toSet.size >= single.toSet.size && single.nonEmpty)
    info(s"pairs above 0.4: ${single.size} at 1 band → " +
      s"${multi.size} at 4 bands")
    // the x6 gate path (planes=6, default bands) is byte-for-byte the
    // pre-bands plan: same pairs, same cosines
    val gate = SimilarityQueries.x6EmbeddingNearDup(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.toSet == gate)
    // collapseVectors with bands composes (superset of drops never
    // collapses a vector two bands disagree on — min-id rule intact)
    val collapsed = EmbeddingOps.collapseVectors(renamed, "item", "emb",
      threshold = 0.95, planes = 8, bands = 4)
    assert(collapsed.count() <= renamed.count())
  }

  test("admitVectors bands>1: OR-ed bucketings recover the recall a " +
      "single wide-angle bucketing loses, and never reject a keeper") {
    val existing = renamed.filter(col("item") % 5 =!= 0)
    val incoming = renamed.filter(col("item") % 5 === 0)
    def admits(planes: Int, bands: Int) =
      EmbeddingOps.admitVectors(existing, incoming, "item", "emb",
        threshold = 0.4, planes = planes, bands = bands)
        .select("item").collect().map(_.getLong(0)).toSet
    val exactAdmit = admits(0, 1)
    val all = incoming.select("item").collect().map(_.getLong(0)).toSet
    val exactRejects = all -- exactAdmit
    def recall(a: Set[Long]) =
      (exactRejects -- a).size.toDouble / exactRejects.size
    val single = admits(8, 1)
    val multi = admits(8, 6)
    // superset invariant holds for banded too
    assert(exactAdmit.subsetOf(multi))
    // more bands → more candidates → admit set can only SHRINK toward
    // the exact set (every band's hits are unioned)
    assert(multi.subsetOf(single),
      "adding bands must never admit a vector one band rejects")
    val (r1, r6) = (recall(single), recall(multi))
    info(f"rejection recall at t=0.4, 8 planes: 1 band $r1%.2f → " +
      f"6 bands $r6%.2f (${exactRejects.size} exact rejects)")
    // theory: 1 − (1 − p^8)^6 with p = 1 − arccos(0.4)/π
    val floor6 = 1.0 -
      math.pow(1.0 - math.pow(1.0 - math.acos(0.4) / math.Pi, 8), 6)
    assert(r6 >= r1, "OR-ed bands must not lose recall")
    assert(r6 >= floor6, f"6-band recall $r6%.2f < theory $floor6%.3f")
  }

  test("admitVectors planes>0: only ever ADMITS a superset of the exact " +
      "path (a straddled bucket can miss a hit, never invent one), " +
      "measured in the wide-angle x33 regime") {
    val existing = renamed.filter(col("item") % 5 =!= 0)
    val incoming = renamed.filter(col("item") % 5 === 0)
    val exactAdmit = EmbeddingOps.admitVectors(existing, incoming,
      "item", "emb", threshold = 0.4)
      .select("item").collect().map(_.getLong(0)).toSet
    val all = incoming.select("item").collect().map(_.getLong(0)).toSet
    val exactRejects = all -- exactAdmit
    assert(exactRejects.nonEmpty)
    Seq(4, 8).foreach { p =>
      val bucketedAdmit = EmbeddingOps.admitVectors(existing, incoming,
        "item", "emb", threshold = 0.4, planes = p)
        .select("item").collect().map(_.getLong(0)).toSet
      assert(exactAdmit.subsetOf(bucketedAdmit),
        s"planes=$p rejected a vector the exact path admits")
      val recall = (exactRejects -- bucketedAdmit).size.toDouble /
        exactRejects.size
      // t = 0.4 is the WORST regime for single-bucket sign-LSH (wide
      // angles straddle planes): per-plane collision probability for a
      // pair at exactly t is 1 − arccos(t)/π, so recall over pairs
      // ABOVE t is lower-bounded by that to the p-th power — the
      // measured curve must sit on or above it (production thresholds
      // 0.9+ and the dominant cosine-1.0 dedup class sit far higher —
      // the provable-recall spec above)
      val floor = math.pow(1.0 - math.acos(0.4) / math.Pi, p)
      info(f"planes=$p rejection recall at t=0.4: $recall%.2f " +
        f"(theory floor $floor%.3f, ${exactRejects.size} exact rejects)")
      assert(recall >= floor, f"planes=$p recall $recall%.2f < $floor%.3f")
    }
  }

  test("admitVectors planes>0 plan: hash join on the bucket key, batch " +
      "still the build side, corpus never shuffled") {
    val existing = renamed.filter(col("item") % 5 =!= 0)
    val incoming = renamed.filter(col("item") % 5 === 0)
    val out = EmbeddingOps.admitVectors(existing, incoming,
      "item", "emb", threshold = 0.4, planes = 8)
    out.collect(): Unit
    val plan = out.queryExecution.executedPlan.toString
    // the sweep is a HASH probe of the broadcast batch's buckets now,
    // not a nested loop over every batch vector
    assert(plan.contains("BroadcastHashJoin [_g_b"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    // build side must remain the increment; built from the corpus it
    // would broadcast the 100 TB side at scale
    assert(plan.contains("BuildRight"), plan.take(1200))
    assert(!plan.contains("BuildLeft"), plan.take(1200))
  }

  test("a degenerate zero vector never rejects or chains admission " +
      "(NaN cosine maps below every threshold)") {
    import spark.implicits._
    def v(xs: Float*) = xs.toSeq
    // one bad embedding in the corpus: NaN cosine against everything,
    // and Spark's NaN-greatest ordering would otherwise make it
    // "near" every incoming vector — rejecting all future admission
    val existing = Seq((1L, v(1f, 0f)), (2L, v(0f, 0f)))
      .toDF("vec_id", "emb")
    val incoming = Seq((10L, v(0f, 1f)), (11L, v(0.99f, 0.05f)),
      (12L, v(0f, 0f))).toDF("vec_id", "emb")
    val out = EmbeddingOps.admitVectors(existing, incoming,
      "vec_id", "emb", threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // orthogonal 10 admitted, near-dup 11 rejected, zero 12 admitted
    // (a degenerate vector is near NOTHING — not even another zero)
    assert(out == Set(10L, 12L), out.toString)
    // and within-set collapse: the zero vector's NaN edges must not
    // chain two orthogonal directions into one cluster
    val batch = Seq((20L, v(1f, 0f)), (21L, v(0f, 1f)), (22L, v(0f, 0f)))
      .toDF("vec_id", "emb")
    val kept = EmbeddingOps.collapseVectors(batch, "vec_id", "emb",
      threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(20L, 21L, 22L), kept.toString)
  }
}
