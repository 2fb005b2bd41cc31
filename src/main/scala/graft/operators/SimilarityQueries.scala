package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection and embedding similarity search — the
  * training-data-pipeline surface (no equivalent in the reference; designed
  * Spark-first per SURVEY §7.1 module 8).
  *
  * Scale design:
  *  - MinHash/SimHash signatures are computed map-side from exploded
  *    shingles; the only shuffles are groupBy(doc_id) (signature assembly)
  *    and groupBy(band) (LSH bucketing). Raw text never shuffles.
  *  - LSH turns the O(n²) all-pairs problem into per-bucket candidate
  *    generation — the 100 TB path. Brute-force cosine is kept as the
  *    correctness baseline and for one-off top-k probes (TakeOrdered, no
  *    full sort).
  *  - All hash seeds are baked constants → fully deterministic, so results
  *    are reproducible across runs and cluster sizes.
  */
object SimilarityQueries {

  val NumPerms = 16 // minhash permutations
  val BandSize = 4  // rows per LSH band => 4 bands

  /** words(text): whitespace-split, lowercased, empties dropped. */
  private def words(t: Column): Column =
    filter(split(lower(t), "\\s+"), w => length(w) > 0)

  /** Word 3-gram shingles from a PRE-MATERIALIZED words-array column. */
  private def shinglesOf(ws: Column): Column =
    when(size(ws) < 3, array(concat_ws(" ", ws)))
      .otherwise(transform(sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ", slice(ws, i + 1, lit(3)))))

  /** doc_id + distinct 64-bit shingle hashes. Raw shingle strings are
    * hashed MAP-SIDE before the distinct — at 100 TB the shuffle carries
    * 16 bytes/row instead of the shingle text. The result is persisted
    * once per (session, dir): the MinHash family (x2/x3/x4) shares this
    * boundary the way the reference checkpoints its prefilter outputs. */
  private val shingleCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def docShingles(s: SparkSession, dir: String): DataFrame =
    shingleCache.computeIfAbsent((s, dir), _ =>
      documents(s, dir)
        // materialize the words array once per row: lambdas don't CSE, so
        // referencing split() inside transform would re-run the regex per
        // shingle — O(words^2) per document
        .select(col("doc_id"), words(col("text")).as("ws"))
        .select(col("doc_id"),
          explode(transform(shinglesOf(col("ws")), sh => xxhash64(sh)))
            .as("shash"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** MinHash signature per document as an array column. Shape: explode the
    * perm dimension and take per-(doc, perm) minima — map-side combine
    * shrinks the shuffle to NumPerms rows/doc, and the narrow expressions
    * stay cheap for codegen (vs a 16-wide agg). */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    minhashSignaturesFrom(docShingles(s, dir))

  private def minhashSignaturesFrom(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), col("shash"),
        explode(sequence(lit(0), lit(NumPerms - 1))).as("perm"))
      .groupBy(col("doc_id"), col("perm"))
      .agg(min(xxhash64(col("perm"), col("shash"))).as("h"))
      .groupBy(col("doc_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("perm"), col("h")))),
        p => p.getField("h")).as("sig"))

  /** LSH candidate pairs: equal band-hash in any band. Output one row per
    * (band, doc_a, doc_b) candidate with the estimated Jaccard from full
    * signature agreement. */
  def x2MinhashLsh(s: SparkSession, dir: String): DataFrame =
    lshPairs(minhashSignatures(s, dir))

  private def lshPairs(sigArr: DataFrame): DataFrame = {
    val nBands = NumPerms / BandSize
    val banded = sigArr.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => xxhash64(concat_ws(",",
          transform(slice(col("sig"), b * lit(BandSize) + 1, lit(BandSize)),
            x => x.cast("string"))), b)))
        .as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)) / lit(NumPerms.toDouble))
          .as("est_jaccard"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard, computed ONLY on LSH candidate pairs (the
    * scalable verify step: |A∩B| via a co-grouped shingle join, never
    * all-pairs). */
  def x4NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    // the shared persisted shingle set feeds signatures, candidate
    // generation, AND the exact verification
    val sh = docShingles(s, dir)
    val cand = lshPairs(minhashSignaturesFrom(sh))
      .select(col("doc_a"), col("doc_b"))
    // exact Jaccard via set expressions: candidate pairs are few (LSH
    // bounds them), so carrying each doc's hash-set through the join is
    // cheaper than a two-sided shingle-level intersection join
    val sets = sh.groupBy(col("doc_id"))
      .agg(collect_set(col("shash")).as("set"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("set").as("set_a")),
        Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("set").as("set_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("set_a"), col("set_b"))) /
          (size(col("set_a")) + size(col("set_b")) -
            size(array_intersect(col("set_a"), col("set_b")))).cast("double"),
          6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash (16-bit, word-hash votes): per bit, sign of the sum of ±1
    * votes from each word's xxhash64 — assembled with algebraic aggs only. */
  def x3Simhash(s: SparkSession, dir: String): DataFrame = {
    val wordsDf = documents(s, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .withColumn("wh", xxhash64(col("w")))
    val bitAggs = (0 until 16).map { b =>
      sum(when(shiftright(col("wh"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val perDoc = wordsDf.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sim = (0 until 16).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    perDoc.select(col("doc_id"), sim.as("simhash"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- embeddings ----

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** dot(a,b) via zip_with + aggregate — codegen'd higher-order functions,
    * no UDF. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force cosine top-k against the vec_id=0 query vector.
    * Plan shape: broadcast 1-row query side, map-side cosine, TakeOrdered
    * top-k (no global sort). This is the exact baseline an IVF/LSH variant
    * is measured against. */
  def x1CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir).select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    val q = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("v"), col("qv")) / (norm(col("v")) * norm(col("qv"))), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(10)
  }

  /** LSH-bucketed ANN (signed-projection-ish): bucket = sign bits of 8
    * deterministic pseudo-hyperplane projections; candidates share the
    * query's bucket, then exact cosine within. The 100 TB path: bucket id
    * is a shuffle key, each bucket is searched independently. */
  def x5AnnBuckets(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir).select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    // deterministic hyperplane p,d weight in {-1,+1} from xxhash64(p, d)
    def proj(p: Int): Column = aggregate(
      zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
        (x, i) => when(xxhash64(lit(p), i).bitwiseAND(1) === 1, x)
          .otherwise(-x)),
      lit(0.0d), (acc, x) => acc + x)
    val bucket = (0 until 8).map(p =>
      when(proj(p) > 0, lit(1L << p)).otherwise(0L)).reduce(_ + _)
    val bucketed = emb.withColumn("bucket", bucket)
    val q = bucketed.filter(col("vec_id") === 0)
      .select(col("bucket"), col("v").as("qv"))
    bucketed.filter(col("vec_id") =!= 0)
      .join(broadcast(q), Seq("bucket"))
      .select(col("vec_id"),
        round(dot(col("v"), col("qv")) / (norm(col("v")) * norm(col("qv"))), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(10)
  }

  /** Embedding-cosine near-duplicate pairs within LSH buckets (per-bucket
    * self-join instead of all-pairs). */
  def x6EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir).select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    def proj(p: Int): Column = aggregate(
      zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
        (x, i) => when(xxhash64(lit(p), i).bitwiseAND(1) === 1, x)
          .otherwise(-x)),
      lit(0.0d), (acc, x) => acc + x)
    val bucket = (0 until 6).map(p =>
      when(proj(p) > 0, lit(1L << p)).otherwise(0L)).reduce(_ + _)
    val b = emb.withColumn("bucket", bucket)
      .withColumn("nv", transform(col("v"), x => x / norm(col("v"))))
    val l = b.select(col("bucket"), col("vec_id").as("id_a"), col("nv").as("va"))
    val r = b.select(col("bucket"), col("vec_id").as("id_b"), col("nv").as("vb"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") > 0.95)
      .orderBy("id_a", "id_b")
  }
}
