package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d13 (PII scrub), d14 (tf-idf keywords), d15 (length deciles) and x11
  * (int8 quantization): crafted-input edge cases the synthetic corpus
  * cannot produce, plus independent driver-side recomputations so the
  * oracle SQL and the engine cannot drift together. */
class PipelineOpsSpec extends AnyFunSuite {
  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("scrubPii redacts crafted emails and IPv4s exactly") {
    import spark.implicits._
    val df = Seq(
      "mail a@b.co and host 1.2.3.4 here",
      "no pii at all",
      "two x@y.org plus first.last+tag@sub.domain.io",
      "edge 1.2.3.4567 is not an ip but 10.0.0.1. ends one",
      "ip at end 192.168.0.255"
    ).toDF("t")
    val (ne, ni, red) = TextQueries.scrubPii(col("t"))
    val got = df.select(ne.as("ne"), ni.as("ni"), red.as("red")).collect()
    assert(got(0).getLong(0) == 1 && got(0).getLong(1) == 1)
    assert(got(0).getString(2) == "mail <EMAIL> and host <IP> here")
    assert(got(1).getLong(0) == 0 && got(1).getLong(1) == 0)
    assert(got(1).getString(2) == "no pii at all")
    assert(got(2).getLong(0) == 2 && got(2).getLong(1) == 0)
    assert(got(2).getString(2) == "two <EMAIL> plus <EMAIL>")
    // 1.2.3.4567 must NOT match (word boundary); trailing-dot IP must
    assert(got(3).getLong(1) == 1 &&
      got(3).getString(2) == "edge 1.2.3.4567 is not an ip but <IP>. ends one")
    assert(got(4).getLong(1) == 1 &&
      got(4).getString(2) == "ip at end <IP>")
  }

  test("d13 finds the injected PII in every enriched document") {
    val got = TextQueries.d13PiiScrub(spark, Sf).collect()
    val nDocs = graft.Tables.documents(spark, Sf).count()
    assert(got.length == nDocs && nDocs > 0)
    got.foreach { r =>
      assert(r.getLong(1) >= 1, s"doc ${r.getLong(0)} email not found")
      assert(r.getLong(2) >= 1, s"doc ${r.getLong(0)} ip not found")
      assert(r.getString(3).length == 32)
    }
  }

  test("d14 matches a full driver-side tf-idf recomputation") {
    val got = TextQueries.d14TfidfKeywords(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getDouble(3)))
      .toMap
    val texts = graft.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val tf = texts.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val n = texts.length.toDouble
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = tf.flatMap { case (id, counts) =>
      counts.toSeq
        .map { case (w, c) => (w, r4(c * (n / df(w)))) }
        .sortBy { case (w, sc) => (-sc, w) }
        .take(3).zipWithIndex
        .map { case ((w, sc), i) => (id, (i + 1).toLong) -> (w, sc) }
    }
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, (term, score)) =>
      assert(expect(k) == ((term, score)), s"mismatch at $k")
    }
  }

  test("d15 deciles partition each language exactly and in order") {
    val got = TextQueries.d15LengthDeciles(spark, Sf).collect()
    val perLang = got.groupBy(_.getString(0))
    val langCounts = graft.Tables.documents(spark, Sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.keySet == langCounts.keySet)
    perLang.foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_.getLong(2)).sum == langCounts(lang))
      // ntile balance: bucket sizes differ by at most one
      val sizes = sorted.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1)
      // decile ranges are ordered and non-overlapping (lo <= hi <= next lo)
      sorted.foreach(r => assert(r.getLong(3) <= r.getLong(4)))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) <= b.getLong(3))
        case _ => ()
      }
    }
  }

  test("d16 profiles the injected domains completely") {
    val got = TextQueries.d16DomainProfile(spark, Sf).collect()
    val nDocs = graft.Tables.documents(spark, Sf).count()
    // 13 site- domains + 5 www.ref- domains, every doc contributing 2 URLs
    assert(got.length == math.min(13, nDocs) + math.min(5, nDocs))
    assert(got.map(_.getLong(2)).sum == 2 * nDocs)
    got.foreach { r =>
      val blocked = r.getString(0).startsWith("www.ref-")
      assert(r.getBoolean(3) == blocked)
      assert(r.getLong(1) <= r.getLong(2)) // n_docs <= n_urls
    }
    assert(got.count(_.getBoolean(3)) == math.min(5, nDocs))
  }

  test("d17 chunks cover every word with the right overlap") {
    val got = TextQueries.d17ChunkDocuments(spark, Sf).collect()
    val wordCounts = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"),
        size(filter(split(lower(col("text")), "\\s+"),
          w => length(w) > 0)).as("nw"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val perDoc = got.groupBy(_.getLong(0))
    assert(perDoc.keySet == wordCounts.filter(_._2 > 0).keySet)
    perDoc.foreach { case (id, chunks) =>
      val nw = wordCounts(id)
      val expectChunks = (nw + 47) / 48 // ceil(nw/48): starts 0,48,.. < nw
      assert(chunks.length == expectChunks, s"doc $id: ${chunks.length}")
      val sorted = chunks.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (0L until expectChunks).toSeq)
      // every chunk except possibly the tail holds the full window or
      // the remaining words
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(2) == math.min(64, nw - i * 48))
      }
    }
  }

  test("d18 packs every doc exactly once with bounded bins") {
    val got = TextQueries.d18PackSequences(spark, Sf).collect()
    val totals = graft.Tables.documents(spark, Sf)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(ceil(length(col("text")) / lit(4.0)).cast("long")).as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val perLang = got.groupBy(_.getString(0))
    assert(perLang.keySet == totals.keySet)
    perLang.foreach { case (lang, bins) =>
      val (nDocs, toks) = totals(lang)
      assert(bins.map(_.getLong(2)).sum == nDocs)
      assert(bins.map(_.getLong(3)).sum == toks)
      // bins are contiguous from 0 (concat-and-chunk leaves no gaps)
      val ids = bins.map(_.getLong(1)).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq)
      // a bin never holds more than budget + one overflowing doc
      bins.foreach(b => assert(b.getLong(3) <= 2048 + 600,
        s"$lang bin ${b.getLong(1)}: ${b.getLong(3)} tokens"))
    }
  }

  test("quantizeInt8 maps crafted vectors to exact codes") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0f, 1f, 2f)),
      (2L, Seq(5f, 5f, 5f)),
      (3L, Seq(-1f, 0f, 3f))
    ).toDF("id", "vec")
    val got = SimilarityQueries.quantizeInt8(df, "id", "vec").collect()
    assert(got(0).getString(1) == "0,127,255") // (1-0)*255/2 = 127.5 → 127
    assert(got(1).getString(1) == "0,0,0" && got(1).getDouble(2) == 0.0)
    assert(got(2).getString(1) == "0,63,255") // (0+1)*255/4 = 63.75 → 63
    assert(got(2).getDouble(3) == -1.0) // zero_point = lo
  }

  test("x11 codes reconstruct within one quantization step") {
    val emb = graft.Tables.embeddings(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val got = SimilarityQueries.x11Int8Quantize(spark, Sf).collect()
    assert(got.length == emb.size)
    got.foreach { r =>
      val v = emb(r.getLong(0))
      val codes = r.getString(1).split(",").map(_.toInt)
      assert(codes.length == v.length)
      assert(codes.forall(c => c >= 0 && c <= 255))
      val (lo, hi) = (v.min, v.max)
      val step = (hi - lo) / 255.0
      codes.zip(v).foreach { case (c, x) =>
        assert(math.abs(x - (lo + c * step)) <= step * 1.0001,
          s"vec ${r.getLong(0)}: code $c for value $x (step $step)")
      }
    }
  }
}
