package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generated inputs for the pipeline kernels: the quantizer's
  * reconstruction contract over arbitrary float vectors and the PII
  * scrubber's idempotence over adversarial almost-PII strings (fixed
  * seeds — reproducible, no flaky search). */
class PipelinePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: quantizeInt8 reconstructs any float vector within one step") {
    import spark.implicits._
    val vecGen = for {
      n <- Gen.chooseNum(1, 64)
      v <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
    } yield v
    val vecs = samples(vecGen, 50) ++ Seq(
      List.fill(8)(3.14f), // constant vector → all-zero codes
      List(42f), // single element
      List(0f, Float.MinPositiveValue), // denormal-tight range
      List(-1e30f, 1e30f)) // huge range
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
    val got = SimilarityQueries.quantizeInt8(df, "id", "vec").collect()
    got.foreach { r =>
      val v = vecs(r.getLong(0).toInt).map(_.toDouble)
      val codes = r.getString(1).split(",").map(_.toInt)
      assert(codes.length == v.length)
      assert(codes.forall(c => c >= 0 && c <= 255))
      val (lo, hi) = (v.min, v.max)
      val step = (hi - lo) / 255.0
      if (step == 0.0) assert(codes.forall(_ == 0))
      else codes.zip(v).foreach { case (c, x) =>
        assert(math.abs(x - (lo + c * step)) <= step * 1.0001,
          s"vec ${r.getLong(0)}: code $c for $x (lo=$lo hi=$hi)")
      }
      // the minimum element always maps to code 0
      assert(codes(v.indexOf(lo)) == 0)
    }
  }

  test("property: scrubPii is idempotent — a scrubbed text has no PII left") {
    import spark.implicits._
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val email = for { a <- word; b <- word } yield s"$a@$b.com"
    val ip = Gen.listOfN(4, Gen.chooseNum(0, 999)).map(_.mkString("."))
    val nearMiss = Gen.oneOf("a@@b.cc", "1.2.3.4567", "@nodomain", "x@y",
      "...", "1.2.3", "user@", "a@b.c@d.ee", "0..1..2..3")
    val tokenGen = Gen.frequency(
      5 -> word, 2 -> email, 2 -> ip, 2 -> nearMiss)
    val textGen = Gen.nonEmptyListOf(tokenGen).map(_.mkString(" "))
    val texts = samples(textGen, 80)
    val (ne, ni, red) = TextQueries.scrubPii(col("t"))
    val once = texts.toDF("t")
      .select(red.as("t")).as[String].collect()
    val twice = once.toSeq.toDF("t")
      .select(ne.as("ne"), ni.as("ni"), red.as("t2"), col("t"))
      .collect()
    twice.foreach { r =>
      assert(r.getLong(0) == 0 && r.getLong(1) == 0,
        s"PII survived the first scrub: ${r.getString(3)}")
      assert(r.getString(2) == r.getString(3), "second scrub changed text")
    }
  }

  test("property: splitCorpus partitions the corpus for any weights/seed") {
    import spark.implicits._
    val weightsGen = for {
      k <- Gen.chooseNum(1, 5)
      ws <- Gen.listOfN(k, Gen.chooseNum(0L, 20L))
      if ws.exists(_ > 0)
    } yield ws.zipWithIndex.map { case (w, i) => (s"s$i", w) }
    val cases = samples(Gen.zip(weightsGen, Gen.chooseNum(0L, 1000L)), 12)
    val docs = (0 until 300).map(i => (i.toLong, s"doc $i")).toDF("item", "body")
    cases.foreach { case (splits, seed) =>
      val out = CorpusOps.splitCorpus(docs, "item", splits, seed)
        .select("item", "split").as[(Long, String)].collect()
      // every doc lands in exactly one split, and only in named splits
      assert(out.length == 300 && out.map(_._1).distinct.length == 300)
      val names = splits.map(_._1).toSet
      assert(out.forall(r => names.contains(r._2)), s"unknown split in $splits")
      // zero-weight splits receive nothing (the last split absorbs the
      // tail only when its own weight is positive — guaranteed by filter)
      val got = out.groupBy(_._2).view.mapValues(_.length).toMap
      splits.filter(_._2 == 0L).foreach { case (n, _) =>
        assert(!got.contains(n), s"zero-weight split $n got docs") }
    }
  }

  test("property: temperatureMix respects domain sizes and budget monotonicity") {
    import spark.implicits._
    val sizesGen = for {
      k <- Gen.chooseNum(1, 4)
      ns <- Gen.listOfN(k, Gen.chooseNum(1, 60))
    } yield ns
    val cases = samples(Gen.zip(sizesGen, Gen.chooseNum(0L, 150L)), 10)
    cases.foreach { case (sizes, budget) =>
      val docs = sizes.zipWithIndex.flatMap { case (n, d) =>
        (0 until n).map(i => (d * 1000L + i, s"text $d $i", s"dom$d"))
      }.toDF("item", "body", "dom")
      val kept = CorpusOps.temperatureMix(docs, "item", "body", "dom",
          budget = budget, subs = 4)
        .groupBy("dom").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // never upsamples, never exceeds the budget in total
      sizes.zipWithIndex.foreach { case (n, d) =>
        assert(kept.getOrElse(s"dom$d", 0L) <= n) }
      assert(kept.values.sum <= budget)
      // a larger budget never selects fewer docs from any domain
      val more = CorpusOps.temperatureMix(docs, "item", "body", "dom",
          budget = budget + 50, subs = 4)
        .groupBy("dom").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      sizes.indices.foreach { d =>
        assert(more.getOrElse(s"dom$d", 0L) >= kept.getOrElse(s"dom$d", 0L)) }
    }
  }
}
