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
}
