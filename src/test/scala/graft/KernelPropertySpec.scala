package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._

/** ScalaCheck-generated property tests for the custom codegen
  * kernels: each property evaluates a fixed seeded sample of random
  * inputs in ONE Spark job and compares against a scala-side
  * reference implementation (so codegen and interpreted paths are
  * both exercised through the real expression). */
class KernelPropertySpec extends AnyFunSuite {
  import TestSession._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("scalacheck generation failed"))

  private val tokenGen: Gen[Seq[String]] =
    Gen.choose(0, 30).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.toSeq))

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-1.0f, 1.0f)).map(_.toSeq)

  test("property: sorted_jaccard equals the set formula |A∩B|/|A∪B|") {
    import spark.implicits._
    val rows = sample(Gen.zip(tokenGen, tokenGen), 200, 42L)
    val got = rows.toDF("a", "b")
      .select(sorted_jaccard(
        array_sort(array_distinct(col("a"))),
        array_sort(array_distinct(col("b")))).as("j"))
      .collect().map(_.getDouble(0))
    rows.zip(got).foreach { case ((a, b), j) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val expected =
        if (sa.union(sb).isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(j === expected, s"a=$a b=$b")
    }
  }

  test("property: text_shingles equals sliding-window concatenation") {
    import spark.implicits._
    val rows = sample(tokenGen, 200, 43L)
    val got = rows.toDF("t")
      .select(text_shingles(col("t"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    rows.zip(got).foreach { case (t, sh) =>
      val expected =
        if (t.length < 3) Seq.empty
        else t.sliding(3).map(_.mkString(" ")).toSeq
      assert(sh === expected, s"tokens=$t")
    }
  }

  test("property: simhash64 is token-order invariant; hamming is symmetric") {
    import spark.implicits._
    val rng = new scala.util.Random(44L)
    val rows = sample(tokenGen, 200, 44L).filter(_.nonEmpty)
      .map(t => (t, rng.shuffle(t)))
    val got = rows.toDF("t", "shuffled")
      .select(simhash64(col("t")).as("h1"),
        simhash64(col("shuffled")).as("h2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (h1, h2) => assert(h1 === h2) }
  }

  test("property: minhash_bands is order- and duplicate-invariant, length=bands") {
    import spark.implicits._
    val rng = new scala.util.Random(45L)
    val rows = sample(tokenGen, 200, 45L).filter(_.nonEmpty)
      .map(t => (t, rng.shuffle(t ++ t.take(3))))
    val got = rows.toDF("t", "mutated")
      .select(minhash_bands(col("t"), 16, 4).as("b1"),
        minhash_bands(col("mutated"), 16, 4).as("b2"))
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    got.foreach { case (b1, b2) =>
      assert(b1.length === 16)
      assert(b1 === b2, "duplicates/order changed a min-hash band")
    }
  }

  test("property: cosine_sim is symmetric and within [-1, 1]") {
    import spark.implicits._
    val rows = sample(Gen.zip(vecGen, vecGen), 200, 46L)
      .map { case (a, b) => (a.toArray, b.toArray) }
    val got = rows.toDF("a", "b")
      .select(cosine_sim(col("a"), col("b")).as("ab"),
        cosine_sim(col("b"), col("a")).as("ba"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    got.foreach { case (ab, ba) =>
      assert(ab === ba)
      assert(ab >= -1.0000001 && ab <= 1.0000001)
    }
  }
}
