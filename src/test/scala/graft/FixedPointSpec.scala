package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{FixedPoint, TextQueries}

/** In-JVM verification of the shared fixed-point numeric layer
  * (graft.operators.FixedPoint) — the device that moves float-fold
  * queries under the cross-engine hash gate. Cross-engine equality is
  * what the DuckDB oracle checks; THESE tests pin fidelity: the defined
  * integer values must track the true transcendental within the
  * documented bounds. */
class FixedPointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def lnFp(ns: Seq[Long]): Map[Long, BigDecimal] = {
    import spark.implicits._
    FixedPoint.withStages(ns.toDF("n"),
        FixedPoint.lnFpStages("n", "t_", FixedPoint.SparkFp))
      .select(col("n"), col("t_ln"))
      .collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1)))
      .toMap
  }

  test("lnFpStages: exact at powers of two, 5e-11-relative elsewhere") {
    val pows = (0 to 62).map(1L << _)
    val got = lnFp(pows)
    pows.foreach { n =>
      val k = java.lang.Long.numberOfTrailingZeros(n)
      // at powers of two the mantissa series is exactly zero, so the
      // result is exactly k·Ln2Fp
      assert(got(n) == BigDecimal("693147180559945309") * k,
        s"n=$n got=${got(n)}")
    }
  }

  test("lnFpStages property: tracks Math.log within 5e-11 relative " +
      "for arbitrary positive longs") {
    val gen = Gen.oneOf(
      Gen.chooseNum(1L, 1000L),
      Gen.chooseNum(1L, Long.MaxValue / 2),
      Gen.chooseNum(Long.MaxValue / 2, Long.MaxValue - 1))
    check(Prop.forAll(Gen.listOfN(30, gen)) { ns =>
      ns.isEmpty || {
        val got = lnFp(ns.distinct)
        ns.distinct.forall { n =>
          val want = math.log(n.toDouble)
          val g = (got(n) / BigDecimal("1e18")).toDouble
          math.abs(g - want) <= 5e-11 * math.max(1.0, want)
        }
      }
    }, n = 5)
  }

  test("lnFpScala is bit-equal to the staged lnFpStages form " +
      "for arbitrary positive longs") {
    val gen = Gen.oneOf(
      Gen.chooseNum(1L, 1000L),
      Gen.chooseNum(1L, Long.MaxValue / 2),
      Gen.chooseNum(Long.MaxValue / 2, Long.MaxValue - 1))
    check(Prop.forAll(Gen.listOfN(40, gen)) { ns =>
      ns.isEmpty || {
        val staged = lnFp(ns.distinct)
        ns.distinct.forall { n =>
          BigDecimal(FixedPoint.lnFpScala(n)) == staged(n)
        }
      }
    }, n = 5)
  }

  test("q_text_perplexity (micro-nat) matches the plain-Scala " +
      "add-one-smoothed LM fold within the declared grain") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1).toSeq))
    val counts = texts.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val vocab = counts.size.toLong
    val want = texts.map { case (id, toks) =>
      val nll = -toks.map(t => math.log(
        (counts.getOrElse(t, 0L) + 1).toDouble / (total + vocab)))
        .sum / toks.size
      id -> (toks.size.toLong, nll)
    }.toMap
    val got = TextQueries.qTextPerplexity(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (n, nll)) =>
      val (gn, gUnat) = got(id)
      assert(gn == n, s"doc $id token count")
      // the fixed-point ln is within 5e-11 rel of true, and the output
      // truncates at micro-nat grain — so the integer sits within 1
      // micro-nat (+ float noise in `want`) of the float fold
      assert(math.abs(gUnat / 1e6 - nll) <= 2e-6 * math.max(1.0, nll) + 2e-6,
        s"doc $id: $gUnat micro-nats vs $nll nats")
    }
    // fidelity sanity: frequency variation must separate documents
    assert(got.values.map(_._2).toSet.size > 1)
  }
}
