package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Contract guards for the driver-facing registry. */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key names a registered query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("registry is populated across all operator families") {
    val names = SparkEntry.queries.keySet
    Seq("q_scan", "q_join", "q_agg", "q_window", "q_dedup", "q_text",
      "q_similarity", "q_multimodal").foreach { prefix =>
      assert(names.exists(_.startsWith(prefix)), s"no queries with $prefix*")
    }
    assert(names.size >= 70)
  }

  test("entry() returns rows on the smoke fixture") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("WeightedMean: merge of arbitrary splits equals single reduce") {
    import graft.functions.WeightedMean
    val gen = Gen.listOf(Gen.zip(
      Gen.chooseNum(1, 50).map(_.toDouble),
      Gen.chooseNum(0, 10000).map(_ / 100.0)))
    val prop = Prop.forAll(gen, Gen.chooseNum(0, 100)) { (xs, cut) =>
      val whole = xs.foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      val k = if (xs.isEmpty) 0 else cut % (xs.length + 1)
      val (l, r) = xs.splitAt(k)
      val merged = WeightedMean.merge(
        l.foldLeft(WeightedMean.zero)(WeightedMean.reduce),
        r.foldLeft(WeightedMean.zero)(WeightedMean.reduce))
      WeightedMean.finish(whole) == WeightedMean.finish(merged) ||
        (WeightedMean.finish(whole) != null &&
          WeightedMean.finish(whole).compareTo(WeightedMean.finish(merged)) == 0)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }
}
