package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationOps, QualityModel}

/** Learned quality tier (q_quality_logistic) + temperature mixture
  * (q_mix_temperature): the two round-9 curation additions. */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("mlLogisticScored (library): map-side scoring agrees with the " +
      "trained model and approximates the gopher gate") {
    val out = QualityModel.mlLogisticScored(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2),
        r.getBoolean(3)))
    val n = out.length
    assert(n > 0)
    // scores are probabilities
    assert(out.forall { case (_, s, _, _) => s >= 0.0 && s <= 1.0 })
    // pred is exactly score >= 0.5
    assert(out.forall { case (_, s, p, _) => p == (s >= 0.5) })
    // the linear model must actually LEARN the gate: accuracy well above
    // the majority-class baseline on its training corpus
    val acc = out.count { case (_, _, p, k) => p == k }.toDouble / n
    val majority = math.max(out.count(_._4), n - out.count(_._4)).toDouble / n
    assert(acc >= 0.85, s"accuracy $acc")
    assert(acc > majority, s"accuracy $acc <= majority baseline $majority")
    // rerun determinism: the cached artifact makes a second evaluation
    // bit-identical (Verify runs every query twice)
    val again = QualityModel.mlLogisticScored(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2),
        r.getBoolean(3)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("q_quality_logistic (declared, fixed-point NB): learns the gate, " +
      "sigmoid table consistent, deterministic") {
    val out = QualityModel.qQualityLogistic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3)))
    val n = out.length
    assert(n > 0)
    // score_ppm is a clamped-sigmoid ppm value
    assert(out.forall { case (_, s, _, _) => s >= 335L && s <= 999665L })
    // pred (exact z sign) and the table score agree except exactly at
    // the 500000-ppm centi-nat boundary cell, where the table has
    // floored a slightly-negative z onto σ(0)
    assert(out.forall { case (_, s, p, _) =>
      p == (s >= 500000L) || s == 500000L
    })
    // the closed-form NB model must also actually LEARN the gate
    val acc = out.count { case (_, _, p, k) => p == k }.toDouble / n
    val majority = math.max(out.count(_._4), n - out.count(_._4)).toDouble / n
    assert(acc >= 0.85, s"accuracy $acc")
    assert(acc > majority, s"accuracy $acc <= majority baseline $majority")
    // monotone fidelity: the pinned table is the rounded true sigmoid
    QualityModel.SigmoidPpm.zipWithIndex.foreach { case (v, i) =>
      val want =
        math.round(1e6 / (1.0 + StrictMath.exp(-(i - 800) / 100.0)))
      assert(v == want, s"table[$i]")
    }
    val again = QualityModel.qQualityLogistic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("q_mix_temperature: centi-rate equals floor(100*(cmin/c)^0.3) and " +
      "kept volume tracks count^0.7") {
    val out = CurationOps.qMixTemperature(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.nonEmpty)
    val byLang = out.groupBy(_._2)
    val counts = byLang.map { case (s, rows) => s -> rows.head._3 }
    val cmin = counts.values.min
    byLang.foreach { case (s, rows) =>
      val c = rows.head._3
      val want = math.floor(
        100.0 * math.pow(cmin.toDouble / c, 0.3)).toInt
      assert(rows.head._4 == want, s"lang $s rate")
      // rate also via the pure-integer definition the query uses
      val exact = (0 to 100).filter(n =>
        BigInt(n).pow(10) * BigInt(c).pow(3)
          <= BigInt(100).pow(10) * BigInt(cmin).pow(3)).max
      assert(rows.head._4 == exact, s"lang $s integer rate")
      // kept fraction within sampling noise of rate_c/100
      val kept = rows.length.toDouble / c
      assert(math.abs(kept - want / 100.0) < 0.15, s"lang $s kept=$kept")
    }
    // the smallest language keeps everything (rate 100), and the
    // dominant one is genuinely damped
    val minLang = counts.minBy(_._2)._1
    assert(byLang(minLang).head._4 == 100)
    val maxLang = counts.maxBy(_._2)._1
    assert(byLang(maxLang).head._4 < 100)
  }

  test("Artifacts.memo bounds every session cache and evicts on overflow") {
    import graft.operators.Artifacts
    val cache = scala.collection.concurrent.TrieMap[Int, String]()
    var evicted = 0
    val cap = Artifacts.MaxEntriesPerCache
    for (k <- 0 until cap * 3)
      Artifacts.memo(cache, k, (_: String) => evicted += 1)(s"v$k")
    // never more than cap entries resident; overflow evicted whole caches
    assert(cache.size <= cap)
    assert(evicted == cap * 2, s"evicted=$evicted")
    // hits do NOT evict and return the cached value
    val before = cache.size
    val k0 = cache.keys.head
    assert(Artifacts.memo(cache, k0, (_: String) => evicted += 1)("fresh")
      == s"v$k0")
    assert(cache.size == before && evicted == cap * 2)
  }
}
