package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FeatureOps

/** Plain-Scala recomputation of the feature-engineering family — each
  * query is also DuckDB-oracle-pinned; these verify the semantics
  * independently on the collected sf0.001 fixture. */
class FeatureOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def cents(v: Double): Long =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.unscaledValue().longValueExact()

  private lazy val cust = Tables.customer(spark, sf)
    .select("c_custkey", "c_mktsegment", "c_acctbal").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

  test("one-hot rows carry exactly one set indicator, matching the priority") {
    val rows = FeatureOps.qFeatureOnehot(spark, sf).collect()
    assert(rows.nonEmpty)
    val pri = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val ind = (1 to 5).map(i => r.getInt(r.fieldIndex(s"is_p$i")))
      assert(ind.sum == 1)
      assert(ind.indexOf(1) + 1 == pri(r.getLong(0)).head.asDigit)
    }
  }

  test("bucketize: bucket counts cover all orders and respect cent edges") {
    val got = FeatureOps.qFeatureBucketize(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    val prices = Tables.orders(spark, sf).select("o_totalprice")
      .collect().map(_.getDouble(0))
    val expect = prices.map(cents).groupBy(c => math.min(c / 5000000L, 9L))
      .map { case (b, cs) => b -> (cs.length.toLong, cs.sum) }
    assert(got == expect)
    assert(got.values.map(_._1).sum == prices.length)
  }

  test("LOO target encoding excludes the row's own label") {
    val bySeg = cust.groupBy(_._2).map { case (seg, g) =>
      seg -> (g.count(_._3 > 0.0).toLong, g.length.toLong)
    }
    val got = FeatureOps.qFeatureTargetEnc(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    cust.foreach { case (k, seg, bal) =>
      val (s, n) = bySeg(seg)
      val y = if (bal > 0.0) 1L else 0L
      assert(got(k) == (y, (s - y) * 1000000L / (n - 1)))
    }
  }

  test("min-max scaling hits 0 and 10^6 exactly at each segment's extremes") {
    val got = FeatureOps.qFeatureScale(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
    val byKey = got.toMap
    val rng = cust.groupBy(_._2).map { case (seg, g) =>
      seg -> (g.map(t => cents(t._3)).min, g.map(t => cents(t._3)).max)
    }
    cust.foreach { case (k, seg, bal) =>
      val (lo, hi) = rng(seg)
      assert(byKey(k) == ((seg, (cents(bal) - lo) * 1000000L / (hi - lo))))
    }
    rng.keys.foreach { seg =>
      val vals = got.collect { case (_, (s, v)) if s == seg => v }
      assert(vals.min == 0L && vals.max == 1000000L)
    }
  }

  test("k-fold assignment is total, 5-way, and deterministic") {
    val rows = FeatureOps.qTrainKfold(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.sorted.forall(f => f >= 0 && f < 5))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum == nDocs)
    val again = FeatureOps.qTrainKfold(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.sorted.sameElements(again.sorted))
  }

  test("class weights are inverse-frequency ppm over the language label") {
    val rows = FeatureOps.qClassWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = rows.map(_._2).sum
    val k = rows.length.toLong
    rows.foreach { case (_, n, w) =>
      assert(w == total * 1000000L / (k * n))
    }
    // rarer class => strictly larger weight
    val sorted = rows.sortBy(_._2)
    assert(sorted.map(_._3).reverse.sameElements(sorted.map(_._3).sorted))
  }

  test("winsorize clips at the declared per-segment order statistics") {
    val rows = FeatureOps.qFeatureWinsorize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.length == cust.length)
    rows.groupBy(_._2).foreach { case (seg, rs) =>
      // reference bounds from a plain sort of the segment's cents
      val sortedC = cust.filter(_._2 == seg).map(c => cents(c._3)).sorted
      val n = sortedC.length.toLong
      val lo = sortedC(((5 * n) / 100).max(1L).toInt - 1)
      val hi = sortedC(((95 * n) / 100 + 1).min(n).toInt - 1)
      rs.foreach { case (_, _, c, w, clipped) =>
        assert(w == math.max(lo, math.min(hi, c)))
        assert(clipped == (c < lo || c > hi))
      }
      // the clip is real but bounded: ≤ ~5% per tail on this fixture
      val frac = rs.count(_._5).toDouble / rs.length
      assert(frac > 0.0 && frac <= 0.11, s"$seg: clipped fraction $frac")
    }
  }
}
