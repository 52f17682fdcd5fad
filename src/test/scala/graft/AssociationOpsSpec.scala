package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AssociationOps

/** Independent references for the association/model-fit layer. The
  * DuckDB oracles for these queries mirror the engine's sufficient-
  * statistics algebra, so (per the oracle-independence discipline) each
  * statistic is re-derived here naively in double precision from the
  * collected fixture rows — a shared algebra error would pass the hash
  * gate but fail these. */
class AssociationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val lineitem = Tables.lineitem(spark, sf)
    .select("l_returnflag", "l_quantity", "l_extendedprice")
    .collect()
    .map(r => (r.getString(0), math.round(r.getDouble(1) * 100).toDouble,
      math.round(r.getDouble(2) * 100).toDouble))

  test("regr_fit matches naive double OLS per flag") {
    val got = AssociationOps.qRegrFit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    lineitem.groupBy(_._1).foreach { case (flag, rs) =>
      val xs = rs.map(_._2); val ys = rs.map(_._3)
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val syy = ys.map(y => (y - my) * (y - my)).sum
      val slope = sxy / sxx
      val intercept = my - slope * mx
      val r2 = sxy * sxy / (sxx * syy)
      val (gn, gs, gi, gr) = got(flag)
      assert(gn == xs.length.toLong)
      assert(math.abs(gs - slope) < 1e-6 * math.max(1.0, math.abs(slope)),
        s"$flag slope $gs vs $slope")
      assert(math.abs(gi - intercept) <
        1e-6 * math.max(1.0, math.abs(intercept)),
        s"$flag intercept $gi vs $intercept")
      assert(math.abs(gr - r2) < 1e-9, s"$flag r2 $gr vs $r2")
      assert(gr >= 0.0 && gr <= 1.0 + 1e-12)
    }
  }

  test("corr_kendall matches naive all-pairs tau-b on the binned grid") {
    val got = AssociationOps.qCorrKendall(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type",
        "CAST(floor(value / 50.0) AS BIGINT) AS x",
        "CAST(get_json_object(props, '$.k') AS BIGINT) div 10 AS y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val pts = rs.map(r => (r._2, r._3))
      var nc = 0L; var nd = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.length) {
        val s = (pts(i)._1 - pts(j)._1).signum * (pts(i)._2 - pts(j)._2).signum
        if (s > 0) nc += 1 else if (s < 0) nd += 1
      }
      val n = pts.length.toDouble
      val n0 = n * (n - 1) / 2.0
      val nx = pts.groupBy(_._1).values
        .map(g => g.size.toDouble * (g.size - 1) / 2.0).sum
      val ny = pts.groupBy(_._2).values
        .map(g => g.size.toDouble * (g.size - 1) / 2.0).sum
      val tau = (nc - nd) / math.sqrt((n0 - nx) * (n0 - ny))
      val (gn, gnc, gnd, gtau) = got(tpe)
      assert(gn == pts.length.toLong, s"$tpe n")
      assert(gnc == nc, s"$tpe nc $gnc vs $nc")
      assert(gnd == nd, s"$tpe nd $gnd vs $nd")
      assert(math.abs(gtau - tau) < 1e-9, s"$tpe tau $gtau vs $tau")
      assert(gtau >= -1.0 - 1e-12 && gtau <= 1.0 + 1e-12)
    }
  }

  test("stat_ks matches naive double KS over binned CDFs") {
    val r = AssociationOps.qStatKs(spark, sf).collect()
    assert(r.length == 1)
    val (n1, n2, dNum, dMilli, rejected) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
        r(0).getBoolean(4))
    val vals = Tables.events(spark, sf)
      .filter("event_type IN ('purchase', 'view')")
      .selectExpr("event_type", "CAST(floor(value) AS BIGINT) AS bin")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val p = vals.filter(_._1 == "purchase").map(_._2)
    val v = vals.filter(_._1 == "view").map(_._2)
    assert(n1 == p.length.toLong && n2 == v.length.toLong)
    val bins = (p ++ v).distinct.sorted
    val d = bins.map { b =>
      math.abs(p.count(_ <= b).toDouble / p.length
        - v.count(_ <= b).toDouble / v.length)
    }.max
    assert(math.abs(dNum.toDouble / (n1.toDouble * n2) - d) < 1e-12,
      s"D ${dNum.toDouble / (n1.toDouble * n2)} vs $d")
    assert(dMilli ==
      (BigInt(dNum) * 1000 / (BigInt(n1) * BigInt(n2))).toLong)
    val crit = 1.358 * math.sqrt((n1 + n2).toDouble / (n1.toDouble * n2))
    // the integer decision squares 1.3580 (18441 = ceil(1.358² · 10⁴));
    // away from the boundary both sides agree
    if (math.abs(d - crit) > 1e-4)
      assert(rejected == (d > crit), s"rejected=$rejected D=$d crit=$crit")
  }

  test("basket_rules matches a naive per-basket pair mirror") {
    val items = Tables.lineitem(spark, sf)
      .filter("l_linenumber <= 3")
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val supp = items.groupBy(_._2).map { case (i, xs) => i -> xs.length }
    val nBaskets = items.map(_._1).distinct.length
    val pairCounts = items.groupBy(_._1).values.flatMap { basket =>
      val is = basket.map(_._2).sorted
      for (i <- is.indices; j <- (i + 1) until is.length)
        yield (is(i), is(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size }
      .filter(_._2 >= AssociationOps.MinSupport)
    val got = AssociationOps.qBasketRules(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == pairCounts.keySet)
    assert(got.nonEmpty, "fixture yields no frequent pairs — weaken gate")
    got.foreach { case ((a, b), (sab, cab, cba, lift)) =>
      assert(sab == pairCounts((a, b)).toLong)
      assert(cab == sab * 1000000L / supp(a))
      assert(cba == sab * 1000000L / supp(b))
      assert(lift ==
        (BigInt(nBaskets) * sab * 1000000 /
          (BigInt(supp(a)) * supp(b))).toLong)
      // confidence is a probability: supp_ab ≤ supp of either side
      assert(cab <= 1000000L && cba <= 1000000L)
    }
  }
}
