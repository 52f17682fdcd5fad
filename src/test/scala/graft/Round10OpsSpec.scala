package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Attribution, Quantize}

/** Independent checks for the round-10 additions that carry non-trivial
  * algebra (Lloyd assignment, Welch t-test) — both are also
  * DuckDB-oracle-pinned; these recompute semantics in plain Scala and
  * drive the decision branch the fixture cannot reach. */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def quant(e: Array[Float]): Array[Long] =
    e.map(x => BigDecimal(x * 1000.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)

  /** Plain-Scala mirror of Hashing.md5Bucket(user_id, "", 2) == 0. */
  private def armA(u: Long): Boolean = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
    val hex = md5.take(2).map("%02x".format(_)).mkString
    java.lang.Integer.parseInt(hex, 16) % 2 == 0
  }

  test("Lloyd assignment step equals the plain-Scala argmin reference") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val seeds = vecs.filter(_._1 < 8)
      .map { case (id, e) => (id, quant(e)) }.sortBy(_._1)
    def n2(v: Array[Long]) = v.map(x => x * x).sum
    val expect = vecs.filter(_._1 >= 8).map { case (id, e) =>
      val v = quant(e)
      val (cid, dist) = seeds.map { case (c, cv) =>
        val dot = v.zip(cv).map { case (a, b) => a * b }.sum
        (c, n2(v) + n2(cv) - 2 * dot)
      }.minBy { case (c, dd) => (dd, c) }
      (id, cid, dist)
    }.groupBy(_._2).map { case (cid, g) =>
      cid -> ((g.length.toLong, g.map(_._3).sum,
        g.map(_._1).min, g.map(_._1).max))
    }
    val got = Quantize.qClusterAssign(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum == vecs.count(_._1 >= 8))
  }

  test("Welch t-test inequality matches the BigInt reference on the " +
      "A/A fixture (a stray 5%-level false positive is legitimate)") {
    val rows = Attribution.qAbtestTtest(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.length == 5)
    assert(rows.exists(!_._6), "an A/A split cannot flag every type")
    // recompute the inequality from the emitted sufficient statistics
    // (Q recomputed from the fixture) and check the flag agrees
    val cents = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (et, na, nb, sa, sb, sig) =>
      val g = cents.filter(_._1 == et)
      val ga = g.filter(t => armA(t._2)).map(_._3)
      val gb = g.filterNot(t => armA(t._2)).map(_._3)
      assert(ga.length == na && gb.length == nb)
      assert(ga.sum == sa && gb.sum == sb)
      val (qa, qb) = (ga.map(c => BigInt(c) * c).sum,
        gb.map(c => BigInt(c) * c).sum)
      // normalized quantized decision (round-13 sf10 overflow fix):
      // milli-cent mean difference, micro-grain variance proxies
      val a = BigInt(sa) * nb - BigInt(sb) * na
      val dm = (BigInt(1000) * a.abs) / (BigInt(na) * nb)
      val vua = (BigInt(1000000) * (BigInt(na) * qa - BigInt(sa) * sa)) /
        (BigInt(na) * na)
      val vub = (BigInt(1000000) * (BigInt(nb) * qb - BigInt(sb) * sb)) /
        (BigInt(nb) * nb)
      val lhs = dm * dm * (na - 1) * (nb - 1)
      val rhs = 4 * (vua * (nb - 1) + vub * (na - 1))
      assert(sig == (lhs > rhs))
    }
  }

  test("Lloyd update step sums match the assignment and plain Scala") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val seeds = vecs.filter(_._1 < 8)
      .map { case (id, e) => (id, quant(e)) }.sortBy(_._1)
    def n2(v: Array[Long]) = v.map(x => x * x).sum
    val assign = vecs.filter(_._1 >= 8).map { case (id, e) =>
      val v = quant(e)
      val cid = seeds.map { case (c, cv) =>
        val dot = v.zip(cv).map { case (a, b) => a * b }.sum
        (c, n2(v) + n2(cv) - 2 * dot)
      }.minBy { case (c, dd) => (dd, c) }._1
      (cid, v)
    }
    val expect = assign.groupBy(_._1).flatMap { case (cid, g) =>
      val dim = g.head._2.length
      (0 until dim).map(j =>
        (cid, j) -> ((g.map(_._2(j)).sum, g.length.toLong)))
    }
    val got = Quantize.qClusterUpdate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
  }

  test("exact AUC equals the quadratic pairwise reference, ties included") {
    val docs = Tables.documents(spark, sf)
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = graft.operators.QualityModel.qEvalAuc(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    docs.map(_._1).distinct.foreach { l =>
      val pos = docs.filter(_._1 == l).map(_._2)
      val neg = docs.filter(_._1 != l).map(_._2)
      var wins2 = BigInt(0)
      pos.foreach { p =>
        neg.foreach { n =>
          if (p > n) wins2 += 2 else if (p == n) wins2 += 1
        }
      }
      val expectPpm = (wins2 * 1000000 /
        (2 * BigInt(pos.length) * neg.length)).toLong
      val (np, nn, ppm) = got(l)
      assert(np == pos.length && nn == neg.length)
      assert(ppm == expectPpm, s"AUC mismatch for $l")
    }
  }

  test("interval coverage equals the plain-Scala sweep-line merge") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS s").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = evs.groupBy(_._1).map { case (u, g) =>
      val iv = g.map(t => (t._2, t._2 + 600000000L)).sortBy(identity)
      var islands = 0L; var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      iv.foreach { case (a, b) =>
        if (islands == 0 || a > curE) {
          if (islands > 0) covered += curE - curS
          islands += 1; curS = a; curE = b
        } else if (b > curE) curE = b
      }
      covered += curE - curS
      u -> ((islands, covered))
    }
    val got = graft.operators.FrontierOps.qIntervalCoverage(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == expect)
  }

  test("skyline points are exactly the non-dominated (spend, n) pairs") {
    val rows = graft.operators.FrontierOps.qSkyline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pts = {
      val o = Tables.orders(spark, sf)
        .filter(col("o_custkey").isNotNull)
        .selectExpr("o_custkey",
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS c")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val seg = Tables.customer(spark, sf)
        .select("c_custkey", "c_mktsegment").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      o.groupBy(_._1).toSeq.map { case (ck, g) =>
        (seg(ck), g.map(_._2).sum, g.length.toLong)
      }.distinct
    }
    val expect = pts.filter { case (s0, sp, n) =>
      !pts.exists { case (s1, sp1, n1) =>
        s1 == s0 && sp1 >= sp && n1 >= n && (sp1 > sp || n1 > n)
      }
    }.toSet
    assert(rows.toSet == expect)
    assert(rows.nonEmpty && rows.length < pts.length)
  }

  test("weighted percentiles equal the plain-Scala cumulative-weight scan") {
    val rows = Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS LONG) AS p",
        "CAST(CAST(l_quantity AS DECIMAL(18,2)) * 10 AS LONG) AS w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (f, g) =>
      val hist = g.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = hist.map(_._2).sum
      var cum = 0L
      var med = Option.empty[Long]; var p90 = Option.empty[Long]
      hist.foreach { case (p, w) =>
        cum += w
        if (med.isEmpty && cum * 2 >= tot) med = Some(p)
        if (p90.isEmpty && cum * 10 >= tot * 9) p90 = Some(p)
      }
      f -> ((med.get, p90.get, tot))
    }
    val got = graft.operators.AggQueries.qAggWeightedPercentile(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    got.values.foreach { case (m, p, _) => assert(m <= p) }
  }

  test("nearest as-of picks the min-|Δt| partner, ties to prior") {
    val evs = Tables.events(spark, sf)
      .filter(col("event_type").isin("error", "signup", "purchase"))
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = evs.groupBy(_._3)
    val expect = evs.filter(_._4 == "error").map { case (id, us, u, _) =>
      val partners = byUser(u).filter(_._4 != "error")
      val prior = partners
        .filter(p => p._2 < us || (p._2 == us && p._1 < id))
        .sortBy(p => (p._2, p._1)).lastOption
      val next = partners
        .filter(p => p._2 > us || (p._2 == us && p._1 > id))
        .sortBy(p => (p._2, p._1)).headOption
      val pick = (prior, next) match {
        case (None, None) => None
        case (Some(p), None) => Some((p._1, "prior"))
        case (None, Some(n)) => Some((n._1, "next"))
        case (Some(p), Some(n)) =>
          if (us - p._2 <= n._2 - us) Some((p._1, "prior"))
          else Some((n._1, "next"))
      }
      id -> pick
    }.toMap
    val got = graft.operators.CoreQueries.qJoinAsofNearest(spark, sf)
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(2)) None
          else Some((r.getLong(2), r.getString(3))))
      }.toMap
    assert(got == expect)
    assert(got.values.flatten.exists(_._2 == "prior") &&
      got.values.flatten.exists(_._2 == "next"))
  }

  test("skew central sums equal BigInt exact moments; sign is sensible") {
    val rows = Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag",
        "CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS LONG) AS q")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = graft.operators.AggQueries.qAggSkew(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    rows.groupBy(_._1).foreach { case (f, g) =>
      val n = g.length
      val sTot = g.map(t => BigInt(t._2)).sum
      val cs = g.map(t => BigInt(n) * t._2 - sTot)
      val a2 = cs.map(c => c * c).sum
      val a3 = cs.map(c => c * c * c).sum
      val (gn, ga2, ga3, skew) = got(f)
      assert(gn == n)
      assert(ga2 == a2.toDouble && ga3 == a3.toDouble)
      assert(skew == ga3 / math.sqrt(ga2 * ga2 * ga2 / n.toDouble))
    }
  }

  test("median imputation repairs exactly the 1-in-7 dropout rows") {
    val rows = graft.operators.MiscQueries.qImputeMedian(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    val cents = Tables.events(spark, sf)
      .selectExpr("event_id", "event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS LONG) AS c")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def med2(xs: Seq[Long]): Long = {
      val s0 = xs.sorted; val n = s0.length
      if (n % 2 == 1) s0(n / 2) * 2 else s0(n / 2 - 1) + s0(n / 2)
    }
    val m2 = cents.filter(_._1 % 7 != 0).groupBy(_._2)
      .map { case (t, g) => t -> med2(g.map(_._3).toSeq) }
    val byId = cents.map(t => t._1 -> t._3).toMap
    rows.foreach { case (id, t, v2, imp) =>
      assert(imp == (id % 7 == 0))
      assert(v2 == (if (imp) m2(t) else byId(id) * 2))
    }
  }

  test("Gini and HHI match the BigInt identities and sit in-range") {
    val spend = Tables.orders(spark, sf)
      .filter(col("o_custkey").isNotNull)
      .selectExpr("o_custkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val segOf = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.operators.FrontierOps.qAggConcentration(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    spend.toSeq.map { case (k, x) => (segOf(k), x) }.groupBy(_._1)
      .foreach { case (seg, g) =>
        val xs = g.map(_._2).sorted
        val n = xs.length
        val sx = xs.map(BigInt(_)).sum
        val wsum = xs.zipWithIndex.map { case (x, i) =>
          BigInt(i + 1) * x }.sum
        val gini = ((2 * wsum - BigInt(n + 1) * sx) * 1000000 /
          (BigInt(n) * sx)).toLong
        val hhi = (xs.map(x => BigInt(x) * x).sum * 1000000 /
          (sx * sx)).toLong
        val (gn, gg, gh) = got(seg)
        assert(gn == n && gg == gini && gh == hhi)
        assert(gini > 0 && gini < 1000000 && hhi >= 1000000L / n)
      }
  }

  test("inverse-Simpson diversity: bounds and exact identity hold") {
    val rows = graft.operators.CurationOps.qTextDiversity(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.length == Tables.documents(spark, sf).count())
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, n, sumsq, eff) =>
      val toks = texts(id).toLowerCase.split(" ", -1)
      assert(n == toks.length)
      val counts = toks.groupBy(identity).values.map(_.length.toLong)
      assert(sumsq == counts.map(c => c * c).sum)
      assert(eff == BigInt(n) * n * 1000 / sumsq)
      // 1 <= effective types <= distinct types
      assert(eff >= 1000 && eff <= counts.size.toLong * 1000)
    }
  }

  test("two-way residuals: every term recomputes and each margin ~cancels") {
    val rows = graft.operators.TrendOps.qTwoWayProfile(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    val cells = rows.map(t => (t._1, t._2) -> t._3).toMap
    def ppm(sum: Long, cnt: Long) = BigInt(sum) * 1000000 / cnt
    val sg = cells.values.map(BigInt(_)).sum * 1000000 / cells.size
    rows.foreach { case (d0, h, x, resid) =>
      val row = cells.collect { case ((d1, _), v) if d1 == d0 => v }
      val colv = cells.collect { case ((_, h1), v) if h1 == h => v }
      val expect = BigInt(x) * 1000000 -
        ppm(row.sum, row.size) - ppm(colv.sum, colv.size) + sg
      assert(resid == expect.toLong)
    }
    // residuals are mean-centered up to integer-division slack
    val total = rows.map(t => BigInt(t._4)).sum.abs
    assert(total < rows.length.toLong * 1000000L)
    assert(rows.exists(_._4 > 0) && rows.exists(_._4 < 0))
  }

  test("Benford shares recompute exactly and flag the synthetic prices") {
    val rows = graft.operators.MiscQueries.qQualityBenford(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val digits = Tables.orders(spark, sf).select("o_totalprice").collect()
      .map(r => BigDecimal(r.getDouble(0))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.unscaledValue().toString.head.asDigit)
    val counts = digits.groupBy(identity).view.mapValues(_.length.toLong)
    val total = digits.length.toLong
    assert(rows.map(_._2).sum == total)
    rows.foreach { case (dd, n, share, bf, delta) =>
      assert(n == counts(dd))
      assert(share == n * 1000000L / total)
      assert(delta == math.abs(share - bf))
    }
    // the fixture's uniform-ish price generator is decidedly NOT
    // Benford-conforming — the metric must say so loudly
    assert(rows.map(_._5).max > 15000L)
  }

  test("rolling median equals the doubled-scale reference on every window") {
    val got = graft.operators.TrendOps.qTsRollingMedian(spark, sf)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    def med2(xs: Seq[Long]): Long = {
      val s0 = xs.sorted; val n = s0.length
      if (n % 2 == 1) s0(n / 2) * 2 else s0(n / 2 - 1) + s0(n / 2)
    }
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
    daily.foreach { case (et, series) =>
      series.indices.foreach { i =>
        val win = series.slice(math.max(0, i - 14), i + 1).map(_._2)
        if (win.length >= 8)
          assert(got((et, series(i)._1)) ==
            ((win.length.toLong, med2(win))))
        else assert(!got.contains((et, series(i)._1)))
      }
    }
  }

  test("Welch t-test flags a genuinely shifted arm as significant") {
    import spark.implicits._
    // the md5-A arm gets value ~50, the other arm ~80 — a 30-unit
    // shift that must clear |t| > 2
    val synth = (1L to 400L).map { u =>
      val base = if (armA(u)) 50.0 else 80.0
      (u, "exp", base + (u % 5) * 0.25)
    }.toDF("user_id", "event_type", "value")
    val out = Attribution.abtestTtest(synth).collect()
    assert(out.length == 1 && out.head.getBoolean(5),
      "a 30-unit mean shift must be flagged significant")
  }
}
