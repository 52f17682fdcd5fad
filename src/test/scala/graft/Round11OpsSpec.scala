package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CurationOps, Maintenance, StatsOps}

/** Semantics of the round-11 stats/audit/curation additions, beyond the
  * DuckDB hash gate. */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bootstrap CI: 32 replicas, lo <= sample mean <= hi per type") {
    val rows = StatsOps.qBootstrapCi(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5)
    val means = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("CAST((sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS " +
        "LONG)) * 1000) div count(1) AS LONG)").as("mean_milli"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (tpe, n, lo, hi) =>
      assert(n == 32L, s"$tpe: expected 32 replicas, got $n")
      assert(lo <= hi, s"$tpe: lo $lo > hi $hi")
      // a p5..p95 percentile CI straddles the point estimate on a
      // 200-row-per-type fixture (deterministic given the fixed seeds)
      assert(lo <= means(tpe) && means(tpe) <= hi,
        s"$tpe: sample mean ${means(tpe)} outside CI [$lo, $hi]")
    }
  }

  test("poisson weights: ppm frequencies match the pinned inverse-CDF") {
    // the weight distribution over many draws must reproduce the pinned
    // cumulative thresholds: P(w=0) ~= 367879 ppm, P(w>=1) its complement
    import spark.implicits._
    val n = 20000
    val w = (0 until n).map(_.toLong).toDF("id")
      .select(StatsOps.poissonWeight(col("id"), lit(7)).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val p0 = w.getOrElse(0, 0L).toDouble / n
    val p1 = w.getOrElse(1, 0L).toDouble / n
    assert(math.abs(p0 - 0.3679) < 0.02, s"P(w=0)=$p0")
    assert(math.abs(p1 - 0.3679) < 0.02, s"P(w=1)=$p1")
    assert(w.keys.max <= 9)
    // mean weight ~ 1 (the bootstrap's resample-size-preserving property)
    val mean = w.map { case (k, c) => k.toLong * c }.sum.toDouble / n
    assert(math.abs(mean - 1.0) < 0.02, s"mean weight $mean")
  }

  test("drift chisq: totals conserved, contributions non-negative") {
    val rows = StatsOps.qDriftChisq(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.events(spark, sf).count()
    assert(rows.map(r => r._2 + r._3).sum == total)
    rows.foreach { case (tpe, _, _, c) =>
      assert(c >= 0L, s"$tpe: negative contribution $c") }
  }

  test("content manifest fingerprint is partitioning-independent and " +
    "content-sensitive") {
    val docs = Tables.documents(spark, sf)
    val base = Maintenance.contentManifest(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(4)))
      .toMap
    // same content, different partitioning/order → identical manifest
    val shuffled = Maintenance.contentManifest(
      docs.repartition(7, col("doc_id")).sortWithinPartitions("text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(4)))
      .toMap
    assert(base == shuffled)
    // a single-row payload change must move that source's fingerprint
    val tampered = Maintenance.contentManifest(
      docs.withColumn("text",
        when(col("doc_id") === 3L, concat(col("text"), lit(" x")))
          .otherwise(col("text"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(4)))
      .toMap
    val victim = docs.filter(col("doc_id") === 3L)
      .select("source").collect()(0).getString(0)
    assert(tampered(victim)._2 != base(victim)._2)
    assert((tampered - victim) == (base - victim))
  }

  test("spearman matches a naive average-rank double reference per flag") {
    val got = graft.operators.AggQueries.qCorrSpearman(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val rows = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        math.round(r.getDouble(2) * 100)))
    def avgRanks(xs: Seq[Long]): Map[Long, Double] = {
      val sorted = xs.sorted
      xs.distinct.map { v =>
        val first = sorted.indexOf(v) + 1
        val t = sorted.count(_ == v)
        v -> (first + (t - 1) / 2.0)
      }.toMap
    }
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val (xs, ys) = (rs.toSeq.map(_._2), rs.toSeq.map(_._3))
      val (rx, ry) = (avgRanks(xs), avgRanks(ys))
      val a = xs.map(rx)
      val b = ys.map(ry)
      val n = a.length.toDouble
      val (ma, mb) = (a.sum / n, b.sum / n)
      val num = a.zip(b).map { case (p, q) => (p - ma) * (q - mb) }.sum
      val den = math.sqrt(a.map(p => (p - ma) * (p - ma)).sum *
        b.map(q => (q - mb) * (q - mb)).sum)
      val want = num / den
      assert(math.abs(got(flag) - want) < 1e-9,
        s"$flag: engine ${got(flag)} vs naive $want")
    }
  }

  test("pseudonymization is deterministic and join-consistent") {
    import graft.operators.Privacy
    val out = Privacy.qPrivacyPseudonym(spark, sf)
    // every customer with >=1 order appears exactly once, counts intact
    val expected = Tables.orders(spark, sf)
      .groupBy("o_custkey").count().count()
    assert(out.count() == expected)
    // deterministic across plan rebuilds
    val again = Privacy.qPrivacyPseudonym(spark, sf)
    assert(out.exceptAll(again).isEmpty)
    // pseudonyms are collision-free on the fixture key space
    assert(out.select("pid").distinct().count() == expected)
  }

  test("quality terciles: balanced buckets, head strictly above tail") {
    val rows = CurationOps.qQualityTerciles(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, ts) =>
      assert(ts.map(_._2).sorted.toSeq == Seq(1, 2, 3))
      val sizes = ts.sortBy(_._2).map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang: unbalanced $sizes")
      val head = ts.find(_._2 == 1).get
      val tail = ts.find(_._2 == 3).get
      // ranking is by n_chars desc: the head's floor sits at or above
      // the tail's ceiling
      assert(head._4 >= tail._5, s"$lang: head min ${head._4} below " +
        s"tail max ${tail._5}")
    }
  }

  test("eval gains: cumulative capture matches a naive ranking") {
    import graft.operators.QualityModel
    val got = QualityModel.qEvalGains(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    val docs = Tables.documents(spark, sf)
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val total = BigInt(docs.length)
    val byLang = docs.groupBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case ((lang, score), (cumN, cumPos, rec, prec, lift)) =>
      val wantCumN = BigInt(docs.count(_._2 >= score))
      val pos = byLang(lang).map(_._2)
      val wantCumPos = BigInt(pos.count(_ >= score))
      val nPos = BigInt(pos.length)
      assert(cumN == wantCumN && cumPos == wantCumPos,
        s"$lang@$score: cum ($cumN,$cumPos) vs ($wantCumN,$wantCumPos)")
      assert(rec == wantCumPos * 1000000 / nPos)
      assert(prec == wantCumPos * 1000000 / wantCumN)
      assert(lift == wantCumPos * total * 1000000 / (wantCumN * nPos))
    }
    // the curve is complete: every lang's deepest row captures everything
    byLang.keys.foreach { lang =>
      val deepest = got.keys.filter(_._1 == lang).minBy(_._2)
      assert(got(deepest)._2 == byLang(lang).length)
    }
  }

  test("eval confusion: counts partition the corpus, F1 is harmonic") {
    import graft.operators.QualityModel
    val rows = QualityModel.qEvalConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val n = Tables.documents(spark, sf).count()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, tp, fp, fn, tn) =>
      assert(tp + fp + fn + tn == n, s"$lang: cells don't partition")
      val naive = Tables.documents(spark, sf)
        .select(col("lang"), col("n_chars")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val wantTp = naive.count(d =>
        d._1 == lang && d._2 >= QualityModel.ConfusionCut)
      assert(tp == wantTp, s"$lang: tp $tp vs $wantTp")
    }
  }

  test("collocations: Dice matches a naive bigram count") {
    import graft.operators.TextQueries
    val got = TextQueries.qTextColloc(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val toks = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).toLowerCase.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val bi = toks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 5L)
    assert(got.keySet == bi.toMap.keySet)
    got.foreach { case ((w, c), (nAb, nW, nC, dice)) =>
      assert(nAb == bi((w, c)) && nW == uni(w) && nC == uni(c))
      assert(dice == BigInt(nAb) * 2000000 / (BigInt(nW) + BigInt(nC)))
      assert(dice >= 0 && dice <= 1000000)
    }
  }

  test("t-closeness: exact ppm EMD matches a naive double reference") {
    import graft.operators.Privacy
    val rows = Privacy.qPrivacyTcloseness(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), expr("n_chars div 200").as("b"), col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val values = docs.map(_._3).distinct.sorted
    val m = values.length
    val globCum = values.map(v => docs.count(_._3 <= v).toDouble)
    val n = docs.length.toDouble
    assert(rows.nonEmpty && m > 1)
    rows.foreach { case ((lang, b), (nC, tPpm, tClose)) =>
      val cls = docs.filter(d => d._1 == lang && d._2 == b)
      assert(nC == cls.length)
      val emd = values.zipWithIndex.map { case (v, i) =>
        math.abs(cls.count(_._3 <= v) / cls.length.toDouble
          - globCum(i) / n)
      }.sum / (m - 1)
      val want = emd * 1000000
      // integer floor vs float reference: within one ppm + fp noise
      assert(math.abs(tPpm - want) <= 1.5, s"$lang/$b: $tPpm vs $want")
      assert(tClose == (tPpm <= Privacy.TClosenessPpm))
      assert(tPpm >= 0 && tPpm <= 1000000)
    }
  }

  test("clustering coefficient: ppm matches naive adjacency sets") {
    import graft.operators.Graph
    val edges = Graph.coOrderEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges.map(e => (e._1, e._2)) ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Graph.qGraphClustering(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got.keySet == adj.keySet)
    got.foreach { case (node, (deg, tri, cc)) =>
      val nbrs = adj(node)
      assert(deg == nbrs.size.toLong)
      val wantTri = nbrs.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }
      assert(tri == wantTri.toLong, s"$node: tri $tri vs $wantTri")
      if (deg < 2) assert(cc.isEmpty)
      else assert(cc.contains(
        (BigInt(wantTri) * 2000000 / (BigInt(deg) * (deg - 1))).toLong))
    }
  }

  test("assortativity: sufficient stats match a naive edge fold") {
    import graft.operators.Graph
    val edges = Graph.coOrderEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (m, s1, s2, s3) = edges.foldLeft(
      (0L, BigInt(0), BigInt(0), BigInt(0))) { case ((cm, a, b, c), (u, v)) =>
      val (j, k) = (BigInt(deg(u)), BigInt(deg(v)))
      (cm + 1, a + j + k, b + j * j + k * k, c + j * k)
    }
    val row = Graph.qGraphAssortativity(spark, sf).collect().head
    assert(row.getLong(0) == m)
    assert(row.getLong(1) == s1.toLong)
    assert(row.getLong(2) == s2.toLong)
    assert(row.getLong(3) == s3.toLong)
    val want = (4 * BigInt(m) * s3 - s1 * s1).toString.toDouble /
      (2 * BigInt(m) * s2 - s1 * s1).toString.toDouble
    assert(row.getDouble(4) == want, s"r ${row.getDouble(4)} vs $want")
    assert(row.getDouble(4) >= -1.0 && row.getDouble(4) <= 1.0)
  }

  test("novelty: first-occurrence accounting matches a naive scan") {
    import graft.operators.CurationOps
    val got = CurationOps.qTextNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1)))
      .filter(_._2.length >= 4)
    val shingles = docs.map { case (id, t) =>
      id -> t.sliding(4).map(_.mkString(" ")).toSet
    }.toMap
    val firstSeen = shingles.toSeq.flatMap { case (id, gs) =>
      gs.map(_ -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    assert(got.keySet == shingles.keySet)
    got.foreach { case (id, (n, novel, ppm)) =>
      assert(n == shingles(id).size.toLong)
      val wantNovel = shingles(id).count(g => firstSeen(g) == id).toLong
      assert(novel == wantNovel, s"doc $id: $novel vs $wantNovel")
      assert(ppm == BigInt(wantNovel) * 1000000 / n)
    }
    // the earliest document is all-novel by construction
    val firstDoc = shingles.keys.min
    assert(got(firstDoc)._3 == 1000000L)
  }

  test("linear attribution: credits match a naive trace walk") {
    import graft.operators.Attribution
    val got = Attribution.qAttributionLinear(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    val trace = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getLong(3)))
    val byUser = trace.groupBy(_._1)
    var purchases = 0
    byUser.values.foreach { evs =>
      val ordered = evs.sortBy(e => (e._3, e._4))
      var (nc, nv) = (0L, 0L)
      ordered.foreach { e =>
        if (e._2 == "purchase") {
          purchases += 1
          val (gc, gv, cc, vc) = got(e._4)
          assert(gc == nc && gv == nv, s"purchase ${e._4}: ($gc,$gv) vs ($nc,$nv)")
          if (nc + nv == 0) assert(cc.isEmpty && vc.isEmpty)
          else {
            val share = 1000000L / (nc + nv)
            assert(cc.contains(nc * share) && vc.contains(nv * share))
            // credit conservation up to per-touch truncation
            assert(cc.get + vc.get <= 1000000L)
            assert(cc.get + vc.get >= 1000000L - (nc + nv))
          }
        }
        else if (e._2 == "click") nc += 1
        else nv += 1
      }
    }
    assert(got.size == purchases)
  }

  test("cohort LTV: cumulative cents match a naive cohort fold") {
    import graft.operators.Behavior
    val got = Behavior.qCohortLtv(spark, sf).collect()
      .map(r => ((r.getDate(0).toString, r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        to_date(col("ts")).as("day"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate,
        math.round(r.getDouble(3) * 100)))
    val cohortOf = evs.groupBy(_._1).view
      .mapValues(_.map(_._3).min(Ordering.by((d: java.time.LocalDate) =>
        d.toEpochDay))).toMap
    val cells = evs.filter(_._2 == "purchase")
      .groupBy(e => (cohortOf(e._1),
        java.time.temporal.ChronoUnit.DAYS.between(cohortOf(e._1), e._3) / 7))
    val sizes = cohortOf.values.groupBy(identity).view.mapValues(_.size)
    assert(got.keySet == cells.keySet.map(k => (k._1.toString, k._2)))
    cells.foreach { case ((cohort, age), ps) =>
      val (nUsers, nP, cents, cum, ltv) = got((cohort.toString, age))
      assert(nUsers == sizes(cohort).toLong)
      assert(nP == ps.length.toLong)
      assert(cents == ps.map(_._4).sum)
      val wantCum = cells.filter { case ((c, a), _) =>
        c == cohort && a <= age }.values.flatten.map(_._4).sum
      assert(cum == wantCum, s"$cohort/$age: cum $cum vs $wantCum")
      assert(ltv == BigInt(wantCum) * 1000 / nUsers)
    }
  }

  test("seasonal-naive backtest: errors match a naive daily walk") {
    import graft.operators.TimeSeries
    val got = TimeSeries.qTsBacktest(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val scored = daily.keys.toSeq.flatMap { case (tpe, day) =>
      daily.get((tpe, day.minusDays(7))).map(f =>
        (tpe, math.abs(daily((tpe, day)) - f), math.abs(daily((tpe, day)))))
    }.groupBy(_._1)
    assert(got.keySet == scored.keySet)
    scored.foreach { case (tpe, rows) =>
      val (n, sae, mae, wape) = got(tpe)
      val wantSae = rows.map(r => BigInt(r._2)).sum
      val wantSum = rows.map(r => BigInt(r._3)).sum
      assert(n == rows.length.toLong)
      assert(sae == wantSae, s"$tpe: sae $sae vs $wantSae")
      assert(mae == wantSae * 1000 / n)
      if (wantSum > 0) assert(wape.contains((wantSae * 1000000 / wantSum).toLong))
      else assert(wape.isEmpty)
    }
  }

  test("calibration: bins partition the corpus; rates match a naive count") {
    import graft.operators.QualityModel
    val rows = QualityModel.qEvalCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val docs = Tables.documents(spark, sf)
      .select(col("n_chars"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(_._2).sum == docs.length)
    val byBin = docs.groupBy(_._1 / QualityModel.CalibrationBinWidth)
    assert(rows.map(_._1).toSet == byBin.keySet)
    rows.foreach { case (bin, n, meanMilli, nPos, ppm) =>
      val ds = byBin(bin)
      assert(n == ds.length)
      val pos = ds.count(_._2 == "en")
      assert(nPos == pos.toLong)
      assert(meanMilli == ds.map(x => BigInt(x._1)).sum * 1000 / n)
      assert(ppm == BigInt(pos) * 1000000 / n)
    }
  }

  test("modularity: brand partition sums match a naive edge walk") {
    import graft.operators.Graph
    val got = Graph.qGraphModularity(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val brandOf = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val edges = Graph.coOrderEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = edges.length.toLong
    val dC = edges.flatMap(e => Seq(brandOf(e._1), brandOf(e._2)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val eIn = edges.filter(e => brandOf(e._1) == brandOf(e._2))
      .groupBy(e => brandOf(e._1)).view.mapValues(_.length.toLong).toMap
    assert(got.keySet == dC.keySet)
    got.foreach { case (b, (ein, d, num, den)) =>
      assert(d == dC(b))
      assert(ein == eIn.getOrElse(b, 0L))
      assert(num == 4 * m * ein - d * d, s"$b: num")
      assert(den == 4 * m * m)
    }
    // sanity: global modularity Q = sum(num)/den lies in [-1, 1]
    val q = got.values.map(_._3).sum.toDouble / (4.0 * m * m)
    assert(q >= -1.0 && q <= 1.0)
  }

  test("mcnemar: cells partition each lang; decision matches naive chi2") {
    val rows = StatsOps.qStatMcnemar(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)
      + r.getLong(4)).sum == total)
    rows.foreach { r =>
      val (b, c) = (r.getLong(2), r.getLong(3))
      if (b + c == 0) {
        assert(r.isNullAt(5) && r.isNullAt(6))
      } else {
        val chi2 = (b - c).toDouble * (b - c) / (b + c)
        assert(r.getLong(5) == ((b - c) * (b - c) * 1000000L) / (b + c))
        assert(r.getBoolean(6) == chi2 > 3.8415)
      }
    }
  }

  test("generalization walk: census matches naive; suppression shrinks " +
    "as widths merge") {
    import graft.operators.Privacy
    val rows = Privacy.qPrivacyGeneralize(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(rows.keySet == Privacy.GenWidths.toSet)
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    Privacy.GenWidths.foreach { w =>
      val classes = docs.groupBy(d => (d._1, d._2 / w))
        .view.mapValues(_.length.toLong).toMap
      val (nc, nb, sup, kmin, cov, anon) = rows(w)
      assert(nc == classes.size.toLong)
      val below = classes.values.filter(_ < Privacy.KFloor)
      assert(nb == below.size.toLong)
      assert(sup == below.sum)
      assert(kmin == classes.values.min)
      assert(cov == BigInt(docs.length - below.sum) * 1000000 / docs.length)
      assert(anon == below.isEmpty)
    }
    // doubling the width only merges classes, so suppression never grows
    val supByW = Privacy.GenWidths.map(w => rows(w)._3)
    assert(supByW.zip(supByW.tail).forall { case (a, b) => b <= a },
      s"suppression not monotone: $supByW")
  }

  test("lsh bucket audit: census matches a naive fold of the sig table") {
    import graft.operators.DedupQueries
    val got = DedupQueries.qDedupBucketStats(spark, sf).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val sig = DedupQueries.qDedupMinhashSig(spark, sf).collect()
      .map(r => (r.getInt(1), r.getString(2)))
    val byBand = sig.groupBy(_._1)
    assert(got.keySet == byBand.keySet)
    byBand.foreach { case (band, rs) =>
      val sizes = rs.groupBy(_._2).values.map(_.length.toLong).toSeq
      val (nb, nd, mx, cp, sg) = got(band)
      assert(nb == sizes.length.toLong)
      assert(nd == sizes.sum)
      assert(mx == sizes.max)
      assert(cp == sizes.map(s => s * (s - 1) / 2).sum)
      assert(sg == sizes.count(_ == 1L).toLong)
    }
  }

  test("hotspot: neighborhood census matches a naive 3x3 walk") {
    import graft.operators.Geo
    val got = Geo.qGeoHotspot(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    val cells = Tables.events(spark, sf).select("event_id").collect()
      .map { r =>
        val id = r.getLong(0)
        def coord(salt: String) = {
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest((id.toString + salt).getBytes("UTF-8"))
            .take(4).map("%02x".format(_)).mkString
          java.lang.Long.parseLong(h, 16) % 1000000L
        }
        (coord("#lat") / 100000L, coord("#lon") / 100000L)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.keySet == cells.keySet.map { case (x, y) => x * 2000 + y })
    cells.foreach { case ((x, y), cnt) =>
      val nbrs = for {
        dx <- -1L to 1L; dy <- -1L to 1L if dx != 0 || dy != 0
        c <- cells.get((x + dx, y + dy))
      } yield c
      val (gc, gn, gs, hot) = got(x * 2000 + y)
      assert(gc == cnt)
      assert(gn == nbrs.length.toLong)
      assert(gs == nbrs.sum)
      assert(hot == (cnt * nbrs.length >= 2 * nbrs.sum))
    }
  }

  test("od matrix: flows match naive first/last per user-day") {
    import graft.operators.Geo
    val got = Geo.qGeoOdMatrix(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map { r =>
        val id = r.getLong(2)
        def coord(salt: String) = {
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest((id.toString + salt).getBytes("UTF-8"))
            .take(4).map("%02x".format(_)).mkString
          java.lang.Long.parseLong(h, 16) % 1000000L
        }
        val cell = (coord("#lat") / 100000L) * 2000 +
          coord("#lon") / 100000L
        ((r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate),
          (r.getTimestamp(1), id, cell))
      }
    val want = ev.groupBy(_._1).values.map { rows =>
      val sorted = rows.map(_._2).sortBy(t =>
        (t._1.toInstant.getEpochSecond, t._1.toInstant.getNano, t._2))
      (sorted.head._3, sorted.last._3)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }

  test("cross-correlation: r matches a naive double fold; lag-0 " +
    "purchase autocorr is 1") {
    import graft.operators.TimeSeries
    val got = TimeSeries.qTsCrossCorr(spark, sf).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val anchor = daily.collect { case ((t, d), v) if t == "purchase" =>
      d -> v }
    got.foreach { case ((tpe, lag), (n, r)) =>
      val pairs = daily.toSeq.collect {
        case ((t, d), x) if t == tpe && anchor.contains(d.plusDays(lag)) =>
          (x.toDouble, anchor(d.plusDays(lag)).toDouble)
      }
      assert(n == pairs.length.toLong)
      val nn = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val num = nn * pairs.map(p => p._1 * p._2).sum - sx * sy
      val d1 = nn * pairs.map(p => p._1 * p._1).sum - sx * sx
      val d2 = nn * pairs.map(p => p._2 * p._2).sum - sy * sy
      if (d1 > 0 && d2 > 0) {
        val want = num / math.sqrt(d1 * d2)
        assert(math.abs(r.get - want) < 1e-9, s"$tpe lag$lag: $r vs $want")
      } else assert(r.isEmpty)
    }
    assert(math.abs(got(("purchase", 0))._2.get - 1.0) < 1e-12)
  }

  test("zipf audit: rank 1 reads exactly 1e6 ppm; ratios match naive") {
    import graft.operators.TextQueries
    val rows = TextQueries.qTextZipf(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .distinct().count()
    assert(rows.length.toLong == math.min(50L, vocab))
    val f1 = rows.find(_._1 == 1).get._3
    assert(rows.find(_._1 == 1).get._4 == 1000000L)
    rows.foreach { case (rank, _, cnt, ppm) =>
      assert(ppm == BigInt(cnt) * rank * 1000000 / f1)
    }
    // counts are rank-ordered (non-increasing)
    val byRank = rows.sortBy(_._1).map(_._3)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => b <= a })
  }

  test("wilson containment: flags agree with the naive double Wilson " +
    "interval") {
    val rows = StatsOps.qStatWilson(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    assert(rows.length == 5)
    rows.foreach { case (tpe, n, x, ppm, c1, c5) =>
      assert(ppm == BigInt(x) * 1000000 / n)
      val (nn, xx) = (n.toDouble, x.toDouble)
      val c = (xx + 1.9208) / (nn + 3.8416)
      val m = 1.96 / (nn + 3.8416) * math.sqrt(xx * (nn - xx) / nn + 0.9604)
      // the integer score test IS the Wilson-interval inversion: each
      // containment flag must agree with the naive double interval
      // (the fixture rates sit far from the decision boundary)
      Seq(0.01 -> c1, 0.05 -> c5).foreach { case (p0, flag) =>
        assert(flag == (p0 >= c - m && p0 <= c + m),
          s"$tpe@$p0: flag=$flag vs [${c - m}, ${c + m}]")
      }
    }
  }

  test("runs test: decision matches a naive z-statistic") {
    val rows = StatsOps.qStatRuns(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n1, n2, runs) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (n1 == 0 || n2 == 0) assert(r.isNullAt(4))
      else {
        val nn = (n1 + n2).toDouble
        val a = 2.0 * n1 * n2
        val mu = a / nn + 1
        val s2 = a * (a - nn) / (nn * nn * (nn - 1))
        val rej = (runs - mu) * (runs - mu) > 3.8416 * s2
        assert(r.getBoolean(4) == rej,
          s"${r.getString(0)}: n1=$n1 n2=$n2 R=$runs")
      }
    }
  }

  test("brier: matches a naive bin-rate walk and sits in [0, 2.5e11]") {
    import graft.operators.QualityModel
    val row = QualityModel.qEvalBrier(spark, sf).collect()(0)
    val docs = Tables.documents(spark, sf)
      .select(col("n_chars"), col("lang")).collect()
      .map(r => (r.getLong(0) / QualityModel.CalibrationBinWidth,
        r.getString(1) == "en"))
    val rate = docs.groupBy(_._1).view.mapValues(ds =>
      BigInt(ds.count(_._2)) * 1000000 / ds.length).toMap
    val se = docs.map { case (bin, en) =>
      val diff = rate(bin) - (if (en) BigInt(1000000) else BigInt(0))
      diff * diff
    }.sum
    assert(row.getLong(0) == docs.length.toLong)
    assert(row.getLong(1) == se / docs.length)
    assert(row.getLong(1) >= 0L && row.getLong(1) <= 250000000000L)
  }

  test("theil-sen: medians match a naive pairwise slope walk") {
    import graft.operators.TimeSeries
    val got = TimeSeries.qTsTheilSen(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => ((r.getString(0),
        r.getDate(1).toLocalDate.toEpochDay), // absolute day; deltas equal
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    got.foreach { case (tpe, (n, lo, hi)) =>
      val days = daily.keys.filter(_._1 == tpe).map(_._2).toSeq.sorted
      val slopes = (for {
        i <- days.indices; j <- i + 1 until days.length
        dv = BigInt(daily((tpe, days(j))) - daily((tpe, days(i))))
        dd = BigInt(days(j) - days(i))
        // floor division (BigInt / truncates; adjust for negatives)
        q = (dv * 1000) / dd
        f = if ((dv * 1000) % dd != 0 && (dv * 1000).signum < 0) q - 1
            else q
      } yield f.toLong).sorted
      assert(n == slopes.length.toLong)
      assert(lo == slopes((slopes.length + 1) / 2 - 1), s"$tpe lo")
      assert(hi == slopes((slopes.length + 2) / 2 - 1), s"$tpe hi")
    }
  }

  test("burstiness: cf/df match naive counts; burst >= 1000") {
    import graft.operators.TextQueries
    val rows = TextQueries.qTextBurstiness(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).toLowerCase.split(" ").toSeq)
    rows.foreach { case (tok, cf, df, burst) =>
      assert(cf == docs.map(_.count(_ == tok)).sum.toLong)
      assert(df == docs.count(_.contains(tok)).toLong)
      assert(burst == BigInt(cf) * 1000 / df)
      assert(burst >= 1000L)
    }
  }

  test("degree distribution: histogram and ccdf match a naive fold") {
    import graft.operators.Graph
    val got = Graph.qGraphDegreeDist(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val edges = Graph.coOrderEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val hist = deg.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(got.keySet == hist.keySet)
    val total = deg.size.toLong
    got.foreach { case (d, (n, nGe, ppm)) =>
      assert(n == hist(d))
      val wantGe = hist.filter(_._1 >= d).values.sum
      assert(nGe == wantGe)
      assert(ppm == BigInt(wantGe) * 1000000 / total)
    }
  }

  test("pareto: decile shares match a naive spend ranking and sum to 1e6") {
    import graft.operators.Behavior
    val rows = Behavior.qParetoShare(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 10))
    val spend = Tables.events(spark, sf)
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(rows.map(_._2).sum == spend.size.toLong)
    val total = spend.values.map(BigInt(_)).sum
    assert(rows.map(_._3).map(BigInt(_)).sum == total)
    // decile 1 (top spenders) carries at least its proportional share
    assert(rows.head._4 >= 100000L)
    // cumulative share is non-decreasing and ends at ~1e6 (floor)
    val cums = rows.map(_._5)
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    assert(cums.last == total * 1000000 / total) // == 1e6 exactly
    // shares match a naive ntile walk
    val ranked = spend.toSeq.sortBy { case (u, sp) => (-sp, u) }
    val n = ranked.length
    val want = (1 to 10).map { dl =>
      val sz = n / 10 + (if (dl <= n % 10) 1 else 0)
      val start = (1 until dl).map(j =>
        n / 10 + (if (j <= n % 10) 1 else 0)).sum
      ranked.slice(start, start + sz).map(x => BigInt(x._2)).sum
    }
    rows.zip(want).foreach { case ((dl, _, v, sppm, _), w) =>
      assert(BigInt(v) == w, s"decile $dl")
      assert(sppm == (w * 1000000 / total).toLong)
    }
  }

  test("balanced sample: every lang keeps exactly the min class count") {
    import graft.operators.CorpusPipeline
    val got = CorpusPipeline.qSampleBalanced(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val counts = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = counts.values.min
    val byLang = got.groupBy(_._1)
    assert(byLang.keySet == counts.keySet)
    byLang.foreach { case (l, ds) =>
      assert(ds.length.toLong == minN, s"$l: ${ds.length} != $minN")
      assert(ds.map(_._2).distinct.length == ds.length)
    }
  }
}
