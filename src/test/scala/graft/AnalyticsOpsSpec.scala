package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Behavior, CurationOps, Geo, MiscQueries, Outliers, TextQueries, TimeSeries}

/** Structural/brute-force checks for the profiling and analytics
  * operators added late in round 6 — each declared query is also pinned
  * by its DuckDB oracle; these tests verify the semantics against
  * independent plain-Scala computations on the collected fixture. */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("zscoreOutliers matches an exact BigInt moment computation") {
    val rows = Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // exact integer moments on centi-units, cleared-denominator compare
    val byType = rows.groupBy(_._2)
    val expect = (for {
      (_, g) <- byType
      qs = g.map(t => BigInt(BigDecimal(t._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.unscaledValue()))
      n = BigInt(g.length)
      sSum = qs.sum
      ss = qs.map(q => q * q).sum
      ((id, _, _), q) <- g.zip(qs)
      dev = n * q - sSum
      if dev * dev * (n - 1) > 4 * n * (n * ss - sSum * sSum)
    } yield id).toSet
    val got = Outliers
      .zscoreOutliers(Tables.events(spark, sf), "event_type", "value", 2.0)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("ohlcBars picks first/last by (ts, event_id) and min/max exactly") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"),
        col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    val expect = rows.groupBy(t => (t._1, t._2)).map { case (k, g) =>
      val ord = g.sortBy(t => (t._3.getTime, t._4))
      k -> (ord.head._5, g.map(_._5).max, g.map(_._5).min, ord.last._5,
        g.length.toLong)
    }
    val bars = TimeSeries.ohlcBars(Tables.events(spark, sf), "event_type")
      .collect()
      .map(r => ((r.getString(0), r.getTimestamp(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6)))).toMap
    assert(bars == expect)
  }

  test("vocabTopK ranks by (count desc, token) with exact coverage") {
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
    val total = toks.length.toLong
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong)
    val expect = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(30)
    val got = TextQueries.vocabTopK(Tables.documents(spark, sf), 30)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.map(t => (t._1, t._2)).toSeq == expect)
    // rank is 1..k, cum_cnt is the running sum, cum_pct its exact ratio
    assert(got.map(_._3).toSeq == (1 to got.length))
    val running = expect.map(_._2).scanLeft(0L)(_ + _).tail
    assert(got.map(_._4).toSeq == running)
    assert(got.map(_._5).toSeq ==
      running.map(c => c.toDouble / total.toDouble))
  }

  test("shuffleShards is a permutation: dense in-shard positions, " +
    "deterministic across reruns, epoch-sensitive") {
    val docs = Tables.documents(spark, sf)
    val a = CurationOps.shuffleShards(docs, "doc_id", 8, epoch = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val nDocs = docs.count()
    assert(a.map(_._1).distinct.length.toLong == nDocs)
    for ((_, g) <- a.groupBy(_._2))
      assert(g.map(_._3).sorted.toSeq == (1 to g.length))
    val b = CurationOps
      .shuffleShards(docs.repartition(7), "doc_id", 8, epoch = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    val e1 = CurationOps.shuffleShards(docs, "doc_id", 8, epoch = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(e1.sortBy(_._1).toSeq != a.sortBy(_._1).toSeq)
  }

  test("qDedupSpans matches a brute-force cross-doc shingle count") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val shingles = texts.map { case (id, t) =>
      val toks = t.toLowerCase.split(" ", -1)
      id -> toks.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap
    val docFreq = shingles.values.flatten
      .groupBy(identity).view.mapValues(_.size)
    val expect = shingles.map { case (id, gs) =>
      id -> (gs.size.toLong, gs.count(g => docFreq(g) >= 2).toLong)
    }
    val got = CurationOps.qDedupSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect && expect.nonEmpty)
  }

  test("neighborPairs equals brute-force radius search at several radii") {
    val pts = Geo.qGeoCell(spark, sf)
      .select("c_custkey", "lat_u", "lon_u").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for (radius <- Seq(10000L, 40000L, 120000L)) {
      val expect = (for {
        (a, xa, ya) <- pts; (b, xb, yb) <- pts
        if a < b
        d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
        if d2 <= radius * radius
      } yield (a, b, d2)).toSet
      val base = Tables.customer(spark, sf).select(col("c_custkey"),
        Geo.derivedCoord(col("c_custkey"), "#lat", 1000000L).as("lat_u"),
        Geo.derivedCoord(col("c_custkey"), "#lon", 1000000L).as("lon_u"))
      val got = Geo.neighborPairs(base, "c_custkey", "lat_u", "lon_u", radius)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"radius=$radius")
    }
  }

  test("neighborPairs refuses the degenerate-radius regime loudly") {
    // ADVICE r16: at rowStride <= 2 (radius >= half the 10^8 coord span)
    // the forward offsets {0,1,rowStride-1,rowStride,rowStride+1} stop
    // being pairwise distinct, so a pair would meet on two identical
    // exploded keys and be emitted twice — the guard must throw instead
    import spark.implicits._
    val pts = Seq((1L, 10L, 10L), (2L, 20L, 20L)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Geo.neighborPairs(pts, "id", "x", "y", radius = 100000000L)
    }
    assert(e.getMessage.contains("degenerate"))
    // rowStride = 3 (just above the guard) still computes exactly
    val ok = Geo.neighborPairs(pts, "id", "x", "y", radius = 66000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ok == Seq((1L, 2L)))
  }

  test("inConvex: interior, exterior, vertex and edge points classify exactly") {
    import spark.implicits._
    // the declared 'central' ring: (200k,200k) (700k,250k) (650k,700k) (250k,650k)
    val ring = Seq((200000L, 200000L), (700000L, 250000L),
      (650000L, 700000L), (250000L, 650000L))
    val cases = Seq(
      (450000L, 450000L, true),   // centroid-ish interior
      (200000L, 200000L, true),   // vertex — boundary counts as inside
      (450000L, 225000L, true),   // on the first edge (midpoint)
      (100000L, 100000L, false),  // outside, below-left
      (699999L, 100000L, false),  // outside, below the first edge
      (950000L, 950000L, false))  // outside, above-right
    val got = cases.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .withColumn("in", Geo.inConvex(col("x"), col("y"), ring))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    cases.foreach { case (x, y, want) =>
      assert(got((x, y)) == want, s"($x,$y)")
    }
    // a plain-Scala winding recompute agrees on every fixture point
    def cross(x1: Long, y1: Long, x2: Long, y2: Long, x: Long, y: Long) =
      (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
    def inside(x: Long, y: Long) = ring.indices.forall { i =>
      val (x1, y1) = ring(i); val (x2, y2) = ring((i + 1) % ring.size)
      cross(x1, y1, x2, y2, x, y) >= 0L
    }
    val zones = Geo.qGeoZone(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(zones.nonEmpty)
    zones.foreach { case (x, y, z) =>
      assert((z == "central") == inside(x, y), s"($x,$y) -> $z")
    }
    // both declared zones and the complement are populated on the fixture
    val byZone = zones.groupBy(_._3).view.mapValues(_.size).toMap
    assert(byZone.keySet == Set("central", "east", "none"), byZone.toString)
  }

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("neighborPairs property: equals brute force on random point sets") {
    import spark.implicits._
    val ptsGen = Gen.listOf(for {
      x <- Gen.chooseNum(0L, 99999L); y <- Gen.chooseNum(0L, 99999L)
    } yield (x, y))
    val radiusGen = Gen.oneOf(1000L, 7000L, 33333L)
    check(Prop.forAll(ptsGen, radiusGen) { (raw, radius) =>
      val pts = raw.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      pts.isEmpty || {
        val expect = (for {
          (a, xa, ya) <- pts; (b, xb, yb) <- pts
          if a < b
          d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
          if d2 <= radius * radius
        } yield (a, b, d2)).toSet
        val got = Geo.neighborPairs(pts.toDF("id", "x", "y"),
          "id", "x", "y", radius)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        // exact set AND no duplicate emissions
        got.toSet == expect && got.length == expect.size
      }
    }, n = 15)
  }

  test("inConvex property: equals plain-Scala winding on random CCW triangles") {
    import spark.implicits._
    val coord = Gen.chooseNum(0L, 999999L)
    val triGen = for {
      ax <- coord; ay <- coord; bx <- coord; by <- coord
      cx <- coord; cy <- coord
      // non-degenerate, oriented CCW (swap B and C when clockwise)
      if (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) != 0L
    } yield {
      val ccw = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0L
      if (ccw) Seq((ax, ay), (bx, by), (cx, cy))
      else Seq((ax, ay), (cx, cy), (bx, by))
    }
    val ptsGen = Gen.nonEmptyListOf(Gen.zip(coord, coord))
    check(Prop.forAll(triGen, ptsGen) { (ring, pts) =>
      def inside(x: Long, y: Long) = ring.indices.forall { i =>
        val (x1, y1) = ring(i); val (x2, y2) = ring((i + 1) % ring.size)
        (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1) >= 0L
      }
      val got = pts.toDF("x", "y")
        .withColumn("in", Geo.inConvex(col("x"), col("y"), ring))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(2)))
      got.forall { case ((x, y), in) => in == inside(x, y) }
    }, n = 15)
  }

  test("inPolygon classifies the concave L-zone: notch out, arms in") {
    import spark.implicits._
    // the declared L ring: bottom strip [100k,900k]×[100k,400k] plus
    // left column [100k,400k]×[100k,900k]
    val ring = Seq((100000L, 100000L), (900000L, 100000L),
      (900000L, 400000L), (400000L, 400000L), (400000L, 900000L),
      (100000L, 900000L))
    val cases = Seq(
      (250000L, 250000L, true),   // bottom strip
      (800000L, 250000L, true),   // far end of the bottom strip
      (250000L, 800000L, true),   // left column
      (800000L, 800000L, false),  // the concave notch — inConvex can't say this
      (50000L, 50000L, false),    // outside below-left
      (950000L, 250000L, false))  // outside right
    val got = cases.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .withColumn("in", Geo.inPolygon(col("x"), col("y"), ring))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    cases.foreach { case (x, y, want) => assert(got((x, y)) == want, s"($x,$y)") }
  }

  test("inPolygon property: equals the winding rule strictly inside/outside triangles") {
    import spark.implicits._
    val coord = Gen.chooseNum(0L, 999999L)
    val triGen = for {
      ax <- coord; ay <- coord; bx <- coord; by <- coord
      cx <- coord; cy <- coord
      if (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0L // CCW only
    } yield Seq((ax, ay), (bx, by), (cx, cy))
    val ptsGen = Gen.nonEmptyListOf(Gen.zip(coord, coord))
    check(Prop.forAll(triGen, ptsGen) { (ring, pts) =>
      def crosses(x: Long, y: Long) = ring.indices.map { i =>
        val (x1, y1) = ring(i); val (x2, y2) = ring((i + 1) % ring.size)
        (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
      }
      // boundary semantics differ by design — compare strict points only
      val strict = pts.filter { case (x, y) => !crosses(x, y).contains(0L) }
      strict.isEmpty || {
        val winding = strict.map { case (x, y) =>
          (x, y) -> crosses(x, y).forall(_ > 0L)
        }.toMap
        val got = strict.toDF("x", "y")
          .withColumn("in", Geo.inPolygon(col("x"), col("y"), ring))
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(2)))
        got.forall { case (p, in) => in == winding(p) }
      }
    }, n = 15)
  }

  test("CMS property: estimate >= exact on random key multisets, merge-safe") {
    import spark.implicits._
    import graft.operators.AggQueries
    val keysGen = Gen.nonEmptyListOf(Gen.chooseNum(0, 400).map(i => s"k$i"))
    check(Prop.forAll(keysGen) { raw =>
      val exact = raw.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val df = raw.toDF("k")
      val cells = AggQueries.cmsCells(df, col("k"))
      val est = AggQueries.cmsEstimates(cells, df.distinct())
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // every key estimated, never below its true count; and a
      // two-way split re-summed answers identically to the one-pass
      val (h1, h2) = raw.splitAt(raw.size / 2)
      val sliced = AggQueries.cmsCells(h1.toDF("k"), col("k"))
        .unionAll(AggQueries.cmsCells(h2.toDF("k"), col("k")))
        .groupBy("r", "b").agg(sum("n").as("n"))
      val merged = AggQueries.cmsEstimates(sliced, df.distinct())
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      est.keySet == exact.keySet &&
        exact.forall { case (k, c) => est(k) >= c } &&
        merged == est
    }, n = 10)
  }

  /** Reference implementation: plain-Scala haversine, meters. */
  private def haversineRef(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val a = math.pow(math.sin(math.toRadians(lat2 - lat1) / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(math.toRadians(lon2 - lon1) / 2), 2)
    2 * 6371008.8 * math.asin(math.min(1.0, math.sqrt(a)))
  }

  test("haversineMeters equals the exact formula on random coordinate pairs") {
    import spark.implicits._
    val coordGen = for {
      lat1 <- Gen.chooseNum(-66.0, 66.0); lon1 <- Gen.chooseNum(-179.0, 179.0)
      lat2 <- Gen.chooseNum(-66.0, 66.0); lon2 <- Gen.chooseNum(-179.0, 179.0)
    } yield (lat1, lon1, lat2, lon2)
    check(Prop.forAll(Gen.listOfN(20, coordGen)) { quads =>
      quads.isEmpty || {
        val got = quads.toDF("lat1", "lon1", "lat2", "lon2")
          .select(Geo.haversineMeters(col("lat1"), col("lon1"),
            col("lat2"), col("lon2")))
          .collect().map(_.getDouble(0))
        got.zip(quads).forall { case (g, (a, b, c, d)) =>
          val want = haversineRef(a, b, c, d)
          math.abs(g - want) <= 1e-6 * math.max(1.0, want)
        }
      }
    }, n = 10)
  }

  test("haversineNeighborPairs: recall 1.0 vs brute-force haversine sweep") {
    val pts = Geo.qGeoCell(spark, sf)
      .select("c_custkey", "lat_u", "lon_u").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1e6, r.getLong(2) / 1e6))
    val base = Tables.customer(spark, sf).select(col("c_custkey"),
      (Geo.derivedCoord(col("c_custkey"), "#lat", 1000000L) / 1e6).as("lat"),
      (Geo.derivedCoord(col("c_custkey"), "#lon", 1000000L) / 1e6).as("lon"))
    for (radius <- Seq(400.0, 1200.0, 5000.0)) {
      val expect = (for {
        (a, la, oa) <- pts; (b, lb, ob) <- pts
        if a < b
        if haversineRef(la, oa, lb, ob) <= radius
      } yield (a, b)).toSet
      val got = Geo.haversineNeighborPairs(base, "c_custkey", "lat", "lon",
          radius).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.toSet == expect, s"radius=$radius")
      assert(got.length == expect.size, s"duplicate emissions at $radius")
      assert(expect.nonEmpty || radius < 1000,
        s"fixture should have pairs at radius $radius")
    }
  }

  test("haversineNeighborPairs property: recall 1.0 on random high-latitude patches") {
    import spark.implicits._
    // high latitudes are where the naive euclidean grid under-covers
    // longitude — exactly the regime the spherical cell bounds must survive
    val ptGen = for {
      lat <- Gen.chooseNum(58.0, 60.0); lon <- Gen.chooseNum(20.0, 24.0)
    } yield (lat, lon)
    check(Prop.forAll(Gen.listOf(ptGen), Gen.oneOf(2000.0, 20000.0, 100000.0)) {
      (raw, radius) =>
        val pts = raw.zipWithIndex.map { case ((la, lo), i) => (i.toLong, la, lo) }
        pts.isEmpty || {
          val expect = (for {
            (a, la, oa) <- pts; (b, lb, ob) <- pts
            if a < b
            if haversineRef(la, oa, lb, ob) <= radius
          } yield (a, b)).toSet
          val got = Geo.haversineNeighborPairs(
            pts.toDF("id", "lat", "lon"), "id", "lat", "lon", radius)
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          got.toSet == expect && got.length == expect.size
        }
    }, n = 15)
  }

  test("haversineNeighborPairs fails loudly when |lat| exceeds the recall band") {
    import spark.implicits._
    // a 70°N point under the default 66° band would silently lose pairs
    // (lon cells sized from cos(66) under-cover at cos(70)) — the inline
    // raise_error must surface the violation instead
    val pts = Seq((1L, 70.0, 18.9), (2L, 70.0005, 18.905)).toDF("id", "lat", "lon")
    val e = intercept[Exception] {
      Geo.haversineNeighborPairs(pts, "id", "lat", "lon", 1200.0).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("recall bound")), messages(e).mkString("; "))
    // same points pass once the declared band covers them
    assert(Geo.haversineNeighborPairs(pts, "id", "lat", "lon", 1200.0,
      maxAbsLatDeg = 71.0).count() == 1)
  }

  test("qGeoTrajectoryHaversine (fixed-point mm) matches a plain-Scala " +
      "great-circle fold within the declared mm grain") {
    val ev = Tables.events(spark, sf).select(col("user_id"), col("ts"),
        col("event_id"),
        (Geo.derivedCoord(col("event_id"), "#lat", 1000000L) / 1e6).as("lat"),
        (Geo.derivedCoord(col("event_id"), "#lon", 1000000L) / 1e6).as("lon"))
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2)),
        r.getDouble(3), r.getDouble(4)))
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val steps = rows.sortBy(_._2).sliding(2).collect {
        case Array((_, _, la1, lo1), (_, _, la2, lo2)) =>
          haversineRef(la1, lo1, la2, lo2)
      }.toSeq
      u -> (steps.size.toLong, steps.sum, if (steps.isEmpty) 0.0 else steps.max)
    }
    val got = Geo.qGeoTrajectoryHaversine(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) 0L else r.getLong(3)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (u, (n, totalM, mxM)) =>
      val (gn, gtotalMm, gmxMm) = got(u)
      assert(gn == n, s"user $u moves")
      // each step is mm-truncated, so the sum undershoots by < n mm; the
      // fixed-point-vs-true divergence adds < 1 µm per step on the patch
      assert(math.abs(gtotalMm / 1000.0 - totalM) <=
        0.001 * (n + 1) + 1e-6 * math.max(1.0, totalM), s"user $u total")
      assert(math.abs(gmxMm / 1000.0 - mxM) <=
        0.002 + 1e-6 * math.max(1.0, mxM), s"user $u max")
    }
  }

  test("qGeoNeighborsHaversine (fixed-point mm) agrees with the float " +
      "library surface: identical pair set, distances within 2 mm") {
    val exact = Geo.qGeoNeighborsHaversine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val float = Geo.haversineNeighborPairs(
        Tables.customer(spark, sf).select(col("c_custkey"),
          (Geo.derivedCoord(col("c_custkey"), "#lat", 1000000L) / 1e6)
            .as("lat"),
          (Geo.derivedCoord(col("c_custkey"), "#lon", 1000000L) / 1e6)
            .as("lon")),
        "c_custkey", "lat", "lon", 1200.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.keySet == float.keySet)
    exact.foreach { case (pair, mm) =>
      assert(math.abs(mm / 1000.0 - float(pair)) <= 0.002,
        s"$pair: fixed-point ${mm}mm vs float ${float(pair)}m")
    }
  }

  test("runsConsecutive property: reconstructs any random trace exactly") {
    import spark.implicits._
    val evGen = Gen.listOf(for {
      u <- Gen.chooseNum(1L, 3L); t <- Gen.oneOf("A", "B", "C")
    } yield (u, t))
    check(Prop.forAll(evGen) { raw =>
      val rows = raw.zipWithIndex.map { case ((u, t), i) =>
        (u, t, new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong)
      }
      rows.isEmpty || {
        val got = Behavior.runsConsecutive(
          rows.toDF("user_id", "event_type", "ts", "event_id"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
            r.getLong(4))).toSeq.sortBy(r => (r._1, r._4))
        // brute force: fold each user's time-ordered trace into runs
        val expect = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
          val ordered = es.sortBy(_._4)
          ordered.foldLeft(Vector.empty[(Long, String, Long, Long, Long)]) {
            case (acc, (_, t, _, id)) =>
              if (acc.nonEmpty && acc.last._2 == t) {
                val l = acc.last
                acc.init :+ ((u, t, l._3 + 1, l._4, id))
              } else acc :+ ((u, t, 1L, id, id))
          }
        }.sortBy(r => (r._1, r._4))
        got == expect
      }
    }, n = 20)
  }

  test("concurrencySweep: closed-open overlap, day clipping, touching intervals") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      // day 1: first two 5-min intervals overlap, third is alone,
      // fourth is clipped at midnight and overlaps nothing
      (1L, t("2024-01-01 00:00:00")),
      (2L, t("2024-01-01 00:01:00")),
      (3L, t("2024-01-01 00:10:00")),
      (4L, t("2024-01-01 23:58:00")),
      // day 2: an interval starting exactly where another ends does NOT
      // overlap it (closed-open semantics)
      (5L, t("2024-01-02 08:00:00")),
      (6L, t("2024-01-02 08:05:00"))
    ).toDF("event_id", "ts")
    val got = TimeSeries.concurrencySweep(df, holdSeconds = 300).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("2024-01-01") == ((2L, 4L)))
    assert(got("2024-01-02") == ((1L, 2L)))
  }

  test("skipgramPairs counts (w, c, k) pairs within distance 2") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b"),
      (3L, "x")).toDF("doc_id", "text")
    val got = TextQueries.skipgramPairs(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(("a", "b", 1)) == ((2L, 2L)))
    assert(got(("b", "c", 1)) == ((1L, 1L)))
    assert(got(("a", "c", 2)) == ((1L, 1L)))
    // single-token doc contributes nothing; no pair invented beyond k=2
    assert(got.size == 3)
  }

  test("labelCentroids equals an exact plain-Scala integer fold") {
    val vecs = Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    // independent recomputation: half-up milli-quantize then exact sums
    val expect = vecs
      .flatMap { case (l, v) => v.zipWithIndex.map { case (x, i) =>
        ((l, i), math.floor(x.toDouble * 1000.0 + 0.5).toLong) } }
      .groupBy(_._1)
      .map { case (k, xs) => k -> ((xs.map(_._2).sum, xs.length.toLong)) }
    val got = graft.operators.Quantize
      .labelCentroids(Tables.embeddings(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size == expect.size)
    expect.foreach { case (k, (s, n)) =>
      val (gs, gn, gm) = got(k)
      assert(gs == s && gn == n, s"label/dim $k")
      assert(gm == s.toDouble / n.toDouble, s"mean at $k")
    }
  }

  test("kAnonymityAudit flags exactly the small or uniform-source groups") {
    import spark.implicits._
    // group (en, bucket 0): 5 docs over 2 sources → releasable.
    // group (en, bucket 1): 5 docs, single source → k ok, l fails.
    // group (de, bucket 0): 2 docs over 2 sources → l ok, k fails.
    val docs = (
      (1 to 5).map(i => (i.toLong, "en", if (i <= 2) "web" else "books", 50L)) ++
      (6 to 10).map(i => (i.toLong, "en", "web", 250L)) ++
      Seq((11L, "de", "web", 10L), (12L, "de", "books", 20L))
    ).toDF("doc_id", "lang", "source", "n_chars")
    val got = graft.operators.Privacy.kAnonymityAudit(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6)))).toMap
    assert(got(("en", 0L)) == ((5L, 2L, true, true, true)))
    assert(got(("en", 1L)) == ((5L, 1L, true, false, false)))
    assert(got(("de", 0L)) == ((2L, 2L, false, true, false)))
  }

  test("qProfileTable matches plain-Scala profile of orders") {
    val rows = Tables(spark, sf, "orders")
      .select("o_custkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice", "o_orderdate").collect()
    val p = MiscQueries.qProfileTable(spark, sf).collect().head
    assert(p.getLong(0) == rows.length.toLong)
    assert(p.getLong(1) == rows.count(!_.isNullAt(0)).toLong)
    assert(p.getLong(2) ==
      rows.filter(!_.isNullAt(0)).map(_.getLong(0)).distinct.length.toLong)
    assert(p.getLong(3) == rows.map(_.getString(1)).distinct.length.toLong)
    assert(p.getLong(4) == rows.map(_.getString(2)).distinct.length.toLong)
    assert(p.getDouble(5) == rows.map(_.getDouble(3)).min)
    assert(p.getDouble(6) == rows.map(_.getDouble(3)).max)
  }

  test("qDriftSnapshot matches a plain-Scala share-shift computation, incl. PSI") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val groups = docs.groupBy(d => (d._2, d._3)).view.mapValues { ds =>
      (ds.count(_._1 % 2 == 0).toLong, ds.count(_._1 % 2 == 1).toLong)
    }.toMap
    val totalA = groups.values.map(_._1).sum
    val totalB = groups.values.map(_._2).sum
    val got = MiscQueries.qDriftSnapshot(spark, sf).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getBoolean(7))
    }.toMap
    assert(got.keySet == groups.keySet)
    groups.foreach { case (k, (na, nb)) =>
      val (gna, gnb, pa, pb, dpm, drifted) = got(k)
      assert((gna, gnb) == ((na, nb)), s"counts at $k")
      assert(pa == na * 1000 / totalA && pb == nb * 1000 / totalB, s"pm at $k")
      assert(dpm == math.abs(pa - pb) && drifted == (dpm >= 20), s"delta at $k")
    }
    // the PSI the integer report feeds (kept off the oracle per the float
    // policy): sum over cells of (pA - pB)·ln(pA/pB) with per-mille
    // smoothing, non-negative and zero iff the two mixes are identical
    def share(n: Long, t: Long): Double = math.max(n.toDouble / t, 1e-3)
    val psi = groups.values.map { case (na, nb) =>
      val (pa, pb) = (share(na, totalA), share(nb, totalB))
      (pa - pb) * math.log(pa / pb)
    }.sum
    assert(psi >= 0.0)
    val psiSelf = groups.values.map { case (na, _) =>
      val p = share(na, totalA); (p - p) * math.log(p / p)
    }.sum
    assert(psiSelf == 0.0)
  }

  test("autocorr matches a plain-Scala exact ACF on the fixture series") {
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val n = daily.length.toLong
    val s = daily.sum
    val c = daily.map(x => n * x - s) // exact integer residuals
    val den = c.map(v => v * v).sum
    def r(k: Int) =
      c.drop(k).zip(c.dropRight(k)).map { case (a, b) => a * b }.sum
        .toDouble / den.toDouble
    val got = TimeSeries.autocorr(Tables.events(spark, sf), Seq(1, 7))
      .collect().map(row => row.getInt(0) -> row.getDouble(2)).toMap
    assert(got(1) == r(1) && got(7) == r(7))
    // lag-1 persistence on a smooth daily series should be positive
    assert(got.values.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("forgetManifest: cascade counts equal per-customer brute force") {
    val m = graft.operators.Privacy.forgetManifest(
      Tables.customer(spark, sf), Tables.orders(spark, sf),
      Tables.lineitem(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.nonEmpty)
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val liByOrder = Tables.lineitem(spark, sf).groupBy("l_orderkey")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCust = orders.groupBy(_._2)
    m.foreach { case (cust, nOrd, nLi) =>
      val os = byCust.getOrElse(cust, Array.empty)
      assert(nOrd == os.length.toLong, s"cust $cust orders")
      assert(nLi == os.map(o => liByOrder.getOrElse(o._1, 0L)).sum,
        s"cust $cust lineitems")
    }
  }

  test("negativeSample: k draws per doc, never self, join-verified") {
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val rows = graft.operators.CorpusPipeline
      .negativeSample(docs, negsPerDoc = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == nDocs * 4) // every draw resolved by the join
    assert(rows.forall { case (a, _, b) => a != b })
    assert(rows.forall { case (_, _, b) => b >= 0 && b < nDocs })
    // deterministic: a second evaluation draws the identical partners
    val again = graft.operators.CorpusPipeline
      .negativeSample(docs, negsPerDoc = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.sorted.sameElements(again.sorted))
    // degenerate corpora: no partner exists → clean empty result, not a
    // modulo-by-zero (ADVICE r8)
    for (n <- Seq(0, 1)) {
      val tiny = graft.operators.CorpusPipeline
        .negativeSample(docs.limit(n), negsPerDoc = 4)
      assert(tiny.count() == 0, s"n=$n")
      assert(tiny.columns.toSeq ==
        Seq("doc_id", "k", "neg_id", "hard"), s"n=$n schema")
    }
  }

  test("sortedNeighborhoodLinks: subset of block pairs, symmetric-free, " +
      "distance-correct") {
    import spark.implicits._
    val recs = Seq(
      (1L, "alpha", 0), (2L, "alphb", 0), (3L, "alphc", 0),
      (4L, "zeta", 0), (5L, "beta", 1), (6L, "betb", 1))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val got = graft.operators.Linkage
      .sortedNeighborhoodLinks(recs, "c_nationkey", "c_name", "c_custkey",
        width = 3, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    // within block 0: alpha~alphb~alphc all at dist 1-2; zeta too far
    // within block 1: beta~betb at dist 1; no cross-block pairs
    assert(got == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1), (5L, 6L, 1)))
  }
}
