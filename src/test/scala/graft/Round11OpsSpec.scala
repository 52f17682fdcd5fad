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
}
