package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrendOps

/** Plain-Scala recomputation of the trend family (each query is also
  * DuckDB-oracle-pinned). */
class TrendOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val daily: Map[String, Seq[(String, Long)]] =
    Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap

  test("8-tap dyadic EWMA renormalizes over present taps exactly") {
    val got = TrendOps.qTsEwma(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(3))
      .toMap
    daily.foreach { case (et, series) =>
      series.indices.foreach { i =>
        val taps = (0 to 7).flatMap { k =>
          if (i - k >= 0) Some((series(i - k)._2, 1L << (7 - k))) else None
        }
        val num = taps.map { case (x, w) => BigInt(x) * w }.sum * 1000000
        val den = taps.map(_._2).sum
        assert(got((et, series(i)._1)) == (num / den).toLong)
      }
    }
  }

  test("rolling z flags exactly the days with (nx-S)^2 > 4(nQ-S^2)") {
    val got = TrendOps.qTsAnomaly(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    var flagged = 0
    daily.foreach { case (et, series) =>
      series.indices.foreach { i =>
        val win = series.slice(math.max(0, i - 14), i + 1).map(_._2)
        val n = win.length
        if (n >= 8) {
          val s = win.map(BigInt(_)).sum
          val q = win.map(x => BigInt(x) * x).sum
          val c = BigInt(n) * series(i)._2 - s
          val expect = c * c > 4 * (BigInt(n) * q - s * s)
          val (gn, gf) = got((et, series(i)._1))
          assert(gn == n && gf == expect)
          if (expect) flagged += 1
        } else assert(!got.contains((et, series(i)._1)))
      }
    }
    assert(flagged > 0, "fixture should produce at least one anomaly")
  }

  test("seasonal residuals sum to ~0 per hour and carry both signs") {
    val rows = TrendOps.qTsSeasonal(spark, sf).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      val d = g.length
      val s = g.map(_._2).sum
      g.foreach { case (_, x, resid) =>
        // BigInt / truncates toward zero — exactly Spark's `div`
        assert(resid == ((BigInt(x) * d - s) * 1000000 / d).toLong)
      }
      // mean-centered: residual total is bounded by rounding slack (< d ppm)
      assert(g.map(t => BigInt(t._3)).sum.abs < d * 1000000L)
    }
    assert(rows.exists(_._3 > 0) && rows.exists(_._3 < 0))
  }
}
