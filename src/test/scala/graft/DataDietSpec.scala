package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DataDietOps, Privacy, StatsOps}

/** Round-13 data-diet operators: brute-force in-JVM references for each
  * exact query (SURVEY.md §5.2 item 2) plus the funnel-monotonicity and
  * budget invariants that must hold at any corpus size. */
class DataDietSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def norm(t: String): String =
    t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  test("q_dedup_norm matches a brute-force normalized grouping") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), norm(r.getString(1))))
    val want = docs.groupBy(_._2)
      .map { case (_, v) => (v.map(_._1).min, v.size.toLong) }.toSet
    val got = DataDietOps.qDedupNorm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("q_dedup_norm collapses case/punctuation variants that exact dedup keeps") {
    val exactGroups = Tables.documents(spark, sf)
      .select("text").distinct().count()
    val normGroups = DataDietOps.qDedupNorm(spark, sf).count()
    assert(normGroups <= exactGroups, "normalization can only merge groups")
  }

  test("q_dedup_soft: weights are exact reciprocals; every doc appears once") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = docs.map { case (id, t) =>
      (id, counts(t), 1000000L / counts(t))
    }.toSet
    val got = DataDietOps.qDedupSoft(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.size == docs.length, "one weighted row per document")
  }

  test("q_filter_cascade: funnel is monotone non-increasing from corpus size") {
    val rows = DataDietOps.qFilterCascade(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.keySet == (0 to 5).toSet)
    assert(rows(0) == Tables.documents(spark, sf).count())
    (1 to 5).foreach { k =>
      assert(rows(k) <= rows(k - 1),
        s"stage $k grew the funnel: ${rows(k)} > ${rows(k - 1)}")
    }
    assert(rows(5) > 0L, "cascade must not annihilate the fixture corpus")
  }

  test("q_epoch_schedule: equal shares, epoch cap, and deficit accounting") {
    val perSource = Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val share = 10000000L / perSource.size
    val got = DataDietOps.qEpochSchedule(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.keySet == perSource.keySet)
    got.foreach { case (src, (tok, sh, epochs, consumed, deficit)) =>
      assert(tok == perSource(src))
      assert(sh == share)
      assert(epochs == math.min(4L, (share + tok - 1) / tok))
      assert(consumed == math.min(share, 4L * tok))
      assert(deficit == math.max(0L, share - 4L * tok))
      assert(consumed + deficit == math.max(share, consumed),
        s"$src: consumed+deficit must reconstruct the share when capped")
    }
  }

  test("q_privacy_dpcount: noise bounded by the truncated support; counts shift deterministically") {
    val truth = Tables.documents(spark, sf)
      .select("lang").collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = StableRuns(2)(
      Privacy.qPrivacyDpCount(spark, sf).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(got.keySet == truth.keySet)
    got.foreach { case (lang, noisy) =>
      val k = noisy - truth(lang)
      assert(k >= -8L && k <= 8L,
        s"$lang: noise $k outside the truncated geometric support")
    }
    // the draw must not be constant across languages on this fixture
    assert(got.map { case (l, n) => n - truth(l) }.toSet.size > 1,
      "all languages drew identical noise — seed device is suspect")
  }

  /** Runs `body` n times and asserts the results identical (rerun
    * stability is part of the DP release contract here). */
  private object StableRuns {
    def apply[A](n: Int)(body: => A): A = {
      val runs = Seq.fill(n)(body)
      assert(runs.distinct.size == 1, "release must be rerun-stable")
      runs.head
    }
  }

  test("q_eval_kappa matches a BigInt brute-force on the fixture") {
    val per = Tables.events(spark, sf)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
      .groupBy(_._1).map { case (u, rows) =>
        (u, rows.count(_._2 == "purchase") >= 14, rows.map(_._3).sum >= 330000L)
      }
    val want = per.groupBy(_._1 % 10).map { case (bkt, us) =>
      val n = BigInt(us.size)
      val n11 = BigInt(us.count(t => t._2 && t._3))
      val n10 = BigInt(us.count(t => t._2 && !t._3))
      val n01 = BigInt(us.count(t => !t._2 && t._3))
      val n00 = BigInt(us.count(t => !t._2 && !t._3))
      val pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
      val den = n * n - pe
      val kappa = if (den > 0)
        Some(((BigInt(1000000) * (n * (n11 + n00) - pe)) / den).toLong)
      else None
      bkt -> (n.toLong, n11.toLong, n10.toLong, n01.toLong, n00.toLong, kappa)
    }
    val got = StatsOps.qEvalKappa(spark, sf).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))
    }.toMap
    assert(got == want)
    // the fixture must actually exercise the statistic (non-trivial
    // agreement table in at least one bucket)
    assert(got.values.exists(_._6.exists(k => k != 0L)),
      "kappa is 0/NULL everywhere — labelers degenerate on fixture")
  }

  test("q_curriculum_buckets matches a brute-force phase assignment") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars", "text").collect()
      .map { r =>
        val words = r.getString(3).split(" ", -1).length.toLong
        val difficulty = (1000L * r.getLong(2)) / words
        val phase =
          if (difficulty < 4500L) 1 else if (difficulty < 5500L) 2 else 3
        (phase, r.getString(1), r.getLong(0), r.getLong(2))
      }
    val want = docs.groupBy(t => (t._1, t._2)).map { case ((p, l), v) =>
      (p, l, v.size.toLong, v.map(_._4).sum, v.map(_._3).min, v.map(_._3).max)
    }.toSet
    val got = DataDietOps.qCurriculumBuckets(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
  }
}
