package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DataDietOps

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
