package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainMixOps

/** Round-13 training-mix/ranking operators: brute-force Scala references
  * for the exact queries, property pins for the no-oracle NDCG fold
  * (SURVEY.md §5.2 item 2). */
class TrainMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q_eval_mrr matches a brute-force in-JVM reference") {
    val events = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val perUser = events.groupBy(_._1).map { case (u, rows) =>
      val ranked = rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3))
        .zipWithIndex.map { case (r, i) => (i + 1, r._4 == "purchase") }
      val firstRel = ranked.collectFirst { case (rk, true) => rk }
      (u,
        firstRel.filter(_ <= 10).map(2520L / _).getOrElse(0L),
        ranked.count { case (rk, rel) => rel && rk <= 5 }.toLong,
        ranked.count { case (rk, rel) => rel && rk <= 10 }.toLong,
        ranked.count(_._2).toLong)
    }
    val want = perUser.groupBy(_._1 % 10).map { case (b, us) =>
      b -> (us.size.toLong, us.map(_._2).sum, us.map(_._3).sum,
        us.map(_._4).sum, us.map(_._5).sum)
    }
    val got = TrainMixOps.qEvalMrr(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == want)
  }

  test("q_mix_budget: exact proportional-with-cap allocation, never over budget") {
    val perCell = Tables.documents(spark, sf)
      .select("lang", "source", "n_chars").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val total = BigInt(perCell.values.sum)
    val want = perCell.map { case ((l, s), tok) =>
      (l, s) -> (tok, ((BigInt(2000000) * tok) / total).min(BigInt(400000)).toLong)
    }
    val got = TrainMixOps.qMixBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    // cap + budget invariants on the emitted allocation
    assert(got.values.forall(_._2 <= 400000L))
    assert(got.values.map(_._2).sum <= 2000000L)
  }

  private def writeEvents(rows: Seq[Row]): String = {
    val dir = java.nio.file.Files.createTempDirectory("trainmix").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Tables.eventsSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ev(id: Long, sec: Int, user: Long, typ: String): Row =
    Row(id, Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"), user, typ,
      1.0, "{}")

  test("q_eval_ndcg: perfect ranking scores exactly 1e6 ppm; bounds hold") {
    // user 1: all three events relevant (perfect ranking — DCG == IDCG by
    // shared fold); user 2: purchase last of three (worst); user 3: no
    // purchases (must be excluded)
    val dir = writeEvents(Seq(
      ev(1, 1, 1L, "purchase"), ev(2, 2, 1L, "purchase"),
      ev(3, 3, 1L, "purchase"),
      ev(4, 1, 2L, "view"), ev(5, 2, 2L, "click"), ev(6, 3, 2L, "purchase"),
      ev(7, 1, 3L, "view")))
    val got = TrainMixOps.qEvalNdcg(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(1L, 2L), s"user 3 must be excluded: $got")
    assert(got(1L) == ((1L, 1000000L)),
      s"perfect ranking must be exactly 1e6 ppm: ${got(1L)}")
    val (n2, ppm2) = got(2L)
    assert(n2 == 1L && ppm2 > 0L && ppm2 < 1000000L,
      s"imperfect ranking must land strictly inside (0, 1e6): $ppm2")
  }

  test("q_eval_ndcg: deterministic across runs and bounded on the fixture") {
    val a = TrainMixOps.qEvalNdcg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = TrainMixOps.qEvalNdcg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b), "ndcg ppm must be run-to-run stable")
    a.foreach { case (bucket, n, sumPpm) =>
      assert(sumPpm > 0L && sumPpm <= 1000000L * n,
        s"bucket $bucket: sum ppm $sumPpm outside (0, 1e6 * $n]")
    }
  }

  test("q_dedup_prefix: survivors are distinct prefixes; dups counted") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).take(40)))
    val want = docs.groupBy(_._2)
      .map { case (_, v) => (v.map(_._1).min, v.size.toLong) }.toSet
    val got = TrainMixOps.qDedupPrefix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }
}
