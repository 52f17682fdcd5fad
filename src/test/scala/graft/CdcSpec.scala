package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Cdc, FuzzyDedup, Outliers, Quantize, TimeSeries}

/** Round-6 operators: CDC merge/upsert (both physical strategies), SCD2
  * history, int8 embedding quantization, IQR outlier filtering,
  * forward-fill, fuzzy vocabulary dedup. */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("mergeUpsert: latest version wins, ties break toward delta") {
    import spark.implicits._
    val base = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 5)).toDF("k", "v", "version")
    val delta = Seq((2L, "B", 2), (3L, "C", 5), (4L, "D", 2)).toDF("k", "v", "version")
    val out = Cdc.mergeUpsert(base, delta, Seq("k"), "version")
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    // k=3: same version both sides → delta row wins (deterministic tie-break)
    assert(out == Seq((1L, "a", 1), (2L, "B", 2), (3L, "C", 5), (4L, "D", 2)))
  }

  test("window and broadcast merge strategies agree on randomized batches") {
    import spark.implicits._
    val rnd = new scala.util.Random(6)
    for (_ <- 1 to 5) {
      val baseKeys = (0L until 200L).filter(_ => rnd.nextDouble() < 0.8)
      val deltaKeys = (0L until 250L).filter(_ => rnd.nextDouble() < 0.3)
      val base = baseKeys.map(k => (k, s"b$k", 1)).toDF("k", "v", "version")
      val delta = deltaKeys.map(k => (k, s"d$k", 2)).toDF("k", "v", "version")
      val a = Cdc.mergeUpsert(base, delta, Seq("k"), "version")
        .as[(Long, String, Int)].collect().toSet
      val b = Cdc.mergeUpsertSmallDelta(base, delta, Seq("k"))
        .as[(Long, String, Int)].collect().toSet
      assert(a == b)
      assert(a.map(_._1) == (baseKeys ++ deltaKeys).toSet)
    }
  }

  test("broadcast merge plan shuffles neither side of the base append") {
    val base = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    val delta = base.filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    val plan = Cdc.mergeUpsertSmallDelta(base, delta, Seq("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"anti-join must broadcast the delta keys:\n$plan")
  }

  test("quantize: codes in [-127,127], dequantization error within one step") {
    import spark.implicits._
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .withColumn("scale", Quantize.vecScale(col("embedding")))
      .withColumn("q", Quantize.quantize(col("embedding"), col("scale")))
      .as[(Long, Array[Float], Double, Array[Int])].collect()
    assert(rows.nonEmpty)
    for ((_, emb, scale, q) <- rows) {
      assert(q.length == emb.length)
      assert(q.forall(c => c >= -127 && c <= 127))
      val step = scale / 127.0
      for (i <- emb.indices)
        assert(math.abs(q(i) * step - emb(i)) <= step * 0.5 + 1e-9,
          s"code ${q(i)} too far from ${emb(i)} (step $step)")
    }
  }

  test("scd2History: intervals tile each key's timeline, one current row") {
    val h = Cdc.scd2History(Tables.events(spark, sf), Seq("user_id"), "ts",
      Seq("event_id"))
      .select("user_id", "event_id", "valid_from", "valid_to", "is_current")
      .collect()
      .groupBy(_.getLong(0))
    assert(h.nonEmpty)
    for ((_, rows) <- h) {
      val sorted = rows.sortBy(r =>
        (r.getTimestamp(2).getTime, r.getLong(1)))
      // exactly the last row is current
      assert(sorted.count(_.getBoolean(4)) == 1)
      assert(sorted.last.getBoolean(4) && sorted.last.isNullAt(3))
      // each valid_to equals the successor's valid_from
      for (Array(a, b) <- sorted.sliding(2) if sorted.length > 1)
        assert(a.getTimestamp(3) == b.getTimestamp(2))
    }
  }

  test("fillForward equals a per-key ordered scan carrying the last value") {
    val out = TimeSeries.fillForward(
      Tables.events(spark, sf)
        .withColumn("reading", when(col("event_id") % 3 === 0, col("value"))),
      Seq("user_id"), "ts", Seq("event_id"), "reading")
      .select("user_id", "ts", "event_id", "reading", "reading_filled")
      .collect()
    val byUser = out.groupBy(_.getLong(0))
    for ((_, rows) <- byUser) {
      var carried: Option[Double] = None
      for (r <- rows.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))) {
        if (!r.isNullAt(3)) carried = Some(r.getDouble(3))
        carried match {
          case Some(v) => assert(!r.isNullAt(4) && r.getDouble(4) == v)
          case None    => assert(r.isNullAt(4))
        }
      }
    }
  }

  test("fuzzyPairs matches brute force and the length band is lossless") {
    val names = Tables.part(spark, sf).select("p_name").distinct()
      .collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 2
    } yield (a, b, lev(a, b))).toSet
    val got = FuzzyDedup.fuzzyPairs(Tables.part(spark, sf), "p_name", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == brute)
    assert(brute.nonEmpty)
  }

  test("mergeUpsert on random multi-version batches equals a plain-Scala reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 5) {
      // both sides may carry SEVERAL versions of the same key
      def batch(): Seq[(Long, String, Int)] =
        Seq.fill(300)((rnd.nextInt(40).toLong,
          s"v${rnd.nextInt(1000)}", rnd.nextInt(5)))
      val base = batch(); val delta = batch()
      val got = Cdc.mergeUpsert(base.toDF("k", "v", "version"),
          delta.toDF("k", "v", "version"), Seq("k"), "version")
        .as[(Long, String, Int)].collect().toSet
      // reference: per key, max version wins; delta beats base on ties;
      // within (key, version, side) the surviving row is whichever the
      // window picked — compare on (key, version, side) identity
      val ref = (base.map(r => (r, 0)) ++ delta.map(r => (r, 1)))
        .groupBy(_._1._1)
        .map { case (_, rows) => rows.maxBy { case ((_, _, ver), src) => (ver, src) } }
        .map { case ((k, _, ver), src) => (k, ver, src) }.toSet
      assert(got.size == ref.size)
      val gotKeyVer = got.map { case (k, v, ver) =>
        (k, ver, if (delta.contains((k, v, ver))) 1 else 0) }
      assert(gotKeyVer == ref)
    }
  }

  test("edge cases: empty delta, empty chunk input, zero-vector quantize") {
    import spark.implicits._
    // empty delta → merge returns the base unchanged (both strategies)
    val base = Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "v", "version")
    val empty = Seq.empty[(Long, String, Int)].toDF("k", "v", "version")
    assert(Cdc.mergeUpsert(base, empty, Seq("k"), "version")
      .as[(Long, String, Int)].collect().toSet ==
      Set((1L, "a", 1), (2L, "b", 1)))
    assert(Cdc.mergeUpsertSmallDelta(base, empty, Seq("k"))
      .as[(Long, String, Int)].collect().toSet ==
      Set((1L, "a", 1), (2L, "b", 1)))
    // empty corpus → no chunks, no crash
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.CurationOps.chunkOverlap(noDocs, 20, 15)
      .count() == 0)
    // all-zero embedding: the 1e-30 scale guard keeps the division
    // finite and every code 0
    val z = Seq((0L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
      .withColumn("scale", Quantize.vecScale(col("embedding")))
      .withColumn("q", Quantize.quantize(col("embedding"), col("scale")))
      .select("q").as[Array[Int]].collect()(0)
    assert(z.toSeq == Seq(0, 0, 0))
    // fuzzy pairs on an empty vocabulary
    assert(FuzzyDedup.fuzzyPairs(noDocs.select(col("text")), "text", 2)
      .count() == 0)
  }

  test("IQR filter keeps exactly the rows inside its own bounds") {
    val ev = Tables.events(spark, sf).select("event_id", "event_type", "value")
    val bounds = Outliers.iqrBounds(ev, "event_type", "value")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(bounds.values.forall { case (lo, hi) => lo <= hi })
    val kept = Outliers.filterOutliers(ev, "event_type", "value")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val expected = ev.collect()
      .filter(r => !r.isNullAt(2) && {
        val (lo, hi) = bounds(r.getString(1))
        r.getDouble(2) >= lo && r.getDouble(2) <= hi
      })
      .map(_.getLong(0)).toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size < ev.count())
  }

  test("rollupMaintain: state + delta equals full recompute for ANY split") {
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sf)
      .withColumn("day", to_date(col("ts")))
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    def full = ev.groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec2)).cast(dec2).as("s"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getLong(2), r.getDecimal(3))).toSet
    // four batch boundaries: two interleaved splits plus BOTH
    // degenerate edges — empty state (everything arrives in the delta)
    // and empty delta (state passes through untouched)
    val splits = Seq(
      "mod2" -> (col("event_id") % 2 === 0),
      "mod3" -> (col("event_id") % 3 === 0),
      "empty-state" -> lit(true),
      "empty-delta" -> lit(false))
    for ((name, inDelta) <- splits) {
      val state = ev.filter(!inDelta)
        .groupBy("day", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec2)).cast(dec2).as("s"))
      val delta = ev.filter(inDelta)
      val got = Cdc.rollupMaintain(state, delta, Seq("day", "event_type"))
        .collect().map(r => (r.getDate(0).toString, r.getString(1),
          r.getLong(2), r.getDecimal(3))).toSet
      assert(got == full, s"split=$name")
    }
  }
}
