package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.ParseDelay
import graft.operators.DedupQueries

/** Edge-case and property tests (SURVEY.md §5.2 items 2–3). ScalaCheck is
  * driven directly (no scalatestplus bridge in the offline cache). */
class EdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("ParseDelay unit cases") {
    assert(ParseDelay.parse("5 min").contains(300))
    assert(ParseDelay.parse("2 h").contains(7200))
    assert(ParseDelay.parse("30 s").contains(30))
    assert(ParseDelay.parse("-5 min").contains(-300))
    assert(ParseDelay.parse(" 7 min ").contains(420))
    assert(ParseDelay.parse("garbage").isEmpty)
    assert(ParseDelay.parse("5 days").isEmpty)
    assert(ParseDelay.parse("").isEmpty)
  }

  test("ParseDelay round-trips any generated duration string") {
    val units = Map("s" -> 1, "min" -> 60, "h" -> 3600)
    check(Prop.forAll(Gen.chooseNum(-10000, 10000),
      Gen.oneOf(units.keys.toSeq)) { (n: Int, unit: String) =>
      ParseDelay.parse(s"$n $unit").contains(n * units(unit))
    }, n = 100)
  }

  test("session_window boundary: gap == 30 min merges, gap > 30 min splits") {
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    def plus(sec: Long) = new Timestamp(t0.getTime + sec * 1000)
    // Spark merges TOUCHING session windows: an event at exactly
    // prev + gap extends the session; only a strictly larger gap splits.
    // (This pins the `>` vs `>=` choice in the q_window_session oracle.)
    val df = Seq(
      (1L, t0), (1L, plus(1800)), (1L, plus(1800 + 1801)),
      (2L, t0), (2L, plus(1801))).toDF("user_id", "ts")
    val sessions = df.groupBy(session_window(col("ts"), "30 minutes"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // u1: [0, 30:00] merged (touching), then 60:01 splits → 2 + 1
    // u2: gap 30:01 > 30:00 → two sessions of 1
    assert(sessions == Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L)))
  }

  test("sliding window equals union of two offset tumbling bucketings") {
    val ev = Tables.events(spark, TestSpark.sf)
    val sliding = ev.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .count()
      .select(col("window.start").as("wstart"), col("count"))
    val b30 = ev.select(window(col("ts"), "30 minutes")("start").as("b"))
    val manual = b30.select(explode(array(col("b"),
        col("b") - expr("INTERVAL 30 MINUTES"))).as("wstart"))
      .groupBy("wstart").count()
    val l = sliding.collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq.sorted
    val r = manual.collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq.sorted
    assert(l == r)
  }

  test("exact dedup is idempotent and keeps the lowest doc_id") {
    val docs = Seq(
      (3L, "b b"), (1L, "a"), (2L, "a"), (5L, "b b"), (9L, "c")).toDF("doc_id", "text")
    def dedup(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("text").orderBy("doc_id")
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    }
    val once = dedup(docs)
    val twice = dedup(once)
    assert(once.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L, 9L))
    assert(twice.collect().toSet == once.collect().toSet)
  }

  test("prefix-filtered ngramPairs equals brute force on random corpora") {
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val corpusGen = Gen.listOfN(8,
      Gen.nonEmptyListOf(Gen.oneOf(vocab)).map(_.mkString(" ")))
    check(Prop.forAll(corpusGen) { texts: List[String] =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = DedupQueries.ngramPairs(docs, 7, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.toLowerCase.split(" ").toSet
      }
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        inter = (sa & sb).size; uni = (sa | sb).size
        if inter * 10 >= uni * 7
      } yield (ia, ib)).toSet
      got == want
    }, n = 8)
  }

  test("ngramPairs general (large-vocab) path equals brute force too") {
    // 70-token vocabulary forces the array path (bitmask needs ≤ 62)
    val vocab = (0 until 70).map(i => f"w$i%02d").toVector
    val corpusGen = Gen.listOfN(6,
      Gen.chooseNum(1, 12).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" "))))
    check(Prop.forAll(corpusGen) { texts: List[String] =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = DedupQueries.ngramPairs(docs, 5, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.toLowerCase.split(" ").toSet
      }
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        inter = (sa & sb).size; uni = (sa | sb).size
        if inter * 10 >= uni * 5
      } yield (ia, ib)).toSet
      got == want
    }, n = 5)
  }

  test("simhashPairs (pigeonhole banding) equals brute-force hamming search") {
    val sims = DedupQueries.qDedupSimhash(spark, TestSpark.sf)
    val collected = sims.collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxHamming = 3
    val want = (for {
      (ia, ha) <- collected; (ib, hb) <- collected if ia < ib
      if java.lang.Long.bitCount(ha ^ hb) <= maxHamming
    } yield (ia, ib)).toSet
    val got = DedupQueries.simhashPairs(sims, maxHamming).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture should contain simhash near-dups")
  }

  test("train/val/test split is deterministic and roughly 80/10/10") {
    import graft.operators.CorpusPipeline
    val a = CorpusPipeline.qTrainSplit(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val b = CorpusPipeline.qTrainSplit(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq == b.toSeq) // stable across runs
    val frac = a.groupBy(_._2).view.mapValues(_.length.toDouble / a.length).toMap
    assert(math.abs(frac("train") - 0.8) < 0.06, frac.toString)
    assert(math.abs(frac("val") - 0.1) < 0.05, frac.toString)
    assert(math.abs(frac("test") - 0.1) < 0.05, frac.toString)
  }

  test("Dedup facade: byDigest equals exact-on-text; embedding brute == lsh-verified subset") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, TestSpark.sf)
    val byText = Dedup.exact(docs, Seq("text"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byDigest = Dedup.byDigest(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byText == byDigest) // no sha-256 collisions on the fixture
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val brute = Dedup.nearEmbeddingPairs(emb, "vec_id", "embedding",
      minCosine = 0.45, dim = 64, lsh = false).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.nearEmbeddingPairs(emb, "vec_id", "embedding",
      minCosine = 0.45, dim = 64, lsh = true, nbits = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
  }

  test("corpus curation invariants: gates hold, no surviving near-dups, idempotent-ish") {
    import graft.operators.CorpusPipeline
    val docs = Tables.documents(spark, TestSpark.sf)
    val curated = CorpusPipeline.qCorpusCurate(spark, TestSpark.sf)
    val rows = curated.collect()
    assert(rows.nonEmpty && rows.length < docs.count())
    // quality gates hold for every survivor
    assert(rows.forall(r => r.getInt(1) >= 15 && r.getInt(2) * 100 <= r.getInt(1) * 40))
    // no surviving pair is a near-dup at the threshold
    val ids = rows.map(_.getLong(0)).toSet
    val pairs = DedupQueries.ngramPairs(docs, 9, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => !(ids(a) && ids(b)) })
  }

  test("minhash bands: identical token sets share all band keys") {
    val docs = Seq(
      (1L, "x y z"), (2L, "z y x x"), (3L, "p q r")).toDF("doc_id", "text")
    val bands = DedupQueries.minhashBands(docs, bands = 4, rows = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    (0 until 4).foreach { b =>
      assert(bands((1L, b)) == bands((2L, b))) // same token set
      assert(bands((1L, b)) != bands((3L, b))) // disjoint token set
    }
  }

  test("setContractedLabels equals the uncontracted pair-graph labels") {
    // random word-soup corpora over a tiny vocab maximize identical sets,
    // reordered sets, and cross-set near-dups — the contraction's cases
    val vocab = Vector("a", "b", "c", "d")
    val corpusGen = Gen.listOfN(10,
      Gen.nonEmptyListOf(Gen.oneOf(vocab)).map(_.mkString(" ")))
    check(Prop.forAll(corpusGen) { texts: List[String] =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val want = graft.operators.Clustering.componentLabels(
        DedupQueries.ngramPairs(docs, 7, 10))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = graft.operators.Clustering.setContractedLabels(docs, 7, 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want
    }, n = 8)
  }

  test("Artifacts.clearAll: cached artifacts rebuild identically") {
    val before = DedupQueries.qDedupMinhashPairs(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    graft.operators.Artifacts.clearAll()
    val after = DedupQueries.qDedupMinhashPairs(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(before == after && before.nonEmpty)
  }

  test("componentLabelsStar equals componentLabels on random graphs and chains") {
    // the adversarial case for plain propagation: one long path
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val chainGot = graft.operators.Clustering.componentLabelsStar(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chainGot == (0L until 40L).map(_ -> 0L).toMap)
    val edgeGen = Gen.listOf(for {
      a <- Gen.chooseNum(0L, 14L); b <- Gen.chooseNum(0L, 14L)
      if a != b
    } yield (math.min(a, b), math.max(a, b)))
    check(Prop.forAll(edgeGen) { edges: List[(Long, Long)] =>
      edges.isEmpty || {
        val df = edges.toDF("doc_a", "doc_b")
        val star = graft.operators.Clustering.componentLabelsStar(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val prop = graft.operators.Clustering.componentLabels(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        star == prop
      }
    }, n = 6)
  }

  test("componentLabels throws (never silently truncates) when maxIter is too small") {
    // a 12-node path cannot converge in 2 doubled-hop rounds: the loop
    // must fail loudly — a silently returned partial labeling would let
    // near-duplicates through curation as separate 'clusters'
    val chain = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      graft.operators.Clustering.componentLabels(chain, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("not converged"))
    // the same graph converges under the default budget
    val ok = graft.operators.Clustering.componentLabels(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == (0L until 12L).map(_ -> 0L).toMap)
  }

  test("componentLabels: chains, shared neighbors, separate components") {
    // chain 1-2-3 (min label must travel 2 hops), shared-neighbor
    // 10-12 / 11-12 (the case where greedy drop-higher over-drops),
    // isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (10L, 12L), (11L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val got = graft.operators.Clustering.componentLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("componentLabels equals brute-force union-find on random graphs") {
    val edgeGen = Gen.listOf(for {
      a <- Gen.chooseNum(0L, 14L); b <- Gen.chooseNum(0L, 14L)
      if a != b
    } yield (math.min(a, b), math.max(a, b)))
    check(Prop.forAll(edgeGen) { edges: List[(Long, Long)] =>
      edges.isEmpty || {
        val df = edges.toDF("doc_a", "doc_b")
        val got = graft.operators.Clustering.componentLabels(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // brute force: repeated relabel until fixpoint
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        var lbl = nodes.map(n => n -> n).toMap
        var changed = true
        while (changed) {
          changed = false
          edges.foreach { case (a, b) =>
            val m = math.min(lbl(a), lbl(b))
            if (lbl(a) != m || lbl(b) != m) {
              lbl = lbl + (a -> m) + (b -> m); changed = true
            }
          }
        }
        got == lbl
      }
    }, n = 15)
  }

  test("lateral top-k: under-full and empty groups behave like inner join") {
    // nation 0 has 3 customers (top-2 kept), nation 1 has one (1 row),
    // nation 2 has none (dropped entirely — inner LATERAL, not outer)
    Seq((0, "A"), (1, "B"), (2, "C")).toDF("n_nationkey", "n_name")
      .createOrReplaceTempView("lat_nation")
    Seq((10L, 0, 5.0), (11L, 0, 9.0), (12L, 0, 9.0), (20L, 1, 1.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .createOrReplaceTempView("lat_customer")
    val got = spark.sql(
      """SELECT n.n_name, t.c_custkey
        |FROM lat_nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM lat_customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    // tie at 9.0 breaks to the lower custkey 11, then 12
    assert(got == Seq(("A", 11L), ("A", 12L), ("B", 20L)))
  }

  test("bitmap distinct equals count_distinct across bucket boundaries") {
    // user ids straddle several 32768-wide bitmap buckets and repeat
    val ids = Seq(1L, 1L, 5L, 32767L, 32768L, 32769L, 70000L, 70000L,
      1000000L, 999999L, 1000000L)
    ids.map(("x", _)).toDF("event_type", "user_id")
      .createOrReplaceTempView("bm_events")
    val bm = spark.sql(
      """SELECT event_type, CAST(SUM(bitmap_count(b)) AS BIGINT) AS n_users
        |FROM (SELECT event_type,
        |             bitmap_bucket_number(user_id) AS bkt,
        |             bitmap_construct_agg(bitmap_bit_position(user_id)) AS b
        |      FROM bm_events
        |      GROUP BY event_type, bitmap_bucket_number(user_id))
        |GROUP BY event_type""".stripMargin)
      .collect().map(r => r.getLong(1)).head
    assert(bm == ids.distinct.size.toLong)
  }

  test("window nth: single-event partitions yield NULL second_type") {
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    def plus(sec: Long) = new Timestamp(t0.getTime + sec * 1000)
    val df = Seq((1L, t0, 100L, "view"), (1L, plus(60), 101L, "click"),
      (2L, t0, 102L, "signup")).toDF("user_id", "ts", "event_id", "event_type")
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val full = ord.rowsBetween(Long.MinValue, Long.MaxValue)
    val got = df.select(col("user_id"),
        row_number().over(ord).as("rn"),
        first(col("event_type")).over(full).as("f"),
        last(col("event_type")).over(full).as("l"),
        nth_value(col("event_type"), 2).over(full).as("s"))
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3),
        Option(r.getString(4)))).toSeq.sortBy(_._1)
    assert(got == Seq((1L, "view", "click", Some("click")),
      (2L, "signup", "signup", None)))
  }
}
