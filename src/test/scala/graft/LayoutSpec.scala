package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IncrementalDedup, Layout}

/** Z-order layout + Bloom-prefiltered incremental dedup: the two round-6
  * scale mechanisms whose guarantees are equalities (curve = reference
  * interleave; bloom path = plain path) rather than oracle rows. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Plain-Scala Morton reference. */
  private def mortonRef(x: Long, y: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < 16) {
      acc += ((x >> i) & 1L) << (2 * i)
      acc += ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    acc
  }

  test("morton16 matches the bit-interleave reference on corner and random cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 2L), (21845L, 43690L)) ++
      Seq.fill(50)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val out = cases.toDF("zx", "zy")
      .withColumn("zkey", Layout.morton16("zx", "zy"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y), s"morton($x,$y)")
    }
    // interleave identities: morton(x,0) spreads x's bits to even positions,
    // morton(0,y) to odd; the two halves are disjoint and sum to morton(x,y)
    out.foreach { case (x, y, z) =>
      assert((mortonRef(x, 0) & mortonRef(0, y)) == 0L)
      assert(mortonRef(x, 0) + mortonRef(0, y) == z)
    }
  }

  test("morton16 runs inside whole-stage codegen and equals the HOF form") {
    // spark.range (not a literal local table, which constant-folds to a
    // LocalTableScan with no codegen stage at all)
    val df = spark.range(200)
      .selectExpr("(id * 31) % 65536 AS zx", "(id * 17) % 65536 AS zy")
    val native = df.withColumn("zkey", Layout.morton16("zx", "zy"))
    // the native expression inlines into a WholeStageCodegen span
    val plan = native.queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, plan.toString)
    val hof = df.withColumn("zkey", expr(
      """aggregate(sequence(0, 15), CAST(0 AS BIGINT),
         (acc, i) -> acc
           + shiftleft(CAST(shiftright(zx, i) & 1 AS BIGINT), 2 * i)
           + shiftleft(CAST(shiftright(zy, i) & 1 AS BIGINT), 2 * i + 1))"""))
    assert(native.collect().map(_.getLong(2)).toSeq ==
      hof.collect().map(_.getLong(2)).toSeq)
  }

  test("zorderBy clusters both dimensions into fewer distinct files than a 1-D sort") {
    import spark.implicits._
    // 32×32 grid of points; lay out in 16 curve segments vs 16 x-sorted
    // segments, then measure how many segments a y-band filter touches:
    // the Z-curve keeps y-locality a lexicographic x-sort throws away.
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("zx", "zy")
    val z = Layout.zorderBy(grid, "zx", "zy", numPartitions = 16)
      .withColumn("seg", spark_partition_id())
    val xs = grid.repartitionByRange(16, col("zx"), col("zy"))
      .withColumn("seg", spark_partition_id())
    def segsTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("zy") < 4).select("seg").distinct().count()
    val zTouched = segsTouched(z)
    val xTouched = segsTouched(xs)
    assert(zTouched < xTouched,
      s"z-curve segments touched $zTouched must beat 1-D sort's $xTouched")
  }

  test("zonemap: per-zone bounds cover exactly the rows on that curve segment") {
    // independent recompute from the raw fixture rows: quantize, interleave
    // in plain Scala, bucket by zkey >> 6, take exact count/min/max
    val rows = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), hour(col("ts")).as("zy")).collect()
      .map(r => (((r.getLong(0) % 65536L) + 65536L) % 65536L, r.getInt(1)))
    def interleave(x: Long, y: Long): Long =
      (0 until 16).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val expect = rows
      .map { case (zx, zy) => (interleave(zx, zy.toLong) >> 6, zx, zy) }
      .groupBy(_._1)
      .map { case (z, xs) => z -> ((xs.length.toLong,
        xs.map(_._2).min, xs.map(_._2).max,
        xs.map(_._3).min, xs.map(_._3).max)) }
    val got = Layout.qLayoutZonemap(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5)))).toMap
    assert(got == expect)
  }

  test("newDocsBloom returns exactly newDocs' survivors") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val state = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val stateDigests = IncrementalDedup.digestsOf(state)
    val stateBands = IncrementalDedup.bandsOf(state).select("band", "band_key")
    val plain = IncrementalDedup.newDocs(batch, stateDigests, stateBands)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomed = IncrementalDedup.newDocsBloom(batch, stateDigests, stateBands,
        expectedItems = 1000L, fpp = 0.01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("newDocsBloomStatePruned returns exactly newDocs' survivors") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val state = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val stateDigests = IncrementalDedup.digestsOf(state)
    val stateBands = IncrementalDedup.bandsOf(state).select("band", "band_key")
    val plain = IncrementalDedup.newDocs(batch, stateDigests, stateBands)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pruned = IncrementalDedup.newDocsBloomStatePruned(
        batch.withColumn("digest", sha2(col("text"), 256)),
        stateDigests, stateBands, expectedItems = 1000L, fpp = 0.01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("newDocsBloomBucketed returns exactly newDocs' survivors across buckets") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val state = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val stateDigests = IncrementalDedup.digestsOf(state)
    val stateBands = IncrementalDedup.bandsOf(state).select("band", "band_key")
    val plain = IncrementalDedup.newDocs(batch, stateDigests, stateBands)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // nBuckets small enough that every bucket holds many state digests
    // AND large enough that the fixture provably spans several buckets
    val bucketed = IncrementalDedup.newDocsBloomBucketed(batch, stateDigests,
        stateBands, nBuckets = 8, expectedItemsPerBucket = 200L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bucketed == plain)
    assert(plain.nonEmpty)
    val distinctBuckets = stateDigests
      .select(pmod(xxhash64(col("digest")), lit(8L)).as("b"))
      .distinct().count()
    assert(distinctBuckets > 1, "fixture must span several buckets")
    // the driver fan-out is BOUNDED: past MaxBloomBuckets the regime
    // refuses loudly (collecting one bitmap per bucket + one plan branch
    // per bucket does not scale past the documented driver budget)
    assert(IncrementalDedup.MaxBloomBuckets == 256)
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.newDocsBloomBucketed(batch, stateDigests,
        stateBands, nBuckets = IncrementalDedup.MaxBloomBuckets + 1)
    }
    assert(e.getMessage.contains("MaxBloomBuckets"))
    // and at exactly the cap it still constructs (plan-build only — no
    // need to execute a 256-branch union in the unit tier)
    IncrementalDedup.newDocsBloomBucketed(batch, stateDigests,
      stateBands, nBuckets = IncrementalDedup.MaxBloomBuckets,
      expectedItemsPerBucket = 10L)
  }

  /** Total shuffle-write bytes across all jobs triggered by `f`. */
  private def shuffleBytes(f: => Unit): Long = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val acc = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) acc.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      f
      org.apache.spark.graftx.ListenerBridge.drain(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    acc.get()
  }

  test("state-pruned Bloom cuts exact-phase shuffle bytes in the no-broadcast regime") {
    // the regime the operator exists for: state too big to broadcast, so
    // the exact anti-join sort-merges and BOTH sides shuffle. The Bloom
    // built over the batch prunes the state side map-side BEFORE its
    // exchange; on the parity fixture (no exact dups across the split)
    // that collapses the state side to ~fpp of its rows.
    val docs = Tables.documents(spark, TestSpark.sf)
    val digested = IncrementalDedup.docDigests(docs)
    val batch = digested.filter(col("doc_id") % 2 === 1)
    val state = digested.filter(col("doc_id") % 2 === 0).select("digest")
    val bloom = graft.functions.Bloom.build(batch, col("digest"), 1000L, 0.01)
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plainBytes = shuffleBytes {
        batch.join(state, Seq("digest"), "left_anti").count(); ()
      }
      val prunedBytes = shuffleBytes {
        batch.join(
          state.filter(coalesce(
            graft.functions.Bloom.mightContain(bloom, col("digest")),
            lit(false))),
          Seq("digest"), "left_anti").count(); ()
      }
      assert(plainBytes > 0)
      assert(prunedBytes < plainBytes * 7 / 10,
        s"pruned $prunedBytes vs plain $plainBytes: the state side should " +
          "shrink to ~fpp of its rows before the exchange")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
  }

  test("Bloom helper: empty build is null; probes find every inserted key at ~fpp noise") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("digest")
    assert(graft.functions.Bloom.build(empty, col("digest"), 10L, 0.01) == null)
    val keys = (0 until 2000).map(i => s"key-$i")
    val bf = graft.functions.Bloom.build(keys.toDF("digest"), col("digest"),
      2000L, 0.01)
    // no false negatives, by construction
    val inserted = keys.toDF("digest")
      .filter(graft.functions.Bloom.mightContain(bf, col("digest")))
    assert(inserted.count() == 2000)
    // false-positive rate on a disjoint probe set stays near fpp
    val absent = (0 until 2000).map(i => s"other-$i").toDF("digest")
      .filter(graft.functions.Bloom.mightContain(bf, col("digest")))
    assert(absent.count() <= 2000 * 5 / 100, s"fp=${absent.count()}")
  }

  test("Bloom.build sized past Spark's session caps succeeds via ensureCapacity") {
    import spark.implicits._
    // default caps: maxNumItems 4M, maxNumBits 64Mbit — a 10M-item/1%
    // request exceeds both and fails analysis with a bare 'requirement
    // failed' unless build() raises the caps first
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (items0, bits0) = (spark.conf.get(itemsKey), spark.conf.get(bitsKey))
    try {
      val keys = (0 until 100).map(i => s"big-$i")
      val bf = graft.functions.Bloom.build(keys.toDF("digest"),
        col("digest"), expectedItems = 10000000L, fpp = 0.01)
      assert(bf != null)
      assert(spark.conf.get(itemsKey).toLong >= 10000000L)
      assert(spark.conf.get(bitsKey).toLong >=
        graft.functions.Bloom.optimalNumBits(10000000L, 0.01))
      val found = keys.toDF("digest")
        .filter(graft.functions.Bloom.mightContain(bf, col("digest")))
      assert(found.count() == 100)
    } finally {
      spark.conf.set(itemsKey, items0); spark.conf.set(bitsKey, bits0)
    }
  }

  test("bloom pre-filter lets most non-dup digests skip the anti-join") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val state = IncrementalDedup.digestsOf(docs.filter(col("doc_id") % 2 === 0))
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .withColumn("digest", sha2(col("text"), 256))
    val bloom = state.stat.bloomFilter("digest", 1000L, 0.01)
    val n = batch.count().toDouble
    val positives = batch.collect()
      .count(r => bloom.mightContainString(r.getAs[String]("digest")))
    // the fixture has no exact dups across the parity split, so nearly the
    // whole batch should be bloom-negative (≤ a few % false positives)
    assert(positives / n < 0.05, s"bloom positives $positives of $n")
  }

  test("bucketed tables join with zero exchanges and identical results") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val orders = Tables.orders(spark, TestSpark.sf)
    val customer = Tables.customer(spark, TestSpark.sf)
    Layout.writeBucketed(orders, "bkt_orders", "o_custkey", 4)
    Layout.writeBucketed(customer, "bkt_customer", "c_custkey", 4)
    val priorBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_custkey"))
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect {
        case e: ShuffleExchangeExec => e
        case a: AdaptiveSparkPlanExec =>
          a.executedPlan.collect { case e: ShuffleExchangeExec => e }
      }
      assert(shuffles.isEmpty,
        s"bucketed join must plan no exchange:\n$plan")
      val expected = orders.join(customer,
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_custkey"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == expected && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }

  test("compact merges a many-small-file table, preserving row content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .toString + "/events"
    // strew the table across many tiny files
    Tables.events(spark, TestSpark.sf).repartition(32)
      .write.parquet(dir)
    val before = Tables.events(spark, TestSpark.sf).count()
    val (nBefore, nAfter) =
      graft.operators.Layout.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(nBefore >= 32 && nAfter == 1, s"$nBefore -> $nAfter")
    // re-split to a byte target that needs several files: ceil division
    val total = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val (_, nAfter2) =
      graft.operators.Layout.compact(spark, dir, targetBytes = total / 3)
    assert(nAfter2 == 3 || nAfter2 == 4, // ceil(total/(total/3)) ∈ {3,4}
      s"expected 3-4 files at a third-of-total byte target, got $nAfter2")
    val after = spark.read.parquet(dir)
    assert(after.count() == before)
    // content identical (sorted by the unique event_id)
    val a = after.select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Tables.events(spark, TestSpark.sf)
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("compact recovers a crash between its two swap renames") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-crash")
      .toString + "/events"
    Tables.events(spark, TestSpark.sf).repartition(4).write.parquet(dir)
    val rows = spark.read.parquet(dir).count()
    // simulate the crash window: table renamed to backup, second rename
    // never happened — no live directory at `dir`
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__precompact")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    // rerun must restore the backup (not delete it) and then compact
    val (_, nAfter) =
      graft.operators.Layout.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(nAfter == 1)
    assert(spark.read.parquet(dir).count() == rows,
      "every row must survive crash recovery + compaction")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__precompact")))
  }

  test("shard packing equals the one-pass streaming reference exactly") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .selectExpr("doc_id", "octet_length(text) AS bytes").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val kinds = Map(0L -> "image", 1L -> "audio", 2L -> "video")
    val assigned = docs.groupBy(t => kinds(t._1 % 3)).toSeq.flatMap {
      case (k, g) =>
        var cum = 0L
        g.sortBy(_._1).toSeq.map { case (id, b) =>
          val shard = cum / 16384; cum += b; (k, shard, id, b)
        }
    }
    val expect = assigned.groupBy(t => (t._1, t._2)).map {
      case ((k, sh), items) =>
        (k, sh) -> ((items.size.toLong, items.map(_._4).sum,
          items.map(_._3).min, items.map(_._3).max))
    }
    val got = graft.operators.Layout.qMultimodalShard(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect)
    // manifest covers the corpus: per-kind item counts add up
    assert(got.values.map(_._1).sum == docs.length)
  }
}
