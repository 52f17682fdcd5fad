package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.operators.Salting

/** Library API surface: typed Datasets, SQL-registered custom functions,
  * salting utilities. */
class ApiSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("TypedTables: typed groupByKey agg equals the untyped plan") {
    import spark.implicits._
    val typed = TypedTables.lineitem(spark, sf)
      .groupByKey(l => (l.l_returnflag, l.l_linestatus))
      .mapGroups((key: (String, String), rows: Iterator[TypedTables.Lineitem]) =>
        (key._1, key._2, rows.length.toLong))
      .collect().map { case (rf, ls, n) => ((rf, ls), n) }.toMap
    val untyped = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(typed == untyped)
  }

  test("GraftFunctions: cosine_f / parse_delay / weighted_mean usable from SQL") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("api_emb")
    val c = spark.sql(
      """SELECT cosine_f(a.embedding, a.embedding) AS c FROM api_emb a
         WHERE a.vec_id = 0""").collect()(0).getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12) // self-cosine

    assert(spark.sql("SELECT parse_delay('5 min') AS s").collect()(0).getInt(0) == 300)

    val wm = spark.sql(
      "SELECT weighted_mean(CAST(2.0 AS DOUBLE), CAST(10.0 AS DOUBLE)) AS m")
      .collect()(0).getDecimal(0)
    assert(wm.compareTo(new java.math.BigDecimal("10")) == 0)
  }

  test("CosineSimFloat codegen equals interpreted eval") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    val got = df.select(graft.functions.VectorFunctions.cosineF(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    def ref(a: Array[Float], b: Array[Float]) = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    assert(math.abs(got(0) - ref(Array(1f, 2f, 3f), Array(3f, 2f, 1f))) < 1e-12)
    assert(math.abs(got(1) - 0.0) < 1e-12)
    // null propagation
    val withNull = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.cosineF(col("a"), col("b")))
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("GraftExtensions injects cosine_f into a fresh session via config") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // ensure the shared context exists
    // getOrCreate returns the active session as-is, so detach it first;
    // the new session reuses the same SparkContext with extensions applied
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val c = s2.sql(
        """SELECT cosine_f(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""")
        .collect()(0).getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("PinnedDimBroadcast: nation/region joins broadcast with stats off") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      def bhjCount(df: org.apache.spark.sql.DataFrame): Int = {
        val p = df.queryExecution.executedPlan
        val expanded = p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        (p +: expanded).flatMap(_.collect {
          case b: BroadcastHashJoinExec => b
        }).size
      }
      // unhinted customer ⋈ nation: the rule pins the broadcast even
      // though the stats path is disabled
      val joined = Tables.customer(s2, TestSpark.sf)
        .join(Tables.nation(s2, TestSpark.sf),
          col("c_nationkey") === col("n_nationkey"))
      assert(bhjCount(joined) == 1)
      // a dim-only subtree (nation ⋈ region) above the scans still pins
      val chain = Tables.customer(s2, TestSpark.sf)
        .join(Tables.nation(s2, TestSpark.sf)
          .join(Tables.region(s2, TestSpark.sf),
            col("n_regionkey") === col("r_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
      assert(bhjCount(chain) == 2)
      // results are unchanged by the pin
      assert(joined.count() == Tables.customer(s2, TestSpark.sf).count())
      // a fact⋈fact join is untouched (no pinned side): zero BHJ
      val facts = Tables.orders(s2, TestSpark.sf)
        .join(Tables.customer(s2, TestSpark.sf),
          col("o_custkey") === col("c_custkey"))
      assert(bhjCount(facts) == 0)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("saltedJoin equals plain join; saltedCount equals plain count") {
    import spark.implicits._
    val facts = Seq.tabulate(1000)(i => (i % 7L, i)).toDF("key", "v")
    val dim = Seq((0L, "a"), (1L, "b"), (6L, "g")).toDF("key", "name")
    val plain = facts.join(dim, Seq("key")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = Salting.saltedJoin(facts, dim, "key", n = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
    val counts = Salting.saltedCount(facts, col("key"), n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts == facts.groupBy("key").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap)
  }

  test("AQE splits the skewed side of a sort-merge join at runtime") {
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec}
    // one key carries ~90% of a 60k-row fact side; thresholds lowered so
    // the skew machinery engages at fixture scale
    val prior = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val facts = Seq.tabulate(60000)(i =>
        (if (i % 10 < 9) 7L else i % 64L, s"payload-$i-${"x" * 40}"))
        .toDF("key", "payload").repartition(8)
      val other = Seq.tabulate(60000)(i => (i % 64L, i)).toDF("key", "w")
        .repartition(8)
      // assert on the EXECUTED query (AQE decisions exist only after a
      // run); aggregate over the payload so the wide column flows through
      // the shuffle — count(1) alone prunes the fact side down to a
      // column of identical keys, which compresses below any skew
      // threshold
      val agg = facts.join(other, Seq("key"))
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
      val cnt = agg.collect()(0).getLong(0)
      // exact row count: each fact row matches its key's multiplicity
      val perKey = (0L until 64L).map(k => k ->
        (0 until 60000).count(i => i.toLong % 64L == k).toLong).toMap
      val expected = (0 until 60000).map(i =>
        perKey(if (i % 10 < 9) 7L else i % 64L)).sum
      assert(cnt == expected)
      val finalPlan = agg.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // query stages are leaf nodes — collect() does not descend into
      // them, so recurse through QueryStageExec.plan explicitly
      def skewReads(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[AQEShuffleReadExec] =
        p.collect {
          case r: AQEShuffleReadExec if r.hasSkewedPartition => Seq(r)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            skewReads(q.plan)
        }.flatten
      assert(skewReads(finalPlan).nonEmpty,
        s"expected a skew-split AQE shuffle read in:\n$finalPlan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    import spark.implicits._
    // InjectRuntimeFilter plants a bloom_filter_agg over the filtered
    // dim's join keys and a might_contain probe above the fact scan —
    // the optimizer-level semi-join reduction that keeps a 100 TB fact
    // scan from shuffling rows a selective dimension will drop anyway.
    // Thresholds lowered so injection engages at fixture scale.
    val prior = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "50MB")
      // shuffle join: bloom injection targets non-broadcast joins
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = Tables.lineitem(spark, TestSpark.sf)
        .select("l_orderkey", "l_quantity")
      val dim = Tables.orders(spark, TestSpark.sf)
        .filter(col("o_orderpriority") === "1-URGENT") // selective creation side
        .select("o_orderkey")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom probe in:\n$optimized")
      // and the probe must not change the result
      val plainN = {
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        fact.join(dim, col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1))).collect()(0).getLong(0)
      }
      assert(joined.collect()(0).getLong(0) == plainN)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salting on a hot-key fixture: equal results AND spread partitions") {
    import spark.implicits._
    val n = 8
    // 60% of all rows carry one hot key — the fixture AQE can't fix when
    // the first aggregation stage itself is the skew point
    val facts = Seq.tabulate(5000)(i =>
      (if (i % 5 < 3) 42L else i % 50L, i)).toDF("key", "v")
      .repartition(8) // multiple input partitions feed the salt formula
    val dim = (0L until 50L).map(k => (k, s"name$k")).toDF("key", "name")
    val plain = facts.join(dim, Seq("key")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = Salting.saltedJoin(facts, dim, "key", n)
    assert(salted.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet == plain)
    // the skew-spreading property itself: after salting, the hot key's
    // rows split across all n sub-keys, no sub-key holding more than ~2/n
    val saltShares = facts.withColumn("_salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(n.toLong))
          .cast("int"))
      .filter(col("key") === 42L)
      .groupBy("_salt").count().collect().map(r => r.getLong(1))
    val hotRows = saltShares.sum
    assert(saltShares.length == n, s"hot key only hit ${saltShares.length} salts")
    assert(saltShares.max.toDouble / hotRows <= 2.0 / n,
      s"max salt share ${saltShares.max} of $hotRows exceeds 2/$n")
    // alias + semi/anti acceptance (salt-safe), outer rejection
    // non-hot fact keys are i%50 for i%5 in {3,4} → keys ≡ 3,4 (mod 5)
    val semi = Salting.saltedJoin(facts, dim.filter(col("key") < 10), "key",
      n, "left_semi").collect().map(_.getLong(0)).toSet
    assert(semi == Set(3L, 4L, 8L, 9L))
    val anti = Salting.saltedJoin(facts, dim, "key", n, "leftanti").count()
    assert(anti == 0L)
    Salting.saltedJoin(facts, dim, "key", n, "leftouter") // alias accepted
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(facts, dim, "key", n, "full_outer")
    }
  }
}
