package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Approximate-nearest-neighbor search over embedding columns
  * (north-star "similarity search").
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    O(n) dot products, no shuffle until the final TakeOrdered(k).
  *  - [[lshCandidates]]/[[lshTopK]]: random-hyperplane sign-bit LSH.
  *    Hyperplanes are derived deterministically from a hash of
  *    (bit, dimension) — no RNG, so results are reproducible run-to-run
  *    and testable. At 100 TB the corpus is bucketed once (a narrow
  *    int key), queries probe their own bucket ± hamming-1 neighbors, and
  *    only candidates are re-ranked exactly: O(n/2^bits · probes) per
  *    query instead of O(n).
  */
object Similarity {

  /** Cosine similarity between two array<float> columns — the native
    * codegen'd expression (graft.functions.CosineSimFloat): fused
    * dot+norms loop, bit-identical to the HOF/plain-Scala forms
    * (index-ascending accumulation). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineF(a, b)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))

  /** Deterministic pseudo-uniform hyperplane component in [-1, 1) for
    * (bit, dim), via a splitmix64-style integer mix — public-domain
    * constant mixing, no RNG state. */
  private[operators] def planeComponent(bit: Int, dim: Int): Double = {
    var z = bit.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble) // in (-1, 1)
  }

  def hyperplanes(nbits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nbits, dim)(planeComponent)

  /** Sign-bit bucket id (0 .. 2^nbits−1) of an embedding column. */
  def bucketOf(emb: Column, nbits: Int, dim: Int): Column = {
    val planes = hyperplanes(nbits, dim)
    val bits = (0 until nbits).map { b =>
      val plane = array(planes(b).map(lit): _*)
      val dot = aggregate(zip_with(emb, plane,
        (x, h) => x.cast(DoubleType) * h), lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1 << b)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Exact cosine top-k of `corpus` (idCol, embCol) against a single query
    * vector. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    corpus
      .withColumn("cosine", cosine(col(embCol), q))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Corpus rows in the query's bucket or any bucket within hamming
    * distance `probeRadius` (multi-probe). Radius is the recall/scan
    * knob AFTER nbits is fixed by corpus size: probes grow as
    * Σ C(nbits, r) while each adds a near-boundary bucket — at nbits=8,
    * radius 2 scans ~14% for recall hamming-1 can't reach (RecallReport
    * prints the measured trade-off). */
  def lshCandidates(corpus: DataFrame, embCol: String, query: Array[Float],
      nbits: Int, probeRadius: Int = 1): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 2, "radius 0-2 supported")
    val dim = query.length
    val planes = hyperplanes(nbits, dim)
    val qBucket = (0 until nbits).map { b =>
      val dot = planes(b).zip(query).map { case (h, x) => h * x.toDouble }.sum
      if (dot > 0) 1 << b else 0
    }.sum
    val h1 = (0 until nbits).map(b => qBucket ^ (1 << b))
    val h2 = for (b1 <- 0 until nbits; b2 <- b1 + 1 until nbits)
      yield qBucket ^ (1 << b1) ^ (1 << b2)
    val probes = probeRadius match {
      case 0 => Seq(qBucket)
      case 1 => qBucket +: h1
      case _ => (qBucket +: h1) ++ h2
    }
    corpus
      .withColumn("bucket", bucketOf(col(embCol), nbits, dim))
      .filter(col("bucket").isin(probes: _*))
  }

  /** LSH-bucketed top-k: probe → exact re-rank of candidates only. */
  def lshTopK(corpus: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int, nbits: Int,
      probeRadius: Int = 1): DataFrame = {
    val q = array(query.map(lit): _*)
    lshCandidates(corpus, embCol, query, nbits, probeRadius)
      .withColumn("cosine", cosine(col(embCol), q))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** All-pairs near-duplicate candidates via sign-bit LSH bucketing: pairs
    * are generated only within a bucket or between hamming-1-adjacent
    * buckets, then exactly verified against the cosine threshold. The
    * 100 TB path for embedding dedup (DESIGN.md §2): the self-join key is
    * a small int bucket id, never the full corpus cross product. Recall
    * is probabilistic (tested against brute force); raise nbits with
    * corpus size to keep per-bucket counts flat. */
  def lshNearDupPairs(corpus: DataFrame, idCol: String, embCol: String,
      minCosine: Double, nbits: Int, dim: Int): DataFrame = {
    val bucketed = corpus
      .withColumn("bucket", bucketOf(col(embCol), nbits, dim))
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("bucket"))
    // probe pairs: same bucket, or buckets differing in exactly bit b —
    // emit each row also under its hamming-1 neighbors with b set
    val withProbes = bucketed.withColumn("probe",
      explode(array((lit(-1) +: (0 until nbits).map(lit)): _*)))
      .withColumn("pbucket",
        when(col("probe") < 0, col("bucket"))
          .otherwise(expr("int(bucket) ^ shiftleft(1, probe)")))
    val a = bucketed.select(col("id").as("id_a"), col("emb").as("emb_a"),
      col("bucket").as("pbucket"))
    a.join(withProbes.select(col("id").as("id_b"), col("emb").as("emb_b"),
        col("pbucket")), Seq("pbucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .distinct() // a pair can match via both its own bucket and a probe
  }

  /** Integer-quantized hyperplane components: [[planeComponent]] scaled to
    * milli-units and rounded. A quantized hyperplane is still a (slightly
    * perturbed) random hyperplane, so sign-bit LSH over these planes keeps
    * its locality property — and every bucket id becomes a pure function
    * of integer arithmetic, reproducible bit-for-bit in any engine. */
  def quantizedPlanes(nplanes: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(nplanes, dim)((b, d) => math.round(planeComponent(b, d) * 1000))

  /** Scale-safe embedding near-dup pairs with an EXACT oracle — the
    * declared-query twin of [[lshNearDupPairs]] (float recall path).
    *
    * Everything is integer arithmetic end-to-end, so the result
    * hash-matches a DuckDB oracle that recomputes the same buckets:
    *  1. quantize embeddings to milli-units via the shared
    *     [[graft.functions.VectorFunctions.milliQuant]] kernel — the
    *     explicit double cast inside it is what keeps both engines on
    *     the same product (a float product CAN land on .5 where the
    *     double product doesn't: 0.3195f — DESIGN.md §7);
    *  2. `tables` independent LSH tables of `nbits` sign bits each, signs
    *     taken from integer dot products against [[quantizedPlanes]];
    *  3. candidates = pairs whose buckets agree within hamming ≤ 1 in ANY
    *     table (side b is exploded under its own bucket + nbits one-bit
    *     probes; within a table each pair meets at most once);
    *  4. exact integer verification: dot > 0 and dot²·10⁴ ≥ cosSq1e4·‖a‖²·‖b‖²
    *     (⇔ cosine ≥ √(cosSq1e4)/100), in DECIMAL(38,0) — dot² can pass
    *     int64 for non-unit vectors (oracle uses HUGEINT for the same).
    *
    * 100 TB design: the only join is an equality join on (table, bucket) —
    * a narrow int key, never an all-pairs cross product. Multi-table OR-ing
    * (union of 2×4-bit tables, ~0.8 recall at cos 0.45 on the fixture)
    * buys recall the way MinHash banding does; raise nbits with corpus
    * size to hold per-bucket counts flat, add tables to hold recall. The
    * final distinct dedups the ≤`tables` copies of a verified pair. */
  def lshNearDupPairsQ(corpus: DataFrame, idCol: String, embCol: String,
      tables: Int, nbits: Int, dim: Int, cosSq1e4: Long): DataFrame =
    lshNearDupPairsQUnsorted(corpus, idCol, embCol, tables, nbits, dim,
      cosSq1e4).orderBy("id_a", "id_b")

  /** [[lshNearDupPairsQ]] without the presentation sort — the artifact
    * form (an eagerly-materialized sort re-runs the upstream plan for its
    * range-bound sampling; declared queries sort on top instead). */
  /** (id, qv, nrm2, tbl, bucket) — the milli-quantized, sign-bucketed
    * form of an embedding frame, one row per (vector, table): the narrow
    * shape the self-join dedup scans and the cross-snapshot ingest state
    * table stores. All `tables` bucket ids are computed in one projection
    * then exploded — each row's plane dots run once (codegen'd
    * LongVecDot), not per probe. */
  def quantBucketed(df: DataFrame, idCol: String, embCol: String,
      tables: Int, nbits: Int, dim: Int): DataFrame = {
    import graft.functions.VectorFunctions.dotL
    val planes = quantizedPlanes(tables * nbits, dim)
    val quant = graft.functions.VectorFunctions.milliQuant(col(embCol))
    val base = df.select(col(idCol).as("id"), quant.as("qv"))
      .withColumn("nrm2", dotL(col("qv"), col("qv")))
    val tb = (0 until tables).map { t =>
      val bits = (0 until nbits).map { j =>
        val plane = array(planes(t * nbits + j).map(lit): _*)
        when(dotL(col("qv"), plane) > 0, lit(1 << j)).otherwise(lit(0))
      }
      struct(lit(t).as("tbl"), bits.reduce(_ + _).as("bucket"))
    }
    base.withColumn("tb", explode(array(tb: _*)))
      .select(col("id"), col("qv"), col("nrm2"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  private def lshNearDupPairsQUnsorted(corpus: DataFrame, idCol: String,
      embCol: String, tables: Int, nbits: Int, dim: Int,
      cosSq1e4: Long): DataFrame = {
    import graft.functions.VectorFunctions.dotL
    val bucketed = quantBucketed(corpus, idCol, embCol, tables, nbits, dim)
    val withProbes = bucketed.withColumn("probe",
        explode(array((lit(-1) +: (0 until nbits).map(lit)): _*)))
      .withColumn("pbucket",
        when(col("probe") < 0, col("bucket"))
          .otherwise(expr("int(bucket) ^ shiftleft(1, probe)")))
    val a = bucketed.select(col("id").as("id_a"), col("qv").as("qa"),
      col("nrm2").as("na2"), col("tbl"), col("bucket").as("pbucket"))
    val dec38 = DecimalType(38, 0)
    a.join(withProbes.select(col("id").as("id_b"), col("qv").as("qb"),
        col("nrm2").as("nb2"), col("tbl"), col("pbucket")), Seq("tbl", "pbucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dot", dotL(col("qa"), col("qb")))
      .filter(col("dot") > 0
        && col("dot").cast(dec38) * col("dot") * 10000L
           >= lit(cosSq1e4).cast(dec38) * col("na2") * col("nb2"))
      .select(col("id_a"), col("id_b"), col("dot"), col("na2"), col("nb2"))
      .distinct() // a pair can verify in up to `tables` tables
  }

  /** Batch vectors with NO verified cosine near-dup among `stateBuckets`
    * (rows in [[quantBucketed]] shape) — the cross-snapshot filter of a
    * recurring embedding ingest. Candidates meet on (tbl, bucket)
    * equality: the batch side exploded under its hamming ≤ 1 probes, the
    * state side at its true buckets — never batch × state — and
    * verification is the same exact integer test as [[lshNearDupPairsQ]].
    * Returns the distinct batch ids that are NEW. */
  def embedNewIds(batch: DataFrame, idCol: String, embCol: String,
      stateBuckets: DataFrame, tables: Int, nbits: Int, dim: Int,
      cosSq1e4: Long): DataFrame = {
    import graft.functions.VectorFunctions.dotL
    val b = quantBucketed(batch, idCol, embCol, tables, nbits, dim)
    val withProbes = b.withColumn("probe",
        explode(array((lit(-1) +: (0 until nbits).map(lit)): _*)))
      .withColumn("pbucket",
        when(col("probe") < 0, col("bucket"))
          .otherwise(expr("int(bucket) ^ shiftleft(1, probe)")))
      .select(col("id").as("id_b"), col("qv").as("qb"),
        col("nrm2").as("nb2"), col("tbl"), col("pbucket"))
    val st = stateBuckets.select(col("qv").as("qa"),
      col("nrm2").as("na2"), col("tbl"), col("bucket").as("pbucket"))
    val dec38 = DecimalType(38, 0)
    // exact-qv equality is a dup SHORT-CIRCUIT ahead of the cosine test:
    // cosine is undefined for a vector whose milli-quantized form is all
    // zeros (nrm2 = 0, dot > 0 can never hold — not even against its own
    // state row), which would break ingest rerun-idempotence by
    // re-emitting such vectors as survivors on every replay. An
    // identical quantized vector is a duplicate under any threshold.
    val dupIds = withProbes.join(st, Seq("tbl", "pbucket"))
      .withColumn("dot", dotL(col("qa"), col("qb")))
      .filter((col("qa") === col("qb"))
        || (col("dot") > 0
          && col("dot").cast(dec38) * col("dot") * 10000L
             >= lit(cosSq1e4).cast(dec38) * col("na2") * col("nb2")))
      .select(col("id_b").as("id")).distinct()
    batch.select(col(idCol).as("id")).distinct()
      .join(dupIds, Seq("id"), "left_anti")
  }

  /** Session-scoped verified-pair artifact for the declared embedding
    * dedup queries — like DedupQueries.pairCache for token sets, the
    * 100 TB form is a pair table materialized once per landed corpus and
    * read by both the pair listing and the clustering that follows. */
  private val pairCache =
    scala.collection.concurrent.TrieMap[String, DataFrame]()

  private[operators] def embedPairsArtifact(s: SparkSession,
      d: String): DataFrame =
    Artifacts.memo(pairCache, d, Artifacts.unpersistDf)(
      lshNearDupPairsQUnsorted(Tables.embeddings(s, d), "vec_id", "embedding",
        tables = 2, nbits = 4, dim = 64, cosSq1e4 = 2025L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** IVF index = fitted coarse quantizer + cell-assigned corpus. At
    * 100 TB this is an INGEST step: the k-means model is fit once, cell
    * ids land as a partition column, and queries prune to their probe
    * cells at the scan. [[ivfCache]] is the in-session stand-in for that
    * ingest artifact — fitting per query (the round-1/2 shape) re-clusters
    * the corpus on every call. Keyed by caller-supplied corpus identity. */
  private val ivfCache = scala.collection.concurrent.TrieMap[
    (String, Int), (org.apache.spark.ml.clustering.KMeansModel, DataFrame)]()

  /** Drop cached IVF index and embed-pair artifacts (see
    * [[DedupQueries.clearArtifacts]]). */
  def clearArtifacts(): Unit = {
    ivfCache.values.foreach { case (_, df) =>
      try df.unpersist(false) catch { case _: Throwable => () }
    }
    ivfCache.clear()
    pairCache.values.foreach { df =>
      try df.unpersist(false) catch { case _: Throwable => () }
    }
    pairCache.clear()
    pqCache.values.foreach { case (_, df) =>
      try df.unpersist(false) catch { case _: Throwable => () }
    }
    pqCache.clear()
  }

  def ivfIndex(corpus: DataFrame, embCol: String, nlist: Int,
      cacheKey: Option[String] = None)
      : (org.apache.spark.ml.clustering.KMeansModel, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    def build() = {
      val withVec = corpus.withColumn("_vec",
        array_to_vector(col(embCol).cast(ArrayType(DoubleType))))
      val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
        .setFeaturesCol("_vec").setPredictionCol("_cell")
        .fit(withVec)
      val assigned = model.transform(withVec).drop("_vec")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (model, assigned)
    }
    cacheKey match {
      case Some(key) => Artifacts.memo(ivfCache, (key, nlist),
        (v: (org.apache.spark.ml.clustering.KMeansModel, DataFrame)) =>
          v._2.unpersist(false))(build())
      case None      => build()
    }
  }

  /** IVF (inverted-file) ANN: the coarse quantizer (MLlib k-means, fixed
    * seed → deterministic) assigns each corpus vector to a cell; a query
    * probes only its `nprobe` nearest cells and re-ranks those candidates
    * exactly. The other standard scale path next to LSH: a query reads
    * `nprobe/nlist` of the corpus. Pass `cacheKey` to reuse the fitted
    * index across calls (the ingest-time-artifact semantics). */
  def ivfTopK(corpus: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int, nlist: Int, nprobe: Int,
      cacheKey: Option[String] = None): DataFrame = {
    val (model, assigned) = ivfIndex(corpus, embCol, nlist, cacheKey)
    probeTopK(assigned, model.clusterCenters.map(_.toArray), idCol, embCol,
      query, k, nprobe)
  }

  /** Probe the `nprobe` cells nearest the query (driver-side over the
    * tiny centroid table) and exactly re-rank only those candidates. */
  private def probeTopK(assigned: DataFrame, centers: Array[Array[Double]],
      idCol: String, embCol: String, query: Array[Float], k: Int,
      nprobe: Int): DataFrame = {
    def sqdist(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - query(i); s += d * d; i += 1 }
      s
    }
    val probeCells = centers.zipWithIndex
      .map { case (c, i) => (sqdist(c), i) }
      .sortBy(_._1).take(nprobe).map(_._2)
    val q = array(query.map(lit): _*)
    assigned.filter(col("_cell").isin(probeCells: _*))
      .withColumn("cosine", cosine(col(embCol), q))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Persist a fitted IVF index: the tiny centroid table plus the
    * cell-assigned corpus. Build ONCE at corpus landing, query from any
    * later session — the index is data, not process state (the
    * IncrementalDedup state-table precedent applied to ANN). */
  def saveIvfIndex(model: org.apache.spark.ml.clustering.KMeansModel,
      assigned: DataFrame, dir: String): Unit = {
    val spark = assigned.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }
      .toDF("_cell", "center")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    assigned.write.mode("overwrite").parquet(s"$dir/assigned")
  }

  /** Query a persisted IVF index without refitting: centroids (a
    * ~nlist-row table) come to the driver for probe selection; only the
    * probed cells of the assigned corpus are scanned. */
  def ivfTopKFromIndex(spark: SparkSession, indexDir: String, idCol: String,
      embCol: String, query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val centers = spark.read.parquet(s"$indexDir/centroids")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val assigned = spark.read.parquet(s"$indexDir/assigned")
    probeTopK(assigned, centers, idCol, embCol, query, k, nprobe)
  }

  // ---- product quantization (PQ) ---------------------------------------

  private val pqCache = scala.collection.concurrent.TrieMap[
    (String, Int, Int), (Array[Array[Array[Double]]], DataFrame)]()

  /** Fit a product-quantization index: split the `dim`-dimensional
    * embedding into `m` subspaces of `dim/m` dims, k-means each subspace
    * to `ksub` centroids (deterministic seeds), and encode every corpus
    * vector as `m` small codes.
    *
    * THE memory lever for ANN at 100 TB: codes are `m` bytes per vector
    * versus `4·dim` float bytes — 32× smaller at (m=8, dim=64), so the
    * scan side of a query reads codes, not vectors. Fitting is m corpus
    * passes at INGEST time (ingest-artifact semantics, cached like the
    * IVF index); queries never refit. Returns (codebooks m×ksub×dsub,
    * encoded corpus with an `_codes` array column). */
  def pqIndex(corpus: DataFrame, embCol: String, m: Int, ksub: Int,
      cacheKey: Option[String] = None)
      : (Array[Array[Array[Double]]], DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    def build() = {
      val dim = corpus.select(size(col(embCol))).head.getInt(0)
      require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
      val dsub = dim / m
      // L2-normalize before encoding: on unit vectors, squared-L2 order
      // equals cosine order, so the ADC approximation targets the same
      // ranking the exact re-rank (scale-invariant cosine) reports.
      // The norm is computed ONCE into its own column — a
      // transform(x => x / l2norm(emb)) lambda would re-evaluate the
      // whole-array fold per ELEMENT (O(dim²) per row on the ingest
      // pass). Zero vectors (norm 0) would encode as NaN slices and
      // poison KMeans.fit — cosine is undefined for them, so they are
      // excluded from the index rather than silently corrupting it.
      val unit = corpus
        .withColumn("_nrm", l2norm(col(embCol)))
        .filter(col("_nrm") > 0.0)
        .withColumn("_unit",
          transform(col(embCol).cast(ArrayType(DoubleType)),
            x => x / col("_nrm")))
        .drop("_nrm")
      val withSlices = (0 until m).foldLeft(unit) { (df, j) =>
        df.withColumn(s"_s$j", array_to_vector(
          slice(col("_unit"), j * dsub + 1, dsub)))
      }
      val models = (0 until m).map { j =>
        new KMeans().setK(ksub).setSeed(42L + j).setMaxIter(5)
          .setFeaturesCol(s"_s$j").setPredictionCol(s"_c$j")
          .fit(withSlices)
      }
      val encoded = models.foldLeft(withSlices)((df, mod) => mod.transform(df))
        .withColumn("_codes", array((0 until m).map(j => col(s"_c$j")): _*))
        .drop("_unit" +: (0 until m).flatMap(j => Seq(s"_s$j", s"_c$j")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val books = models.map(_.clusterCenters.map(_.toArray)).toArray
      (books, encoded)
    }
    cacheKey match {
      case Some(key) => Artifacts.memo(pqCache, (key, m, ksub),
        (v: (Array[Array[Array[Double]]], DataFrame)) =>
          v._2.unpersist(false))(build())
      case None      => build()
    }
  }

  /** PQ asymmetric-distance (ADC) top-k: the query builds a tiny
    * driver-side distance table (m × ksub subspace distances to each
    * codebook centroid); each corpus vector's approximate distance is m
    * table lookups summed over its codes — a built-in-HOF fold over the
    * byte codes, never touching the float vectors. The `rerank` nearest
    * by ADC are then re-ranked EXACTLY on the original embeddings, so
    * reported scores are true cosines (approximation affects only which
    * candidates are considered). Scan cost per query: m lookups per
    * vector over 32×-compressed data + `rerank` exact dot products. */
  def pqTopK(corpus: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int, m: Int = 8, ksub: Int = 16,
      rerank: Int = 50, cacheKey: Option[String] = None): DataFrame = {
    val (books, encoded) = pqIndex(corpus, embCol, m, ksub, cacheKey)
    adcRerank(encoded, books, idCol, embCol, query, k, m, ksub, rerank)
  }

  /** ADC scan + exact re-rank over an already-encoded frame (`_codes`
    * column present) — shared by [[pqTopK]] and [[ivfPqTopK]]. */
  private def adcRerank(encoded: DataFrame,
      books: Array[Array[Array[Double]]], idCol: String, embCol: String,
      query: Array[Float], k: Int, m: Int, ksub: Int,
      rerank: Int): DataFrame = {
    val dsub = query.length / m
    val qn = {
      var s = 0.0; var i = 0
      while (i < query.length) { s += query(i).toDouble * query(i); i += 1 }
      math.sqrt(s)
    }
    val dtab = Array.tabulate(m, ksub) { (j, c) =>
      var s = 0.0; var i = 0
      while (i < dsub) {
        val d = query(j * dsub + i) / qn - books(j)(c)(i); s += d * d; i += 1
      }
      s
    }
    val dtabLit = array(dtab.flatten.map(lit).toSeq: _*)
    val adc = aggregate(
      transform(sequence(lit(0), lit(m - 1)),
        j => element_at(dtabLit,
          j * ksub + element_at(col("_codes"), j + 1) + 1)),
      lit(0.0), (acc, x) => acc + x)
    val qLit = array(query.map(lit).toSeq: _*)
    encoded.withColumn("_adc", adc)
      .orderBy(col("_adc").asc, col(idCol).asc).limit(rerank)
      .withColumn("cosine", cosine(col(embCol), qLit))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Persist a fitted PQ index: codebooks (m×ksub tiny rows) plus the
    * encoded corpus — the [[saveIvfIndex]] contract for the PQ path:
    * built once at corpus landing, queried from any later session. */
  def savePqIndex(books: Array[Array[Array[Double]]], encoded: DataFrame,
      dir: String): Unit = {
    val spark = encoded.sparkSession
    import spark.implicits._
    (for {
      (sub, j) <- books.zipWithIndex
      (centroid, c) <- sub.zipWithIndex
    } yield (j, c, centroid.toSeq)).toSeq
      .toDF("sub", "code", "centroid")
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    encoded.write.mode("overwrite").parquet(s"$dir/encoded")
  }

  /** Query a persisted PQ index without refitting — codebooks come to
    * the driver (m·ksub rows), the ADC scan reads the encoded corpus. */
  def pqTopKFromIndex(spark: SparkSession, indexDir: String, idCol: String,
      embCol: String, query: Array[Float], k: Int, m: Int = 8,
      ksub: Int = 16, rerank: Int = 50): DataFrame = {
    val books = Array.ofDim[Array[Double]](m, ksub)
    spark.read.parquet(s"$indexDir/codebooks").collect().foreach { r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    val encoded = spark.read.parquet(s"$indexDir/encoded")
    adcRerank(encoded, books.map(_.toArray), idCol, embCol, query, k, m,
      ksub, rerank)
  }

  /** IVF-PQ — the standard warehouse-scale ANN stack: the coarse IVF
    * quantizer prunes the corpus to `nprobe`/`nlist` cells, the PQ codes
    * absorb the distance scan inside those cells (32× compressed reads),
    * and only `rerank` candidates touch the float vectors for the exact
    * final ranking. Both indexes are ingest artifacts: k-means fits
    * happen once per corpus key, queries reuse them. */
  def ivfPqTopK(corpus: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int, nlist: Int, nprobe: Int, m: Int = 8,
      ksub: Int = 16, rerank: Int = 50,
      cacheKey: Option[String] = None): DataFrame = {
    val (model, assigned) = ivfIndex(corpus, embCol, nlist, cacheKey)
    val (books, encoded) =
      pqIndex(assigned, embCol, m, ksub, cacheKey.map(_ + ":pq"))
    val centers = model.clusterCenters.map(_.toArray)
    def sqdist(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - query(i); s += d * d; i += 1 }
      s
    }
    val probeCells = centers.zipWithIndex
      .map { case (c, i) => (sqdist(c), i) }
      .sortBy(_._1).take(nprobe).map(_._2)
    adcRerank(encoded.filter(col("_cell").isin(probeCells: _*)), books,
      idCol, embCol, query, k, m, ksub, rerank)
  }

  // ---- declared queries -------------------------------------------------

  type Q = (SparkSession, String) => DataFrame

  /** LSH-bucketed approximate top-10 against vec_id=0 (4 sign bits,
    * multi-probe hamming-1 → 5 of 16 buckets ≈ 31% of the corpus scanned).
    * Bits/probes trade recall for scan fraction; at 100 TB you'd raise
    * nbits with corpus size to hold the per-bucket count roughly constant.
    * No oracle (float scores); scalatest measures recall vs the
    * brute-force baseline. */
  /** The vec_id=0 probe vector, memoized per corpus so repeated plan
    * construction (retries, Verify re-runs) fetches it once — the
    * scalar-artifact discipline (LazyRegistrySpec). */
  private def probeVec(emb: DataFrame, d: String): Array[Float] =
    Artifacts.scalar(s"qvec:$d") {
      emb.filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0)
        .getSeq[Float](0).toArray
    }

  /** Declared query (exact integer arithmetic since r15 — the
    * quantized-integer form replaced the float-cosine top-k, making
    * the scores deterministic/oracle-ready, though the query remains
    * in the pinned no-oracle ANN-recall class — its correctness
    * property is recall, verified by scalatest, not a DuckDB hash):
    * ANN top-10 against vec_id=0
    * through one 4-bit sign-LSH table with hamming-1 multi-probe,
    * candidates re-ranked by the EXACT q_similarity_topk score algebra
    * — sign(dot)·(dot²·10¹² div (‖a‖²‖q‖²)) over milli-quantized
    * vectors, so every bucket bit and every score is pure integer
    * arithmetic both engines reproduce (the [[quantizedPlanes]] used by
    * the whole embed-dedup family). The query-side bucket and norm are
    * bounded driver scalars (the probeVec device); recall is the
    * measured property NoOracleSpec pins — the float-plane [[lshTopK]]
    * stays the library surface for arbitrary query vectors. */
  val qSimilarityLsh: Q = (s, d) => {
    import graft.functions.VectorFunctions.{dotL, milliQuant}
    val nbits = 4
    val dim = 64
    val planes = quantizedPlanes(nbits, dim)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        milliQuant(col("embedding")).as("qv"))
      .withColumn("n2", dotL(col("qv"), col("qv")))
    val qv = Artifacts.scalar(s"qvecq:$d") {
      e.filter(col("vec_id") === 0).select(col("qv"))
        .collect()(0).getSeq[Long](0).toArray
    }
    val qn2 = qv.map(x => x * x).sum
    val qBucket = (0 until nbits).map { b =>
      val dot = planes(b).zip(qv).map { case (p, x) => p * x }.sum
      if (dot > 0) 1L << b else 0L
    }.sum
    val probes = qBucket +: (0 until nbits).map(b => qBucket ^ (1L << b))
    val bits = (0 until nbits).map { j =>
      val plane = array(planes(j).map(lit): _*)
      when(dotL(col("qv"), plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    e.filter(col("vec_id") =!= 0 && col("n2") > 0)
      .withColumn("bucket", bits.reduce(_ + _))
      .filter(col("bucket").isin(probes: _*))
      .withColumn("dot", dotL(col("qv"), array(qv.map(lit): _*)))
      .withColumn("score", expr(
        s"""(CASE WHEN dot < 0 THEN -1L ELSE 1L END) *
           ((CAST(dot AS DECIMAL(38,0)) * dot * 1000000000000)
            div (CAST(n2 AS DECIMAL(38,0)) * ${qn2}L))"""))
      .select(col("vec_id"), col("label"), col("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  /** IVF ANN top-10 against vec_id=0: 8 cells, probe the 3 nearest
    * (≈3/8 of the corpus re-ranked). No oracle (float + iterative
    * clustering); scalatest measures recall vs brute force. */
  val qSimilarityIvf: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val query = probeVec(emb, d)
    ivfTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      query, k = 10, nlist = 8, nprobe = 3, cacheKey = Some(s"ivf:$d"))
  }

  /** PQ-ADC ANN top-10 against vec_id=0: 8 subspaces × 16 centroids
    * (32× code compression), 50 ADC candidates re-ranked exactly. No
    * oracle (float + iterative clustering); scalatest measures recall vs
    * brute force and verifies reported scores are exact cosines. */
  val qSimilarityPq: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val query = probeVec(emb, d)
    pqTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      query, k = 10, m = 8, ksub = 16, rerank = 50,
      cacheKey = Some(s"pq:$d"))
  }

  /** Declared scale-safe embedding dedup: cosine ≥ 0.45 pairs through the
    * 2-table × 4-bit quantized LSH (hamming-1 probes). Exact oracle — the
    * DuckDB side recomputes the identical integer buckets from the same
    * plane literals. The all-pairs baselines this replaces in the registry
    * (DedupQueries.qDedupEmbed/_Q) remain as documented exactness
    * references for the recall tests. */
  val qDedupEmbedLsh: Q = (s, d) =>
    embedPairsArtifact(s, d).orderBy("id_a", "id_b")

  /** Embedding near-dup clustering: connected components over the
    * verified LSH pair graph — [[qDedupEmbedLsh]]'s pairs fed through the
    * same label propagation as the token-set clustering
    * ([[Clustering.componentLabels]]): every vector labeled with the
    * smallest vec_id reachable through cosine ≥ 0.45 edges, singletons
    * labeling themselves. The pair artifact is shared with
    * q_dedup_embed_lsh, so the graph build costs once per corpus. */
  val qDedupEmbedCluster: Q = (s, d) => {
    val pairs = embedPairsArtifact(s, d)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val labels = Clustering.componentLabels(pairs,
      cacheKey = Some(s"embed:$d"))
    Tables.embeddings(s, d).select(col("vec_id"))
      .join(labels.select(col("id").as("vec_id"), col("label")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("cluster"))
  }

  /** Shared oracle CTE chain for the embedding dedup queries, generated
    * with the same quantized-plane literals the Spark plans embed:
    * candidates = bucket hamming ≤ 1 in any table, verification in
    * HUGEINT; the final `vpairs` CTE is the verified pair list.
    *
    * Round 14, two structural changes:
    *
    * (1) CONTRACTION on the quantized vector `qv` — buckets, norms,
    * and dots are pure functions of qv, so the candidate/verify step
    * runs once per DISTINCT vector (`g`, rep = min vec_id) and the
    * verified rep-pair list `vrep` expands back to member pairs at the
    * end. Exact equivalence: identical vectors share buckets (hamming
    * 0) and verify iff nrm2 > 0 (dot = nrm2; nrm2²·10⁴ ≥ cos²·nrm2²
    * always at cos² ≤ 10⁴) — the `g.sz > 1 AND nrm2 > 0` self-pair
    * row; cross-group verification depends only on (qv_a, qv_b). This
    * collapses corpora with exact-duplicate embeddings; note the
    * GenScale mirror is NOT such a corpus (it micro-jitters each copy
    * precisely to break ties), so at sf1/sf10 the contraction is an
    * exactness-preserving no-op, not a speedup.
    *
    * (2) STREAMING candidates — the r13 `SELECT DISTINCT` inside
    * `cand` deduped the raw Θ(n²/2^nbits) candidate stream BEFORE
    * verification, building a multi-10-GB hash/spill of pair keys at
    * the 100× fixture (the disk death). The DISTINCT now runs in
    * `vrep` AFTER the cosine filter, where surviving rows are
    * output-scale; `cand`→`ver` streams each candidate through an
    * in-memory 200k-row array build and drops it immediately.
    * Verification work for pairs probed by both tables is duplicated
    * (≤2×) but never materialized.
    *
    * (3) BLOCKED candidates + wide dot (round 15, the device that
    * closed the last sf10 digest holdout): the r14 `cand` joined bk to
    * itself on `tbl` alone (2 key values!) and filtered
    * bit_count(xor) ≤ 1 — a Θ(n²) 4·10¹⁰-row pre-filter stream at
    * sf10 — and `ver` re-joined g twice to run a per-row list-lambda
    * dot (list_zip allocates per candidate). Now the probe side
    * explodes over the nbits+1 XOR masks {0, 1<<b} and candidates meet
    * on (tbl, bucket) EQUALITY — exactly the grid-blocked
    * q_geo_neighbors oracle device; a hamming-0 pair meets only on
    * mask 0 and a hamming-1 pair only on its differing bit (from both
    * orientations, collapsed by rep_a < rep_b), so the enumerated set
    * is identical with no dedup needed before verification. The dot
    * runs on 64 unpacked BIGINT columns (`bkw`) as one vectorized
    * multiply-add expression — no list allocation in the 10¹⁰-row
    * loop. The candidate COUNT stays Θ(n²/2^nbits) by query
    * semantics (12.76e9 measured at sf10), but the per-candidate cost
    * drops enough to clear the digest watchdog.
    *
    * Multi-referenced CTEs keep `AS MATERIALIZED` (the Graph-oracle
    * device, round 13) so DuckDB's CTE inlining cannot re-evaluate the
    * pipeline per reference — EXCEPT bk/bkw, deliberately plain:
    * DuckDB drives each pipeline from its source operator's morsels,
    * and a materialized-CTE scan is a serial source, so with `bkw`
    * materialized the entire 10¹⁰-row candidate+dot pipeline ran on
    * ONE thread (measured: sf1 full oracle 160 s; EXPLAIN ANALYZE put
    * 53 s in the dot projection + 17 s in the join on a single
    * pipeline). Plain bk/bkw inline, so the hot pipeline's source is
    * bk's radix-partitioned hash aggregate — fully parallel — at the
    * cost of re-running the cheap 2·|reps|-row bucket build per
    * reference (sf1: 23 s full oracle, 6.9×; the sf10 digest fits the
    * watchdog at ~45 min). */
  private def embedLshCtes(tables: Int, nbits: Int, dim: Int,
      cosSq1e4: Long): String = {
    val planes = quantizedPlanes(tables * nbits, dim)
    val planeRows = planes.zipWithIndex.map { case (p, i) =>
      s"(${i / nbits}, ${i % nbits}, [${p.mkString(",")}]::BIGINT[])"
    }.mkString(",\n           ")
    s"""q AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           FROM embeddings),
         g AS MATERIALIZED (
           SELECT qv, MIN(vec_id) AS rep, COUNT(*) AS sz,
             CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nrm2
           FROM q GROUP BY qv),
         mem AS MATERIALIZED (
           SELECT g.rep, q.vec_id FROM q JOIN g USING (qv)),
         pl AS (SELECT * FROM (VALUES $planeRows) AS t(tbl, b, plane)),
         bk AS (
           SELECT rep, tbl,
             CAST(SUM(CASE WHEN list_sum(list_transform(list_zip(qv, plane),
                    t -> t[1] * t[2])) > 0
                  THEN (1 << b) ELSE 0 END) AS BIGINT) AS bucket
           FROM g, pl GROUP BY rep, tbl),
         bkw AS (
           SELECT bk.rep, bk.tbl, bk.bucket, g.nrm2,
             ${(1 to dim).map(i => s"g.qv[$i] AS e$i").mkString(", ")}
           FROM bk JOIN g USING (rep)),
         probe AS (
           SELECT bkw.*, xor(bucket, msk.m) AS pbucket
           FROM bkw, (VALUES ${(Seq(0L) ++ (0 until nbits)
             .map(b => 1L << b)).map(m => s"(CAST($m AS BIGINT))")
             .mkString(",")}) AS msk(m)),
         vrep AS MATERIALIZED (
           SELECT DISTINCT rep_a, rep_b, dot, na2, nb2 FROM (
             SELECT a.rep AS rep_a, b.rep AS rep_b,
               ${(1 to dim).map(i => s"a.e$i * b.e$i").mkString(" + ")}
                 AS dot,
               a.nrm2 AS na2, b.nrm2 AS nb2
             FROM probe a JOIN bkw b
               ON b.tbl = a.tbl AND b.bucket = a.pbucket
                 AND a.rep < b.rep)
           WHERE dot > 0
             AND CAST(dot AS HUGEINT) * dot * 10000
                 >= $cosSq1e4 * CAST(na2 AS HUGEINT) * nb2
           UNION ALL
           SELECT rep, rep, nrm2, nrm2, nrm2 FROM g
           WHERE sz > 1 AND nrm2 > 0),
         vrep2 AS (
           SELECT rep_a AS qa, rep_b AS qb, dot, na2, nb2 FROM vrep
           UNION ALL
           SELECT rep_b, rep_a, dot, nb2, na2 FROM vrep
           WHERE rep_a <> rep_b),
         vpairs AS MATERIALIZED (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b, v.dot,
             v.na2, v.nb2
           FROM vrep2 v JOIN mem a ON a.rep = v.qa
                        JOIN mem b ON b.rep = v.qb
           WHERE a.vec_id < b.vec_id)"""
  }

  private def embedLshOracle(tables: Int, nbits: Int, dim: Int,
      cosSq1e4: Long): String =
    s"""WITH ${embedLshCtes(tables, nbits, dim, cosSq1e4)}
         SELECT id_a, id_b, dot, na2, nb2 FROM vpairs
         ORDER BY id_a, id_b"""

  /** Oracle for [[qDedupEmbedCluster]]: transitive closure by recursive
    * CTE (min reachable id), run on the CONTRACTED rep graph (round 14).
    * Equivalence: members of an nrm2 > 0 group are pairwise connected
    * through the self-pair rows, so the expanded graph's components are
    * exactly the rep graph's components with whole groups substituted
    * for their reps; each group's min vec_id IS its rep, so the
    * component's min vec_id = min reachable rep. Zero-vector groups
    * (nrm2 = 0) have NO edges at all — dot = 0 fails `dot > 0` even
    * between identical copies — so every member labels itself, exactly
    * as in the uncontracted closure. */
  private def embedClusterOracle(tables: Int, nbits: Int, dim: Int,
      cosSq1e4: Long): String =
    s"""WITH RECURSIVE ${embedLshCtes(tables, nbits, dim, cosSq1e4)},
         e AS MATERIALIZED (
           SELECT rep_a AS id, rep_b AS nbr FROM vrep WHERE rep_a <> rep_b
           UNION ALL
           SELECT rep_b AS id, rep_a AS nbr FROM vrep WHERE rep_a <> rep_b),
         reach(id, r) AS (
           SELECT rep, rep FROM g WHERE nrm2 > 0
           UNION
           SELECT e.id, reach.r FROM e JOIN reach ON reach.id = e.nbr),
         labels AS (SELECT id, MIN(r) AS label FROM reach GROUP BY id)
         SELECT m.vec_id,
           CASE WHEN gg.nrm2 > 0 THEN l.label ELSE m.vec_id END AS cluster
         FROM mem m JOIN g gg ON gg.rep = m.rep
                    LEFT JOIN labels l ON l.id = m.rep
         ORDER BY m.vec_id"""

  /** Cross-snapshot embedding dedup — the IncrementalDedup pattern at
    * vector granularity: even vec_ids are the ingested corpus (state),
    * odd vec_ids the new batch; a batch vector survives iff it has NO
    * verified cosine ≥ 0.45 near-dup among state vectors. Reuses the
    * whole-corpus verified pair artifact (pairs are parity-agnostic), so
    * the incremental check is one anti-join over the cross-parity slice
    * of an ingest-time table — candidates met on (table, bucket)
    * equality, never batch × state. */
  val qDedupEmbedIncremental: Q = (s, d) => {
    val pairs = embedPairsArtifact(s, d)
    val dupBatchIds = pairs
      .filter(col("id_a") % 2 =!= col("id_b") % 2)
      .select(when(col("id_a") % 2 === 1, col("id_a"))
        .otherwise(col("id_b")).as("vec_id"))
      .distinct()
    Tables.embeddings(s, d).filter(col("vec_id") % 2 === 1)
      .join(dupBatchIds, Seq("vec_id"), "left_anti")
      .select(col("vec_id"))
  }

  /** Contracted form (round 14): an odd (batch) vector is a dup iff its
    * group reaches a group holding an even (state) member through one
    * verified edge — the self row covers "my own group has an even
    * copy" (parities differ, so the even copy is a distinct vector and
    * the pair exists whenever the self row does). */
  private def embedIncrementalOracle(tables: Int, nbits: Int, dim: Int,
      cosSq1e4: Long): String =
    s"""WITH ${embedLshCtes(tables, nbits, dim, cosSq1e4)},
         geven AS (
           SELECT rep FROM mem WHERE vec_id % 2 = 0 GROUP BY rep),
         dup_groups AS (
           SELECT DISTINCT v.qa AS rep FROM vrep2 v
           JOIN geven ge ON ge.rep = v.qb)
         SELECT m.vec_id FROM mem m
         WHERE m.vec_id % 2 = 1
           AND m.rep NOT IN (SELECT rep FROM dup_groups)
         ORDER BY vec_id"""

  /** Coverage (diversity-aware) sampling — the selection step that keeps
    * a training mix REPRESENTATIVE rather than merely deduplicated: the
    * embedding space is carved into sign-LSH regions (one 8-bit table →
    * 256 cells over the same deterministic quantized hyperplanes the
    * dedup layer uses) and each populated region reports its population
    * and one representative (min vec_id — deterministic; swap in a
    * quality argmax via max_by for scored corpora). Downsampling to the
    * representatives flattens the density distribution — dense regions
    * shed mass, sparse regions keep theirs — the cheap engine-exact
    * counterpart of k-means/facility-location coreset selection (those
    * need float centroids; sign-bucket regions keep the exact-oracle
    * policy).
    *
    * Scale shape: bucket assignment is map-side (codegen'd integer dot
    * products), then ONE partial-aggregating shuffle on the 8-bit
    * region key; nothing else moves. Region count is a knob (nbits):
    * raise it with corpus size to hold per-region populations flat —
    * the same bucket-granularity scaling rule as the LSH dedup
    * tables. */
  val qSampleCoverage: Q = (s, d) =>
    quantBucketed(Tables.embeddings(s, d), "vec_id", "embedding",
        tables = 1, nbits = 8, dim = 64)
      .groupBy(col("bucket").cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("rep"))

  private def coverageOracle(nbits: Int, dim: Int): String = {
    val planes = quantizedPlanes(nbits, dim)
    val planeRows = planes.zipWithIndex.map { case (p, i) =>
      s"($i, [${p.mkString(",")}]::BIGINT[])"
    }.mkString(",\n           ")
    s"""WITH q AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           FROM embeddings),
         pl AS (SELECT * FROM (VALUES $planeRows) AS t(b, plane)),
         bk AS (
           SELECT vec_id,
             CAST(SUM(CASE WHEN list_sum(list_transform(list_zip(qv, plane),
                    t -> t[1] * t[2])) > 0
                  THEN (1 << b) ELSE 0 END) AS BIGINT) AS bucket
           FROM q, pl GROUP BY vec_id)
         SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           MIN(vec_id) AS rep
         FROM bk GROUP BY bucket ORDER BY bucket"""
  }

  val queries: Map[String, Q] = Map(
    "q_similarity_lsh" -> qSimilarityLsh,
    "q_similarity_ivf" -> qSimilarityIvf,
    "q_similarity_pq" -> qSimilarityPq,
    "q_dedup_embed_lsh" -> qDedupEmbedLsh,
    "q_dedup_embed_cluster" -> qDedupEmbedCluster,
    "q_dedup_embed_incremental" -> qDedupEmbedIncremental,
    "q_sample_coverage" -> qSampleCoverage)

  val oracleSql: Map[String, String] = Map(
    "q_dedup_embed_lsh" ->
      embedLshOracle(tables = 2, nbits = 4, dim = 64, cosSq1e4 = 2025L),
    "q_dedup_embed_cluster" ->
      embedClusterOracle(tables = 2, nbits = 4, dim = 64, cosSq1e4 = 2025L),
    "q_dedup_embed_incremental" ->
      embedIncrementalOracle(tables = 2, nbits = 4, dim = 64,
        cosSq1e4 = 2025L),
    "q_sample_coverage" -> coverageOracle(nbits = 8, dim = 64))
}
