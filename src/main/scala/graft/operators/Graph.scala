package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over edge tables — degree, triangle counting, and
  * PageRank — the relationship layer a corpus/warehouse needs once
  * entities link to each other (co-purchase graphs here; citation /
  * hyperlink / co-click graphs in a training-data pipeline, where link
  * structure feeds dedup clustering, quality propagation, and crawl
  * prioritization). The reference has no graph surface; this extends the
  * connected-components layer ([[Clustering]]) with the other two
  * classic warehouse graph operators.
  *
  * Everything is DataFrame joins/aggregations on narrow (long, long)
  * edge rows — no vertex-program framework, no driver-side adjacency:
  *
  *  - The undirected fixture graph is materialized ONCE per session as a
  *    canonical `(u < v)` distinct edge artifact (the [[Artifacts]]
  *    pattern; at 100 TB this is the persisted edge table every graph
  *    query starts from, bucketed by `u` so degree scans and the wedge
  *    join co-locate).
  *  - Triangle counting uses the degree-ordered node-iterator: each
  *    edge orients from its lower-(degree, id) endpoint to the higher,
  *    wedges enumerate only from each center's OUT-neighbors, and a
  *    final equi-join against the edge table closes them. Orienting by
  *    degree bounds out-degree by O(√m) on any graph, so the wedge
  *    self-join — the only super-linear step — generates
  *    O(Σ outdeg²) = O(m^1.5) candidates instead of the unoriented
  *    Σ deg² blow-up that a hub node turns quadratic; this is the
  *    standard MapReduce/MPC triangle algorithm and degree-orientation
  *    is its anti-skew device (same role the rarest-token prefix plays
  *    in [[DedupQueries]]'s PPJoin).
  *  - PageRank runs a FIXED number of synchronous iterations as one
  *    declarative plan: per-iteration cost is one broadcast join of the
  *    rank table onto the edge list plus one `groupBy(dst)` partial
  *    aggregation — the rank table is |V| narrow rows and broadcasts
  *    while edges never re-shuffle on anything but `dst`. Arithmetic is
  *    INTEGER-scaled (ranks are BIGINTs at scale 10¹²; contributions
  *    divide by out-degree with integral `div`), so results are exact,
  *    partitioning-independent, and oracle-checkable — the same
  *    float-free policy as tf-idf/z-score. At real scale the loop stays
  *    the same shape with a localCheckpoint every few iterations to cut
  *    lineage; convergence detection (L1 delta below ε) is a one-row
  *    aggregate per round.
  */
object Graph {

  /** Canonical undirected simple edges: distinct `(u, v)` with `u < v`,
    * self-loops dropped. Input is any two-column pair frame. */
  def canonicalEdges(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame =
    pairs.select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") < col("v"))
      .distinct()

  /** Per-node degree of a canonical undirected edge table. Isolated
    * nodes (no edges) by definition do not appear. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** Per-node triangle participation counts: `(node, degree, triangles)`
    * for every non-isolated node, zero-triangle nodes included.
    *
    * Degree-ordered node-iterator (see object doc): every triangle
    * {a,b,c} is generated exactly once, as a wedge at its minimum-
    * (degree, id) vertex, closed by the third edge. The degree table is
    * broadcast onto the edge list twice (|V| narrow rows), so the only
    * shuffles are the wedge self-join on `src` and the closing
    * equi-join on `(u, v)`. */
  /** All triangles of a canonical edge table, one row each, as
    * `(src, x, y)` — `src` the minimum-(degree, id) vertex, `x < y` its
    * two co-members. The shared wedge machinery of [[triangleCounts]]
    * and [[edgeJaccard]]. */
  def triangleRows(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    val ranked = edges
      .join(broadcast(deg.select(col("node").as("u"), col("degree").as("du"))), "u")
      .join(broadcast(deg.select(col("node").as("v"), col("degree").as("dv"))), "v")
    // orient low-(degree, id) → high; (du,u) never equals (dv,v) since
    // u ≠ v, so the orientation is total
    val oriented = ranked.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        col("u")).otherwise(col("v")).as("src"),
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        col("v")).otherwise(col("u")).as("dst"))
    // wedges at a shared center, out-neighbors canonically ordered by id
    // — so the closing edge is exactly an (u, v) row of the edge table
    val o1 = oriented.select(col("src"), col("dst").as("x"))
    val o2 = oriented.select(col("src"), col("dst").as("y"))
    val wedges = o1.join(o2, Seq("src")).filter(col("x") < col("y"))
    wedges.join(edges,
      wedges("x") === edges("u") && wedges("y") === edges("v"))
      .select(col("src"), col("x"), col("y"))
  }

  def triangleCounts(edges: DataFrame): DataFrame = {
    val perNode = triangleRows(edges)
      .select(explode(array(col("src"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    degrees(edges).join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Neighborhood-Jaccard link scores for every EXISTING edge — the
    * link-prediction / tie-strength primitive (common-neighbor count and
    * per-mille Jaccard of the two open neighborhoods). A triangle
    * through edge (u,v) IS a common neighbor of u and v, so the common
    * count reuses [[triangleRows]] exploded per edge — the wedge join
    * runs once, degree-oriented, never a neighbor-list × neighbor-list
    * self-join. |N(u) ∪ N(v)| = deg(u) + deg(v) − common by
    * inclusion–exclusion (v ∈ N(u) and u ∈ N(v) stay in the union —
    * open-neighborhood convention), and the score is integer per-mille
    * (`1000·common div union`) so the whole frame is oracle-exact. */
  def edgeJaccard(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    val perEdge = triangleRows(edges)
      .select(explode(array(
        struct(least(col("src"), col("x")).as("u"),
          greatest(col("src"), col("x")).as("v")),
        struct(least(col("src"), col("y")).as("u"),
          greatest(col("src"), col("y")).as("v")),
        struct(col("x").as("u"), col("y").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("common"))
    edges
      .join(perEdge, Seq("u", "v"), "left")
      .join(broadcast(deg.select(col("node").as("u"), col("degree").as("du"))), "u")
      .join(broadcast(deg.select(col("node").as("v"), col("degree").as("dv"))), "v")
      .select(col("u"), col("v"),
        coalesce(col("common"), lit(0L)).as("common"),
        expr("1000 * coalesce(common, 0L) div (du + dv - coalesce(common, 0L))")
          .as("jac_pm"))
  }

  /** Fixed-iteration synchronous PageRank over a DIRECTED edge table
    * `(src, dst)`, integer-scaled: every node starts at
    * `scale div N`, and each round sets
    *
    *   r'(v) = ((den−num)·(scale div N)) div den
    *         + (num·Σ_{u→v} (r(u) div outdeg(u))) div den
    *
    * with damping `num/den` (default 85/100). All arithmetic is BIGINT
    * with integral division, so the result is exact and engine-portable.
    * Dangling nodes (no out-edges) leak their mass — the variant that
    * redistributes it costs one extra one-row aggregate per round and is
    * a caller-side fold; documented rather than defaulted because the
    * leak-free form keeps the per-round plan at one join + one
    * aggregation. Returns `(node, rank)`. */
  def pageRankScaled(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L, num: Long = 85L,
      den: Long = 100L, knownN: Option[Long] = None): DataFrame = {
    require(iters >= 0 && scale > 0 && num >= 0 && den > 0)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    // N is ONE driver-side scalar (the share-of-total precedent): the
    // uniform start rank and teleport term need it as a literal.
    // `knownN` skips the counting job when the caller already persists
    // the node count next to its edge artifact (the declared query does)
    val n = knownN.getOrElse(nodes.count())
    val base = scale / n
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var r = nodes.select(col("node"), lit(base).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(broadcast(r.select(col("node").as("src"), col("rank"))), "src")
        .join(broadcast(outdeg), "src")
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      r = nodes
        .join(broadcast(contribs.select(col("dst").as("node"), col("s"))),
          Seq("node"), "left")
        .select(col("node"),
          (lit(((den - num) * base) / den) +
            expr(s"($num * coalesce(s, 0L)) div $den")).as("rank"))
    }
    r
  }

  private val edgeCache =
    scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** Drop cached edge artifacts (see [[DedupQueries.clearArtifacts]]). */
  def clearArtifacts(): Unit = {
    edgeCache.values.foreach(df =>
      try df.unpersist(false) catch { case _: Throwable => () })
    edgeCache.clear()
    nCache.clear()
  }

  /** The fixture's undirected graph, materialized once per session:
    * parts co-ordered within an order (first three lines per order, so
    * edge count stays linear in orders and max degree bounded — the
    * graph survey's standard co-occurrence construction). At 100 TB the
    * equivalent is the persisted edge table an ingest job writes,
    * bucketed by `u`. */
  def coOrderEdges(spark: SparkSession, sfDir: String): DataFrame =
    Artifacts.memo(edgeCache, s"coorder:$sfDir", Artifacts.unpersistDf)({
      val li = Tables.lineitem(spark, sfDir)
        .filter(col("l_linenumber") <= 3)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      canonicalEdges(
        li.select(col("ok"), col("pk").as("a"))
          .join(li.select(col("ok"), col("pk").as("b")), "ok")
          .filter(col("a") < col("b")),
        "a", "b").localCheckpoint(true)
    })

  type Q = (SparkSession, String) => DataFrame

  /** Declared query: per-node degree of the co-order part graph. */
  val qGraphDegree: Q = (s, d) => degrees(coOrderEdges(s, d))

  /** Declared query: per-node triangle counts on the co-order graph. */
  val qGraphTriangles: Q = (s, d) => triangleCounts(coOrderEdges(s, d))

  /** Part id offset that makes the supplier→part node spaces disjoint
    * (both are small positive BIGINTs in the fixture). */
  val PartOffset = 10000000L

  private val nCache =
    scala.collection.concurrent.TrieMap[String, Long]()

  /** The supply digraph (supplier → part, distinct), materialized once
    * per session with its node count — the directed sibling of
    * [[coOrderEdges]]; at scale both live as persisted edge tables with
    * stats, and every rank/degree query starts from them instead of
    * re-distincting the fact table. */
  def supplyEdges(spark: SparkSession, sfDir: String): DataFrame =
    Artifacts.memo(edgeCache, s"supply:$sfDir", Artifacts.unpersistDf)({
      Tables.lineitem(spark, sfDir)
        .select(col("l_suppkey").as("src"),
          (col("l_partkey") + PartOffset).as("dst"))
        .distinct().localCheckpoint(true)
    })

  /** Declared query: 3-iteration integer-exact PageRank over the
    * supplier→part supply digraph (who supplies what, the bipartite
    * direction making parts rank by supplier fan-in). */
  val qGraphPagerank: Q = (s, d) => {
    val edges = supplyEdges(s, d)
    val n = Artifacts.memo(nCache, s"supplyN:$d")(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct().count())
    pageRankScaled(edges, iters = 3, knownN = Some(n))
  }

  /** Declared query: neighborhood-Jaccard link scores on the co-order
    * graph. */
  val qGraphJaccard: Q = (s, d) => edgeJaccard(coOrderEdges(s, d))

  /** Declared query: connected components of the decile subgraph (both
    * endpoints ≡ 0 mod 10) of the co-order graph — a naturally
    * fragmented slice (the full graph is one dense component, which
    * would make the oracle's transitive closure quadratic in |V|;
    * components on a FRAGMENTED graph are the operator's actual use
    * case: near-dup groups, not one giant blob). Reuses the
    * [[Clustering.componentLabels]] frontier label propagation. */
  val qGraphComponents: Q = (s, d) => {
    val sub = coOrderEdges(s, d)
      .filter(col("u") % 10 === 0 && col("v") % 10 === 0)
    Clustering.componentLabels(
        sub.select(col("u").as("doc_a"), col("v").as("doc_b")),
        cacheKey = Some(s"graphcc:$d")) // labels are an ingest artifact,
      // recomputed when the edge table is (the q_dedup_cluster precedent)
      .select(col("id").as("node"), col("label").as("component"))
  }

  /** Fixed-depth BFS distances from a seed set over a canonical
    * undirected edge table: every node within `maxDepth` hops, with its
    * exact hop distance (min over walk lengths = shortest path). One
    * equi-join shuffle per level, frontier deduped per level; at real
    * scale each level gets a localCheckpoint to cut lineage and an
    * anti-join against the visited set to stop re-expanding the (much
    * larger) interior — with depth fixed at 3 the re-expansion here is
    * bounded and the simpler union-then-min plan wins. */
  def bfsDepths(edges: DataFrame, seeds: DataFrame,
      maxDepth: Int): DataFrame = {
    val adj = edges.select(col("u").as("a"), col("v").as("b"))
      .unionAll(edges.select(col("v").as("a"), col("u").as("b")))
    var all = seeds.select(col("node"), lit(0).as("dist"))
    var frontier = all
    for (i <- 1 to maxDepth) {
      // SHUFFLE_HASH on the frontier side (r17): the per-level join
      // builds a hash table over the (node, dist) frontier partition
      // and STREAMS the adjacency list, instead of sort-merging — which
      // re-sorted the 2|E| adjacency rows every level. The frontier is
      // ≤ |V| narrow rows hash-partitioned across the shuffle, so the
      // per-partition build fits executor memory at any graph size that
      // fits a cluster (guide-standard SHJ condition); measured
      // 1.1 → 0.6 s for the 3-level query at local[32]/sf0.1 with
      // row-identical output (19 693 rows, equal node/dist sums).
      val f = frontier.hint("shuffle_hash")
      frontier = f
        .join(adj, f("node") === adj("a"))
        .select(col("b").as("node"), lit(i).as("dist"))
        .distinct()
      all = all.unionAll(frontier)
    }
    all.groupBy("node").agg(min(col("dist")).as("dist"))
  }

  /** Declared query: 3-hop BFS distances on the co-order graph from the
    * low-id part seeds (pk ≤ 10). Seeds come straight off the edge
    * table (filter + distinct) — the r16 form ran the full degree
    * rollup only to drop the degree column, which cost an extra
    * union-aggregate over 2|E| rows per level-subtree replication. */
  val qGraphBfs: Q = (s, d) => {
    val edges = coOrderEdges(s, d)
    val seeds = edges.filter(col("u") <= 10).select(col("u").as("node"))
      .unionAll(edges.filter(col("v") <= 10).select(col("v").as("node")))
      .distinct()
    bfsDepths(edges, seeds, maxDepth = 3)
  }

  /** k-core peeling, a FIXED number of synchronous rounds: each round
    * drops every node with degree < k and restricts the edge set to
    * surviving endpoints (two semi-joins against the |V|-row keep list).
    * A fixed round count keeps the result deterministic — full
    * convergence iterates the same step with an empty-delta stop test,
    * exactly the [[qGraphComponents]] recipe. Returns the post-peel
    * degree table (a node may dip below k again on the final round —
    * that residue is the next round's work).
    *
    * Iteration discipline: keep sets shrink monotonically
    * (keep_r ⊆ keep_{r-1}, since a surviving node must appear in the
    * induced edge set), so each round re-filters the BASE edge table
    * against only the latest keep set, and that keep set is
    * materialized per round (eager localCheckpoint of |V| narrow
    * rows). Without the per-round cut the lazily-composed plan
    * references each prior round's frame four times and grows as
    * 4^rounds — the fixture plan hit 248 join nodes at 3 rounds —
    * while with it every round is the same constant-size plan over
    * two leaves. This is the persisted-frontier discipline every
    * iterative graph engine applies; the checkpoint jobs are the
    * per-round cost, exactly as at cluster scale. */
  def kcorePeel(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    def induced(keep: DataFrame): DataFrame =
      edges0
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
    var keep: Option[DataFrame] = None
    for (_ <- 1 to rounds) {
      val e = keep.fold(edges0)(induced)
      keep = Some(degrees(e).filter(col("degree") >= k).select("node")
        .localCheckpoint(true))
    }
    degrees(induced(keep.get))
  }

  /** Declared query: 3 peeling rounds toward the 8-core of the co-order
    * graph (k = 8 sits inside the fixture's degree distribution — min
    * degree 3, median ≈ 21 at sf0.01 — so the peel removes real nodes
    * and cascades). */
  val qGraphKcore: Q = (s, d) =>
    // The per-round eager checkpoints run at plan-build; memoized per
    // corpus so steady-state construction is job-free (LazyRegistrySpec)
    // — the ingest-artifact discipline for iterative results.
    Artifacts.memo(edgeCache, s"kcore:${System.identityHashCode(s)}:$d", Artifacts.unpersistDf)(
      kcorePeel(coOrderEdges(s, d), 8, 3))

  /** Bounded Bellman–Ford: `rounds` synchronous relaxations of integer
    * edge weights from a seed set — after r rounds every node holds the
    * exact shortest distance among paths of ≤ r edges (the full
    * algorithm runs |V|−1 rounds with an empty-delta stop). Same
    * per-round materialization discipline as [[kcorePeel]]: the
    * |V|-row distance table is eagerly checkpointed each round, so the
    * plan stays constant-size instead of doubling per relaxation; each
    * round is one dist⋈edges shuffle + one min-combine — the classic
    * iterative-graph shape. */
  def ssspRounds(wEdges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    val adj = wEdges.select(col("u").as("a"), col("v").as("b"), col("w"))
      .unionAll(wEdges.select(col("v").as("a"), col("u").as("b"), col("w")))
    var dist = seeds.select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(adj, dist("node") === adj("a"))
        .select(col("b").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist
  }

  /** Declared query: 3-round shortest distances on the co-order graph
    * from the low-id seeds, deterministic integer weights
    * w(u,v) = 1 + (u+v) mod 5. */
  val qGraphSssp: Q = (s, d) =>
    // Memoized like qGraphKcore: the per-round relaxations checkpoint
    // eagerly at plan-build, once per session.
    Artifacts.memo(edgeCache, s"sssp:${System.identityHashCode(s)}:$d", Artifacts.unpersistDf) {
      val edges = coOrderEdges(s, d)
        .withColumn("w", lit(1L) + pmod(col("u") + col("v"), lit(5L)))
      val seeds = degrees(coOrderEdges(s, d))
        .select("node").filter(col("node") <= 10)
      ssspRounds(edges, seeds, rounds = 3)
    }

  /** Synchronous label propagation (Raghavan et al. 2007's LPA made
    * deterministic): labels start as node ids; each round every node
    * adopts the most frequent label among its neighbors with ties
    * broken toward the SMALLEST label (argmin over the orderable
    * (−count, label) struct — LPA's usual random tie-break is what
    * makes it nondeterministic, and a total order restores
    * engine-exact replay). A FIXED round count, per-round materialized
    * label tables (the [[kcorePeel]] frontier discipline: each round is
    * one adjacency join + two keyed aggregations over |V| rows, and the
    * eager localCheckpoint keeps the plan constant-size instead of
    * 4^rounds). Community detection as the dedup/linkage family uses
    * it: after r rounds, label = a community representative id. */
  def labelPropagate(edges: DataFrame, rounds: Int): DataFrame = {
    val adj = edges.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(edges.select(col("v").as("node"), col("u").as("nbr")))
    var labels = adj.select(col("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.select(col("node").as("nbr"), col("label")), "nbr")
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(min_by(col("label"),
          struct((-col("cnt")).as("nc"), col("label").as("lb")))
          .as("label"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Declared query: 3 synchronous LPA rounds on the co-order graph.
    * Memoized like [[qGraphSssp]]: the per-round label tables
    * checkpoint eagerly at plan-build, once per session. */
  val qGraphLabelProp: Q = (s, d) =>
    Artifacts.memo(edgeCache,
      s"lpa:${System.identityHashCode(s)}:$d", Artifacts.unpersistDf) {
      labelPropagate(coOrderEdges(s, d), rounds = 3)
    }

  /** Per-node local clustering coefficient in exact ppm:
    * cc = 2·triangles div (deg·(deg−1)), NULL for degree-1 nodes (the
    * coefficient is undefined on a single edge; DuckDB's `// 0`
    * agrees). Pure arithmetic over [[triangleCounts]] — the wedge join
    * runs once, degree-oriented, and the readout costs nothing more
    * than the triangle table itself. Headroom: 2·tri·10⁶ rides
    * decimal(38); tri ≤ deg² ≤ 10¹⁸ for a 10⁹-degree hub stays inside. */
  def clusteringCoefficients(edges: DataFrame): DataFrame =
    triangleCounts(edges)
      .select(col("node"), col("degree"), col("triangles"),
        expr("""CASE WHEN degree >= 2 THEN
                CAST(CAST(triangles AS DECIMAL(38,0)) * 2000000
                  div (CAST(degree AS DECIMAL(38,0)) * (degree - 1))
                AS LONG) END""").as("cc_ppm"))

  /** Declared query: local clustering coefficient on the co-order
    * part graph. */
  val qGraphClustering: Q = (s, d) =>
    clusteringCoefficients(coOrderEdges(s, d))

  /** Degree assortativity (Newman 2002, Phys. Rev. Lett. 89.208701):
    * the Pearson correlation of endpoint degrees over the undirected
    * edge list, from four exact sufficient statistics —
    * m, S1 = Σₑ(j+k), S2 = Σₑ(j²+k²), S3 = Σₑ jk — with the one float
    * readout r = (4m·S3 − S1²) / (2m·S2 − S1²) evaluated as the
    * IDENTICAL expression over the same exact integers in both engines
    * (the [[AssociationOps.qRegrFit]] slope device; an integer ppm is
    * deliberately NOT emitted — r can be negative, where Spark's `div`
    * truncates but DuckDB's `//` floors).
    *
    * 100 TB shape: the degree table joins the edge list TWICE on its
    * own keys (u then v) — two keyed shuffles over (edge, degree) rows,
    * then one map-side-combinable fold to a single row. Headroom: S1
    * rides decimal(38) and S1² is the envelope — safe to S1 ≈ 10¹⁹
    * (≈10¹⁵ edges at average degree 10⁴); past that, scale degrees to a
    * declared coarser grain first (the qAggSkew discipline). */
  def assortativity(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    edges
      .join(deg.select(col("node").as("u"), col("degree").as("j")), "u")
      .join(deg.select(col("node").as("v"), col("degree").as("k")), "v")
      .agg(count(lit(1)).as("m"),
        sum(dec(col("j")) + col("k")).as("s1"),
        sum(dec(col("j")) * col("j") + dec(col("k")) * col("k")).as("s2"),
        sum(dec(col("j")) * col("k")).as("s3"))
      // num/den go decimal→STRING→double (the exactDouble device,
      // DESIGN.md §7 rule 3): s1² outgrows 2⁵³ grain already at sf1,
      // where DuckDB's native int128→double would double-round
      .select(col("m"),
        col("s1").cast("long").as("s1"),
        col("s2").cast("long").as("s2"),
        col("s3").cast("long").as("s3"),
        ((lit(4) * col("m") * col("s3") - col("s1") * col("s1"))
          .cast("string").cast("double")
          / (lit(2) * col("m") * col("s2") - col("s1") * col("s1"))
            .cast("string").cast("double")).as("r"))
  }

  /** Declared query: degree assortativity of the co-order part graph. */
  val qGraphAssortativity: Q = (s, d) => assortativity(coOrderEdges(s, d))

  /** Newman modularity of the BRAND partition of the co-order graph —
    * "are same-brand parts co-ordered more than degree-chance predicts?"
    * Q = Σ_c [e_c/m − (d_c/2m)²] = Σ_c (4m·e_c − d_c²) / 4m², emitted
    * as exact integers: per brand `e_in` (intra-brand edges), `d_c`
    * (degree mass), the contribution NUMERATOR `4m·e_c − d_c²` and the
    * shared denominator `4m²` — numerator/denominator stay separate
    * columns because contributions go negative, where Spark's `div`
    * truncates but DuckDB's `//` floors (the [[assortativity]] rule).
    *
    * 100 TB shape: the brand dim joins onto both edge endpoints with
    * NO forced broadcast (|part| rows scale with SF — AQE broadcasts
    * while it fits, a bucketed dim join past that), each edge then
    * UNPIVOTS into its two (brand, intra?) stubs map-side, and ONE
    * brand-keyed fold yields d_c = stubs, 2e_c = intra stubs per brand;
    * 2m re-derives from the |brands|-row fold itself via a partition-
    * less window (no second scan, no driver scalar). Headroom: the
    * products ride decimal(38) internally; the emitted LONGs hold to
    * m2 ≈ 3·10⁹ stubs (1.5·10⁹ edges) — past that, emit the decimals
    * through the exactDouble string device (DESIGN.md §7 rule 3). */
  val qGraphModularity: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val brand = Tables.part(s, d)
      .select(col("p_partkey"), col("p_brand"))
    val withB = coOrderEdges(s, d)
      .join(brand.select(col("p_partkey").as("u"),
        col("p_brand").as("bu")), "u")
      .join(brand.select(col("p_partkey").as("v"),
        col("p_brand").as("bv")), "v")
    val stubs = withB.select(col("bu").as("brand"),
        (col("bu") === col("bv")).as("intra"))
      .unionAll(withB.select(col("bv").as("brand"),
        (col("bu") === col("bv")).as("intra")))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    stubs.groupBy(col("brand"))
      .agg(count(lit(1)).as("d_c"),
        sum(when(col("intra"), 1L).otherwise(0L)).as("e2_c"))
      .withColumn("m2", sum(col("d_c")).over(Window.partitionBy()))
      .select(col("brand"), expr("CAST(e2_c div 2 AS LONG)").as("e_in"),
        col("d_c"),
        (dec(col("m2")) * col("e2_c") - dec(col("d_c")) * col("d_c"))
          .cast("long").as("q_num"),
        (dec(col("m2")) * col("m2")).cast("long").as("q_den"))
  }

  /** Degree-distribution census of the co-order graph: per observed
    * degree value, the node count and the exact CCDF in ppm
    * (`nodes with degree ≥ d` · 10⁶ div |V|) — the one-glance
    * power-law-or-not health readout every graph pipeline snapshots
    * before trusting hub-sensitive algorithms (triangle orientation,
    * salting decisions both key off the tail this table exposes).
    *
    * Scale shape: degrees is one union-agg exchange; the histogram is
    * a |distinct degrees|-row contraction and both the descending
    * cumulative window and the total ride it. */
  val qGraphDegreeDist: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val hist = degrees(coOrderEdges(s, d))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
    val wDesc = Window.orderBy(col("degree").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("n_ge", sum(col("n_nodes")).over(wDesc))
      .withColumn("total",
        sum(col("n_nodes")).over(Window.partitionBy()))
      .select(col("degree"), col("n_nodes"), col("n_ge"),
        expr("""CAST(CAST(n_ge AS DECIMAL(38,0)) * 1000000 div total
                AS LONG)""").as("ccdf_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "q_graph_degree_dist" -> qGraphDegreeDist,
    "q_graph_modularity" -> qGraphModularity,
    "q_graph_degree" -> qGraphDegree,
    "q_graph_clustering" -> qGraphClustering,
    "q_graph_assortativity" -> qGraphAssortativity,
    "q_graph_triangles" -> qGraphTriangles,
    "q_graph_jaccard" -> qGraphJaccard,
    "q_graph_components" -> qGraphComponents,
    "q_graph_pagerank" -> qGraphPagerank,
    "q_graph_bfs" -> qGraphBfs,
    "q_graph_kcore" -> qGraphKcore,
    "q_graph_sssp" -> qGraphSssp,
    "q_graph_label_prop" -> qGraphLabelProp)

  /** Shared oracle prelude: the same canonical co-order edge set.
    * `AS MATERIALIZED` is a DuckDB evaluation hint, not a semantic
    * change: every graph oracle references `e` (and often a derived
    * `adj`) several times, and DuckDB inlines CTEs by default — at the
    * sf10 rehearsal the q_graph_bfs oracle recomputed the blocking
    * 45M-row DISTINCT self-join once per frontier level and spilled
    * past 80 GB of temp disk; materialized, the same oracle finishes
    * in under a minute (round 13, BASELINE.md sf10 row). */
  private val edgeCteBody: String =
    """p AS MATERIALIZED (
         SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         FROM lineitem WHERE l_linenumber <= 3),
       e AS MATERIALIZED (
         SELECT DISTINCT a.pk AS u, b.pk AS v
         FROM p a JOIN p b ON a.ok = b.ok AND a.pk < b.pk)"""

  private val edgeCte: String = "WITH " + edgeCteBody

  val oracleSql: Map[String, String] = Map(
    "q_graph_degree_dist" -> (edgeCte +
      """,
       deg AS (
         SELECT node, COUNT(*) AS degree FROM (
           SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
         GROUP BY 1),
       h AS (SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY 1),
       r AS (
         SELECT degree, n_nodes,
           SUM(n_nodes) OVER (ORDER BY degree DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_ge,
           SUM(n_nodes) OVER () AS total
         FROM h)
       SELECT degree, CAST(n_nodes AS BIGINT) AS n_nodes,
         CAST(n_ge AS BIGINT) AS n_ge,
         CAST(CAST(n_ge AS HUGEINT) * 1000000 // total AS BIGINT)
           AS ccdf_ppm
       FROM r ORDER BY degree"""),
    "q_graph_modularity" -> (edgeCte +
      """,
       eb AS (
         SELECT pu.p_brand AS bu, pv.p_brand AS bv
         FROM e JOIN part pu ON pu.p_partkey = e.u
                JOIN part pv ON pv.p_partkey = e.v),
       stubs AS (
         SELECT bu AS brand, bu = bv AS intra FROM eb
         UNION ALL SELECT bv AS brand, bu = bv AS intra FROM eb),
       f AS (
         SELECT brand, COUNT(*) AS d_c,
           SUM(CASE WHEN intra THEN 1 ELSE 0 END) AS e2_c
         FROM stubs GROUP BY 1),
       g AS (SELECT brand, d_c, e2_c, SUM(d_c) OVER () AS m2 FROM f)
       SELECT brand, CAST(e2_c // 2 AS BIGINT) AS e_in,
         CAST(d_c AS BIGINT) AS d_c,
         CAST(CAST(m2 AS HUGEINT) * e2_c
           - CAST(d_c AS HUGEINT) * d_c AS BIGINT) AS q_num,
         CAST(CAST(m2 AS HUGEINT) * m2 AS BIGINT) AS q_den
       FROM g ORDER BY brand"""),
    "q_graph_label_prop" -> (edgeCte +
      """,
       adj AS MATERIALIZED (SELECT u AS node, v AS nbr FROM e
               UNION ALL SELECT v AS node, u AS nbr FROM e),
       l0 AS (SELECT DISTINCT node, node AS label FROM adj),
       c1 AS (SELECT a.node, l.label, COUNT(*) AS cnt
              FROM adj a JOIN l0 l ON a.nbr = l.node GROUP BY 1, 2),
       l1 AS (SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER (
                  PARTITION BY node ORDER BY cnt DESC, label) AS rk
                FROM c1) WHERE rk = 1),
       c2 AS (SELECT a.node, l.label, COUNT(*) AS cnt
              FROM adj a JOIN l1 l ON a.nbr = l.node GROUP BY 1, 2),
       l2 AS (SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER (
                  PARTITION BY node ORDER BY cnt DESC, label) AS rk
                FROM c2) WHERE rk = 1),
       c3 AS (SELECT a.node, l.label, COUNT(*) AS cnt
              FROM adj a JOIN l2 l ON a.nbr = l.node GROUP BY 1, 2),
       l3 AS (SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER (
                  PARTITION BY node ORDER BY cnt DESC, label) AS rk
                FROM c3) WHERE rk = 1)
       SELECT node, label FROM l3 ORDER BY node"""),
    "q_graph_sssp" -> (edgeCte +
      """,
       we AS (SELECT u, v, 1 + (u + v) % 5 AS w FROM e),
       adj AS MATERIALIZED (SELECT u AS a, v AS b, w FROM we
               UNION ALL SELECT v AS a, u AS b, w FROM we),
       d0 AS (SELECT DISTINCT a AS node, CAST(0 AS BIGINT) AS dist
              FROM adj WHERE a <= 10),
       d1 AS (SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d0
                UNION ALL
                SELECT adj.b AS node, d0.dist + adj.w AS dist
                FROM d0 JOIN adj ON d0.node = adj.a) GROUP BY node),
       d2 AS (SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d1
                UNION ALL
                SELECT adj.b AS node, d1.dist + adj.w AS dist
                FROM d1 JOIN adj ON d1.node = adj.a) GROUP BY node),
       d3 AS (SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d2
                UNION ALL
                SELECT adj.b AS node, d2.dist + adj.w AS dist
                FROM d2 JOIN adj ON d2.node = adj.a) GROUP BY node)
       SELECT node, dist FROM d3 ORDER BY node"""),
    "q_graph_kcore" -> (edgeCte +
      """,
       dg0 AS (SELECT node, count(*) AS degree
               FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
               GROUP BY node),
       k0 AS (SELECT node FROM dg0 WHERE degree >= 8),
       e1 AS MATERIALIZED (SELECT e.u, e.v FROM e
              JOIN k0 a ON e.u = a.node JOIN k0 b ON e.v = b.node),
       dg1 AS (SELECT node, count(*) AS degree
               FROM (SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1)
               GROUP BY node),
       k1 AS (SELECT node FROM dg1 WHERE degree >= 8),
       e2 AS MATERIALIZED (SELECT e1.u, e1.v FROM e1
              JOIN k1 a ON e1.u = a.node JOIN k1 b ON e1.v = b.node),
       dg2 AS (SELECT node, count(*) AS degree
               FROM (SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2)
               GROUP BY node),
       k2 AS (SELECT node FROM dg2 WHERE degree >= 8),
       e3 AS MATERIALIZED (SELECT e2.u, e2.v FROM e2
              JOIN k2 a ON e2.u = a.node JOIN k2 b ON e2.v = b.node)
       SELECT node, count(*) AS degree
       FROM (SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
       GROUP BY node ORDER BY node"""),
    "q_graph_bfs" -> (edgeCte +
      """,
       adj AS MATERIALIZED (SELECT u AS a, v AS b FROM e
               UNION ALL SELECT v AS a, u AS b FROM e),
       d0 AS (SELECT DISTINCT a AS node FROM adj WHERE a <= 10),
       l1 AS (SELECT DISTINCT adj.b AS node
              FROM adj JOIN d0 ON adj.a = d0.node),
       l2 AS (SELECT DISTINCT adj.b AS node
              FROM adj JOIN l1 ON adj.a = l1.node),
       l3 AS (SELECT DISTINCT adj.b AS node
              FROM adj JOIN l2 ON adj.a = l2.node),
       lv AS (SELECT node, 0 AS dist FROM d0
              UNION ALL SELECT node, 1 FROM l1
              UNION ALL SELECT node, 2 FROM l2
              UNION ALL SELECT node, 3 FROM l3)
       SELECT node, CAST(MIN(dist) AS INT) AS dist
       FROM lv GROUP BY node ORDER BY node"""),
    "q_graph_degree" -> (edgeCte +
      """
         SELECT node, count(*) AS degree
         FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
         GROUP BY node ORDER BY node"""),
    "q_graph_assortativity" -> (edgeCte +
      """,
       d AS (
         SELECT node, count(*) AS degree
         FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
         GROUP BY node),
       ed AS (
         SELECT du.degree AS j, dv.degree AS k
         FROM e JOIN d du ON du.node = e.u JOIN d dv ON dv.node = e.v),
       a AS (
         SELECT COUNT(*) AS m,
           SUM(CAST(j AS HUGEINT) + k) AS s1,
           SUM(CAST(j AS HUGEINT) * j + CAST(k AS HUGEINT) * k) AS s2,
           SUM(CAST(j AS HUGEINT) * k) AS s3
         FROM ed)
       SELECT CAST(m AS BIGINT) AS m,
         CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
         CAST(s3 AS BIGINT) AS s3,
         CAST(CAST(4 * m * s3 - s1 * s1 AS VARCHAR) AS DOUBLE)
           / CAST(CAST(2 * m * s2 - s1 * s1 AS VARCHAR) AS DOUBLE) AS r
       FROM a"""),
    "q_graph_clustering" -> (edgeCte +
      """,
       d AS (
         SELECT node, count(*) AS degree
         FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
         GROUP BY node),
       t AS (
         SELECT e1.u AS x, e1.v AS y, e2.v AS z
         FROM e e1
         JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
         JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
       tc AS (
         SELECT node, count(*) AS tri
         FROM (SELECT unnest([x, y, z]) AS node FROM t) GROUP BY node)
       SELECT d.node, d.degree,
         CAST(COALESCE(tc.tri, 0) AS BIGINT) AS triangles,
         CASE WHEN d.degree >= 2 THEN
           CAST(CAST(COALESCE(tc.tri, 0) AS HUGEINT) * 2000000
             // (CAST(d.degree AS HUGEINT) * (d.degree - 1)) AS BIGINT)
         END AS cc_ppm
       FROM d LEFT JOIN tc USING (node) ORDER BY d.node"""),
    "q_graph_triangles" -> (edgeCte +
      """,
       d AS (
         SELECT node, count(*) AS degree
         FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
         GROUP BY node),
       t AS (
         SELECT e1.u AS x, e1.v AS y, e2.v AS z
         FROM e e1
         JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
         JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
       tc AS (
         SELECT node, count(*) AS tri
         FROM (SELECT unnest([x, y, z]) AS node FROM t) GROUP BY node)
       SELECT d.node, d.degree,
         CAST(COALESCE(tc.tri, 0) AS BIGINT) AS triangles
       FROM d LEFT JOIN tc USING (node) ORDER BY d.node"""),
    "q_graph_jaccard" -> (edgeCte +
      """,
       d AS (
         SELECT node, count(*) AS degree
         FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
         GROUP BY node),
       t AS (
         SELECT e1.u AS x, e1.v AS y, e2.v AS z
         FROM e e1
         JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
         JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
       te AS (
         SELECT x AS u, y AS v FROM t
         UNION ALL SELECT x AS u, z AS v FROM t
         UNION ALL SELECT y AS u, z AS v FROM t),
       tc AS (SELECT u, v, count(*) AS common FROM te GROUP BY u, v)
       SELECT e.u, e.v,
         CAST(COALESCE(tc.common, 0) AS BIGINT) AS common,
         CAST((1000 * COALESCE(tc.common, 0))
           // (du.degree + dv.degree - COALESCE(tc.common, 0)) AS BIGINT)
           AS jac_pm
       FROM e
       LEFT JOIN tc ON tc.u = e.u AND tc.v = e.v
       JOIN d du ON du.node = e.u
       JOIN d dv ON dv.node = e.v
       ORDER BY e.u, e.v"""),
    "q_graph_components" -> ("WITH RECURSIVE " + edgeCteBody +
      """,
       sub AS (SELECT u, v FROM e WHERE u % 10 = 0 AND v % 10 = 0),
       sym AS (
         SELECT u AS id, v AS nbr FROM sub
         UNION ALL SELECT v AS id, u AS nbr FROM sub),
       reach(id, r) AS (
         SELECT id, id FROM sym
         UNION
         SELECT sym.id, reach.r FROM sym JOIN reach ON reach.id = sym.nbr)
       SELECT id AS node, MIN(r) AS component
       FROM reach GROUP BY id ORDER BY node"""),
    "q_graph_pagerank" ->
      """WITH e AS MATERIALIZED (
           SELECT DISTINCT l_suppkey AS src,
             l_partkey + 10000000 AS dst
           FROM lineitem),
         nodes AS MATERIALIZED (
           SELECT src AS node FROM e UNION SELECT dst FROM e),
         p AS MATERIALIZED (
           SELECT 1000000000000 // count(*) AS base FROM nodes),
         od AS MATERIALIZED (
           SELECT src, count(*) AS od FROM e GROUP BY src),
         r0 AS (SELECT node, (SELECT base FROM p) AS rank FROM nodes),
         s1 AS (
           SELECT e.dst AS node, CAST(SUM(r0.rank // od.od) AS BIGINT) AS s
           FROM e JOIN r0 ON r0.node = e.src JOIN od ON od.src = e.src
           GROUP BY e.dst),
         r1 AS (
           SELECT n.node,
             (15 * (SELECT base FROM p)) // 100
               + (85 * COALESCE(s1.s, 0)) // 100 AS rank
           FROM nodes n LEFT JOIN s1 ON s1.node = n.node),
         s2 AS (
           SELECT e.dst AS node, CAST(SUM(r1.rank // od.od) AS BIGINT) AS s
           FROM e JOIN r1 ON r1.node = e.src JOIN od ON od.src = e.src
           GROUP BY e.dst),
         r2 AS (
           SELECT n.node,
             (15 * (SELECT base FROM p)) // 100
               + (85 * COALESCE(s2.s, 0)) // 100 AS rank
           FROM nodes n LEFT JOIN s2 ON s2.node = n.node),
         s3 AS (
           SELECT e.dst AS node, CAST(SUM(r2.rank // od.od) AS BIGINT) AS s
           FROM e JOIN r2 ON r2.node = e.src JOIN od ON od.src = e.src
           GROUP BY e.dst),
         r3 AS (
           SELECT n.node,
             (15 * (SELECT base FROM p)) // 100
               + (85 * COALESCE(s3.s, 0)) // 100 AS rank
           FROM nodes n LEFT JOIN s3 ON s3.node = n.node)
         SELECT node, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY node""")
}
