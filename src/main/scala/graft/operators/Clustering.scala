package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Connected components over a near-duplicate pair list — the clustering
  * step that turns pairwise "a looks like b" output into curation
  * decisions (keep one representative per component). Greedy
  * drop-the-higher-id-of-any-pair over-drops: on edges (1,3),(2,3) it
  * removes 2 AND 3 even though 2 and 3 were only near 1's neighbor, not
  * each other — component semantics keeps exactly min-id per cluster.
  *
  * Algorithm: smallest-id label propagation. Every node starts labeled
  * with its own id; each round a node takes the min of its own and its
  * neighbors' labels; fixpoint = min id of the connected component.
  * Rounds = graph diameter (halved by the pointer-jump step). Near-dup
  * graphs at high thresholds are clique-like (diameter 1–2), so a few
  * rounds end-to-end; for adversarial long-chain graphs at 100 TB use
  * [[componentLabelsStar]] — alternating large-star/small-star (Kiveris
  * et al., "Connected Components in MapReduce and Beyond"), which
  * converges in O(log² n) rounds regardless of diameter on the same
  * join+min primitive. Every round is one shuffle join on node id + one
  * groupBy — no driver-side graph state; the driver holds only the loop
  * counter and the per-round changed count.
  */
object Clustering {

  /** Session-scoped label artifacts — like the pair lists they derive
    * from (DedupQueries.pairCache) and the IVF index, cluster labels are
    * an ingest artifact at 100 TB: materialized once per landed corpus,
    * read by every downstream curation/dedup job. */
  private val labelCache =
    scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** Drop cached label artifacts (see [[DedupQueries.clearArtifacts]]). */
  def clearArtifacts(): Unit = labelCache.clear()

  /** (id, label) for every node appearing in `pairs` (doc_a, doc_b);
    * label = smallest doc_id reachable through the pair graph. */
  def componentLabels(pairs: DataFrame, maxIter: Int = 25,
      cacheKey: Option[String] = None): DataFrame =
    cacheKey match {
      case Some(k) => Artifacts.memo(labelCache, k, Artifacts.unpersistDf)(
        propagate(pairs, maxIter))
      case None    => propagate(pairs, maxIter)
    }

  private def propagate(pairs: DataFrame, maxIter: Int): DataFrame = {
    val sym = pairs
      .select(col("doc_a").as("id"), col("doc_b").as("nbr"))
      .union(pairs.select(col("doc_b").as("id"), col("doc_a").as("nbr")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Eager localCheckpoint each round: `labels` feeds later rounds, so
    // without lineage truncation the logical plan doubles per iteration —
    // 2^rounds copies of the whole pair-generation tree kill the analyzer
    // long before the data does. Checkpointed blocks live on executors;
    // on a real cluster swap for reliable checkpoint() if executor loss
    // mid-loop must be survivable.
    //
    // Round 0 fuses the first propagation round from identity labels into
    // a single groupBy: label(v) = min(v, min nbr(v)) — one aggregation
    // instead of a join round. On clique-like near-dup graphs this IS the
    // fixpoint, so the loop below only runs the cheap convergence check.
    var labels = sym.groupBy("id")
      .agg(least(col("id"), min(col("nbr"))).as("label"))
      .localCheckpoint(true)
    // Frontier propagation: only nodes whose label improved last round
    // can lower a neighbor this round (any label a node ever holds is
    // seen by all its neighbors in the round right after acquisition —
    // unchanged nodes' values were already offered). The frontier join's
    // build side shrinks toward empty, so late rounds broadcast a few
    // rows instead of re-shuffling the full label table; the final
    // "nothing changed" verification round is near-free.
    var frontier = labels.filter(col("label") < col("id"))
    var changed = frontier.count()
    var iter = 1
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(frontier.select(col("id").as("nbr"), col("label").as("nlabel")),
          "nbr")
        .groupBy("id").agg(min("nlabel").as("nbr_label"))
      val mid = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
      // pointer jump (path compression): follow the fresh label one more
      // hop through the PREVIOUS label table — L'(v) = min(m(v),
      // L_prev(m(v))). Every label is itself a node id, so the hop is an
      // equality join of the label table with itself-as-of-last-round
      // (node-count rows, broadcast-sized next to the edge join), and the
      // round compounds two hops instead of one — ~half the rounds on
      // chain-shaped components. Joining the checkpointed labels (not
      // `mid`) keeps the edge join computed exactly once per round.
      // carry old + new label in ONE frame: the convergence check needs
      // no next-vs-previous self-join (derived-lineage self-joins resolve
      // ambiguously), and the checkpoint that cuts the round's lineage is
      // the same materialization the frontier count reads
      val stepped = mid
        .join(labels.select(col("id").as("jid"), col("label").as("jlabel")),
          col("label") === col("jid"), "left")
        .select(col("id"), col("old_label"),
          least(col("label"), coalesce(col("jlabel"), col("label")))
            .as("label"))
        .localCheckpoint(true)
      frontier = stepped.filter(col("label") < col("old_label"))
        .select("id", "label")
      changed = frontier.count()
      labels = stepped.select("id", "label")
      iter += 1
    }
    sym.unpersist(false)
    // Non-convergence must be LOUD: returning the last iterate would
    // split long-chain components into several clusters and let
    // near-duplicates through curation with no signal. Chains needing
    // more than maxIter doubled-hop rounds should use
    // [[componentLabelsStar]] (O(log² n) on any shape).
    if (changed > 0)
      throw new IllegalStateException(
        s"componentLabels: not converged after $maxIter rounds " +
          s"($changed labels still improving) — raise maxIter or use " +
          "componentLabelsStar for long-chain graphs")
    labels
  }

  /** Diameter-independent connected components: alternating
    * large-star/small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond") — same (id, label) contract as
    * [[componentLabels]], converging in O(log² n) rounds on ANY graph
    * shape, including the long chains where label propagation needs
    * O(diameter) rounds. Use when component structure is unknown or
    * adversarial; the propagation loop stays the default because on
    * clique-like near-dup graphs it finishes in fewer, cheaper rounds.
    *
    *  - large-star, per node u: emit (v, min(Γ⁺(u))) for every STRICTLY
    *    LARGER neighbor v — hangs big nodes under the local minimum
    *  - small-star, per node u: emit (v, min(Γ⁻(u) ∪ u)) for every
    *    smaller-or-self neighbor — compresses the remaining chains
    *
    * Both are one groupBy-min + one keyed join over the edge list;
    * fixpoint = star graphs whose centers are the component minima.
    * Every intermediate edge (x, y) is an IN-COMPONENT pair (each step
    * only rewires a node to another member of its own component), so the
    * final stars label exactly the input's components. */
  def componentLabelsStar(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    var edges = pairs
      .select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: m(u) = min of closed neighborhood; (m ≤ u < v) ⇒ the
      // emitted (m, v) is already canonically ordered
      val sym = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val mL = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val afterLarge = sym.join(mL, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
      // small-star: per u over smaller neighbors N (v < u): hang
      // (N ∪ {u}) \ {m} under m = min(N)
      val dir = afterLarge.select(col("b").as("u"), col("a").as("v"))
      val mS = dir.groupBy("u").agg(min("v").as("m"))
      val afterSmall = dir.join(mS, "u")
        .filter(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
        .union(mS.select(col("m").as("a"), col("u").as("b")))
        .distinct()
        .localCheckpoint(true)
      // set-equality convergence: equal cardinality + empty difference
      converged = afterSmall.count() == edges.count() &&
        afterSmall.except(edges).isEmpty
      edges = afterSmall
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"componentLabelsStar: not converged after $maxIter rounds — " +
          "raise maxIter (O(log² n) bound suggests a data anomaly)")
    edges.select(col("a").as("id"), col("a").as("label"))
      .union(edges.select(col("b").as("id"), col("a").as("label")))
      .groupBy("id").agg(min("label").as("label"))
  }

  /** (doc_id, label) for every doc in a non-singleton J ≥ tNum/tDen
    * token-set component — semantically identical to
    * `componentLabels(DedupQueries.ngramPairs(docs, ...))` but computed on
    * the identical-set QUOTIENT graph.
    *
    * Jaccard is a function of the token SET alone, so docs with identical
    * sets form J=1 cliques and are interchangeable in every cross-set
    * comparison. Contracting them first (groupBy canonical set key, keep
    * the min-doc_id representative) is the decisive scale move for
    * high-dup corpora: a 700-doc identical-set cluster contributes ~245k
    * rows to the enumerated pair list but exactly ONE node here, so the
    * similarity self-join and the propagation loop run on distinct sets —
    * bounded by content diversity, not corpus size. Exact for any
    * threshold (identical sets: J=1 ≥ t; cross-group: J(members) =
    * J(sets) = J(reps)); property-tested against the uncontracted path. */
  def setContractedLabels(docs: DataFrame, tNum: Int, tDen: Int,
      cacheKey: Option[String] = None): DataFrame = {
    def build(): DataFrame = {
      val (keyed, groups) =
        DedupQueries.setGroups(docs, cacheKey.map(k => s"$k:groups"))
      // checkpoint: the pair build scans its input corpus several times
      // (vocabulary pass + prefix explode) — don't re-run the semi-join
      val repDocs = docs.join(groups.select(col("rep").as("doc_id")),
        Seq("doc_id"), "left_semi")
        .localCheckpoint(true)
      val repLabels = componentLabels(
        DedupQueries.ngramPairs(repDocs, tNum, tDen))
      // a doc is clustered iff its set-group has company (gsize > 1) or
      // its representative pairs with another distinct set
      keyed.join(groups.select(col("skey"), col("rep"),
          size(col("members")).as("gsize")), "skey")
        .join(repLabels.select(col("id").as("rep"), col("label").as("rlabel")),
          Seq("rep"), "left")
        .filter(col("gsize") > 1 || col("rlabel").isNotNull)
        .select(col("doc_id"), coalesce(col("rlabel"), col("rep")).as("label"))
    }
    cacheKey match {
      case Some(k) => Artifacts.memo(labelCache, s"$k:$tNum:$tDen",
        Artifacts.unpersistDf)(build())
      case None    => build()
    }
  }

  /** Every document labeled with its near-dup cluster representative
    * (smallest doc_id in its J ≥ 0.9 token-set component; singletons
    * label themselves). */
  def clusterDocs(docs: DataFrame, tNum: Int, tDen: Int,
      cacheKey: Option[String] = None): DataFrame = {
    val labels = setContractedLabels(docs, tNum, tDen, cacheKey)
    docs.select(col("doc_id"))
      .join(labels.select(col("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"))
  }

  type Q = (SparkSession, String) => DataFrame

  /** Shares its pair-list artifact with q_dedup_ngram (same corpus, same
    * threshold — `docs:$d`) and caches the propagated labels. */
  val qDedupCluster: Q = (s, d) =>
    clusterDocs(Tables.documents(s, d), tNum = 9, tDen = 10,
      cacheKey = Some(s"docs:$d"))

  val queries: Map[String, Q] = Map("q_dedup_cluster" -> qDedupCluster)

  /** Oracle: transitive closure by recursive CTE, min reachable id —
    * CONTRACTED on the distinct token SET (round 14; the same
    * set-quotient the Spark side uses). Jaccard is a pure function of
    * the two token sets, and docs sharing a set are pairwise similar
    * (Jaccard 1 ≥ 0.9; sets are never empty — string_split yields at
    * least one element), so the expanded
    * doc graph's components are the set graph's components with whole
    * set-groups substituted for their reps; each group's min doc_id IS
    * its rep (MIN over the group), so min reachable doc = min reachable
    * rep. The r13 form self-joined ALL docs (quadratic in the corpus —
    * the 1800 s sf10 timeout); contracted, the quadratic step runs on
    * distinct token sets, which the 100× mirror's verbatim text copies
    * keep at base-corpus scale. `list_sort` canonicalizes the set so
    * GROUP BY list equality is order-insensitive (list_intersect never
    * cared; GROUP BY does). Old-vs-new verified row-identical at
    * sf0.01 and on an sf1 slice this round. */
  val oracleSql: Map[String, String] = Map(
    "q_dedup_cluster" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id,
             list_sort(list_distinct(string_split(lower(text), ' ')))
               AS toks
           FROM documents),
         g AS MATERIALIZED (
           SELECT toks, MIN(doc_id) AS rep, COUNT(*) AS sz
           FROM t GROUP BY toks),
         mem AS MATERIALIZED (
           SELECT g.rep, t.doc_id FROM t JOIN g USING (toks)),
         p AS (
           SELECT a.rep AS rep_a, b.rep AS rep_b
           FROM g a JOIN g b ON a.rep < b.rep
           WHERE len(list_intersect(a.toks, b.toks)) * 10 >=
                 (len(a.toks) + len(b.toks)
                  - len(list_intersect(a.toks, b.toks))) * 9),
         e AS MATERIALIZED (
           SELECT rep_a AS id, rep_b AS nbr FROM p
           UNION ALL
           SELECT rep_b AS id, rep_a AS nbr FROM p),
         reach(id, r) AS (
           SELECT rep, rep FROM g
           UNION
           SELECT e.id, reach.r FROM e JOIN reach ON reach.id = e.nbr),
         labels AS (SELECT id, MIN(r) AS label FROM reach GROUP BY id)
         SELECT m.doc_id, l.label AS cluster
         FROM mem m JOIN labels l ON l.id = m.rep
         ORDER BY m.doc_id""")
}
