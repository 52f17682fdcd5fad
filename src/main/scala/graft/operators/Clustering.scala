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
  * Rounds = graph diameter. Near-dup graphs at high thresholds are
  * clique-like (diameter 1–2), so 3–4 rounds end-to-end; for adversarial
  * long-chain graphs at 100 TB swap the step for alternating
  * large-star/small-star (Kiveris et al., "Connected Components in
  * MapReduce and Beyond"), which converges in O(log n) rounds on the
  * same join+min primitive. Every round is one shuffle join on node id +
  * one groupBy — no driver-side graph state; the driver holds only the
  * loop counter and the per-round changed count.
  */
object Clustering {

  /** (id, label) for every node appearing in `pairs` (doc_a, doc_b);
    * label = smallest doc_id reachable through the pair graph. */
  def componentLabels(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = pairs
      .select(col("doc_a").as("id"), col("doc_b").as("nbr"))
      .union(pairs.select(col("doc_b").as("id"), col("doc_a").as("nbr")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Eager localCheckpoint each round: `labels` feeds the next round
    // TWICE (own side + neighbor side), so without lineage truncation the
    // logical plan doubles per iteration — 2^rounds copies of the whole
    // pair-generation tree kill the analyzer long before the data does.
    // Checkpointed blocks live on executors; on a real cluster swap for
    // reliable checkpoint() if executor loss mid-loop must be survivable.
    var labels = sym.select(col("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("nbr"), col("label").as("nlabel")),
          "nbr")
        .groupBy("id").agg(min("nlabel").as("nbr_label"))
      // carry old + new label in ONE frame: the convergence check needs
      // no next-vs-previous self-join (derived-lineage self-joins resolve
      // ambiguously), and the checkpoint that cuts the round's lineage is
      // the same materialization the count reads
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .localCheckpoint(true)
      changed = stepped.filter(col("label") < col("old_label")).count()
      labels = stepped.select("id", "label")
      iter += 1
    }
    sym.unpersist(false)
    labels
  }

  /** Every document labeled with its near-dup cluster representative
    * (smallest doc_id in its J ≥ 0.9 token-set component; singletons
    * label themselves). */
  def clusterDocs(docs: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val labels = componentLabels(DedupQueries.ngramPairs(docs, tNum, tDen))
    docs.select(col("doc_id"))
      .join(labels.select(col("id").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"))
      .orderBy("doc_id")
  }

  type Q = (SparkSession, String) => DataFrame

  val qDedupCluster: Q = (s, d) =>
    clusterDocs(Tables.documents(s, d), tNum = 9, tDen = 10)

  val queries: Map[String, Q] = Map("q_dedup_cluster" -> qDedupCluster)

  /** Oracle: transitive closure by recursive CTE, min reachable id. */
  val oracleSql: Map[String, String] = Map(
    "q_dedup_cluster" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks
           FROM documents),
         p AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM t a JOIN t b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.toks, b.toks)) * 10 >=
                 (len(a.toks) + len(b.toks)
                  - len(list_intersect(a.toks, b.toks))) * 9),
         e AS (
           SELECT doc_a AS id, doc_b AS nbr FROM p
           UNION ALL
           SELECT doc_b AS id, doc_a AS nbr FROM p),
         reach(id, r) AS (
           SELECT id, id FROM e
           UNION
           SELECT e.id, reach.r FROM e JOIN reach ON reach.id = e.nbr),
         labels AS (SELECT id, MIN(r) AS label FROM reach GROUP BY id)
         SELECT d.doc_id, COALESCE(l.label, d.doc_id) AS cluster
         FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
         ORDER BY d.doc_id""")
}
