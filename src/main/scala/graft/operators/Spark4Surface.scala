package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Spark 4 SQL-surface features a warehouse user migrating in 2025+
  * expects to keep: the VARIANT semi-structured type, SQL-defined
  * scalar functions, and pipe syntax. Each is sugar/typing over plans
  * this engine already runs — the queries pin that the FEATURE works
  * end-to-end and produces the same rows as the classical formulation
  * (which is exactly what the DuckDB oracles state).
  *
  * Reference basis: the reference carries ad-hoc JSON-ish payloads in
  * its scraped rows (`dags/warsaw-delays.py:144-155` chip/link/span
  * extraction into untyped cells); VARIANT is the engine-native answer
  * to that column.
  *
  * Scale notes: VARIANT parses once per row map-side (binary-encoded,
  * no re-parse per extraction); the SQL UDF inlines into the plan at
  * analysis time (it is NOT a black-box function — predicates through
  * it still push down); pipe stages desugar to the identical
  * filter→agg→filter plan, so none of these add operators or
  * exchanges. */
object Spark4Surface {

  type Q = (SparkSession, String) => DataFrame

  /** VARIANT ingestion + typed extraction: parse the JSON props column
    * to a variant ONCE, extract a typed long and a missing path (NULL,
    * not an error), and roll up per event type. */
  val qVariantExtract: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("var_events")
    s.sql(
      """SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(variant_get(v, '$.k', 'long')) AS BIGINT) AS sum_k,
           CAST(COUNT(variant_get(v, '$.missing', 'long')) AS BIGINT)
             AS n_missing_path
         FROM (SELECT event_type, parse_json(props) AS v FROM var_events)
         GROUP BY event_type""")
  }

  /** SQL-defined scalar function (CREATE FUNCTION ... RETURN expr):
    * the function body inlines at analysis time, so using it costs
    * nothing vs writing the expression — but the definition is shared,
    * named, and catalog-managed. */
  val qSqlUdf: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("udf_events")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_biz_hours(h INT)
         RETURNS BOOLEAN RETURN h BETWEEN 9 AND 17""")
    s.sql(
      """SELECT event_type,
           COUNT(*) AS n,
           CAST(COUNT(CASE WHEN graft_biz_hours(hour(ts)) THEN 1 END)
             AS BIGINT) AS n_business
         FROM udf_events GROUP BY event_type""")
  }

  /** Pipe-syntax pipeline (FROM … |> WHERE |> AGGREGATE |> …): the
    * linear dataflow spelling of filter→agg→having→project. */
  val qSqlPipe: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("pipe_events")
    s.sql(
      """FROM pipe_events
         |> WHERE event_type IN ('click', 'purchase')
         |> AGGREGATE COUNT(*) AS n,
              CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS BIGINT) AS n_buy
            GROUP BY user_id
         |> WHERE n >= 5
         |> SELECT user_id, n, n_buy""")
  }

  /** Collated grouping (Spark 4 COLLATE): a deterministically
    * case-varied copy of c_mktsegment (even keys lowercased) groups
    * under UTF8_LCASE back into the five segments — the collation does
    * the case-folding inside the grouping key itself (hash and equality
    * are collation-aware; one exchange, no pre-normalization pass) —
    * while COUNT(DISTINCT raw) pins that each merged group really held
    * two binary spellings. The emitted key is lower()ed because the
    * representative a collated group surfaces is engine-arbitrary;
    * lower() of either spelling is the same string, which is what the
    * oracle (DuckDB lower()-keyed grouping) states. */
  val qCollateGroup: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("coll_customer")
    s.sql(
      """SELECT lower(seg) AS segment, COUNT(*) AS n,
           CAST(COUNT(DISTINCT raw) AS BIGINT) AS n_spellings
         FROM (SELECT collate(CASE WHEN c_custkey % 2 = 0
                         THEN lower(c_mktsegment) ELSE c_mktsegment END,
                       'UTF8_LCASE') AS seg,
                      CASE WHEN c_custkey % 2 = 0
                         THEN lower(c_mktsegment) ELSE c_mktsegment END
                        AS raw
               FROM coll_customer)
         GROUP BY seg""")
  }

  val queries: Map[String, Q] = Map(
    "q_variant_extract" -> qVariantExtract,
    "q_sql_udf" -> qSqlUdf,
    "q_sql_pipe" -> qSqlPipe,
    "q_collate_group" -> qCollateGroup)

  val oracleSql: Map[String, String] = Map(
    "q_variant_extract" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS sum_k,
           CAST(COUNT(json_extract_string(props, '$.missing')) AS BIGINT)
             AS n_missing_path
         FROM events GROUP BY event_type""",
    "q_sql_udf" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(COUNT(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 9 AND 17
             THEN 1 END) AS BIGINT) AS n_business
         FROM events GROUP BY event_type""",
    "q_sql_pipe" ->
      """SELECT user_id, COUNT(*) AS n,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
             AS BIGINT) AS n_buy
         FROM events WHERE event_type IN ('click', 'purchase')
         GROUP BY user_id HAVING COUNT(*) >= 5""",
    "q_collate_group" ->
      """WITH c AS (
           SELECT CASE WHEN c_custkey % 2 = 0
                    THEN lower(c_mktsegment) ELSE c_mktsegment END AS raw
           FROM customer)
         SELECT lower(raw) AS segment, COUNT(*) AS n,
           CAST(COUNT(DISTINCT raw) AS BIGINT) AS n_spellings
         FROM c GROUP BY lower(raw)""")
}
