package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Spark4Surface

/** The Spark 4 surface features are sugar over classical plans — these
  * pin the desugaring claims (the value equality is DuckDB-pinned). */
class Spark4SurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("SQL UDF inlines: no black-box UDF node in the optimized plan") {
    val plan = Spark4Surface.qSqlUdf(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      "a SQL-defined function must inline, not become a ScalaUDF")
  }

  test("pipe syntax desugars to the same rows as the classical SQL") {
    Tables.events(spark, sf).createOrReplaceTempView("p4_events")
    val classical = spark.sql(
      """SELECT user_id, COUNT(*) AS n,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
             AS BIGINT) AS n_buy
         FROM p4_events WHERE event_type IN ('click', 'purchase')
         GROUP BY user_id HAVING COUNT(*) >= 5""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val piped = Spark4Surface.qSqlPipe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(piped == classical && piped.nonEmpty)
  }

  test("variant extraction: missing paths are NULL, typed k sums match JSON") {
    val rows = Spark4Surface.qVariantExtract(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5)
    rows.foreach { case (_, _, _, nMissing) => assert(nMissing == 0L) }
    val want = Tables.events(spark, sf)
      .selectExpr("event_type",
        "CAST(get_json_object(props, '$.k') AS LONG) AS k")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    rows.foreach { case (et, _, sumK, _) => assert(sumK == want(et)) }
  }

  test("collated grouping merges case variants the binary grouping splits") {
    val rows = Spark4Surface.qCollateGroup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // five segments survive the UTF8_LCASE merge, each holding both the
    // upper and the lower spelling (customer keys alternate parity)
    assert(rows.length == 5, s"expected 5 collated groups, got $rows")
    rows.foreach { case (seg, n, spellings) =>
      assert(seg == seg.toLowerCase)
      assert(n > 0L)
      assert(spellings == 2L, s"$seg: expected 2 binary spellings")
    }
    // control: binary (default-collation) grouping sees 10 keys
    val binary = Tables.customer(spark, sf)
      .selectExpr("""CASE WHEN c_custkey % 2 = 0
          THEN lower(c_mktsegment) ELSE c_mktsegment END AS raw""")
      .groupBy("raw").count().count()
    assert(binary == 10L)
  }
}
