package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GeneratorOps

/** Semantics + plan-shape checks for the generator / iterative-SQL
  * family (each query is also DuckDB-oracle-pinned). */
class GeneratorOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("recursive CTE executes via UnionLoop and walks every chain fully") {
    val df = GeneratorOps.qRecursiveCte(spark, sf)
    assert(df.queryExecution.optimizedPlan.toString.contains("UnionLoop"),
      "recursion should plan as Spark 4's UnionLoop operator")
    val rows = df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val nations = Tables.nation(spark, sf)
      .select("n_nationkey", "n_regionkey").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    // every nation reached exactly once
    assert(rows.length == nations.length)
    assert(rows.map(_._1).toSet == nations.map(_._1).toSet)
    rows.groupBy(_._2).foreach { case (_, chain) =>
      val byDepth = chain.sortBy(_._4)
      // depths are 1..n with keys strictly increasing along the chain
      assert(byDepth.map(_._4).sameElements(1 to chain.length))
      assert(byDepth.map(_._1).sameElements(byDepth.map(_._1).sorted))
      // the whole chain carries its region's minimum key as root
      assert(byDepth.forall(_._3 == byDepth.head._1))
    }
  }

  test("inline VALUES dim maps every priority to a tier, totals preserved") {
    val rows = GeneratorOps.qValuesInline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).sorted.sameElements(Seq("lazy", "rush", "std")))
    assert(rows.map(_._2).sum == Tables.orders(spark, sf).count())
  }

  test("sequence explode opens each order for exactly 4 days") {
    val total = GeneratorOps.qGeneratorSequence(spark, sf).collect()
      .map(_.getLong(1)).sum
    assert(total == 4L * Tables.orders(spark, sf).count())
  }
}
