package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Attribution

/** Edge cases for the round-10 additions: degenerate arms in the Welch
  * readout and the float-promotion regression pin on the shared
  * quantization kernel. */
class Round10EdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** user ids whose md5 16-bit prefix is even (arm A) / odd (arm B). */
  private def armA(u: Long): Boolean = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
    java.lang.Integer.parseInt(
      md5.take(2).map("%02x".format(_)).mkString, 16) % 2 == 0
  }
  private lazy val aUser = (1L to 100L).find(armA).get
  private lazy val bUser = (1L to 100L).find(u => !armA(u)).get

  test("Welch t-test: an empty arm yields NULL sums and NULL significance") {
    val oneArm = Seq((aUser, "solo", 10.0), (aUser, "solo", 20.0),
      (aUser, "solo", 30.0)).toDF("user_id", "event_type", "value")
    val row = Attribution.abtestTtest(oneArm).collect()(0)
    assert(row.getLong(1) == 3 && row.getLong(2) == 0)
    assert(!row.isNullAt(3) && row.isNullAt(4),
      "empty arm B must sum to NULL (oracle FILTER semantics)")
    assert(row.isNullAt(5), "significance must null-propagate")
  }

  test("Welch t-test: one user per arm (n-1 = 0) stays defined, not thrown") {
    val tiny = Seq((aUser, "t", 10.0), (bUser, "t", 99.0))
      .toDF("user_id", "event_type", "value")
    val row = Attribution.abtestTtest(tiny).collect()(0)
    // lhs = A^2 * 0 * 0 = 0, rhs = 0 -> 0 > 0 is false: never significant
    assert(!row.isNullAt(5) && !row.getBoolean(5))
  }

  test("milliQuant pins the double-precision product (0.3195f -> 319)") {
    // the round-10 regression: DuckDB's float product gives 319.5 -> 320;
    // the shared kernel must stay on the double product 319.4999... -> 319
    val df = Seq(Tuple1(Array(0.3195f, -0.3195f, 0.5004999f)))
      .toDF("embedding")
    val got = df.select(
      graft.functions.VectorFunctions.milliQuant(col("embedding")))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(319L, -319L, 500L),
      s"kernel drifted off the double-product contract: $got")
  }

  test("interval endpoints: equal-start events merge into one island") {
    // same user, identical timestamps: intervals coincide -> 1 island,
    // coverage exactly one 10-minute span
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val dup = Seq((1L, ts, 7L), (2L, ts, 7L), (3L, ts, 7L))
      .toDF("event_id", "ts", "user_id")
    dup.createOrReplaceTempView("edge_iv")
    // run the same algebra as qIntervalCoverage on the synthetic frame
    val out = spark.sql(
      """WITH iv AS (SELECT user_id, unix_micros(ts) AS ivs,
             unix_micros(ts) + 600000000 AS ive FROM edge_iv),
         m AS (SELECT user_id, ivs, ive,
             MAX(ive) OVER (PARTITION BY user_id ORDER BY ivs, ive
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pme FROM iv),
         i AS (SELECT user_id, ivs, ive,
             SUM(CASE WHEN pme IS NULL OR ivs > pme THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ivs, ive
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island FROM m)
         SELECT user_id, COUNT(DISTINCT island) AS n_islands,
           MAX(ive) - MIN(ivs) AS covered
         FROM i GROUP BY user_id""").collect()(0)
    assert(out.getLong(1) == 1L && out.getLong(2) == 600000000L)
  }
}
