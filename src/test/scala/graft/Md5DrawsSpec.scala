package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.functions.Md5Draws24]] — the codegen'd draw kernel
  * behind q_bootstrap_ci — against the CONTRACT form the DuckDB oracle
  * still runs textually: window k of md5(s) = conv(substr(hex, 1+6k, 6),
  * 16, 10). The two must agree value-for-value on every window of every
  * row, including the null-propagation case. */
class Md5DrawsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("digest-byte windows equal the hex/conv contract form") {
    import graft.functions.Md5Draws24.md5Draws
    val ids = Tables.events(spark, TestSpark.sf)
      .select(col("event_id")).limit(2000)
    val both = (0 until 7).foldLeft(ids) { (df, g) =>
      val s = concat(col("event_id").cast(StringType), lit("#boot"),
        lit(g).cast(StringType))
      df.withColumn(s"dr$g", md5Draws(s))
        .withColumn(s"mh$g", md5(s))
    }
    val mismatches = (0 until 7).flatMap { g =>
      (0 until 5).map { w =>
        both.filter(
          element_at(col(s"dr$g"), w + 1) =!=
            conv(substr(col(s"mh$g"), lit(1 + 6 * w), lit(6)), 16, 10)
              .cast("long")).count()
      }
    }
    assert(mismatches.forall(_ == 0L),
      s"kernel diverges from the hex/conv contract form: $mismatches")
  }

  test("null input propagates to null, like md5") {
    import graft.functions.Md5Draws24.md5Draws
    val row = spark.range(1)
      .select(md5Draws(lit(null).cast(StringType)).as("d")).head()
    assert(row.isNullAt(0))
  }

  test("hex-prefix kernel equals the conv(substring(md5)) contract form" +
      " at every width in use") {
    import graft.functions.Md5Draws24.md5Prefix
    val s = concat(col("event_id").cast(StringType), lit("#pfx"))
    val base = Tables.events(spark, TestSpark.sf)
      .select(col("event_id")).limit(2000)
    val widths = Seq(4, 6, 8, 15)
    val mismatches = widths.map { n =>
      base.filter(md5Prefix(s, n) =!=
        conv(substring(md5(s), 1, n), 16, 10).cast("long")).count()
    }
    assert(mismatches.forall(_ == 0L),
      s"prefix kernel diverges at widths $widths: $mismatches")
    // null propagation
    val row = spark.range(1)
      .select(md5Prefix(lit(null).cast(StringType), 8).as("p")).head()
    assert(row.isNullAt(0))
  }

  test("interpreted eval matches codegen (draws helper directly)") {
    val bytes = "42#boot0".getBytes("UTF-8")
    val d = graft.functions.Md5Draws24.draws(bytes)
    val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(bytes)
    val ref = (0 until 5).map(k =>
      java.lang.Long.parseLong(hex.substring(6 * k, 6 * k + 6), 16))
    assert(d.toSeq == ref)
  }
}
