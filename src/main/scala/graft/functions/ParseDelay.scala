package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Typed parsing of `"5 min"`-style duration strings → seconds — the parse
  * the reference never does (its scraped `Delay` column stays a raw string,
  * dags/warsaw-delays.py:147-154,182).
  *
  * Kept as a scalar Scala UDF deliberately: it is the declared UDF surface
  * of the engine (SURVEY.md §2.2 `q_udf_parse_delay`). For hot 100 TB paths
  * prefer the equivalent codegen-friendly native form:
  * `regexp_extract(col, "(\\d+)", 1).cast("int") * (case unit …)`.
  */
object ParseDelay {

  private val Pattern = """\s*(-?\d+)\s*(h|min|s)\s*""".r

  def parse(raw: String): Option[Int] = raw match {
    case Pattern(n, unit) =>
      val v = n.toInt
      unit match {
        case "h"   => Some(v * 3600)
        case "min" => Some(v * 60)
        case "s"   => Some(v)
      }
    case _ => None
  }

  val parseDelayUdf = udf((raw: String) =>
    Option(raw).flatMap(parse)) // Option → nullable Int column

  def parseDelay(c: Column): Column = parseDelayUdf(c)
}
