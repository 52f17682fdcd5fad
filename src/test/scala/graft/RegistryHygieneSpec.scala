package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** Round-end evidence hygiene, enforced by the build instead of by
  * discipline: rounds 11 and 12 each leaked one stale artifact (a
  * 29-query SURVEY registry drift; an untracked sf10 record). The two
  * generated registry views — docs/QUERIES.md (tools/gen_index.py) and
  * SURVEY.md §2's registry print (graft.tools.ListRegistry) — must
  * match the declared registry at every `sbt test`, so deliberate
  * staleness fails the suite. (The third generated view, the plan
  * census, is already asserted by PlanQualitySpec.) */
class RegistryHygieneSpec extends AnyFunSuite {

  test("docs/QUERIES.md matches the source registry (gen_index --check)") {
    val log = new StringBuilder
    val rc = Process(Seq("python3", "tools/gen_index.py", "--check"))
      .!(ProcessLogger(l => { log.append(l).append('\n'); () }))
    assert(rc == 0,
      s"docs/QUERIES.md is stale — regenerate with " +
        s"`python3 tools/gen_index.py`:\n$log")
  }

  test("SURVEY.md registry print matches the declared registry") {
    val lines = {
      val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
      try src.getLines().toVector finally src.close()
    }
    val hdrIdx = lines.indexWhere(_.startsWith("total="))
    assert(hdrIdx >= 0, "registry print header (total=...) not in SURVEY.md")
    val tokens = lines.drop(hdrIdx + 1)
      .takeWhile(l => !l.startsWith("```") && !l.startsWith("(*"))
      .flatMap(_.trim.split("\\s+")).filter(_.startsWith("q_"))
    val printed = tokens.map(_.stripSuffix("*")).toSet
    val printedNoOracle =
      tokens.filter(_.endsWith("*")).map(_.stripSuffix("*")).toSet
    val declared = SparkEntry.queries.keySet
    val declaredNoOracle = declared -- SparkEntry.oracleSql.keySet
    val missing = (declared -- printed).toSeq.sorted
    val stale = (printed -- declared).toSeq.sorted
    assert(missing.isEmpty && stale.isEmpty,
      s"SURVEY.md registry print drift — rerun `sbt \"runMain " +
        s"graft.tools.ListRegistry\"` and paste the block: " +
        s"missing=$missing stale=$stale")
    assert(printedNoOracle == declaredNoOracle,
      s"SURVEY.md no-oracle stars drift: " +
        s"unstarred=${(declaredNoOracle -- printedNoOracle).toSeq.sorted} " +
        s"over-starred=${(printedNoOracle -- declaredNoOracle).toSeq.sorted}")
    val wantHdr = s"total=${declared.size} " +
      s"oracle=${declared.size - declaredNoOracle.size} " +
      s"no_oracle=${declaredNoOracle.size}"
    assert(lines(hdrIdx) == wantHdr,
      s"SURVEY.md registry header drift: have '${lines(hdrIdx)}', " +
        s"want '$wantHdr'")
  }
}
