package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusPipeline, CurationOps, TimeSeries}

/** Structural invariants of the curation operators — properties that
  * must hold on ANY corpus, complementing the exact-value oracles that
  * pin them on the fixture. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("sourceQuotaSalted equals sourceQuota on the fixture and under heavy skew") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2), r.getInt(3))).toSet
    for (k <- Seq(3, 50)) {
      assert(rows(CorpusPipeline.sourceQuotaSalted(docs, k, salts = 8))
        == rows(CorpusPipeline.sourceQuota(docs, k)), s"fixture k=$k")
    }
    // one giant source dominating the table — the regime salting exists
    // for; equality must still be exact including ties in n_chars
    val skewed = ((1 to 900).map(i => (i.toLong, "mega", i % 7)) ++
      (901 to 930).map(i => (i.toLong, s"tail-${i % 3}", i % 5)))
      .toDF("doc_id", "source", "n_chars")
    for (salts <- Seq(1, 4, 16)) {
      assert(rows(CorpusPipeline.sourceQuotaSalted(skewed, 10, salts))
        == rows(CorpusPipeline.sourceQuota(skewed, 10)), s"skew salts=$salts")
    }
  }

  test("chunkOverlap: stride-prefixes + tail reconstruct the document exactly") {
    val chunks = CurationOps.chunkOverlap(Tables.documents(spark, sf), 20, 15)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .groupBy(_._1)
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == texts.keySet)
    for ((id, cs) <- chunks) {
      val sorted = cs.sortBy(_._2)
      val toks = texts(id).split(" ", -1)
      // starts are exactly 1, 16, 31, ... ≤ n_tokens
      assert(sorted.map(_._2).toSeq == (1 to toks.length by 15))
      // each chunk is the literal 20-token slice at its start
      for ((_, start, chunk, n) <- sorted) {
        val expect = toks.slice(start - 1, start - 1 + 20)
        assert(chunk == expect.mkString(" ") && n == expect.length)
      }
      // concatenating each chunk's first 15 tokens plus the final tail
      // reproduces the document (overlap sanity)
      val rebuilt = sorted.init.flatMap(_._3.split(" ", -1).take(15)) ++
        sorted.last._3.split(" ", -1)
      assert(rebuilt.toSeq == toks.toSeq)
    }
  }

  test("rollingActiveUsers matches a brute-force trailing-window count") {
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val got = TimeSeries.rollingActiveUsers(Tables.events(spark, sf), 7)
      .collect()
      .map(r => r.getDate(0).toLocalDate -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.nonEmpty)
    for ((wday, (active, nEvents)) <- got) {
      val inWin = ev.filter { case (d, _) =>
        !d.isAfter(wday) && !d.isBefore(wday.minusDays(6))
      }
      assert(active == inWin.map(_._2).distinct.length,
        s"$wday distinct mismatch")
      assert(nEvents == inWin.length, s"$wday event count mismatch")
    }
  }

  test("splitLeakage: flagged docs are non-train with a token set seen in train") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), CorpusPipeline.splitColumn(col("doc_id")).as("split"),
        col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ").distinct.sorted.toSeq))
    val trainSets = docs.collect { case (_, "train", s) => s }.toSet
    val expected = docs.collect {
      case (id, sp, s) if sp != "train" && trainSets(s) => id
    }.toSet
    val got = CorpusPipeline.qSplitLeakage(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("q_dedup_lines: kept blocks are a prefix-closed subset; corpus keeps each block once") {
    val out = CurationOps.qDedupLines(spark, sf)
      .select("doc_id", "n_blocks", "n_kept", "kept_text").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val kept = r.getLong(2); val total = r.getLong(1)
      assert(kept <= total && kept >= 0)
      val keptTokens = r.getString(3)
      // reassembled text token count consistent with 3-token blocks
      // (last block of a doc may be shorter, so ≤ 3·kept)
      val nTok = if (keptTokens.isEmpty) 0 else keptTokens.split(" ").length
      assert(nTok <= 3 * kept)
    }
    // corpus-wide: total kept blocks == number of distinct blocks
    val docs = Tables.documents(spark, sf)
    val distinctBlocks = docs
      .withColumn("toks", split(lower(col("text")), " "))
      .select(explode(expr(
        """transform(sequence(0, (size(toks) - 1) div 3),
           i -> concat_ws(' ', slice(toks, i * 3 + 1, 3)))""")).as("blk"))
      .distinct().count()
    assert(out.map(_.getLong(2)).sum == distinctBlocks)
  }

  test("q_text_contamination: benchmark docs excluded; counts bounded by shingle counts") {
    val out = CurationOps.qTextContamination(spark, sf).collect()
    assert(out.forall(_.getLong(0) % 50 != 0))
    assert(out.forall(r => r.getLong(1) >= 0))
    assert(out.exists(_.getBoolean(2)) || out.forall(!_.getBoolean(2)))
    // contaminated flag consistent with the count
    assert(out.forall(r => r.getBoolean(2) == (r.getLong(1) > 0)))
  }

  test("q_pack_sequences: bins are contiguous per source and respect the budget arithmetic") {
    val rows = CurationOps.qPackSequences(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, grp) =>
      val sorted = grp.sortBy(_._2)
      var cum = 0L
      sorted.foreach { case (_, _, n, cumTok, bin) =>
        assert(cumTok == cum + n)        // running sum is exact
        assert(bin == (cumTok - n) / 512) // bin = first-token offset / budget
        cum = cumTok
      }
      // bin ids never decrease within a source
      assert(sorted.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("q_mix_upsample: per-language totals are balanced within one repeat factor") {
    val out = CurationOps.qMixUpsample(spark, sf)
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxCnt = orig.values.max
    perLang.foreach { case (lang, total) =>
      // ceil-repeat puts every language's exposure in [maxCnt, maxCnt + cnt)
      assert(total >= maxCnt, s"$lang under-sampled: $total < $maxCnt")
      assert(total < maxCnt + orig(lang), s"$lang over-sampled: $total")
    }
    // rep_idx is dense 1..reps per doc
    val bad = out.groupBy("doc_id").agg(count(lit(1)).as("n"),
        max("rep_idx").as("mx"), min("rep_idx").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0)
  }

  test("q_sample_weighted: keep set equals a plain-Scala md5 recomputation") {
    val kept = CorpusPipeline.qSampleWeighted(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val all = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def u16(id: Long): Long = {
      val hex = md.digest(s"$id#wsample".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16)
    }
    all.foreach { case (id, nChars) =>
      val h = u16(id)
      val want = h * 2000L < nChars * 65536L
      assert(kept.contains(id) == want, s"doc $id h=$h n_chars=$nChars")
      if (want) assert(kept(id) == h, s"doc $id reported hash")
    }
    // the acceptance probability is genuinely weight-proportional: any
    // at-or-above-cap doc must be kept, and splitting the fixture at its
    // median length, the longer half keeps a strictly larger fraction
    assert(all.filter(_._2 >= 2000L).forall(d => kept.contains(d._1)))
    val median = all.map(_._2).sorted.apply(all.length / 2)
    val (long, short) = all.partition(_._2 >= median)
    val fLong = long.count(d => kept.contains(d._1)).toDouble / long.size
    val fShort = short.count(d => kept.contains(d._1)).toDouble / short.size
    assert(fLong > fShort, s"long $fLong vs short $fShort")
  }
}
