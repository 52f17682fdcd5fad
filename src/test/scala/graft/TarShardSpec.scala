package graft

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.Files

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WebDataset tar source (graft.sources.TarShardSource): flat member
  * rows, sample assembly in the query, column pruning that skips
  * payload bytes, conservative name-filter pushdown. */
class TarShardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeShard(path: String,
      members: Seq[(String, Array[Byte])]): Unit = {
    val out = new TarArchiveOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    members.foreach { case (name, bytes) =>
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e)
      out.write(bytes)
      out.closeArchiveEntry()
    }
    out.close()
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-wds").toString
    writeShard(s"$d/shard-000.tar", Seq(
      "000000.jpg" -> Array[Byte](1, 2, 3, 4),
      "000000.json" -> """{"label": 7}""".getBytes("UTF-8"),
      "000000.txt" -> "a caption".getBytes("UTF-8"),
      "000001.jpg" -> Array[Byte](9, 8),
      "000001.json" -> """{"label": 3}""".getBytes("UTF-8")))
    writeShard(s"$d/shard-001.tar", Seq(
      "000002.seg.json" -> "[1,2]".getBytes("UTF-8"),
      "000002.jpg" -> Array[Byte](5)))
    d
  }

  test("reads every member with key/ext split and byte-exact payloads") {
    val rows = spark.read.format("wds").load(dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Array[Byte]](3).toSeq, r.getLong(4)))
    assert(rows.length == 7)
    assert(rows.count(_._1 == "shard-000.tar") == 5)
    val seg = rows.find(_._3 == "seg.json").get
    assert(seg._2 == "000002" && seg._4 == "[1,2]".getBytes("UTF-8").toSeq)
    val jpg0 = rows.find(r => r._2 == "000000" && r._3 == "jpg").get
    assert(jpg0._4 == Seq[Byte](1, 2, 3, 4) && jpg0._5 == 4L)
  }

  test("samples assemble with one groupBy(key) + map_from_entries") {
    val samples = spark.read.format("wds").load(dir)
      .groupBy("shard", "key")
      .agg(map_from_entries(collect_list(struct(col("ext"), col("data"))))
        .as("parts"))
    val m = samples.collect()
      .map(r => r.getString(1) -> r.getMap[String, Array[Byte]](2)).toMap
    assert(m.keySet == Set("000000", "000001", "000002"))
    assert(new String(m("000000")("txt"), "UTF-8") == "a caption")
    assert(m("000001").keySet == Set("jpg", "json"))
  }

  test("metadata-only scans prune the payload column down to the reader") {
    val meta = spark.read.format("wds").load(dir)
      .select("shard", "key", "ext", "size")
    // the V2 scan reports the narrow schema — `data` never materializes
    assert(!meta.queryExecution.executedPlan.toString.contains("data#"))
    val sizes = meta.collect().map(r => (r.getString(1), r.getString(2)) ->
      r.getLong(3)).toMap
    assert(sizes(("000000", "txt")) == 9L)
    assert(sizes.size == 7)
  }

  test("name filters push down and skip members before payload read") {
    val jsons = spark.read.format("wds").load(dir)
      .filter(col("ext") === "json")
    val desc = jsons.queryExecution.executedPlan.toString
    assert(desc.contains("PushedFilters") && desc.contains("ext"),
      s"expected a pushed ext filter in:\n${desc.take(1500)}")
    assert(jsons.count() == 2)
    val prefix = spark.read.format("wds").load(dir)
      .filter(col("key").startsWith("00000") && col("shard")
        === "shard-001.tar")
    assert(prefix.collect().map(_.getString(1)).toSet == Set("000002"))
  }

  test("loads explicit shard paths as well as directories") {
    val one = spark.read.format("wds").load(s"$dir/shard-001.tar")
    assert(one.count() == 2)
    val both = spark.read.format("wds")
      .load(s"$dir/shard-000.tar", s"$dir/shard-001.tar")
    assert(both.count() == 7)
  }
}
