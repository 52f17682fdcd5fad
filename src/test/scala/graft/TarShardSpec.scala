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

  // ──────────────────────────── write side ────────────────────────────

  import spark.implicits._

  private def sampleRows = Seq(
    ("out-000.tar", "000001", "txt", "alpha".getBytes("UTF-8")),
    ("out-000.tar", "000000", "json", """{"y":1}""".getBytes("UTF-8")),
    ("out-000.tar", "000000", "txt", "zero".getBytes("UTF-8")),
    ("out-001.tar", "000002", "bin", Array[Byte](0, 127, -128, 64)),
    ("out-001.tar", "000002", "json", "[]".getBytes("UTF-8")))

  test("writer round-trips through the reader byte-exactly") {
    val out = Files.createTempDirectory("graft-wds-w").toString
    sampleRows.toDF("shard", "key", "ext", "data")
      .write.format("wds").mode("append").save(out)
    val files = new java.io.File(out).listFiles.filter(_.getName.endsWith(".tar"))
    assert(files.map(_.getName).toSet == Set("out-000.tar", "out-001.tar"))
    assert(!new java.io.File(out).listFiles.exists(_.getName.startsWith("_staging")),
      "staging dir must be cleaned up on commit")
    val back = spark.read.format("wds").load(out)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Array[Byte]](3).toSeq))
      .toSet
    assert(back == sampleRows
      .map(t => (t._1, t._2, t._3, t._4.toSeq)).toSet)
  }

  test("writer emits sample members contiguously, sorted by (shard, key)") {
    val out = Files.createTempDirectory("graft-wds-w2").toString
    sampleRows.toDF("shard", "key", "ext", "data")
      .write.format("wds").mode("append").save(out)
    // the WebDataset contract: within a shard, all members of a sample
    // are adjacent — stream the tar raw and check key runs never split
    val tin = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
      new java.io.FileInputStream(s"$out/out-000.tar"))
    val names = Iterator.continually(tin.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toList
    tin.close()
    val keys = names.map(n => n.substring(0, n.indexOf('.')))
    assert(keys == keys.sorted, s"member keys not sorted: $keys")
    assert(keys.distinct.length == keys.toSet.size, "sample keys split")
  }

  test("overwrite truncates stale shards; append leaves them in place") {
    val out = Files.createTempDirectory("graft-wds-w3").toString
    sampleRows.toDF("shard", "key", "ext", "data")
      .write.format("wds").mode("append").save(out)
    val extra = Seq(("out-009.tar", "000009", "txt", "nine".getBytes("UTF-8")))
    extra.toDF("shard", "key", "ext", "data")
      .write.format("wds").mode("append").save(out)
    assert(spark.read.format("wds").load(out).count() == 6)
    // overwrite with only the extra shard — the out-000/out-001 tars go
    extra.toDF("shard", "key", "ext", "data")
      .write.format("wds").mode("overwrite").save(out)
    val left = spark.read.format("wds").load(out)
    assert(left.count() == 1)
    assert(left.select("shard").as[String].first() == "out-009.tar")
  }

  test("writer declares shard clustering: one task per shard, no dup tars") {
    val out = Files.createTempDirectory("graft-wds-w4").toString
    // many shards from a deliberately scrambled, repartitioned input —
    // RequiresDistributionAndOrdering must reassemble them
    val rows = (0 until 200).map { i =>
      (f"sh-${i % 7}%03d.tar", f"k$i%05d", "txt", s"v$i".getBytes("UTF-8"))
    }
    rows.toDF("shard", "key", "ext", "data")
      .repartition(13)
      .write.format("wds").mode("append").save(out)
    val files = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".tar")).map(_.getName)
    assert(files.length == 7, s"expected 7 shards, got ${files.toSeq}")
    val back = spark.read.format("wds").load(out)
    assert(back.count() == 200)
    assert(back.groupBy("shard").count().collect()
      .forall(r => r.getLong(1) >= 28 && r.getLong(1) <= 29))
  }

  test("writer rejects a frame without the wds columns") {
    val out = Files.createTempDirectory("graft-wds-w5").toString
    val e = intercept[Exception] {
      Seq(("a", "b")).toDF("shard", "key")
        .write.format("wds").mode("append").save(out)
    }
    assert(e.getMessage.contains("wds write needs column"))
  }

  private def causeChain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")

  test("append fails loudly on a pre-existing shard-name collision") {
    val out = Files.createTempDirectory("graft-wds-w6").toString
    sampleRows.toDF("shard", "key", "ext", "data")
      .write.format("wds").mode("append").save(out)
    val e = intercept[Exception] {
      Seq(("out-000.tar", "000042", "txt", "clobber".getBytes("UTF-8")))
        .toDF("shard", "key", "ext", "data")
        .write.format("wds").mode("append").save(out)
    }
    assert(causeChain(e).contains("already exist"), causeChain(e))
    // the committed shard survives byte-identical — append never replaces
    val back = spark.read.format("wds").load(out)
    assert(back.count() == 5)
    assert(back.filter(col("key") === "000042").count() == 0)
    // overwrite IS the replace mode: the same collision succeeds there
    Seq(("out-000.tar", "000042", "txt", "fresh".getBytes("UTF-8")))
      .toDF("shard", "key", "ext", "data")
      .write.format("wds").mode("overwrite").save(out)
    val after = spark.read.format("wds").load(out)
    assert(after.count() == 1)
    assert(after.select("key").as[String].first() == "000042")
  }

  test("writer names the null column instead of an opaque NPE") {
    val out = Files.createTempDirectory("graft-wds-w7").toString
    val e = intercept[Exception] {
      Seq(("out-000.tar", "000001", null.asInstanceOf[String],
          "x".getBytes("UTF-8")))
        .toDF("shard", "key", "ext", "data")
        .write.format("wds").mode("append").save(out)
    }
    val msg = causeChain(e)
    assert(msg.contains("null in required column") && msg.contains("ext"),
      msg)
  }

  test("packing manifest bins are exactly the tars the writer produces") {
    import org.apache.spark.sql.expressions.Window
    val out = Files.createTempDirectory("graft-wds-x").toString
    // per-item assignment = the SAME running-offset rule the manifest
    // rolls up (Layout.qMultimodalShard), kept before its groupBy
    val sized = graft.multimodal.MediaOps.mediaTable(spark, TestSpark.sf)
      .select(col("doc_id"), col("kind"), col("media"),
        octet_length(col("media")).cast("long").as("bytes"))
    val w = Window.partitionBy("kind").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    sized
      .withColumn("cum_before",
        coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("shard_id", expr("cum_before div 16384"))
      .select(
        format_string("%s-%04d.tar", col("kind"), col("shard_id"))
          .as("shard"),
        format_string("%012d", col("doc_id")).as("key"),
        lit("bin").as("ext"), col("media").as("data"))
      .write.format("wds").mode("append").save(out)
    val produced = spark.read.format("wds").load(out)
      .groupBy("shard")
      .agg(count(lit(1)).as("n"),
        sum(octet_length(col("data")).cast("long")).as("b"),
        min(col("key")).as("kmin"), max(col("key")).as("kmax"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3).toLong, r.getString(4).toLong))).toMap
    val manifest = SparkEntry.queries("q_multimodal_shard")(
        spark, TestSpark.sf)
      .collect()
      .map(r => f"${r.getAs[String]("kind")}-${r.getAs[Long]("shard")}%04d.tar" ->
        ((r.getAs[Long]("n_items"), r.getAs[Long]("bytes_total"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))).toMap
    assert(produced.keySet == manifest.keySet,
      s"shard sets differ: ${produced.keySet.diff(manifest.keySet)} / " +
        s"${manifest.keySet.diff(produced.keySet)}")
    manifest.foreach { case (shard, (n, bytes, firstDoc, lastDoc)) =>
      assert(produced(shard) == ((n, bytes, firstDoc, lastDoc)),
        s"$shard: manifest ($n,$bytes,$firstDoc,$lastDoc) vs " +
          s"tar ${produced(shard)}")
    }
  }
}
