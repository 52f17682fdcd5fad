package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf
  import spark.implicits._

  private def edgesDf(es: Seq[(Long, Long)]) =
    es.toDF("a", "b")

  test("canonicalEdges: orders, dedups, and drops self-loops") {
    val e = Graph.canonicalEdges(
      edgesDf(Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 5L))), "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(e == Set((1L, 2L), (2L, 5L)))
  }

  test("triangleCounts on a known graph: K4 plus a pendant") {
    // K4 on {1,2,3,4} (4 triangles, 3 per node) + pendant edge 4-5
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = Graph.canonicalEdges(edgesDf(k4 :+ (4L, 5L)), "a", "b")
    val got = Graph.triangleCounts(edges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((3L, 3L)) && got(2L) == ((3L, 3L)) &&
      got(3L) == ((3L, 3L)))
    assert(got(4L) == ((4L, 3L))) // degree 4 (pendant), still 3 triangles
    assert(got(5L) == ((1L, 0L))) // pendant: degree 1, no triangles
  }

  test("triangleCounts equals brute force on random graphs") {
    val gen = Gen.listOf(Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)))
    val prop = Prop.forAll(gen) { raw =>
      val es = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      val adj = es.toSet
      def linked(x: Long, y: Long) = adj((math.min(x, y), math.max(x, y)))
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val wantTri = nodes.map { n =>
        val nb = nodes.filter(m => m != n && linked(n, m))
        n -> nb.combinations(2).count { case Seq(x, y) => linked(x, y) }
      }.toMap
      val wantDeg = nodes.map(n =>
        n -> nodes.count(m => m != n && linked(n, m))).toMap
      val got = Graph.triangleCounts(edgesDf(es).transform(
          df => Graph.canonicalEdges(df, "a", "b")))
        .as[(Long, Long, Long)].collect()
      got.length == nodes.length && got.forall { case (n, d, t) =>
        wantDeg(n) == d && wantTri(n) == t
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("pageRankScaled equals a plain-Scala integer fold, mass bounded") {
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    val scale = 1000000000000L
    val got = Graph.pageRankScaled(edgesDf(es).select(
        col("a").as("src"), col("b").as("dst")), iters = 3)
      .as[(Long, Long)].collect().toMap
    // plain-Scala replica of the declared recurrence
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val base = scale / nodes.length
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to 3) {
      val in = es.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      r = nodes.map(n =>
        n -> ((15L * base) / 100L + (85L * in.getOrElse(n, 0L)) / 100L)).toMap
    }
    assert(got == r)
    // integer truncation only loses mass: total rank stays ≤ scale
    assert(got.values.sum <= scale && got.values.forall(_ > 0))
  }

  test("edgeJaccard equals brute force on random graphs") {
    val gen = Gen.listOf(Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)))
    val prop = Prop.forAll(gen) { raw =>
      val es = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      val adj = es.toSet
      def linked(x: Long, y: Long) = adj((math.min(x, y), math.max(x, y)))
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      def nbrs(n: Long) = nodes.filter(m => m != n && linked(n, m)).toSet
      val got = Graph.edgeJaccard(edgesDf(es).transform(
          df => Graph.canonicalEdges(df, "a", "b")))
        .as[(Long, Long, Long, Long)].collect()
      got.length == es.length && got.forall { case (u, v, common, jacPm) =>
        val cn = (nbrs(u) intersect nbrs(v)).size.toLong
        val un = (nbrs(u) union nbrs(v)).size.toLong
        cn == common && jacPm == 1000 * cn / un
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("qGraphComponents: labels are component-consistent on the fixture") {
    val labels = Graph.qGraphComponents(spark, sf)
      .as[(Long, Long)].collect().toMap
    val sub = Graph.coOrderEdges(spark, sf)
      .filter(col("u") % 10 === 0 && col("v") % 10 === 0)
      .as[(Long, Long)].collect()
    assert(labels.nonEmpty && sub.nonEmpty)
    // both endpoints of every edge share a label; labels are component
    // minima (each label labels itself)
    sub.foreach { case (u, v) =>
      assert(labels(u) == labels(v), s"edge ($u,$v) split")
    }
    labels.values.foreach(l => assert(labels(l) == l, s"label $l not a root"))
    // the decile subgraph is genuinely fragmented (the reason it is the
    // declared fixture): more than one component
    assert(labels.values.toSet.size > 1)
  }

  test("declared co-order graph queries run and agree with each other") {
    val deg = Graph.qGraphDegree(spark, sf).as[(Long, Long)].collect().toMap
    val tri = Graph.qGraphTriangles(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(tri.nonEmpty && tri.length == deg.size)
    tri.foreach { case (n, d, t) =>
      assert(deg(n) == d)
      // a node in t triangles has at least 2 neighbors per... loose bound:
      // triangles ≤ C(degree, 2)
      assert(t <= d * (d - 1) / 2, s"node $n")
    }
    val pr = Graph.qGraphPagerank(spark, sf).as[(Long, Long)].collect()
    assert(pr.nonEmpty && pr.forall(_._2 > 0))
    assert(pr.map(_._2).sum <= 1000000000000L)
  }

  test("label propagation matches a plain-Scala synchronous LPA mirror") {
    import spark.implicits._
    val edges = Graph.coOrderEdges(spark, sf)
      .as[(Long, Long)].collect()
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(labels).map { case (l, xs) => (l, xs.size) }
        n -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = Graph.qGraphLabelProp(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == labels)
    // communities actually formed: strictly fewer labels than nodes
    assert(got.values.toSet.size < got.size)
  }
}
