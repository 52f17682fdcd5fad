package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/** Build-laziness invariant (round 11): constructing a registry
  * DataFrame must not run Spark jobs in the steady state. Eager driver
  * work at plan-build time re-runs on every plan construction (e.g.
  * per task retry in an orchestrator that rebuilds plans) and
  * serializes what should be lazy. Session artifacts — dedup pair
  * tables, IVF/PQ indexes, logistic weights, corpus-count scalars,
  * iterative-frontier results — MAY run jobs on their FIRST build (the
  * ingest-artifact precedent), so the assertion runs against a warmed
  * artifact cache and pins that every such scalar/frame is memoized:
  * round 11 found eleven queries (bm25/vocab/perplexity scalar counts,
  * kcore/sssp frontier checkpoints, curate's gate, ANN probe vectors,
  * share-of-total's N) silently re-counting per construction. */
class LazyRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val documentedEager = Set.empty[String]

  test("registry plan construction runs zero Spark jobs (steady state)") {
    val sc = spark.sparkContext
    // Warm pass: lets memoized session artifacts build once.
    SparkEntry.queries.foreach { case (_, fn) => fn(spark, TestSpark.sf) }

    val offenders = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var current = ""
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val name = current
        if (name.nonEmpty) offenders.merge(name, 1, (a, b) => a + b)
      }
    }
    sc.addSparkListener(listener)
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        current = name
        fn(spark, TestSpark.sf)
        // Job-start events are delivered asynchronously; drain the bus
        // before moving to the next query so attribution stays correct.
        waitUntilListenerBusEmpty(sc)
      }
      current = ""
    } finally sc.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val bad = offenders.asScala.keySet -- documentedEager
    assert(bad.isEmpty,
      s"queries running eager jobs at plan-build time: ${bad.toSeq.sorted}")
  }

  /** `listenerBus` is private[spark]; reach it reflectively (public at
    * the bytecode level) with a sleep fallback if the API moves. */
  private def waitUntilListenerBusEmpty(
      sc: org.apache.spark.SparkContext): Unit =
    try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch {
      case _: Throwable => Thread.sleep(300)
    }
}
