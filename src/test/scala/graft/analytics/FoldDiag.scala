package graft.analytics

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev diagnostic (not a test): job-level cost profile of one registry
  * query's BUILD — how many Spark jobs it runs, their wall-time
  * distribution, and the gap time between jobs (driver-side planning /
  * synchronization). The lever check for the maintainer fold loops:
  * many tiny jobs ⇒ fixed per-job overhead dominates and the driver
  * path is the bottleneck; few long jobs ⇒ the work is in executors.
  *
  *   sbt "Test/runMain graft.analytics.FoldDiag q217 /root/testdata/sf0.1"
  */
object FoldDiag {
  def main(args: Array[String]): Unit = {
    val qn = args.headOption.getOrElse("q217")
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-fold-diag")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.queries.Registry.all
      .find(_.name.startsWith(qn))
      .getOrElse(sys.error(s"no query matching $qn"))

    final case class J(id: Int, start: Long, var end: Long)
    val jobs = new ConcurrentLinkedQueue[J]
    val open = new java.util.concurrent.ConcurrentHashMap[Int, J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId, e.time, -1L)
        open.put(e.jobId, j); jobs.add(j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = open.remove(e.jobId)
        if (j != null) j.end = e.time
      }
    })

    val t0 = System.nanoTime()
    val df = q.run(spark, sfDir)
    val tBuild = (System.nanoTime() - t0) / 1e9
    df.write.format("noop").mode("overwrite").save()
    val tTotal = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)

    import scala.jdk.CollectionConverters._
    val js = jobs.asScala.toSeq.filter(_.end > 0).sortBy(_.start)
    val durs = js.map(j => (j.end - j.start) / 1000.0)
    val busy = durs.sum
    // gap time: wall between consecutive jobs (driver-side think time)
    val gaps = js.sliding(2).collect {
      case Seq(a, b) => math.max(0L, b.start - a.end) / 1000.0
    }.toSeq
    println(f"[diag] ${q.name}: build ${tBuild}%.1f s, " +
      f"total ${tTotal}%.1f s, jobs ${js.size}, " +
      f"job-busy ${busy}%.1f s, inter-job gaps ${gaps.sum}%.1f s")
    val sorted = durs.sorted
    def pct(p: Double) =
      if (sorted.isEmpty) 0.0 else sorted(((sorted.size - 1) * p).toInt)
    println(f"[diag]   job dur p50 ${pct(0.5)}%.3f s  " +
      f"p90 ${pct(0.9)}%.3f s  max ${sorted.lastOption.getOrElse(0.0)}%.3f s")
    println(s"[diag]   slowest 10 jobs: " +
      durs.zip(js.map(_.id)).sortBy(-_._1).take(10)
        .map { case (d, id) => f"#$id=$d%.2fs" }.mkString(" "))
    spark.stop()
  }
}
