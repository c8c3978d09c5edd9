package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query attribution of driver-log WARNs: runs every registered
  * query at sf0.001 with a marker line before each, so `grep -B` on
  * the captured log assigns any WindowExec / scale-shape warning to
  * the query that produced it. Additionally MACHINE-CHECKED (round
  * 13): an in-JVM log4j appender collects every WARN from the pinned
  * scan set — WindowExec (single-partition window = a 100 TB sort on
  * one reducer) and CacheManager (double-persist of an already-cached
  * plan) — attributes it to the running query, and exits non-zero on
  * any hit, so the WARN-free-tail discipline cannot regress silently.
  */
object ProbeWarnScan {
  // the pinned scan set: logger-name substrings whose WARNs fail the probe
  private val ScanSet = Seq("WindowExec", "CacheManager")
  @volatile private var current = "<startup>"

  def main(args: Array[String]): Unit = {
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    installCollector(hits)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      // markers go to stderr (flushed) so they interleave in order
      // with log4j's stderr appender in a combined 2>&1 capture
      current = n
      Console.err.println(s"[q] $n"); Console.err.flush()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        Console.err.println(s"[q] $n ERR ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    current = "<shutdown>"
    spark.stop()
    import scala.jdk.CollectionConverters._
    val all = hits.asScala.toSeq
    println(s"[warn-scan] ${all.size} scan-set WARNs " +
      s"(${ScanSet.mkString(", ")})")
    all.foreach(h => println(s"[warn-scan]   $h"))
    if (all.nonEmpty) sys.exit(1)
  }

  /** Attach a collecting appender for the scan set to the log4j root
    * logger (alongside the normal stderr appender, which keeps the
    * grep-able capture).
    */
  private def installCollector(hits: java.util.Queue[String]): Unit = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    val app = new AbstractAppender("graft-warn-probe", null, null, true,
        Array.empty) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        val ln = String.valueOf(e.getLoggerName)
        if (e.getLevel.isMoreSpecificThan(Level.WARN) &&
            ScanSet.exists(ln.contains)) {
          hits.add(s"$current — $ln: " +
            e.getMessage.getFormattedMessage.linesIterator.next().take(160))
          ()
        }
      }
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    ctx.getConfiguration.getRootLogger.addAppender(app, Level.WARN, null)
    ctx.updateLoggers()
  }
}
