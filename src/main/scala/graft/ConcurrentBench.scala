package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

/** Concurrent-analyst throughput leg — the multi-user face of the
  * reference (an i2b2 webclient fronting many analysts at once; its
  * concurrency safety comes from PostgreSQL, the engine's from Spark's
  * scheduler). N query streams run simultaneously, each in its own
  * FAIR scheduler pool with a DISTINCT round-robin slice of the
  * registered gate queries, so the leg measures what a shared cluster
  * deployment actually experiences: interleaved heterogeneous plans
  * contending for the same executors.
  *
  * Protocol: one serial WARM pass (JIT + codegen + the build-once
  * persisted indexes — also how production works: indexes are built
  * before analysts arrive, and it keeps the concurrent phase free of
  * build-table races), one serial TIMED pass (the serial-sum
  * baseline), then the concurrent phase. Reported: per-stream
  * makespans, concurrent makespan vs serial sum, failures (any
  * exception in either phase), and the serial/concurrent per-query
  * agreement count (a query failing ONLY under concurrency would be an
  * isolation bug, not a throughput number).
  *
  * Reading the number honestly: at local[32] a single serial query
  * already saturates the machine, so the speedup ceiling is set by
  * per-query unparallelized time (driver planning, small stages), not
  * by idle cores — the leg's pass bar is "no failures, no starved
  * stream, makespan ≤ serial sum", not a linear speedup.
  *
  * Usage: runMain graft.ConcurrentBench [sfDir] [nStreams] [outJson]
  */
object ConcurrentBench {

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(" ")
    catch { case _: Throwable => "" }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nStreams = if (args.length > 1) args(1).toInt else 8
    val out = if (args.length > 2) args(2) else "docs/bench_concurrent.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // data-proportional shuffle width via AQE coalescing (see Bench)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.get("SPARK_GRAFT_INIT_PARTS")
          .getOrElse(GraftConf.initShufflePartitions(sfDir, cpus.toInt).toString))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.gateSort", "false")
      // the multi-user scheduler: FAIR pools, one per stream, so a
      // long scan cannot convoy every other analyst behind it (FIFO
      // would — the default — and is exactly what a shared deployment
      // must not run)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT", "16m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.quietTinyFrameWindowWarnings()
    val loadBefore = loadavg()

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }

    def runOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); ((System.nanoTime() - t0) / 1e9, None) }
      catch { case e: Throwable =>
        ((System.nanoTime() - t0) / 1e9, Some(s"$name: ${e.getMessage}"))
      }
    }

    // serial WARM pass: builds + JIT, untimed
    System.err.println(s"[cbench] warm pass over ${all.size} queries")
    val warmFailures = all.flatMap { case (n, f) => runOne(n, f)._2 }

    // serial TIMED pass: the baseline an 8-analyst day would cost if
    // the engine serialized them
    System.err.println("[cbench] serial timed pass")
    var serialFailed = List.empty[String]
    val serial = all.map { case (n, f) =>
      val (secs, err) = runOne(n, f)
      err.foreach(serialFailed ::= _)
      n -> secs
    }.toMap
    val serialSum = serial.values.sum

    // concurrent phase: stream i takes queries i, i+N, i+2N, ... —
    // every stream crosses all operator families, no two streams ever
    // run the same query
    val mixes = (0 until nStreams).map(i =>
      all.zipWithIndex.collect { case (q, j) if j % nStreams == i => q })
    val ec = ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(nStreams))
    System.err.println(s"[cbench] concurrent phase: $nStreams streams")
    val t0 = System.nanoTime()
    val futures = mixes.zipWithIndex.map { case (mix, i) =>
      Future {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"stream$i")
        val errs = scala.collection.mutable.ListBuffer.empty[String]
        val s0 = System.nanoTime()
        mix.foreach { case (n, f) => runOne(n, f)._2.foreach(errs += _) }
        (s"stream$i", (System.nanoTime() - s0) / 1e9, errs.toList)
      }(ec)
    }
    val streams = futures.map(f => Await.result(f, Duration.Inf))
    val makespan = (System.nanoTime() - t0) / 1e9
    ec.shutdown()

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val concurrentFailed = streams.flatMap(_._3)
    val streamsJson = streams.map { case (name, secs, _) =>
      "\"" + name + "\":" + num(secs) }.mkString("{", ",", "}")
    // full JSON escaping (Bench.jstr): failure messages carry Spark
    // stack-trace text — newlines/backslashes/control chars — which a
    // quote-only replace would let corrupt the artifact
    def arr(xs: Seq[String]) =
      xs.map(Bench.jstr).mkString("[", ",", "]")
    val line =
      s"""{"sf":"$sfDir","n_streams":$nStreams,"n_queries":${all.size},""" +
        s""""serial_sum_sec":${num(serialSum)},""" +
        s""""concurrent_makespan_sec":${num(makespan)},""" +
        s""""speedup_vs_serial":${num(serialSum / makespan)},""" +
        s""""stream_makespans":$streamsJson,""" +
        s""""slowest_stream_sec":${num(streams.map(_._2).max)},""" +
        s""""fastest_stream_sec":${num(streams.map(_._2).min)},""" +
        s""""failed_warm":${arr(warmFailures)},""" +
        s""""failed_serial":${arr(serialFailed)},""" +
        s""""failed_concurrent":${arr(concurrentFailed)},""" +
        s""""loadavg_before":"$loadBefore","loadavg_after":"${loadavg()}"}"""
    val p = java.nio.file.Paths.get(out)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
    // warm failures gate too: a query that cannot even build its
    // indexes serially is a broken leg, not a warm-up footnote
    if (concurrentFailed.nonEmpty || serialFailed.nonEmpty ||
        warmFailures.nonEmpty) sys.exit(1)
  }
}
