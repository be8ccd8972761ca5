package graft

import graft.sources.Sinks
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line of per-query wall seconds at
  * SPARK_GRAFT_SF_DIR. Queries run in name order; each result is fully
  * materialized through the noop sink (a bare `.count()` would let Catalyst
  * prune the computed columns and under-report map-heavy queries).
  *
  * Measurement protocol (designed so the suite number for a query matches
  * its `SPARK_GRAFT_ONLY` isolated number):
  *  1. one warm-up run (JIT + codegen compile + operator-cache build);
  *  2. SPARK_GRAFT_RUNS (default 3) measured runs; the reported figure is
  *     the MEDIAN; per-run values go to the detail file
  *     (SPARK_GRAFT_BENCH_OUT, default BENCH_DETAIL.json in the repo);
  *  3. after the query: drop its operator caches, force a full GC, and
  *     quiesce briefly — otherwise dead InMemoryRelations from earlier
  *     queries surface as multi-second GC pauses charged to whichever
  *     innocent query they interrupt (the round-2 bench artifact).
  *
  * Cache policy: dedup/ann operators retain internal `.cache()`s so that
  * CacheManager's identical-plan dedupe serves repeated runs — i.e. their
  * steady-state numbers are deliberately CACHE-WARM (input parquet read
  * once, like a resident engine with a populated cache). Set
  * SPARK_GRAFT_CLEAR_CACHE=1 to also drop caches before each measured run
  * for JIT-only warm-up semantics; SPARK_GRAFT_WARMUP=0 for cold timings.
  */
object Bench {

  /** Contention evidence for the artifact: 1/5/15-min loadavg plus the
    * TOTAL live process count on the box (including this JVM and its
    * children — /proc gives no cheap way to subtract the pid tree, so the
    * field reports the raw count and readers compare before vs after).
    * A regressed bench with load ~0 before/after rules out box
    * contention; load >> nproc names it. Readable on any Linux; absent
    * elsewhere.
    */
  private def readFile(p: String): String = {
    val src = scala.io.Source.fromFile(p)
    try src.mkString finally src.close()
  }

  private def loadSnapshot(): String = {
    try {
      val la = readFile("/proc/loadavg").trim.split("\\s+")
      val procs = new java.io.File("/proc").listFiles()
        .count(f => f.getName.forall(_.isDigit))
      s"[${la(0)},${la(1)},${la(2)},$procs]"
    } catch { case _: Throwable => "null" }
  }

  /** Was the box quiet when the run STARTED? Start gate of the isolated
    * claim (the full claim also needs every per-query external-CPU sample
    * under [[extQuiet]] — a before-only check certifies exactly the thing
    * it cannot see, a spike that lands mid-run, which is how the r8
    * artifact stamped `isolated: true` on a contaminated run). Thresholds
    * follow the quiet-window protocol (1-min < 2, 5-min < 3 — slack over
    * the 1.0/2.0 start gate only for decay tails of the box's OWN just-
    * finished work, not for live load).
    */
  private def startQuiet(loadBefore: String): Boolean =
    try {
      val la = loadBefore.stripPrefix("[").split(",")
      la(0).toDouble < 2.0 && la(1).toDouble < 3.0
    } catch { case _: Throwable => false }

  /** Cumulative CPU ticks: (box-wide non-idle across all cpus, box-wide
    * ALL fields across all cpus, this process incl. reaped children,
    * host cpu count). From /proc/stat line 1 + its cpuN line count +
    * /proc/self/stat utime/stime/cutime/cstime — the all-fields total
    * gives elapsed ticks-per-cpu without knowing HZ, and the cpu count
    * comes from the SAME file as the ticks: availableProcessors() can be
    * cgroup/taskset-limited below the host's, which would inflate
    * perCpuElapsed and underestimate external load by exactly the ratio
    * — stamping a contaminated containerized run isolated:true.
    */
  private def cpuTicks(): Option[(Long, Long, Long, Int)] =
    try {
      val lines = readFile("/proc/stat").split("\n")
      val stat = lines.head.split("\\s+").drop(1).map(_.toLong)
      val idle = stat(3) + (if (stat.length > 4) stat(4) else 0L) // idle+iowait
      val ncpus = lines.count(_.matches("cpu\\d+.*"))
      val self = readFile("/proc/self/stat")
        // comm can contain spaces/parens — fields are positional AFTER it
        .split("\\) ").last.split("\\s+")
      // fields 14-17 (1-based incl. pid+comm) = utime stime cutime cstime;
      // after stripping "pid (comm) " the state char is index 0 → 11..14
      val mine = self(11).toLong + self(12).toLong + self(13).toLong + self(14).toLong
      Some((stat.sum - idle, stat.sum, mine, math.max(ncpus, 1)))
    } catch { case _: Throwable => None }

  /** Average EXTERNAL cores busy between two [[cpuTicks]] samples — CPU
    * burned by processes other than this JVM, the one signal that
    * separates box contention from the bench's own (deliberate) 32-thread
    * load: loadavg cannot tell them apart mid-run. HZ-free — elapsed
    * ticks-per-cpu = all-fields delta / host cpu count.
    */
  private def extCores(
      a: (Long, Long, Long, Int), b: (Long, Long, Long, Int)): Double = {
    val perCpuElapsed = (b._2 - a._2) / b._4.toDouble
    if (perCpuElapsed <= 0) 0.0
    // tick granularity can put the difference a hair under 0 on a quiet
    // box (child reap timing) — clamp, a negative core count means 0
    else math.max(0.0, ((b._1 - a._1) - (b._3 - a._3)) / perCpuElapsed)
  }

  /** Per-query external-CPU gate: under one average external core for the
    * query's whole window counts as quiet (background daemons sit at
    * ~0.02; a concurrent build or a second bench shows up as 4-30).
    */
  private val extQuiet = 1.0

  /** Cumulative utime+stime ticks of every OTHER user-space process,
    * pid → ticks. Kernel threads are EXCLUDED (empty cmdline): the
    * box-wide [[extCores]] signal charges asynchronous kernel work —
    * kworker writeback of THIS bench's own shuffle/cache files, kswapd
    * reclaim it triggered — to "external", and those flushes land
    * seconds after the writes, i.e. in some later short query's window
    * (r13: dedup_ngram carried the only dirty stamp in two otherwise
    * clean runs). This signal counts only CO-TENANT processes — the
    * thing the isolation claim is actually about; the two are reported
    * side by side so a reader can tell self-inflicted writeback
    * (ext dirty, ext_user clean) from real contention (both dirty).
    * Undercount caveat: a process that exits between the two samples
    * loses its ticks here — the box-wide signal still sees it, which is
    * why BOTH gates must pass for the strict flag.
    */
  private def otherUserTicks(): Option[Map[Int, Long]] =
    try {
      val self = ProcessHandle.current().pid()
      val procs = new java.io.File("/proc").listFiles()
        .filter(f => f.getName.forall(_.isDigit))
      Some(procs.flatMap { f =>
        val pid = f.getName.toLong
        if (pid == self) None
        else try {
          val cmd = java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(s"/proc/$pid/cmdline"))
          if (cmd.isEmpty) None // kernel thread
          else {
            val st = readFile(s"/proc/$pid/stat")
              .split("\\) ").last.split("\\s+")
            Some(pid.toInt -> (st(11).toLong + st(12).toLong))
          }
        } catch { case _: Throwable => None } // raced an exit
      }.toMap)
    } catch { case _: Throwable => None }

  /** Average CO-TENANT user-space cores busy between two
    * [[otherUserTicks]] samples, normalized by the same HZ-free
    * per-cpu-elapsed denominator as [[extCores]].
    */
  private def extUserCores(ua: Map[Int, Long], ub: Map[Int, Long],
      a: (Long, Long, Long, Int), b: (Long, Long, Long, Int)): Double = {
    val perCpuElapsed = (b._2 - a._2) / b._4.toDouble
    if (perCpuElapsed <= 0) 0.0
    else math.max(0.0, ub.map { case (pid, t) =>
      t - ua.getOrElse(pid, 0L)
    }.sum / perCpuElapsed)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Full GC + short quiesce: settles allocation debt from the previous
    * query's cache build/drop cycle so its pauses don't land on the next
    * measured run. System.gc() is advisory but local-mode JVMs honor it.
    */
  private def quiesce(): Unit = {
    System.gc()
    Thread.sleep(250)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val clearCache = sys.env.getOrElse("SPARK_GRAFT_CLEAR_CACHE", "0") == "1"
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated filter (same knob as Verify) for iterating
    // on a single query's plan without paying for the whole suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val loadBefore = loadSnapshot()
    // per-query external-CPU samples: (name, avg external cores over the
    // query's whole warmup+measure window) — the mid-run contention record
    val ext = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val extU = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      try {
        val t0cpu = cpuTicks()
        val t0usr = otherUserTicks()
        if (warmup) Sinks.blackhole(fn(spark, sfDir))
        // stream_* queries pay state-store + micro-batch scheduling noise
        // (observed ±50% run-to-run) — a 5-run median makes the stream
        // block comparable round-over-round; batch queries keep nRuns.
        val nFor = if (name.startsWith("stream_")) nRuns.max(5) else nRuns
        val runs = (1 to nFor).map { _ =>
          if (clearCache) spark.catalog.clearCache()
          val t0 = System.nanoTime()
          Sinks.blackhole(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        for (a <- t0cpu; b <- cpuTicks()) {
          ext += name -> extCores(a, b)
          for (ua <- t0usr; ub <- otherUserTicks())
            extU += name -> extUserCores(ua, ub, a, b)
        }
        spark.catalog.clearCache()
        quiesce()
        name -> runs
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e")
          spark.catalog.clearCache()
          name -> Seq(-1.0)
      }
    }
    // Locale.ROOT: the default-locale format emits "0,1234" under
    // comma-decimal locales, which is malformed JSON.
    def fmt(v: Double, dec: Int): String = {
      val s = String.format(java.util.Locale.ROOT, "%." + dec + "f", Double.box(v))
      if (s.contains('.')) {
        val t = s.reverse.dropWhile(_ == '0').reverse
        if (t.endsWith(".")) t.dropRight(1) else t
      } else s
    }
    val loadAfter = loadSnapshot()
    // [1m,5m,15m loadavg, total live processes] before/after the run, plus
    // the contention verdict — makes box contention diagnosable (and the
    // "isolated run" claim checkable) from the artifact itself. `isolated`
    // now requires BOTH a quiet start AND every per-query external-CPU
    // sample under extQuiet, so a spike that lands mid-run fails the flag
    // and ext_max_query names where it landed; a run with no /proc access
    // cannot certify isolation at all.
    val extMax = if (ext.isEmpty) ("none", -1.0) else ext.maxBy(_._2)
    val extUMax = if (extU.isEmpty) ("none", -1.0) else extU.maxBy(_._2)
    // coverage, not just quietness: a query that FAILED (or whose
    // /proc read failed) contributes no ext sample, and the missing
    // sample is exactly where a spike could hide — the flag certifies
    // isolation only when every attempted query carries one
    val iso = startQuiet(loadBefore) && ext.size == results.size &&
      ext.forall(_._2 < extQuiet)
    // the CO-TENANT flag: same coverage rule over the user-space-others
    // signal — clean here with a dirty box-wide ext means the "external"
    // CPU was kernel writeback of this bench's own I/O, not contention
    val isoUser = startQuiet(loadBefore) && extU.size == results.size &&
      extU.forall(_._2 < extQuiet)
    val loadJson =
      s""""load":{"before":$loadBefore,"after":$loadAfter,"isolated":$iso,""" +
        s""""ext_max":${fmt(extMax._2, 2)},"ext_max_query":"${extMax._1}",""" +
        s""""isolated_user":$isoUser,"ext_user_max":${fmt(extUMax._2, 2)},""" +
        s""""ext_user_max_query":"${extUMax._1}"}"""
    // failures stay visible as -1 per query but must not distort the total
    val total = results.map(r => median(r._2)).filter(_ >= 0).sum
    def line(entries: Seq[(String, Double)], dec: Int): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + fmt(v, dec) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, dec)},"unit":"sec","queries":$qs,"sf":"$sfDir",$loadJson}"""
    }
    val medians = results.map { case (k, v) => k -> median(v) }
    // Last-resort shrink: collapse ONE underscore-prefixed family
    // (stream_*, text_*, dedup_*, ...) into a per-family total per step —
    // smallest family first, so a few-byte overflow degrades the least
    // granularity instead of wiping out the biggest family's breakdown.
    def merged(entries: Seq[(String, Double)]): Seq[(String, Double)] = {
      val fams = entries.groupBy(_._1.takeWhile(_ != '_')).filter(_._2.length > 1)
      if (fams.isEmpty) entries
      else {
        val (best, es) = fams.minBy { case (_, e) => e.map(_._1.length + 8).sum }
        entries.filterNot(e => es.exists(_._1 == e._1)) :+
          (s"${best}_*" -> es.map(_._2).filter(_ >= 0).sum)
      }
    }
    // Family merges exhausted: keep the SLOWEST queries individually and
    // fold the rest into one "other_*" bucket — the informative
    // degradation (a reader tuning performance needs the expensive
    // queries by name; the 0.2-second tail can aggregate).
    def fitTopK(entries: Seq[(String, Double)]): String = {
      // -1 failure sentinels sort below every real timing — they must
      // never be folded into (and dropped from) the other_* tail, or the
      // degraded path silently loses the failures-stay-visible contract
      val (failed, ok) = entries.partition(_._2 < 0)
      val sorted = ok.sortBy { case (k, v) => (-v, k) }
      (sorted.length to 0 by -1).view
        .map { keep =>
          val (top, rest) = sorted.splitAt(keep)
          val other = "other_*" -> rest.map(_._2).sum
          line((failed ++ top :+ other).sortBy(_._1), 1)
        }
        .find(_.length <= 1920)
        .getOrElse {
          System.err.println(
            s"[bench] per-query breakdown (${entries.length} entries, " +
              s"${failed.length} failed: ${failed.map(_._1).mkString(",")}) " +
              "cannot fit the 1920-byte line; emitting total only")
          line(Seq.empty, 1)
        }
    }
    def fit(entries: Seq[(String, Double)], depth: Int): String =
      (4 to 1 by -1).map(d => line(entries.sortBy(_._1), d))
        .find(_.length <= 1920)
        .getOrElse {
          val m = merged(entries)
          if (depth <= 0 || m == entries) fitTopK(entries)
          else fit(m, depth - 1)
        }
    // Full detail (per-run values) goes to a file; stdout gets ONE compact
    // line. The harness that captures this run keeps only the final ~2000
    // bytes of output, and an sbt epilogue line (~75 bytes) follows us — the
    // JSON line must fit the remaining window IN FULL (≤1920 bytes) or it
    // cannot be parsed downstream. Degrade decimal precision, then merge
    // query families, until it fits.
    val out = fit(medians, depth = 10)
    val extByName = ext.toMap
    val extUByName = extU.toMap
    val detail = results.map { case (k, v) =>
      val e = extByName.get(k).map(x => ",\"ext_cores\":" + fmt(x, 2)).getOrElse("")
      val eu = extUByName.get(k)
        .map(x => ",\"ext_user_cores\":" + fmt(x, 2)).getOrElse("")
      "\"" + k + "\":{\"median\":" + fmt(median(v), 4) +
        ",\"runs\":[" + v.map(fmt(_, 4)).mkString(",") + "]" + e + eu + "}"
    }.mkString("{", ",", "}")
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_DETAIL.json")
    try {
      val w = new java.io.PrintWriter(detailPath, "UTF-8")
      // stream_runs: stream_* queries are sampled with this many measured
      // runs (≥5 floor over runs_per_query) — recorded so cross-round
      // readers see the sampling, not just infer it from array lengths
      try w.println(s"""{"metric":"total","value":${fmt(total, 4)},"unit":"sec","queries":$detail,"sf":"$sfDir","cpus":$cpus,"runs_per_query":$nRuns,"stream_runs":${nRuns.max(5)},$loadJson}""")
      finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }
    // Stop FIRST, then emit the line last: session shutdown flushes its
    // async WARN chatter before the JSON, so no late log line lands between
    // the JSON and the end of output and eats the capture window.
    spark.stop()
    System.err.flush()
    Thread.sleep(200)
    println(out)
    System.out.flush()
  }
}
