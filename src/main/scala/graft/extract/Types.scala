package graft.extract

import graft.text.TextUtils

/** Extraction thresholds (settings.cfg:15-28). */
final case class TrafConfig(
    minExtractedSize: Int = 250,
    minExtractedCommSize: Int = 1,
    minOutputSize: Int = 1,
    minOutputCommSize: Int = 1,
    minDuplcheckSize: Int = 100,
    maxRepetitions: Int = 2,
    maxFileSize: Int = 20000000,
    minFileSize: Int = 10,
    extractionTimeoutSec: Int = 30)

object TrafConfig {
  val Default: TrafConfig = TrafConfig()
  /** ZERO_CONFIG convention used by the reference's golden cases
    * (unit_tests.py:45-47). */
  val Zero: TrafConfig = TrafConfig(minExtractedSize = 0, minOutputSize = 0)
}

/** Per-partition LRU segment-dedup state (lru.py:17-95 + filters.py:34-57).
  * The reference's cache is process-global; under Spark we scope it to the
  * partition (SURVEY §7.4 hazard 3) — same semantics the reference has per
  * worker process. */
final class Deduplicator(maxSize: Int = 4096) {
  private val lru = new java.util.LinkedHashMap[String, Int](256, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Int]): Boolean =
      size() > maxSize
  }
  private def getCount(s: String): Int = { val v = lru.get(s); if (lru.containsKey(s)) v else -1 }
  private def putInCache(s: String): Unit = {
    val c = getCount(s)
    lru.put(s, if (c != -1) c + 1 else 1)
  }
  /** duplicate_test (filters.py:46-57). */
  def isDuplicate(testString: String, config: TrafConfig): Boolean = {
    if (testString.length > config.minDuplcheckSize) {
      val c = getCount(testString)
      if (c > config.maxRepetitions) { lru.put(testString, c + 1); return true }
    }
    putInCache(testString)
    false
  }
  def reset(): Unit = lru.clear()
}

/** Extraction options (core.py:53-73 `Extractor`). */
final case class ExtractorOptions(
    config: TrafConfig = TrafConfig.Default,
    fast: Boolean = false, // no_fallback
    precision: Boolean = false,
    recall: Boolean = false,
    comments: Boolean = true,
    formatting: Boolean = false,
    links: Boolean = false,
    images: Boolean = false,
    tables: Boolean = true,
    dedup: Boolean = false,
    lang: String = null,
    dedupCache: Deduplicator = null,
    urlBlacklist: Set[String] = Set.empty,
    maxTreeSize: Int = 0) {
  def dedupOn: Boolean = dedup && dedupCache != null
}

/** Cooperative per-document deadline (EXTRACTION_TIMEOUT analogue,
  * core.py:1010-1012 — signals don't exist per Spark task, so the hot loops
  * poll). Thread-local: one doc per task thread at a time. */
object KernelBudget {
  final class BudgetExceeded extends RuntimeException("per-doc extraction budget exceeded")
  private val deadline = new ThreadLocal[Long] { override def initialValue(): Long = Long.MaxValue }
  def start(timeoutSec: Int): Unit =
    deadline.set(if (timeoutSec <= 0) Long.MaxValue else System.nanoTime() + timeoutSec * 1000000000L)
  def clear(): Unit = deadline.set(Long.MaxValue)
  @inline def check(): Unit =
    if (System.nanoTime() > deadline.get()) throw new BudgetExceeded
}

object Kernel {
  /** duplicate_test over a DOM element (filters.py:46-57). */
  def duplicateTest(element: graft.dom.Node, options: ExtractorOptions): Boolean = {
    if (!options.dedupOn) return false
    val testString = TextUtils.trim(element.itertext.mkString(" "))
    options.dedupCache.isDuplicate(testString, options.config)
  }
}

/** Env-gated kernel decision trace (GRAFT_TRACE=1): rule choices, length
  * comparisons, arbiter outcomes — debug only, zero cost when off. */
object KTrace {
  val on: Boolean = sys.env.contains("GRAFT_TRACE")
  @inline def log(msg: => String): Unit = if (on) System.err.println("KTRACE " + msg)
}
