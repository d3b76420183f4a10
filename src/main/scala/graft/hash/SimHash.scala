package graft.hash

import graft.text.TextUtils

/** Charikar simhash + token sampling (hashing.py:14-135). */
object SimHash {

  /** Python string.punctuation. */
  private val Punct = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".toSet

  /** sample_tokens (hashing.py:14-27): split, strip punctuation, keep alnum,
    * adaptive min length to keep >= length/2 tokens. */
  def sampleTokens(input: String, length: Int = 64): List[String] = {
    val tokens = input.split("\\s+").iterator
      .map(t => t.dropWhile(Punct.contains).reverse.dropWhile(Punct.contains).reverse)
      .filter(t => t.nonEmpty && t.forall(c => Character.isLetterOrDigit(c)))
      .toList
    var i = 4
    var sample: List[String] = Nil
    while (i >= 0) {
      sample = tokens.filter(_.length > i)
      if (sample.length >= length / 2) return sample
      i -= 1
    }
    sample
  }

  /** _hash (hashing.py:58-62): big-endian 8-byte blake2b digest as unsigned. */
  def tokenHash(token: String): Long = {
    val d = Blake2b.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8), 8)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Token-hash memo mirroring the reference's lru_cache(2**14) on
    * `Simhash._vector_to_add` (hashing.py:76, see SURVEY §4.1): natural-
    * language tokens repeat heavily, so the per-token blake2b (the dominant
    * kernel fingerprint cost, ~35 µs/doc) amortizes to a map lookup.
    * Thread-local: task-scoped like the reference's per-process cache,
    * no contention. */
  private val tokenMemo = new ThreadLocal[java.util.LinkedHashMap[String, java.lang.Long]] {
    override def initialValue() =
      new java.util.LinkedHashMap[String, java.lang.Long](16384, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Long]): Boolean = size() > 16384
      }
  }

  private def tokenHashMemo(token: String): Long = {
    val m = tokenMemo.get()
    val cached = m.get(token)
    if (cached != null) cached.longValue()
    else {
      val h = tokenHash(token)
      m.put(token, java.lang.Long.valueOf(h))
      h
    }
  }

  /** create_hash (hashing.py:82-93): 64-bit Charikar simhash. */
  def createHash(input: String): Long = {
    val vector = new Array[Int](64)
    sampleTokens(input).foreach { token =>
      val th = tokenHashMemo(token)
      var i = 0
      while (i < 64) {
        if ((th & (1L << i)) != 0) vector(i) += 1 else vector(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (vector(i) >= 0) out |= (1L << i); i += 1 }
    out
  }

  def toHex(hash: Long): String = java.lang.Long.toHexString(hash)

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  def similarity(a: Long, b: Long): Double = (64 - hammingDistance(a, b)) / 64.0

  /** content_fingerprint (hashing.py:133-135). */
  def contentFingerprint(content: String): String = toHex(createHash(content))

  /** generate_bow_hash (hashing.py:30-34). */
  def generateBowHash(input: String, length: Int = 24): Array[Byte] = {
    val teststring = sampleTokens(input).mkString(" ").trim
    Blake2b.digest(teststring.getBytes(java.nio.charset.StandardCharsets.UTF_8), length)
  }

  /** generate_hash_filename (hashing.py:37-41). */
  def generateHashFilename(content: String): String = {
    val noXml = content.replaceAll("<[^<]+?>", "")
    java.util.Base64.getUrlEncoder.encodeToString(generateBowHash(noXml, 12))
  }
}
