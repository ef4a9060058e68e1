package graft.core

import java.util.concurrent.atomic.AtomicLong

/** Soul (node id) generation, mirroring the reference's DefaultSoulGen
  * (gun/node.go:14-21): base36(unix-ms) [+ base36(process-unique nano
  * counter)] + 12 random chars over a 62-symbol alphabet (gun/util.go:9-21,
  * 43-61). The time prefix keeps ids roughly sortable by creation time.
  *
  * Deterministic variant for tests/batch: caller supplies the clock and a
  * seed so plans stay replayable (the reference cannot do this, which is why
  * its HAM tests were never written — SURVEY §7).
  */
object SoulGen {
  private val alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"

  private val lastMs = new AtomicLong(-1L)
  private val uniqPerMs = new AtomicLong(0L)

  /** One shared CSPRNG, matching the reference's crypto/rand entropy class
    * (gun/util.go:11-21); SecureRandom is thread-safe.
    */
  private val secureRnd = new scala.util.Random(new java.security.SecureRandom())

  /** Production generator: wall-clock + SecureRandom suffix. */
  def apply(): String = {
    val ms = System.currentTimeMillis()
    val prev = lastMs.getAndSet(ms)
    val uniq = if (prev == ms) uniqPerMs.incrementAndGet() else { uniqPerMs.set(0); 0L }
    fromParts(ms, uniq, randString(12, secureRnd))
  }

  /** Deterministic generator for replayable batch plans and tests. */
  def deterministic(ms: Long, seq: Long): String = {
    val rnd = new scala.util.Random(ms * 31 + seq)
    fromParts(ms, seq, randString(12, rnd))
  }

  def fromParts(ms: Long, uniq: Long, suffix: String): String = {
    val base = java.lang.Long.toString(ms, 36)
    val u = if (uniq > 0) java.lang.Long.toString(uniq, 36) else ""
    base + u + suffix
  }

  private def randString(n: Int, rnd: scala.util.Random): String = {
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) { sb.append(alphabet.charAt(rnd.nextInt(alphabet.length))); i += 1 }
    sb.toString
  }
}
