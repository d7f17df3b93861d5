package graft.sources

import java.util.concurrent.ConcurrentHashMap

/** Blocking token-bucket rate limiter — the analog of the reference's
  * golang.org/x/time/rate Limiter that every executing HTTP call waits
  * on before sending (/root/reference/lib/http.go:524-527, :607-610,
  * :836-839; configured per http lib instance at mito.go:389-419).
  *
  * One bucket per key (normally the request host), shared across ALL
  * threads in the JVM: on a 32-thread executor the partitions
  * collectively respect the limit instead of each pacing independently —
  * that is what keeps a 1000-task stage from hammering an API at
  * 1000x the agreed rate. Unconfigured keys pass through unthrottled.
  */
object RateGate {

  private final class Bucket(val ratePerSec: Double, val burst: Double) {
    var tokens: Double = burst
    var lastNanos: Long = System.nanoTime()
  }

  private val buckets = new ConcurrentHashMap[String, Bucket]()

  /** Configure (or reconfigure) the bucket for a key. rate <= 0 removes
    * the limit. */
  def configure(key: String, ratePerSec: Double, burst: Int = 1): Unit =
    if (ratePerSec <= 0) buckets.remove(key)
    else buckets.put(key, new Bucket(ratePerSec, math.max(1, burst).toDouble))

  def isConfigured(key: String): Boolean = buckets.containsKey(key)

  /** Idempotent per-partition entry point: make the bucket match the
    * caller's (rate, burst). Unlike a configure-if-absent guard, a
    * restarted or second stream with DIFFERENT settings takes effect,
    * and rate <= 0 un-throttles a host a previous stream configured.
    * No-op when the existing bucket already has these settings, so
    * concurrent partitions of one stream never reset each other's
    * token state. */
  def ensure(key: String, ratePerSec: Double, burst: Int = 1): Unit = {
    val b = buckets.get(key)
    if (ratePerSec <= 0) { if (b != null) buckets.remove(key) }
    else if (b == null || b.ratePerSec != ratePerSec ||
      b.burst != math.max(1, burst).toDouble)
      configure(key, ratePerSec, burst)
  }

  /** Block until a token is available for `key` (no-op when the key has
    * no configured limit). Equivalent of rate.Limiter.Wait(ctx). */
  def acquire(key: String): Unit = {
    val b = buckets.get(key)
    if (b == null) return
    var waitNanos = 0L
    b.synchronized {
      val now = System.nanoTime()
      b.tokens = math.min(b.burst, b.tokens + (now - b.lastNanos) / 1e9 * b.ratePerSec)
      b.lastNanos = now
      if (b.tokens >= 1.0) b.tokens -= 1.0
      else {
        // reserve the token and report how long until it exists
        val deficit = 1.0 - b.tokens
        b.tokens -= 1.0
        waitNanos = (deficit / b.ratePerSec * 1e9).toLong
      }
    }
    if (waitNanos > 0) {
      val ms = waitNanos / 1000000L
      val ns = (waitNanos % 1000000L).toInt
      Thread.sleep(ms, ns)
    }
  }
}
