package graft.sources

import scala.collection.mutable
import scala.util.control.NonFatal

/** S9: the cached + retried ingest session (reference
  * `weather_client.py:22-24`: requests_cache.CachedSession with no
  * expiry + 5 retries with 0.2 backoff_factor).
  *
  * This is a DRIVER-SIDE concern, not a Spark operator: every source
  * in this engine takes already-fetched payloads (strings/frames), and
  * the fetch boundary is injected so tests and offline runs pass
  * fixtures. IngestSession is that boundary's production shape — a
  * transport function wrapped with (1) a permanent per-key cache (the
  * reference caches forever, expire_after=-1) and (2) bounded retries
  * with exponential backoff. Zero egress happens here; the transport
  * itself is supplied by the caller.
  *
  * Not thread-hostile: the cache is synchronized, and a fetch failure
  * never poisons the cache (only successes are stored).
  */
class IngestSession[K, V](
    transport: K => V,
    retries: Int = 5,
    backoffFactor: Double = 0.2,
    sleep: Long => Unit = Thread.sleep) {

  private val cache = mutable.Map.empty[K, V]
  private var attemptLog = Vector.empty[K] // observability for specs

  /** Fetch through the cache; on miss, call the transport with up to
    * `retries` retries. Backoff before retry i (1-based) is
    * backoffFactor * 2^(i-1) seconds — the urllib3 Retry formula the
    * reference's retry_requests wrapper delegates to. */
  def fetch(key: K): V = synchronized {
    cache.getOrElseUpdate(key, fetchWithRetry(key, attempt = 0))
  }

  private def fetchWithRetry(key: K, attempt: Int): V = {
    attemptLog :+= key
    try transport(key)
    catch {
      case NonFatal(e) =>
        if (attempt >= retries) throw e
        sleep((backoffFactor * math.pow(2, attempt) * 1000).toLong)
        fetchWithRetry(key, attempt + 1)
    }
  }

  /** Number of transport calls made (cache hits don't count). */
  def transportCalls: Int = synchronized(attemptLog.size)

  def cachedKeys: Set[K] = synchronized(cache.keySet.toSet)
}
