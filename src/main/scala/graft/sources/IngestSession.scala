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

object IngestSession {

  /** The odds-API quota accounting (reference `get_odds.py:21-24`):
    * render the rate-limit headers of one response as the reference's
    * three log lines (header names matched case-insensitively; absent
    * headers print as "unknown" rather than crashing the collection).
    * The literal "Requests" name mirrors the reference verbatim
    * (`get_odds.py:21` reads `headers.get("Requests")`) — the live
    * API may not send it, in which case both implementations log
    * unknown/None; parity over correction. */
  def quotaLines(headers: Map[String, String]): Seq[String] = {
    def h(name: String): String = headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }.getOrElse("unknown")
    Seq(
      s"Requests Used This Query: ${h("Requests")}",
      s"Requests Used this Month: ${h("X-Requests-Used")}",
      s"Requests Remaining: ${h("X-Requests-Remaining")}")
  }

  /** Wrap a headers-producing transport into a plain one that logs the
    * quota lines per REAL call — composed under an [[IngestSession]],
    * cache hits never re-log (the reference only logs on actual HTTP
    * responses). */
  def withQuotaLogging[K, V](transport: K => (V, Map[String, String]),
                             log: String => Unit = println): K => V =
    key => {
      val (value, headers) = transport(key)
      quotaLines(headers).foreach(log)
      value
    }
}
