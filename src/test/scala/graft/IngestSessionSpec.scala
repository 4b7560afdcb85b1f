package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IngestSession

/** S9: cached + retried fetch boundary (weather_client.py:22-24). */
class IngestSessionSpec extends AnyFunSuite {

  test("cache: each key hits the transport once, forever") {
    var calls = 0
    val s = new IngestSession[String, String](k => { calls += 1; s"payload:$k" },
      sleep = _ => ())
    assert(s.fetch("a") === "payload:a")
    assert(s.fetch("a") === "payload:a")
    assert(s.fetch("b") === "payload:b")
    assert(calls === 2)
    assert(s.cachedKeys === Set("a", "b"))
  }

  test("retry: transient failures are retried with exponential backoff") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val s = new IngestSession[String, String](
      k => { calls += 1; if (calls < 4) throw new RuntimeException("flaky") else "ok" },
      retries = 5, backoffFactor = 0.2, sleep = slept += _)
    assert(s.fetch("x") === "ok")
    assert(calls === 4)
    // urllib3 formula: 0.2 * 2^attempt seconds
    assert(slept.toSeq === Seq(200L, 400L, 800L))
  }

  test("retry: gives up after `retries` and does not poison the cache") {
    var calls = 0
    val s = new IngestSession[String, String](
      _ => { calls += 1; throw new RuntimeException("down") },
      retries = 2, sleep = _ => ())
    intercept[RuntimeException](s.fetch("x"))
    assert(calls === 3) // initial + 2 retries
    assert(s.cachedKeys.isEmpty)
    // a later success for the same key is cached normally
    val ok = new IngestSession[String, String](_ => "up", sleep = _ => ())
    assert(ok.fetch("x") === "up")
  }

  test("quota logging: reference's three lines per real call, none on cache hit") {
    val logged = scala.collection.mutable.Buffer.empty[String]
    val transport = IngestSession.withQuotaLogging[String, String](
      k => (s"payload:$k", Map(
        "x-requests-used" -> "120", "X-Requests-Remaining" -> "380",
        "Requests" -> "1")),
      logged += _)
    val s = new IngestSession[String, String](transport, sleep = _ => ())
    assert(s.fetch("odds") === "payload:odds")
    assert(logged.toSeq === Seq(
      "Requests Used This Query: 1",
      "Requests Used this Month: 120",
      "Requests Remaining: 380"))
    s.fetch("odds") // cache hit: no new quota lines
    assert(logged.size === 3)
    // absent headers degrade to "unknown" instead of crashing
    assert(IngestSession.quotaLines(Map.empty).head ===
      "Requests Used This Query: unknown")
  }
}
