package graft

import graft.operators.Metrics
import graft.sources.{RemoteWrite, RemoteWriteClient}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** Remote-write SENDER retry/backoff (upstream's queue-manager
  * semantics, bounded): recoverable failures (transport, 429, 5xx)
  * re-send with exponential backoff, so a transient receiver blip
  * loses NOTHING; unrecoverable 4xx and exhausted retries drop with
  * the counts visible to the caller's accounting.
  */
class RemoteWriteRetrySpec extends SparkTestBase {
  import spark.implicits._

  private def receiver(handler: Int => Int): (com.sun.net.httpserver.HttpServer, String, AtomicInteger) = {
    val hits = new AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer
      .create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v1/write",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getRequestBody.readAllBytes()
        val code = handler(hits.incrementAndGet())
        ex.sendResponseHeaders(code, -1)
        ex.close()
      })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/write",
      hits)
  }

  test("recoverable-code classification and the backoff ladder") {
    assert(Seq(-1, 429, 500, 502, 503).forall(RemoteWrite.isRecoverable))
    assert(!Seq(200, 204, 400, 404, 413).exists(RemoteWrite.isRecoverable))
    // exponential, capped: a permanently-503 receiver sees
    // maxRetries+1 posts with sleeps 50, 100, 200 (cap 200)
    val (server, url, hits) = receiver(_ => 503)
    try {
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val code = RemoteWrite.postWithRetry(url, Array[Byte](1),
        maxRetries = 3, minBackoffMs = 50, maxBackoffMs = 200,
        sleep = sleeps += _)
      assert(code === 503)
      assert(hits.get() === 4)
      assert(sleeps.toSeq === Seq(50L, 100L, 200L))
    } finally server.stop(0)
    // an unrecoverable 400 returns immediately, no retry
    val (s400, url400, hits400) = receiver(_ => 400)
    try {
      assert(RemoteWrite.postWithRetry(url400, Array[Byte](1),
        maxRetries = 3, minBackoffMs = 1, sleep = _ => ()) === 400)
      assert(hits400.get() === 1)
    } finally s400.stop(0)
  }

  test("a receiver that 503s twice then accepts loses nothing; a dead one drops with accounting") {
    val dir = fixture("events" -> Seq(
      ev(1, 0, "purchase", 1.0, "a"),
      ev(2, 60000L, "purchase", 2.0, "a"),
      ev(3, 120000L, "signup", 5.0, "b")
    ).toDF(eventCols: _*))
    val events = Metrics.metricEvents(spark, dir).coalesce(1)
    val n = events.count()
    // transient outage: exactly two 503s, then acceptance
    val (flaky, url, hits) = receiver(i => if (i <= 2) 503 else 204)
    try {
      val client = new RemoteWriteClient(url,
        maxRetries = 4, minBackoffMs = 1, maxBackoffMs = 2)
      val (sent, failed) = client.backfill(events)
      assert(sent === n, "the blip lost nothing")
      assert(failed === 0L)
      assert(hits.get() === 3, "two retries then the accepted send")
    } finally flaky.stop(0)
    // permanently dead: the batch drops, the count says so
    val dead = new RemoteWriteClient("http://127.0.0.1:1/api/v1/write",
      maxRetries = 2, minBackoffMs = 1, maxBackoffMs = 2)
    val (sent2, failed2) = dead.backfill(events)
    assert(sent2 === 0L && failed2 === n)
    // push() rides the same ladder: flaky-once then accept
    graft.streaming.ExpositionRegistry.clear()
    graft.streaming.ExpositionRegistry.publish(
      graft.streaming.MetricStream.SeriesTotal("purchase", "a", 5.5, 3))
    val (flaky2, url2, hits2) = receiver(i => if (i == 1) 503 else 204)
    try {
      val client2 = new RemoteWriteClient(url2,
        maxRetries = 2, minBackoffMs = 1, maxBackoffMs = 2)
      assert(client2.push(1000L) === 204)
      assert(client2.status._2 === None)
      assert(hits2.get() === 2)
    } finally flaky2.stop(0)
  }
}
