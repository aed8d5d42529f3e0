package graft.cardano

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec

/** S1-S4 over the real HTTP transport: an in-process stub server serves
  * the deterministic fixture chain over actual sockets, so the full path
  * — mapPartitions fan-out → HttpClient → retry/404 handling →
  * from_json — is exercised end-to-end and must produce byte-identical
  * DataFrames to the offline FixtureBackend.
  */
class HttpBackendSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val fixture = new BlockfrostSource.FixtureBackend
  private var server: HttpServer = _
  private var base: String = _
  private val flakyHits = new AtomicInteger(0)

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** The fixture's block-txs JSON, unwrapped back to the bare array the
    * real API serves (the backend re-wraps it).
    */
  private def bareTxArray(h: Long): String = {
    val wrapped = fixture.blockTxs(h).get
    wrapped.substring(wrapped.indexOf('['), wrapped.lastIndexOf(']') + 1)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress(0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    val BlockPath = "/blocks/(\\d+)".r
    val BlockTxPath = "/blocks/(\\d+)/txs".r
    val TxPath = "/txs/([0-9a-f]+)".r
    val UtxoPath = "/txs/([0-9a-f]+)/utxos".r
    server.createContext("/", (ex: HttpExchange) =>
      try ex.getRequestURI.getPath match {
        case "/flaky" =>
          // fails twice, then succeeds — exercises withRetry
          if (flakyHits.incrementAndGet() <= 2) reply(ex, 503, "busy")
          else reply(ex, 200, """{"ok": true}""")
        case BlockTxPath(h) => reply(ex, 200, bareTxArray(h.toLong))
        case BlockPath(h) if h.toLong >= 1000 => reply(ex, 404, "not found")
        case BlockPath(h) => reply(ex, 200, fixture.block(h.toLong).get)
        case UtxoPath(hash) => reply(ex, 200, fixture.txUtxo(hash).get)
        case TxPath(hash) => reply(ex, 200, fixture.tx(hash).get)
        case _ => reply(ex, 404, "no route")
      } catch { case t: Throwable => reply(ex, 500, t.toString) })
    server.start()
    base = s"http://localhost:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("fetchBlocks over HTTP matches the offline fixture; 404s are dropped") {
    import spark.implicits._
    val http = new BlockfrostSource.HttpBackend(base, projectId = Some("test_project"))
    // 2000 → 404 → None → dropped by the fan-out (missing-block contract).
    val heights = (1L to 20L) :+ 2000L
    val ds = heights.toDS().map(java.lang.Long.valueOf(_)).repartition(4)
    val viaHttp = BlockfrostSource.fetchBlocks(ds, http)
    val viaFixture = BlockfrostSource.fetchBlocks(
      (1L to 20L).toDS().map(java.lang.Long.valueOf(_)), fixture)
    assert(viaHttp.count() == 20)
    assert(viaHttp.collect().map(_.toString).sorted
      .sameElements(viaFixture.collect().map(_.toString).sorted))
  }

  test("fetchBlockTxs wraps the bare tx-hash array; tx/utxo endpoints round-trip") {
    import spark.implicits._
    val http = new BlockfrostSource.HttpBackend(base)
    val heights = (1L to 10L).toDS().map(java.lang.Long.valueOf(_))
    val blockTxs = BlockfrostSource.fetchBlockTxs(heights, http)
    assert(blockTxs.count() == 10)

    val hashes = blockTxs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("tx_hash")).as("h"))
      .as[String]
    val nTx = hashes.count()
    assert(nTx > 0)
    val txs = BlockfrostSource.fetchTransactions(hashes, http)
    assert(txs.count() == nTx)
    val utxos = BlockfrostSource.fetchTxUtxos(hashes, http)
    assert(utxos.count() == nTx)
    // Same rows as the offline transport end-to-end.
    val offline = BlockfrostSource.fetchTxUtxos(hashes, fixture)
    assert(utxos.collect().map(_.toString).sorted
      .sameElements(offline.collect().map(_.toString).sorted))
  }

  test("withRetry survives transient non-200s (backoff then success)") {
    flakyHits.set(0)
    val http = new BlockfrostSource.HttpBackend(base)
    // /flaky answers 503 twice, then 200 — the fetch loop's withRetry
    // must absorb the transient failures (reference: 5 attempts,
    // exponential backoff).
    val get = classOf[BlockfrostSource.HttpBackend].getDeclaredMethod("get", classOf[String])
    get.setAccessible(true)
    val res = BlockfrostSource.withRetry()(
      get.invoke(http, "/flaky").asInstanceOf[Option[String]])
    assert(res.contains("""{"ok": true}"""))
    assert(flakyHits.get() == 3)
  }

  test("non-matching route is a 404 → None (missing-entity contract)") {
    val http = new BlockfrostSource.HttpBackend(base)
    assert(http.tx("nothex!").isEmpty)
    assert(http.block(99999).isEmpty)
  }
}
