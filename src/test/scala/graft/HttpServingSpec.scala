package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.{Embedder, ServingCounters, ServingIndex}
import graft.serving.{DocumentService, HttpServing, Json}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Drives the HTTP serving surface over a real socket (ephemeral port):
  * the day_8 CRUD contract (insert/search/get/delete/collection-info/
  * batch with FastAPI's status codes and `{"detail":...}` error envelope)
  * and the day_14 observability routes (/metrics prometheus text,
  * /stats counters). The backing index is the engine's Mutable tier, so
  * every request exercises the same base+delta+tombstone machinery the
  * serving specs gate. */
class HttpServingSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  private var server: HttpServing = _
  private var service: DocumentService = _
  private var counters: ServingCounters = _
  private val dim = 16

  override def beforeAll(): Unit = {
    super.beforeAll()
    val empty = spark.sparkContext
      .parallelize(Seq.empty[(Long, Array[Float])], 2)
    val idx = ServingIndex.mutableFlat(empty, dim)
    counters = new ServingCounters(spark.sparkContext, "rag")
    service = new DocumentService(Embedder.MockEncoder(dim), idx, "documents")
    server = HttpServing.start(service, counters)
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    super.afterAll()
  }

  // ---- tiny client ----------------------------------------------------

  private def request(method: String, path: String,
                      body: String = null): (Int, String) = {
    val url = new URI(s"http://127.0.0.1:${server.port}$path").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    if (body != null) {
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val os = conn.getOutputStream
      try os.write(body.getBytes(UTF_8)) finally os.close()
    }
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text =
      if (stream == null) ""
      else try new String(stream.readAllBytes(), UTF_8) finally stream.close()
    conn.disconnect()
    (code, text)
  }

  private def asObj(s: String): Map[String, Any] =
    Json.parse(s).asInstanceOf[Map[String, Any]]

  // ---- the contract ---------------------------------------------------

  test("health and root descriptor") {
    val (hc, hb) = request("GET", "/health")
    assert(hc == 200)
    assert(asObj(hb)("status") == "healthy")
    val (rc, rb) = request("GET", "/")
    assert(rc == 200)
    assert(asObj(rb)("message") == "Vector Database CRUD API")
  }

  test("insert validates doc_id and text like the reference models") {
    // bad doc_id (space): 400 with detail envelope
    val (c1, b1) = request("POST", "/api/v1/insert",
      """{"doc_id":"bad id","text":"hello"}""")
    assert(c1 == 400)
    assert(asObj(b1)("detail").toString.contains("doc_id"))
    // empty text: 400
    val (c2, _) = request("POST", "/api/v1/insert",
      """{"doc_id":"ok-1","text":""}""")
    assert(c2 == 400)
    // missing field: 400
    val (c3, _) = request("POST", "/api/v1/insert", """{"doc_id":"ok-1"}""")
    assert(c3 == 400)
    // malformed JSON: 400, not 500
    val (c4, _) = request("POST", "/api/v1/insert", """{"doc_id": """)
    assert(c4 == 400)
    // happy path echoes the document with the embedding dimension
    val (c5, b5) = request("POST", "/api/v1/insert",
      """{"doc_id":"doc_1","text":"the quick brown fox","metadata":{"lang":"en","year":2020}}""")
    assert(c5 == 200)
    val doc = asObj(b5)
    assert(doc("doc_id") == "doc_1")
    assert(doc("embedding_dimension") == (dim: Any))
  }

  test("CRUD round-trip: insert, get, delete, 404 after delete") {
    val (ci, _) = request("POST", "/api/v1/insert",
      """{"doc_id":"crud-1","text":"ephemeral doc","metadata":{"k":"v"}}""")
    assert(ci == 200)
    val (cg, bg) = request("GET", "/api/v1/documents/crud-1")
    assert(cg == 200)
    val got = asObj(bg)
    assert(got("text") == "ephemeral doc")
    assert(got("metadata").asInstanceOf[Map[String, Any]]("k") == "v")
    val (cd, bd) = request("DELETE", "/api/v1/documents/crud-1")
    assert(cd == 200)
    assert(asObj(bd)("message").toString.contains("deleted"))
    val (c404, b404) = request("GET", "/api/v1/documents/crud-1")
    assert(c404 == 404)
    assert(asObj(b404)("detail").toString.contains("not found"))
    val (cd404, _) = request("DELETE", "/api/v1/documents/crud-1")
    assert(cd404 == 404)
  }

  test("search returns nearest docs with squared-L2 distances, nearest first") {
    // three docs; the MockEncoder is deterministic on text, so searching
    // with an indexed text must return that text at distance ~0 first
    for ((id, text) <- Seq(("s-1", "alpha beta gamma"),
                           ("s-2", "delta epsilon zeta"),
                           ("s-3", "eta theta iota"))) {
      val (c, _) = request("POST", "/api/v1/insert",
        s"""{"doc_id":"$id","text":"$text"}""")
      assert(c == 200)
    }
    val (c, b) = request("POST", "/api/v1/search",
      """{"query":"delta epsilon zeta","n_results":3}""")
    assert(c == 200)
    val resp = asObj(b)
    val results = resp("results").asInstanceOf[Vector[Map[String, Any]]]
    assert(resp("total_results") == (results.length: Any))
    assert(results.nonEmpty)
    assert(results.head("doc_id") == "s-2")
    val dists = results.map(_("distance").asInstanceOf[Number].doubleValue())
    assert(dists.head < 1e-6) // same text ⇒ same vector ⇒ distance 0
    assert(dists == dists.sorted) // ascending squared-L2
    assert(resp("search_time_ms").asInstanceOf[Number].doubleValue() >= 0)
  }

  test("search respects metadata_filter equality and include_distances") {
    for ((id, lang) <- Seq(("f-en-1", "en"), ("f-de-1", "de"), ("f-en-2", "en"))) {
      val (c, _) = request("POST", "/api/v1/insert",
        s"""{"doc_id":"$id","text":"shared text for filter test","metadata":{"lang":"$lang"}}""")
      assert(c == 200)
    }
    val (c, b) = request("POST", "/api/v1/search",
      """{"query":"shared text for filter test","n_results":10,"metadata_filter":{"lang":"en"},"include_distances":false}""")
    assert(c == 200)
    val results = asObj(b)("results").asInstanceOf[Vector[Map[String, Any]]]
    val ids = results.map(_("doc_id")).toSet
    // every hit carries lang=en (doc_1 from the earlier test also matches —
    // the filter is a collection-wide predicate, not a prefix match)
    assert(results.forall(
      _("metadata").asInstanceOf[Map[String, Any]].get("lang").contains("en")))
    assert(Set[Any]("f-en-1", "f-en-2").subsetOf(ids))
    assert(!ids.contains("f-de-1"))
    assert(results.forall(_("distance") == null))
  }

  test("search validation: n_results bounds and query length") {
    val (c1, _) = request("POST", "/api/v1/search",
      """{"query":"x","n_results":0}""")
    assert(c1 == 400)
    val (c2, _) = request("POST", "/api/v1/search",
      """{"query":"x","n_results":51}""")
    assert(c2 == 400)
    val (c3, _) = request("POST", "/api/v1/search",
      s"""{"query":"${"a" * 1001}"}""")
    assert(c3 == 400)
  }

  test("collection info reflects live document count") {
    val (c, b) = request("GET", "/api/v1/collection/info")
    assert(c == 200)
    val info = asObj(b)
    assert(info("name") == "documents")
    assert(info("document_count") == (service.documentCount.toLong: Any))
  }

  test("batch insert tallies per-item success like the reference") {
    val docs = (1 to 5).map(i =>
      s"""{"doc_id":"b-$i","text":"batch doc $i"}""").mkString("[", ",", "]")
    val (c, b) = request("POST", "/api/v1/batch/insert", docs)
    assert(c == 200)
    val resp = asObj(b)
    assert(resp("total_documents") == (5L: Any))
    assert(resp("successful_inserts") == (5L: Any))
    assert(resp("failed_inserts") == (0L: Any))
    assert(resp("success_rate") == (100.0: Any))
    // mixed batch: invalid items fail individually, batch still 200
    val mixed = """[{"doc_id":"b-ok","text":"fine"},{"doc_id":"bad id","text":"x"}]"""
    val (cm, bm) = request("POST", "/api/v1/batch/insert", mixed)
    assert(cm == 200)
    val mr = asObj(bm)
    assert(mr("successful_inserts") == (1L: Any))
    assert(mr("failed_inserts") == (1L: Any))
    // oversized batch: 400
    val big = (1 to 101).map(i =>
      s"""{"doc_id":"z-$i","text":"d"}""").mkString("[", ",", "]")
    val (cb, _) = request("POST", "/api/v1/batch/insert", big)
    assert(cb == 400)
  }

  test("metrics exposes prometheus text and stats counts queries") {
    val before = counters.queriesTotal.value
    val (c, _) = request("POST", "/api/v1/search", """{"query":"alpha beta gamma"}""")
    assert(c == 200)
    val (cm, bm) = request("GET", "/metrics")
    assert(cm == 200)
    assert(bm.contains("rag_requests_total"))
    assert(bm.contains("# TYPE"))
    val (cs, bs) = request("GET", "/stats")
    assert(cs == 200)
    val stats = asObj(bs)
    assert(stats("total_queries").asInstanceOf[Number].longValue() >= before + 1)
    assert(stats("uptime_seconds").asInstanceOf[Number].doubleValue() > 0)
  }

  test("unknown route 404s and wrong method 405s with detail envelope") {
    val (c1, b1) = request("GET", "/api/v1/nope")
    assert(c1 == 404)
    assert(asObj(b1).contains("detail"))
    val (c2, _) = request("DELETE", "/api/v1/collection/info")
    assert(c2 == 405)
    val (c3, _) = request("GET", "/api/v1/insert")
    assert(c3 == 405)
  }

  test("upsert replaces: re-insert same doc_id keeps count, updates text") {
    val n0 = service.documentCount
    request("POST", "/api/v1/insert", """{"doc_id":"up-1","text":"version one"}""")
    val n1 = service.documentCount
    request("POST", "/api/v1/insert", """{"doc_id":"up-1","text":"version two"}""")
    assert(service.documentCount == n1)
    assert(n1 == n0 + 1)
    val (_, b) = request("GET", "/api/v1/documents/up-1")
    assert(asObj(b)("text") == "version two")
  }

  test("Json codec round-trips escapes, unicode, numbers and nesting") {
    val raw = """{"s":"a\"b\\c\ndé","n":-12.5e2,"i":42,"b":true,"x":null,"arr":[1,{"k":[]}]}"""
    val m = asObj(raw)
    assert(m("s") == "a\"b\\c\ndé")
    assert(m("n") == (-1250.0: Any))
    assert(m("i") == (42L: Any))
    assert(m("b") == (true: Any))
    assert(m("x") == null)
    // writer emits valid JSON the parser accepts (fixpoint)
    val out = Json.write(m)
    assert(Json.parse(out) == m)
    // invalid inputs raise ParseError, not arbitrary exceptions
    for (bad <- Seq("{", """{"a":}""", "[1,", "\"unterminated", "12abc", ""))
      assertThrows[Json.ParseError](Json.parse(bad))
  }
}
