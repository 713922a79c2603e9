package graft

import graft.operators.Embedder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object EmbedderSpec {
  val openCount = new java.util.concurrent.atomic.AtomicInteger(0)
  val closeCount = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Counts opens/closes through JVM-static state — local-mode executors
    * share the JVM, so the spec can observe the cache's release path.
    * `tag` keeps each test's cache entry distinct (the cache is JVM-wide). */
  case class CountingFactory(hidden: Int, tag: String = "") extends Embedder.ModelSessionFactory {
    def key: String = s"counting:$hidden:$tag"
    def open(): Embedder.ModelSession = {
      openCount.incrementAndGet()
      new Embedder.ModelSession {
        def hiddenSize: Int = hidden
        def run(inputIds: Array[Array[Long]],
                attentionMask: Array[Array[Long]]): Array[Array[Array[Float]]] =
          inputIds.zip(attentionMask).map { case (ids, mask) =>
            ids.zip(mask).map { case (t, m) =>
              Array.tabulate(hidden)(h => if (m == 0L) 0f else (t % 7 + h).toFloat)
            }
          }
        override def close(): Unit = closeCount.incrementAndGet()
      }
    }
  }
}

class EmbedderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark engines process data"),
    (1L, "vectors live in embedding space"),
    (2L, "spark engines process data")  // same text as 0
  ).toDF("doc_id", "text")

  test("mock embeddings are deterministic, bounded, content-keyed") {
    val out = Embedder.embed(docs, "doc_id", "text", Embedder.MockEncoder(32))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(out(0L) === out(2L))      // same content → same vector
    assert(out(0L) !== out(1L))
    // md5-uniform components live in [-0.5, 0.5)
    assert(out(0L).forall(x => x >= -0.5f && x < 0.5f))
    assert(out(0L).length === 32)
    // golden: component j = int(md5(text#j)[:13], 16) / 2^52 − 0.5
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("spark engines process data#0".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)
    val expected = (java.lang.Long.parseLong(hex, 16) / 9007199254740992.0 - 0.5).toFloat
    assert(out(0L).head === expected)
  }

  test("batching boundary does not change results") {
    val big = (0L until 100L).map(i => (i, s"document number $i")).toDF("doc_id", "text")
    val b1 = Embedder.embed(big, "doc_id", "text", Embedder.MockEncoder(16), batchSize = 7)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val b2 = Embedder.embed(big, "doc_id", "text", Embedder.MockEncoder(16), batchSize = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(b1 === b2)
  }

  test("session encoder: deterministic, batch-invariant, unit-norm, null-safe") {
    val enc = Embedder.SessionEncoder(
      Embedder.HashProjectionFactory("models/test-a", hidden = 32), dim = 32)
    val big = (0L until 60L).map(i => (i, s"document number $i words")).toDF("doc_id", "text")
    val b1 = Embedder.embed(big, "doc_id", "text", enc, batchSize = 7)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val b2 = Embedder.embed(big, "doc_id", "text", enc, batchSize = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(b1 === b2) // one forward pass per batch, but batch-independent
    assert(b1(0L).length === 32)
    val norm = math.sqrt(b1(0L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4) // sentence-transformers contract
    // null and empty texts fall back to the zero vector, no crash
    val weird = Seq((0L, null.asInstanceOf[String]), (1L, ""), (2L, "ok text")).toDF("doc_id", "text")
    val w = Embedder.embed(weird, "doc_id", "text", enc)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(w(0L).forall(_ === 0f) && w(1L).forall(_ === 0f))
    assert(w(2L).exists(_ !== 0f))
  }

  test("session encoder: one session per JVM per model, not per partition") {
    val before = Embedder.sessionOpenCount
    val enc = Embedder.SessionEncoder(
      Embedder.HashProjectionFactory("models/test-b", hidden = 16), dim = 16)
    // 8 partitions × 2 actions — a per-partition open would show ≥ 16
    val big = (0L until 64L).map(i => (i, s"doc $i")).toDF("doc_id", "text").repartition(8)
    Embedder.embed(big, "doc_id", "text", enc).count()
    Embedder.embed(big, "doc_id", "text", enc).count()
    assert(Embedder.sessionOpenCount - before === 1)
  }

  test("closeAllSessions releases native handles; next encode reopens") {
    EmbedderSpec.closeCount.set(0)
    val enc = Embedder.SessionEncoder(EmbedderSpec.CountingFactory(16), dim = 16)
    val d = Seq((0L, "a doc")).toDF("doc_id", "text")
    Embedder.embed(d, "doc_id", "text", enc).count()
    val opensBefore = EmbedderSpec.openCount.get()
    assert(opensBefore >= 1)
    Embedder.closeAllSessions()
    // every cached session's close() actually ran (native release path)
    assert(EmbedderSpec.closeCount.get() >= 1)
    // the cache is really empty: the next batch must reopen via the factory
    Embedder.embed(d, "doc_id", "text", enc).count()
    assert(EmbedderSpec.openCount.get() === opensBefore + 1)
    // idempotent: closing twice must not throw or double-close
    Embedder.closeAllSessions()
    val closes = EmbedderSpec.closeCount.get()
    Embedder.closeAllSessions()
    assert(EmbedderSpec.closeCount.get() === closes)
  }

  test("masking edge cases: seqLen truncation, whitespace-only, mask-aware pooling") {
    val enc = Embedder.SessionEncoder(
      Embedder.HashProjectionFactory("models/test-mask", hidden = 16),
      dim = 16, seqLen = 4)
    // whitespace-only text tokenizes to an all-zero mask → zero vector,
    // exactly like null/empty
    val d = Seq(
      (0L, "   \t  \n "),
      (1L, "one two three four"),            // exactly seqLen tokens
      (2L, "one two three four five six"),   // truncates to the first seqLen
      (3L, "one two three four seven eight") // same prefix → same vector
    ).toDF("doc_id", "text")
    val m = Embedder.embed(d, "doc_id", "text", enc)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2).toList).toMap
    assert(m(0L).forall(_ === 0f))
    // truncation is by token position: past-seqLen tokens cannot matter
    assert(m(2L) === m(1L))
    assert(m(3L) === m(1L))
    // short text = fewer unmasked positions: pooling must average over
    // the MASK count, not seqLen — a padded row equals its unpadded twin
    val encWide = Embedder.SessionEncoder(
      Embedder.HashProjectionFactory("models/test-mask", hidden = 16),
      dim = 16, seqLen = 32)
    val short = Seq((0L, "hello world")).toDF("doc_id", "text")
    val v = Embedder.embed(short, "doc_id", "text", encWide)
      .collect().head.getSeq[Float](2)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4) // normalized over 2 real tokens, not 32 pads
  }

  test("concurrent first encodes race to exactly one session open") {
    // 16 threads hit a COLD cache key simultaneously: computeIfAbsent must
    // collapse the race to one factory open (a per-thread open would load
    // a multi-hundred-MB model once per task thread on a real executor)
    val opens0 = EmbedderSpec.openCount.get()
    val enc = Embedder.SessionEncoder(
      EmbedderSpec.CountingFactory(16, "race-open"), dim = 16)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val tasks = (0 until 16).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            start.await()
            enc.encodeBatch(Seq(s"threaded doc $i", s"second doc $i"))
            ()
          }
        })
      }
      start.countDown()
      tasks.foreach(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(EmbedderSpec.openCount.get() - opens0 === 1)
    Embedder.closeAllSessions()
  }

  test("closeAll racing concurrent encodes: no crash, no leaked session") {
    // encode threads and repeated closeAllSessions interleave (the model
    // hot-swap scenario): every encode must complete, and once the dust
    // settles every session the factory ever opened must be closed —
    // opens == closes is the no-native-leak invariant.
    val opens0 = EmbedderSpec.openCount.get()
    val closes0 = EmbedderSpec.closeCount.get()
    val enc = Embedder.SessionEncoder(
      EmbedderSpec.CountingFactory(16, "race-close"), dim = 16)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(10)
    try {
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      // TWO closers: concurrent closeAll pairs exercise the atomic-remove
      // ownership rule (only the winning remove() closes — a double close
      // of a native handle is a segfault, and would also break the
      // opens == closes accounting below)
      val closers = (0 until 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            while (!stop.get()) { Embedder.closeAllSessions(); Thread.`yield`() }
          }
        })
      }
      val encoders = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            var ok = 0
            var r = 0
            while (r < 50) {
              val out = enc.encodeBatch(Seq(s"doc $i round $r"))
              if (out.head.length == 16) ok += 1
              r += 1
            }
            ok
          }
        })
      }
      // every encode returned a well-formed vector despite the closer
      encoders.foreach(f =>
        assert(f.get(60, java.util.concurrent.TimeUnit.SECONDS) === 50))
      stop.set(true)
      closers.foreach(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    Embedder.closeAllSessions() // terminal close: drain whatever is cached
    val opened = EmbedderSpec.openCount.get() - opens0
    val closed = EmbedderSpec.closeCount.get() - closes0
    assert(opened >= 1) // the closer forced at least one reopen cycle
    assert(closed === opened, s"leaked sessions: $opened opened, $closed closed")
  }

  test("incremental embed reuses the cache with the session encoder too") {
    val enc = Embedder.SessionEncoder(
      Embedder.HashProjectionFactory("models/test-a", hidden = 32), dim = 32)
    val cached = Embedder.embed(docs.where($"doc_id" < 2), "doc_id", "text", enc)
    val incoming = Seq(
      (10L, "spark engines process data"), // hit
      (11L, "a brand new document")        // miss
    ).toDF("doc_id", "text")
    val out = Embedder.embedIncremental(incoming, cached, "doc_id", "text", enc)
    val m = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](r.fieldIndex("embedding")).toList).toMap
    val orig = cached.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](r.fieldIndex("embedding")).toList).toMap
    assert(m(10L) === orig(0L))
    assert(m.contains(11L) && m(11L).exists(_ !== 0f))
  }

  test("incremental embed reuses the cache for known fingerprints") {
    val cached = Embedder.embed(docs.where($"doc_id" < 2), "doc_id", "text")
    val incoming = Seq(
      (10L, "spark engines process data"),   // cache hit (same canonical text)
      (11L, "a brand new document")          // miss → computed
    ).toDF("doc_id", "text")
    val out = Embedder.embedIncremental(incoming, cached, "doc_id", "text")
    assert(out.count() === 2)
    val m = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](r.fieldIndex("embedding")).toList).toMap
    val orig = cached.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](r.fieldIndex("embedding")).toList).toMap
    assert(m(10L) === orig(0L)) // identical vector reused from cache
  }
}
