package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Evt, KeyStats}

class StreamingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("watermarked windowed aggregation over a memory stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Evt]
    val agg = StreamingOps.windowedAgg(mem.toDF(), "1 hour", "1 hour", "2 hours")
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("win_out").start()
    try {
      mem.addData(
        Evt(ts(0, 10), 1, "click", 2.0),
        Evt(ts(0, 50), 2, "click", 3.0),
        Evt(ts(1, 5), 1, "view", 7.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .orderBy("win_start", "event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Timestamp]("win_start") == ts(0, 0))
      assert(rows(0).getString(1) == "click" && rows(0).getLong(2) == 2
        && rows(0).getDouble(3) == 5.0)
      assert(rows(1).getString(1) == "view" && rows(1).getLong(2) == 1)
    } finally q.stop()
  }

  test("session windows close after the gap and split per user") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Evt]
    val agg = StreamingOps.sessionAgg(mem.toDF(), "30 minutes", "2 hours")
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("sess_out").start()
    try {
      mem.addData(
        Evt(ts(0, 0), 1, "click", 1.0),   // session A (user 1)
        Evt(ts(0, 20), 1, "click", 2.0),  // still A (gap 20m < 30m)
        Evt(ts(1, 30), 1, "click", 4.0),  // gap 70m -> session B
        Evt(ts(0, 5), 2, "view", 8.0))    // user 2's own session
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .orderBy("user_id", "sess_start").collect()
      assert(rows.length == 3)
      // user 1, session A: 2 events, sum 3.0, closes 30m after the last event
      assert(rows(0).getAs[Timestamp]("sess_start") == ts(0, 0))
      assert(rows(0).getAs[Timestamp]("sess_end") == ts(0, 50))
      assert(rows(0).getLong(3) == 2 && rows(0).getDouble(4) == 3.0)
      // user 1, session B: singleton
      assert(rows(1).getAs[Timestamp]("sess_start") == ts(1, 30))
      assert(rows(1).getLong(3) == 1)
      // user 2: singleton
      assert(rows(2).getLong(2) == 2L && rows(2).getLong(3) == 1)
    } finally q.stop()
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Evt]
    val dd = StreamingOps.dedupStream(mem.toDF(), Seq("user_id", "event_type"))
    val q = dd.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(
        Evt(ts(0, 1), 1, "click", 1.0),
        Evt(ts(0, 2), 1, "click", 2.0), // dup key in the same batch
        Evt(ts(0, 3), 2, "view", 3.0))
      q.processAllAvailable()
      mem.addData(
        Evt(ts(0, 10), 1, "click", 4.0), // dup key across batches
        Evt(ts(0, 11), 1, "view", 5.0))  // new key
      q.processAllAvailable()
      val rows = spark.table("dedup_out")
        .orderBy("user_id", "event_type").collect()
      assert(rows.length == 3)
      // the FIRST occurrence of each key is the one kept
      assert(rows.map(r => (r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
        == Seq((1L, "click", 1.0), (1L, "view", 5.0), (2L, "view", 3.0)))
    } finally q.stop()
  }

  test("streaming tokenizer apply: a persisted trained model counts subword tokens on a stream, stateless map-only") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // train + persist once (batch side), apply on the stream (ingest side)
    val model = graft.operators.TextOps.bpeTrainModel(
      Seq(Tuple1("abab abab cdcd cd")).toDF("text"), "text", 3, 10)
    val dir = java.nio.file.Files.createTempDirectory("bpe_stream").toString
    graft.operators.TextOps.bpeModelWrite(model, spark, dir)
    val vocab = graft.operators.TextOps.bpeModelRead(spark, dir).vocab
    val mem = MemoryStream[(Long, String)]
    val counted = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.operators.TextOps.tokenCountBpe(col("text"), vocab)
          .cast("long").as("n_tokens_bpe"))
    val q = counted.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("bpe_stream_out").start()
    try {
      mem.addData((1L, "abab cd"), (2L, "zz abab abab"))
      q.processAllAvailable()
      val rows = spark.table("bpe_stream_out").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // batch-side counts must agree exactly (same kernel, same vocab)
      val batch = Seq((1L, "abab cd"), (2L, "zz abab abab"))
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.operators.TextOps.tokenCountBpe(col("text"), vocab)
            .cast("long"))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows == batch.toSeq, s"stream $rows vs batch ${batch.toSeq}")
      val plan = spark.table("bpe_stream_out").queryExecution.analyzed.toString
      assert(!plan.contains("StateStore"), plan.take(1000))
    } finally q.stop()
  }

  test("streaming unigram apply: a persisted Viterbi model tokenizes a stream, torn rebuild fails fast, stateless map-only") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // train + persist once (batch side), restore + apply on the stream
    val model = graft.operators.TextOps.unigramTrainModel(
      Seq(Tuple1("abab abab ab")).toDF("text"), "text",
      maxPieceLen = 4, sampleWords = 10, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("uni_stream").toString
    graft.operators.TextOps.unigramModelWrite(model, spark, dir)
    val restored = graft.operators.TextOps.unigramModelRead(spark, dir)
    // round-trip is exact: pieces, counts, scores, unk penalty
    assert(restored == model)
    val mem = MemoryStream[(Long, String)]
    val toks = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.operators.TextOps.unigramTokens(col("text"), restored)
          .as("tokens"))
    val q = toks.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("uni_stream_out").start()
    try {
      mem.addData((1L, "abab ab"), (2L, "zz abab"))
      q.processAllAvailable()
      val rows = spark.table("uni_stream_out").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toSeq
      // the decode under the restored model: trained words segment as
      // trained; the unseen "zz" unk-steps per codepoint
      assert(rows == Seq(
        (1L, Seq("abab", "ab")), (2L, Seq("z", "z", "abab"))),
        rows.toString)
      val plan = spark.table("uni_stream_out").queryExecution.analyzed
        .toString
      assert(!plan.contains("StateStore"), plan.take(1000))
    } finally q.stop()
    // torn rebuild fails fast: overwrite ONE side with a different model
    val other = graft.operators.TextOps.unigramTrainModel(
      Seq(Tuple1("cd cd cd")).toDF("text"), "text", 2, 10, 1)
    graft.operators.TextOps.unigramModelWrite(other, spark, dir)
    import org.apache.spark.sql.functions.lit
    spark.read.parquet(s"$dir/meta").drop("model_id")
      .withColumn("model_id", lit("deadbeef"))
      .write.mode("overwrite").parquet(s"$dir/meta2")
    // simulate the tear by pointing meta at the stale fingerprint
    val fs = new java.io.File(s"$dir/meta")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(fs)
    new java.io.File(s"$dir/meta2").renameTo(fs)
    val torn = intercept[IllegalArgumentException] {
      graft.operators.TextOps.unigramModelRead(spark, dir)
    }
    assert(torn.getMessage.contains("torn unigram model"))
  }

  test("streaming alignment gate: map-only pair filter, mis-captioned pairs dropped at ingest") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Double], Array[Double])]
    val gated = StreamingOps.alignmentGate(
      mem.toDF().toDF("pair_id", "cap_emb", "img_emb"),
      "cap_emb", "img_emb", tau = 0.9)
    val q = gated.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("align_out").start()
    try {
      mem.addData(
        (1L, Array(1.0, 0.0, 0.0), Array(0.99, 0.1, 0.0)),  // aligned
        (2L, Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)),   // orthogonal
        (3L, Array(0.0, 1.0, 0.0), Array(0.0, 0.98, 0.05))) // aligned
      q.processAllAvailable()
      val rows = spark.table("align_out").orderBy("pair_id")
        .select("pair_id", "keep").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
      assert(rows == Seq((1L, true), (2L, false), (3L, true)))
      // stateless map-only: the micro-batch plan has no state store and
      // no exchange — the scale contract of an ingest-time gate
      val plan = spark.table("align_out").queryExecution.analyzed.toString
      assert(!plan.contains("StateStore"), plan.take(1000))
    } finally q.stop()
  }

  test("stream-static near-dup candidates against a persisted band index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Dedup
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    // corpus: two near-identical docs + one unrelated, signed into an index
    val corpus = Seq(
      (1L, base), (2L, base.replace("beta", "betax")),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val idxPath = s"${sys.props("java.io.tmpdir")}/graft_test_bandidx"
    graft.cli.Cleanup.deleteOnExit(idxPath)
    val sig = Dedup.minHash(Dedup.shingles(corpus, "text", "doc_id", 1), "doc_id", 8)
    Dedup.bandIndexWrite(Dedup.lshBands(sig, "doc_id", 8, 4), "doc_id", 4, idxPath)
    val index = Dedup.bandIndexRead(spark, idxPath)

    val mem = MemoryStream[(Long, String)]
    val cand = StreamingOps.nearDupCandidates(
      mem.toDF().toDF("doc_id", "text"), index, "text", "doc_id")
    val q = cand.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("neardup_out").start()
    try {
      mem.addData(
        (10L, base),                                      // dup of docs 1/2
        (11L, "unrelated words entirely different here")) // no bucket match
      q.processAllAvailable()
      val got = spark.table("neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((1L, 10L)), s"exact dup must match the index: $got")
      assert(!got.exists(_._2 == 11L), s"unrelated doc must not match: $got")
      // a second micro-batch with the same doc re-emits nothing new for
      // already-seen pairs (the stateful distinct)
      mem.addData((10L, base))
      q.processAllAvailable()
      val again = spark.table("neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(again.length == again.distinct.length, s"pair re-emitted: ${again.toSeq}")
    } finally q.stop()
  }

  test("streaming URL-index maintenance: a cosmetic variant collapses onto the batch N-1 ingest; retry no-ops") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Dedup
    val idxPath = s"${sys.props("java.io.tmpdir")}/graft_test_urlidx_maint"
    val ckpt = s"${sys.props("java.io.tmpdir")}/graft_test_urlidx_maint_ckpt"
    graft.cli.Cleanup.deleteOnExit(idxPath)
    graft.cli.Cleanup.deleteOnExit(ckpt)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.maintainUrlIndex(mem.toDF().toDF("doc_id", "url"),
        "url", "doc_id", idxPath)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, "http://a.com/x?p=1&q=2"), (2L, "http://b.com/y"))
      q.processAllAvailable() // batch 0
      mem.addData((10L, "HTTP://A.COM:80/x/?q=2&p=1"), (11L, "http://c.com/z"))
      q.processAllAvailable() // batch 1: a cosmetic variant of doc 1's URL
    } finally q.stop()
    val dups = Dedup.urlIndexDuplicates(spark, idxPath).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // batch 1's variant canonicalized onto batch 0's resource: keeper 1, copies 2
    assert(dups.contains((1L, 2L)), dups.mkString(", "))
    assert(dups.count(_._2 == 1L) == 2, dups.mkString(", "))
    // retry idempotence: an already-applied batch id appends nothing
    val before = spark.read.parquet(s"$idxPath/keys").count()
    assert(!Dedup.urlIndexAppendBatch(idxPath,
      Seq(99L -> "http://d.com/w").toDF("doc_id", "url"), "url", "doc_id", 1L))
    assert(spark.read.parquet(s"$idxPath/keys").count() == before)
    assert(Dedup.urlIndexAppendBatch(idxPath,
      Seq(99L -> "http://d.com/w").toDF("doc_id", "url"), "url", "doc_id", 5L))
    assert(spark.read.parquet(s"$idxPath/keys").count() == before + 1)
  }

  test("streaming winnow-index maintenance: containment match against a batch N-1 ingest; retry no-ops; verify green") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Dedup
    val rnd = new scala.util.Random(5)
    val words = Vector("ka", "lo", "mi", "ne", "os", "pu", "qa", "re", "su", "tu")
    val filler = Seq.fill(30)(words(rnd.nextInt(words.size))).mkString(" ")
    val shared = "zz yy xx ww vv uu" // w + k - 1 tokens: must share a fingerprint
    val idxPath = s"${sys.props("java.io.tmpdir")}/graft_test_winidx_maint"
    val ckpt = s"${sys.props("java.io.tmpdir")}/graft_test_winidx_maint_ckpt"
    graft.cli.Cleanup.deleteOnExit(idxPath)
    graft.cli.Cleanup.deleteOnExit(ckpt)
    def probe(doc: (Long, String)): Set[(Long, Long)] =
      Dedup.winnowIncrementalPairs(spark, idxPath,
          Dedup.winnowFingerprints(Seq(doc).toDF("doc_id", "text"),
            "text", "doc_id", k = 3, w = 4), "doc_id", minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.maintainWinnowIndex(mem.toDF().toDF("doc_id", "text"),
        "text", "doc_id", idxPath)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, filler), (2L, "aa bb cc dd ee")) // batch 0
      q.processAllAvailable()
      mem.addData((10L, filler + " " + shared)) // batch 1: new ingest
      q.processAllAvailable()
      // a doc arriving AFTER batch 1 contains the run ingested in batch 1
      val got = probe(20L -> (shared + " pq rs tv"))
      assert(got.contains((10L, 20L)),
        s"batch-2 doc must hit the batch-1 ingest: $got")
      assert(!got.exists(_._1 == 2L), s"unrelated doc must not pair: $got")
    } finally q.stop()
    // retry idempotence: an already-applied batch id appends nothing
    val before = spark.read.parquet(s"$idxPath/fps").count()
    assert(!Dedup.winnowAppendBatch(idxPath,
      Dedup.winnowFingerprints(Seq(99L -> filler).toDF("doc_id", "text"),
        "text", "doc_id", 3, 4), "doc_id", 1L))
    assert(spark.read.parquet(s"$idxPath/fps").count() == before)
    assert(Dedup.winnowAppendBatch(idxPath,
      Dedup.winnowFingerprints(Seq(99L -> filler).toDF("doc_id", "text"),
        "text", "doc_id", 3, 4), "doc_id", 7L))
    assert(spark.read.parquet(s"$idxPath/fps").count() > before)
    // the maintained index passes the recount-vs-sidecar verifier
    assert(Dedup.winnowIndexVerify(spark, idxPath).isEmpty,
      "maintained index must verify consistent")
  }

  test("streaming sketch maintenance: read-time merge equals the whole-stream sketch; retry no-ops") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Sketch
    val cmPath = s"${sys.props("java.io.tmpdir")}/graft_test_cm_maint"
    val hllPath = s"${sys.props("java.io.tmpdir")}/graft_test_hll_maint"
    val ckpt1 = s"${sys.props("java.io.tmpdir")}/graft_test_cm_maint_ckpt"
    val ckpt2 = s"${sys.props("java.io.tmpdir")}/graft_test_hll_maint_ckpt"
    Seq(cmPath, hllPath, ckpt1, ckpt2).foreach(graft.cli.Cleanup.deleteOnExit)
    val b0 = Seq("alpha", "beta", "alpha", "gamma")
    val b1 = Seq("alpha", "delta", "delta", "epsilon", "beta")
    val memC = MemoryStream[String]
    val memH = MemoryStream[String]
    val qc = StreamingOps.maintainCountMin(memC.toDF().toDF("w"), "w",
      cmPath, depth = 4, width = 8).option("checkpointLocation", ckpt1).start()
    val qh = StreamingOps.maintainHll(memH.toDF().toDF("w"), "w", hllPath)
      .option("checkpointLocation", ckpt2).start()
    try {
      memC.addData(b0); memH.addData(b0)
      qc.processAllAvailable(); qh.processAllAvailable() // batch 0
      memC.addData(b1); memH.addData(b1)
      qc.processAllAvailable(); qh.processAllAvailable() // batch 1
    } finally { qc.stop(); qh.stop() }
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // maintained CMS == the sketch of everything ingested so far
    val whole = (b0 ++ b1).toDF("w")
    assert(asMap(Sketch.cmRead(spark, cmPath)) ==
      asMap(Sketch.countMinCells(whole, "w", 4, 8)))
    // maintained HLL registers == the directly-built registers
    def regMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(regMap(Sketch.hllRead(spark, hllPath, Nil)) ==
      regMap(Sketch.hllRegisters(whole, "w", Nil)))
    // retry idempotence: an already-applied batch id appends nothing —
    // for CMS a silent double-append would DOUBLE-COUNT, so this is the
    // property that keeps the maintained sketch exact
    val before = Sketch.cmRead(spark, cmPath).collect().map(_.getLong(2)).sum
    assert(!Sketch.sketchAppendBatch(cmPath,
      Sketch.countMinCells(Seq("zz").toDF("w"), "w", 4, 8), 1L))
    assert(Sketch.cmRead(spark, cmPath).collect().map(_.getLong(2)).sum == before)
    assert(Sketch.sketchAppendBatch(cmPath,
      Sketch.countMinCells(Seq("zz").toDF("w"), "w", 4, 8), 5L))
    assert(Sketch.cmRead(spark, cmPath).collect().map(_.getLong(2)).sum == before + 4)
  }

  test("RTBF round-trip under ingest: forget hides, later appends apply, purge is physical and idempotent") {
    import spark.implicits._
    import graft.operators.{Dedup, Rtbf}
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_rtbf_winnow"
    graft.cli.Cleanup.deleteOnExit(path)
    val a = "lorem ipsum dolor sit amet consectetur adipiscing elit " +
      "sed alpha beta gamma delta epsilon zeta"
    val b = "quick brown foxes jump over lazy dogs while seven wizards " +
      "brew omega psi chi phi upsilon tau"
    def fps(rows: Seq[(Long, String)]) = Dedup.winnowFingerprints(
      rows.toDF("doc_id", "text"), "text", "doc_id", 3, 4)
    Dedup.winnowIndexWrite(fps(Seq(1L -> a, 2L -> b)), "doc_id", path)
    def probe(txt: String) = Dedup.winnowIncrementalPairs(spark, path,
      fps(Seq(99L -> txt)), "doc_id", minShared = 1)
      .collect().map(_.getLong(0)).toSet
    assert(probe(a) == Set(1L), "pre-forget: doc 1 is containment-visible")
    Dedup.winnowForget(spark, path, Seq(1L).toDF("doc_id"), "doc_id")
    assert(probe(a).isEmpty, "forgotten doc must stop pairing immediately")
    assert(probe(b) == Set(2L), "other docs unaffected")
    // later appends still apply through the replay guard (delete does
    // not wedge the ingest protocol)
    assert(Dedup.winnowAppendBatch(path, fps(Seq(3L -> a)), "doc_id", 1L))
    assert(probe(a) == Set(3L), "post-forget append is probe-visible")
    assert(!Dedup.winnowAppendBatch(path, fps(Seq(3L -> a)), "doc_id", 1L),
      "replayed batch id still no-ops after a forget")
    // purge: physical, verifier-green, probe-stable, idempotent
    Dedup.winnowPurge(spark, path)
    assert(spark.read.parquet(s"$path/fps")
      .where(col("doc_id") === 1L).count() == 0, "purge must be physical")
    assert(spark.read.parquet(s"$path/sizes")
      .where(col("doc_id") === 1L).count() == 0, "sizes rows are data too")
    assert(!Rtbf.hasTombstones(spark, path))
    assert(Dedup.winnowIndexVerify(spark, path).isEmpty)
    assert(probe(a) == Set(3L) && probe(b) == Set(2L))
    Dedup.winnowPurge(spark, path) // no tombstones: a no-op
    assert(probe(a) == Set(3L))
    // a rebuild clears any pending tombstones (no stale hiding)
    Dedup.winnowForget(spark, path, Seq(2L).toDF("doc_id"), "doc_id")
    Dedup.winnowIndexWrite(fps(Seq(1L -> a, 2L -> b)), "doc_id", path)
    assert(probe(b) == Set(2L), "rebuild must clear stale tombstones")
  }

  test("streaming histogram maintenance: frozen-bound merge equals the direct build; out-of-span fails loud") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.{Sketch, Stats}
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_hist_maint"
    val ckpt = s"${sys.props("java.io.tmpdir")}/graft_test_hist_maint_ckpt"
    Seq(path, ckpt).foreach(graft.cli.Cleanup.deleteOnExit)
    // bounds frozen at [0, 99]; the two batches jointly cover both ends,
    // so the direct (data-derived) build uses the same span
    val b0 = Seq(0L, 5L, 12L, 25L)
    val b1 = Seq(30L, 49L, 99L, 60L, 77L)
    val mem = MemoryStream[Long]
    val q = StreamingOps.maintainHistogram(mem.toDF().toDF("v"), "v",
        path, nBuckets = 4, lo = 0L, hi = 99L)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData(b0); q.processAllAvailable()
      mem.addData(b1); q.processAllAvailable()
    } finally q.stop()
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(m(Stats.histogramRead(spark, path, 4, 0L, 99L)) ==
      m(Stats.histogram((b0 ++ b1).toDF("v"), "v", 4)),
      "maintained histogram must equal the direct build bit for bit")
    // retry idempotence: an already-applied batch id appends nothing
    assert(!Sketch.sketchAppendBatch(path,
      Stats.histogramPartial(Seq(1L).toDF("v"), "v", 4, 0L, 99L), 1L))
    assert(m(Stats.histogramRead(spark, path, 4, 0L, 99L)) ==
      m(Stats.histogram((b0 ++ b1).toDF("v"), "v", 4)))
    // a value outside the frozen span fails the batch loud (the
    // re-freeze-and-rebuild signal), never silently clamps
    val e = intercept[Exception] {
      Stats.histogramPartial(Seq(150L).toDF("v"), "v", 4, 0L, 99L).collect()
    }
    assert((e.getMessage != null && e.getMessage.contains("frozen span")) ||
      Option(e.getCause).exists(_.getMessage.contains("frozen span")))
  }

  test("streaming KMV + edge maintenance: read-time merge equals the whole-stream build") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.{Graph, Sketch}
    val kmvPath = s"${sys.props("java.io.tmpdir")}/graft_test_kmv_maint"
    val edgePath = s"${sys.props("java.io.tmpdir")}/graft_test_edge_maint"
    val ck1 = s"${sys.props("java.io.tmpdir")}/graft_test_kmv_maint_ckpt"
    val ck2 = s"${sys.props("java.io.tmpdir")}/graft_test_edge_maint_ckpt"
    Seq(kmvPath, edgePath, ck1, ck2).foreach(graft.cli.Cleanup.deleteOnExit)
    val w0 = Seq("alpha", "beta", "alpha", "gamma", "delta")
    val w1 = Seq("alpha", "epsilon", "zeta", "beta", "eta")
    val e0 = Seq(("A", "B"), ("A", "B"), ("B", "C"))
    val e1 = Seq(("A", "B"), ("C", "A"))
    val memK = MemoryStream[String]
    val memE = MemoryStream[(String, String)]
    val qk = StreamingOps.maintainKmv(memK.toDF().toDF("w"), "w", kmvPath,
      Nil, k = 4).option("checkpointLocation", ck1).start()
    val qe = StreamingOps.maintainEdges(memE.toDF().toDF("s", "t"), "s", "t",
      edgePath).option("checkpointLocation", ck2).start()
    try {
      memK.addData(w0); memE.addData(e0)
      qk.processAllAvailable(); qe.processAllAvailable()
      memK.addData(w1); memE.addData(e1)
      qk.processAllAvailable(); qe.processAllAvailable()
    } finally { qk.stop(); qe.stop() }
    // maintained KMV == the direct whole-stream bottom-k
    val direct = Sketch.kmvSketch((w0 ++ w1).toDF("w"), "w", Nil, k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val got = Sketch.kmvRead(spark, kmvPath, Nil, k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == direct)
    // maintained edges == the whole-history weighted list, and PageRank
    // over them == PageRank over the direct edges
    val edges = Sketch.sumRead(spark, edgePath, Seq("src", "dst"), "w")
    val em = edges.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(em == Map(("A", "B") -> 3L, ("B", "C") -> 1L, ("C", "A") -> 1L))
    def pr(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(df, "src", "dst", "w", 3).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
    val directEdges = (e0 ++ e1).toDF("src", "dst")
      .groupBy("src", "dst")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("w"))
    assert(pr(edges) == pr(directEdges))
  }

  test("edge RTBF: negative-partial forget equals the truncated graph; zero edges drop; purge + replay idempotent") {
    import spark.implicits._
    import graft.operators.{Graph, Sketch}
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_edge_rtbf"
    graft.cli.Cleanup.deleteOnExit(path)
    val fs = new java.io.File(path)
    if (fs.exists) { def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete() }; rm(fs) }
    // ingest two batches of link observations
    val b0 = Seq(("A", "B"), ("A", "B"), ("B", "C"))
    val b1 = Seq(("A", "B"), ("C", "A"))
    def partial(obs: Seq[(String, String)]) = obs.toDF("src", "dst")
      .groupBy("src", "dst")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("w"))
    assert(Sketch.sketchAppendBatch(path, partial(b0), 0L))
    assert(Sketch.sketchAppendBatch(path, partial(b1), 1L))
    // forget the documents that contributed one A->B and the only B->C
    val forgotten = Seq(("A", "B"), ("B", "C")).toDF("s", "t")
    assert(StreamingOps.edgeForgetBatch(forgotten, "s", "t", path, 2L),
      "delete batch must apply")
    assert(!StreamingOps.edgeForgetBatch(forgotten, "s", "t", path, 2L),
      "replayed delete batch must no-op (it would delete twice)")
    def em(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val truncated = Map(("A", "B") -> 2L, ("C", "A") -> 1L)
    assert(em(StreamingOps.edgeRead(spark, path)) == truncated,
      "forget must leave the truncated graph; B->C summed to zero and " +
        "must be ABSENT, not a ghost zero-weight row")
    // PageRank over the maintained truncated edges == over direct ones:
    // node B survives only as a destination (A->B), node C only as a
    // source — the zero edge dropping out is what keeps the node set
    // and teleport shares honest
    def pr(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(df, "src", "dst", "w", 3).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(pr(StreamingOps.edgeRead(spark, path)) ==
      pr(truncated.toSeq.map { case ((s, t), w) => (s, t, w) }
        .toDF("src", "dst", "w")))
    // physical purge: same read, compacted storage, marker intact
    StreamingOps.edgePurge(spark, path)
    assert(em(StreamingOps.edgeRead(spark, path)) == truncated)
    assert(!Sketch.sketchAppendBatch(path, partial(b1), 2L),
      "lastbatch marker must survive the purge (replay still guarded)")
    // ingest continues after the purge
    assert(Sketch.sketchAppendBatch(path, partial(Seq(("B", "C"))), 3L))
    assert(em(StreamingOps.edgeRead(spark, path)) ==
      truncated + (("B", "C") -> 1L))
  }

  test("streaming dHash-index maintenance: a re-encoded image hits the batch N-1 ingest; retry no-ops") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Multimodal
    def plane(f: (Int, Int) => Int): Array[Byte] = {
      val px = new Array[Byte](9 * 8 * 3)
      for (y <- 0 until 8; x <- 0 until 9; c <- 0 until 3)
        px((y * 9 + x) * 3 + c) = f(x, y).toByte
      px
    }
    def ppm(px: Array[Byte]): Array[Byte] =
      "P6\n9 8\n255\n".getBytes("US-ASCII") ++ px
    val gradient = ppm(plane((x, _) => x * 10))
    val flat = ppm(plane((_, _) => 77))
    val idxPath = s"${sys.props("java.io.tmpdir")}/graft_test_dhidx_maint"
    val ckpt = s"${sys.props("java.io.tmpdir")}/graft_test_dhidx_maint_ckpt"
    graft.cli.Cleanup.deleteOnExit(idxPath)
    graft.cli.Cleanup.deleteOnExit(ckpt)
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = StreamingOps.maintainDHashIndex(
        mem.toDF().toDF("doc_id", "payload"), "doc_id", "payload", idxPath)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, flat)) // batch 0
      q.processAllAvailable()
      mem.addData((10L, gradient)) // batch 1: new ingest
      q.processAllAvailable()
      // a re-encoded copy arriving after batch 1 hits the batch-1 ingest
      val got = Multimodal.dhashIncrementalPairs(spark, idxPath,
          Multimodal.imageDHash(Multimodal.decodePpm(
            Seq((20L, gradient)).toDF("doc_id", "payload"),
            "doc_id", "payload")),
          "doc_id", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((10L, 20L, 0L)),
        s"copy must hit the batch-1 ingest and not the flat image: $got")
    } finally q.stop()
    // retry idempotence
    val before = spark.read.parquet(s"$idxPath/hashes").count()
    assert(!Multimodal.dhashAppendBatch(idxPath,
      Multimodal.imageDHash(Multimodal.decodePpm(
        Seq((99L, flat)).toDF("doc_id", "payload"), "doc_id", "payload")),
      "doc_id", 1L))
    assert(spark.read.parquet(s"$idxPath/hashes").count() == before)
  }

  test("streaming dHash maintenance honors the bucket cap: over-cap buckets skip, probes stay bounded") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Multimodal
    def plane(f: (Int, Int) => Int): Array[Byte] = {
      val px = new Array[Byte](9 * 8 * 3)
      for (y <- 0 until 8; x <- 0 until 9; c <- 0 until 3)
        px((y * 9 + x) * 3 + c) = f(x, y).toByte
      px
    }
    def ppm(px: Array[Byte]): Array[Byte] =
      "P6\n9 8\n255\n".getBytes("US-ASCII") ++ px
    val flat = ppm(plane((_, _) => 77))
    val gradient = ppm(plane((x, _) => x * 10))
    val idxPath = s"${sys.props("java.io.tmpdir")}/graft_test_dhcap_maint"
    val ckpt = s"${sys.props("java.io.tmpdir")}/graft_test_dhcap_maint_ckpt"
    Seq(idxPath, ckpt).foreach { p =>
      val f = new java.io.File(p)
      if (f.exists) { org.apache.commons.io.FileUtils.deleteDirectory(f) }
      graft.cli.Cleanup.deleteOnExit(p)
    }
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = StreamingOps.maintainDHashIndex(
        mem.toDF().toDF("doc_id", "payload"), "doc_id", "payload", idxPath,
        maxBucket = 2)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, flat), (2L, flat)) // batch 0: bucket at the cap
      q.processAllAvailable()
      mem.addData((3L, flat), (10L, gradient)) // batch 1: flat crosses cap
      q.processAllAvailable()
    } finally q.stop()
    // the flat images' (identical) band buckets crossed the cap on the
    // straddle append — all four recorded skipped at total-seen 3
    val sk = Multimodal.dhashIndexSkipped(spark, idxPath).collect()
      .map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(sk.keySet == Set(0, 1, 2, 3) && sk.values.forall(_ == 3L),
      s"flat buckets must skip with total-seen 3: $sk")
    // a new flat image probes to NOTHING (bounded by construction)...
    val flatProbe = Multimodal.dhashIncrementalPairs(spark, idxPath,
      Multimodal.imageDHash(Multimodal.decodePpm(
        Seq((90L, flat)).toDF("doc_id", "payload"), "doc_id", "payload")),
      "doc_id", maxHamming = 3)
    assert(flatProbe.count() == 0, "over-cap bucket must not pair")
    // ...while the gradient ingest still pairs through its sub-cap bands
    val got = Multimodal.dhashIncrementalPairs(spark, idxPath,
        Multimodal.imageDHash(Multimodal.decodePpm(
          Seq((91L, gradient)).toDF("doc_id", "payload"), "doc_id", "payload")),
        "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 91L)), s"sub-cap ingest must still pair: $got")
    assert(Multimodal.dhashIndexVerify(spark, idxPath).count() == 0,
      "maintained capped index must verify consistent")
  }

  test("streaming spectral-index maintenance: a half-gain re-export hits the earlier ingest; retry no-ops") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Multimodal
    def pcm(f: Int => Int): Array[Byte] = {
      val b = new Array[Byte](160 * 2)
      for (k <- 0 until 160) {
        val v = f(k) & 0xffff
        b(2 * k) = (v & 0xff).toByte; b(2 * k + 1) = ((v >> 8) & 0xff).toByte
      }
      b
    }
    val p4 = Array(0, 1, 0, -1)
    def toneA(k: Int): Int = p4(k % 4) * (200 + 5 * k)
    def toneB(k: Int): Int = (if (k % 8 < 4) 1 else -1) * (900 - 3 * k)
    def wav(f: Int => Int): Array[Byte] = Multimodal.encodeWav(8000, 1, pcm(f))
    val idxPath = s"${sys.props("java.io.tmpdir")}/graft_test_spec_maint"
    val ckpt = s"${sys.props("java.io.tmpdir")}/graft_test_spec_maint_ckpt"
    Seq(idxPath, ckpt).foreach { p =>
      val f = new java.io.File(p)
      if (f.exists) org.apache.commons.io.FileUtils.deleteDirectory(f)
      graft.cli.Cleanup.deleteOnExit(p)
    }
    val mem = MemoryStream[(Long, Array[Byte])]
    // a NON-doc_id id column: the fingerprint stage renames to the
    // DHashRow shape, and the append must key on THAT, not the
    // caller's name (the regression this pin exists for)
    val q = StreamingOps.maintainSpectralIndex(
        mem.toDF().toDF("clip_id", "wav"), "clip_id", "wav", idxPath)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, wav(toneA))) // batch 0
      q.processAllAvailable()
      mem.addData((2L, wav(toneB))) // batch 1
      q.processAllAvailable()
    } finally q.stop()
    // the half-gain RE-EXPORT of clip 1 (the q144 level edit) probes to
    // its source through the gain-robust spectral fingerprints
    val got = Multimodal.dhashIncrementalPairs(spark, idxPath,
        Multimodal.audioSpectralFingerprint(Multimodal.decodeWav(
          Seq((90L, wav(k => toneA(k) / 2))).toDF("doc_id", "payload"),
          "doc_id", "payload")),
        "doc_id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 90L)),
      s"half-gain re-export must hit clip 1, not clip 2: $got")
    // retry idempotence: a replayed batch id appends nothing
    val before = spark.read.parquet(s"$idxPath/hashes").count()
    assert(!Multimodal.dhashAppendBatch(idxPath,
      Multimodal.audioSpectralFingerprint(Multimodal.decodeWav(
        Seq((99L, wav(toneB))).toDF("doc_id", "payload"),
        "doc_id", "payload")),
      "doc_id", 1L))
    assert(spark.read.parquet(s"$idxPath/hashes").count() == before)
  }

  test("streaming band-index maintenance: batch N collides with batch N-1 ingest") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Dedup
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten"
    val fresh = "brand new sentence with its very own words entirely"
    val idxPath = s"${sys.props("java.io.tmpdir")}/graft_test_bandidx_maint"
    val ckpt = s"${sys.props("java.io.tmpdir")}/graft_test_bandidx_maint_ckpt"
    graft.cli.Cleanup.deleteOnExit(idxPath)
    graft.cli.Cleanup.deleteOnExit(ckpt)
    def probePairs(doc: (Long, String)): Set[(Long, Long)] =
      Dedup.incrementalPairs(Dedup.bandIndexRead(spark, idxPath),
          Dedup.lshBands(Dedup.minHash(
            Dedup.shingles(Seq(doc).toDF("doc_id", "text"), "text", "doc_id", 1),
            "doc_id", 8), "doc_id", 8, 4), "doc_id", 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.maintainBandIndex(mem.toDF().toDF("doc_id", "text"),
        "text", "doc_id", idxPath, maxBucket = 100)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, base), (2L, other)) // batch 0 builds the index
      q.processAllAvailable()
      assert(Dedup.bandIndexRead(spark, idxPath)
        .select("doc_id").distinct().count() == 2)
      mem.addData((10L, fresh)) // batch 1 ingests a doc batch 0 never saw
      q.processAllAvailable()
      // a doc arriving AFTER batch 1 collides with the batch-1 ingest —
      // the index stayed current without any rebuild
      val got = probePairs(20L -> fresh)
      assert(got.contains((10L, 20L)),
        s"batch-2 doc must collide with the near-dup ingested in batch 1: $got")
      assert(!got.exists(_._1 == 2L), s"unrelated indexed doc must not pair: $got")
    } finally q.stop()
    // at-least-once retries: re-applying an already-applied batch id is a
    // no-op (no double-append), a new batch id applies
    val before = Dedup.bandIndexRead(spark, idxPath).count()
    assert(!StreamingOps.appendBatchToBandIndex(
      Seq(99L -> base).toDF("doc_id", "text"), 1L, "text", "doc_id",
      idxPath, maxBucket = 100))
    assert(Dedup.bandIndexRead(spark, idxPath).count() == before)
    assert(StreamingOps.appendBatchToBandIndex(
      Seq(99L -> (other + " tail")).toDF("doc_id", "text"), 7L, "text",
      "doc_id", idxPath, maxBucket = 100))
    assert(Dedup.bandIndexRead(spark, idxPath).count() > before)
    // the maintained index passes the crash-consistency verifier
    assert(Dedup.bandIndexVerify(spark, idxPath, maxBucket = 100).isEmpty)
    // a REBUILD invalidates the lastbatch marker: a maintenance restart
    // with a fresh checkpoint restarts batch ids at 0, and batch 0 must
    // APPLY (a stale marker would silently no-op every append — ingest
    // loss with no error)
    Dedup.bandIndexWrite(
      Dedup.lshBands(Dedup.minHash(
        Dedup.shingles(Seq(1L -> base).toDF("doc_id", "text"),
          "text", "doc_id", 1), "doc_id", 8), "doc_id", 8, 4),
      "doc_id", 4, idxPath, maxBucket = 100)
    assert(StreamingOps.appendBatchToBandIndex(
      Seq(50L -> fresh).toDF("doc_id", "text"), 0L, "text", "doc_id",
      idxPath, maxBucket = 100),
      "rebuild must clear the lastbatch marker so batch 0 applies")
  }

  test("streaming IVF maintenance: vector ingested in batch N-1 retrievable in batch N") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Similarity
    val vecs = (0 until 16).map { i =>
      val base = Array.fill(4)(0.1f)
      base(i % 4) = 1.0f + (i / 4) * 0.05f
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivf_stream_ckpt").toString
    graft.cli.Cleanup.deleteOnExit(tmp)
    graft.cli.Cleanup.deleteOnExit(ckpt)
    val idx = Similarity.ivfBuild(spark, vecs, "vec_id", "embedding", 4, tmp,
      centroids = Some(Similarity.seedCentroids(vecs, "vec_id", "embedding", 4)))
    val qv = vecs.where(org.apache.spark.sql.functions.col("vec_id") === 6)
      .select(org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.maintainIvfIndex(
        mem.toDF().toDF("vec_id", "embedding"), idx)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((100L, qv.map(_.toFloat))) // batch 0: an exact dup of q6
      q.processAllAvailable()
      // the ingested vector routes through the STORED quantizer into the
      // query's cell and is immediately retrievable — no rebuild
      val hits = Similarity.ivfSearchIndexed(idx, qv, nprobe = 1, topK = 8)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(hits.contains((100L, 1.0)),
        s"vector ingested in batch 0 must be retrievable: ${hits.toSeq}")
      // at-least-once retry: re-applying the applied batch id is a no-op
      val before = idx.corpus.count()
      assert(!Similarity.ivfAppendBatch(idx,
        Seq((999L, qv.map(_.toFloat))).toDF("vec_id", "embedding"), 0L))
      assert(idx.corpus.count() == before, "retried batch must append nothing")
    } finally q.stop()
  }

  test("streaming BQ code maintenance: ingested codes land in the right cell and are searchable; retry no-ops") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val vecs = (0 until 16).map { i =>
      val base = Array.fill(4)(0.1f)
      base(i % 4) = 1.0f + (i / 4) * 0.05f
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val flTmp = java.nio.file.Files.createTempDirectory("graft_bqivf_fl").toString
    val tmp = java.nio.file.Files.createTempDirectory("graft_bqivf_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bqivf_ckpt").toString
    Seq(flTmp, tmp, ckpt).foreach(graft.cli.Cleanup.deleteOnExit)
    val fl = Similarity.ivfBuild(spark, vecs, "vec_id", "embedding", 4, flTmp,
      centroids = Some(Similarity.seedCentroids(vecs, "vec_id", "embedding", 4)))
    val idx = Similarity.bqIvfBuild(fl, tmp)
    assert(idx.codes.count() == 16)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.maintainBqIvfIndex(
        mem.toDF().toDF("vec_id", "embedding"), idx)
      .option("checkpointLocation", ckpt).start()
    try {
      // batch 0: a new vector aligned with vec 6's direction
      val qv = vecs.where(col("vec_id") === 6)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray
      mem.addData((100L, qv.map(_.toFloat)))
      q.processAllAvailable()
      // its CODE routed through the stored quantizer into vec 6's cell...
      val cellOf = idx.codes.select("vec_id", "cell")
        .collect().map(r => r.getLong(0) -> r.get(1).toString).toMap
      assert(cellOf.size == 17 && cellOf(100L) == cellOf(6L),
        s"ingested code must land in the query's cell: $cellOf")
      // ...with the same packed word as the identical vector's
      val codeOf = idx.codes.select("vec_id", "bq_code")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(codeOf(100L) == codeOf(6L))
      // ...and is immediately retrievable through the pruned search
      val queries = vecs.where(col("vec_id") === 6)
      val hits = Similarity.bqIvfSearchBatch(
          idx, vecs.unionByName(Seq((100L, qv.map(_.toFloat)))
            .toDF("vec_id", "embedding")),
          queries, nprobe = 1, shortlist = 8, k = 8)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(hits.contains((100L, 0L)),
        s"ingested code must be retrievable at hamming 0: ${hits.toSeq}")
      // at-least-once retry: re-applying the applied batch id is a no-op
      val before = idx.codes.count()
      assert(!Similarity.bqIvfAppendBatch(idx,
        Seq((999L, qv.map(_.toFloat))).toDF("vec_id", "embedding"), 0L))
      assert(idx.codes.count() == before, "retried batch must append nothing")
    } finally q.stop()
  }

  test("streaming semantic dedup: batch-N dup of a batch-N-1 ingest is flagged; survivors append; retry no-ops") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val cents = Seq(0L -> Seq(1.0, 0.0, 0.0, 0.0), 1L -> Seq(0.0, 1.0, 0.0, 0.0))
    val corpus = Seq((10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_semdd_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_semdd_ckpt").toString
    graft.cli.Cleanup.deleteOnExit(tmp); graft.cli.Cleanup.deleteOnExit(ckpt)
    val idx = Similarity.ivfBuild(spark, corpus, "vec_id", "embedding", 2, tmp,
      centroids = Some(cents.toDF("cell", "ce")))
    val verdicts = scala.collection.mutable.ArrayBuffer[(Long, Boolean)]()
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.maintainSemDedupIndex(
        mem.toDF().toDF("vec_id", "embedding"), idx,
        Similarity.collectCentroids(cents.toDF("cell", "ce")), tau = 0.99,
        onBatch = v => verdicts ++= v.collect()
          .map(r => (r.getLong(0), r.getBoolean(4))))
      .option("checkpointLocation", ckpt).start()
    try {
      // batch 0: a novel vector in cell 1 -> survives, appends
      mem.addData((20L, Array(0.5f, 1.0f, 0.0f, 0.0f)))
      q.processAllAvailable()
      // batch 1: a near-dup of the BATCH-0 ingest (not of the original
      // corpus) plus a novel vector
      mem.addData((21L, Array(0.5f, 1.001f, 0.0f, 0.0f)),
        (22L, Array(-1.0f, 0.2f, 0.0f, 0.0f)))
      q.processAllAvailable()
      assert(verdicts.toSet == Set((20L, true), (21L, false), (22L, true)),
        s"verdicts: $verdicts")
      val ids = idx.corpus.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(10L, 11L, 20L, 22L),
        s"only survivors may append: $ids")
      // at-least-once retry of an applied batch id appends nothing
      val before = idx.corpus.count()
      assert(!Similarity.ivfAppendBatch(idx,
        Seq((99L, Array(0.5f, 0.5f, 0.0f, 0.0f))).toDF("vec_id", "embedding"), 1L))
      assert(idx.corpus.count() == before)
    } finally q.stop()
  }

  test("streaming IVF-PQ maintenance: ingested vector routes through both stored quantizers") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Similarity
    val rnd = new scala.util.Random(53)
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextDouble() * 10 - 5))
    val vecs = (0L until 32L).map { i =>
      (i, centers((i % 4).toInt).map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivfpq_sck").toString
    graft.cli.Cleanup.deleteOnExit(tmp)
    graft.cli.Cleanup.deleteOnExit(ckpt)
    val cb = Similarity.pqCollect(
      Similarity.pqTrain(vecs, "vec_id", "embedding",
        m = 2, dsub = 4, ksub = 4, iters = 1), m = 2, dsub = 4, ksub = 4)
    val idx = Similarity.ivfPqBuild(spark, vecs, "vec_id", "embedding",
      k = 4, cb = cb, path = tmp)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.maintainIvfPqIndex(
        mem.toDF().toDF("vec_id", "embedding"), idx, cb, "embedding")
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((200L, centers(2).map(x => (x + 0.02).toFloat)))
      q.processAllAvailable()
      val hits = Similarity.ivfPqSearch(idx, cb, centers(2), nprobe = 1,
        topK = 8).collect().map(_.getLong(0)).toSet
      assert(hits.contains(200L),
        s"vector ingested in batch 0 must be retrievable: $hits")
      // at-least-once retry: the applied batch id appends nothing
      val before = idx.corpus.count()
      assert(!Similarity.ivfPqAppendBatch(idx, cb,
        Seq((999L, centers(0).map(_.toFloat))).toDF("vec_id", "embedding"),
        "embedding", 0L))
      assert(idx.corpus.count() == before, "retried batch must append nothing")
    } finally q.stop()
  }

  test("span-level contamination audit runs per micro-batch against a static eval set") {
    // the eval windows are a STATIC broadcast artifact; each arriving
    // micro-batch is audited span-by-span inside foreachBatch — the
    // ingest-time eval-leak gate (q105's streaming twin)
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Dedup
    import org.apache.spark.sql.DataFrame
    val evalSet = Seq((1000L, "a b c d e")).toDF("doc_id", "text").cache()
    val incoming = Seq((1L, "x a b c d e y z"), (2L, "p q r s t u v w"))
    val batchRep = Dedup.contaminationSpanReport(
        incoming.toDF("doc_id", "text"), evalSet, "text", "doc_id", 4)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.concurrent.TrieMap[Long, Seq[Any]]()
    val fn: (DataFrame, Long) => Unit = (b, _) => {
      Dedup.contaminationSpanReport(b.toDF("doc_id", "text"), evalSet,
          "text", "doc_id", 4)
        .collect().foreach(r => got(r.getLong(0)) = r.toSeq.drop(1))
      ()
    }
    val q = mem.toDF().writeStream.foreachBatch(fn).start()
    try {
      mem.addData(incoming.head)
      q.processAllAvailable()
      mem.addData(incoming(1))
      q.processAllAvailable()
      assert(got.toMap == batchRep, s"stream ${got.toMap} vs batch $batchRep")
      assert(got(1L).head == 8L) // contaminated doc audited on arrival
    } finally { q.stop(); evalSet.unpersist() }
  }

  test("multimodal decode + plane stats run unchanged on a stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Multimodal
    // the decode seam is a stateless mapPartitions, so the SAME operators
    // run per micro-batch with no streaming-specific code — the property
    // that lets a continuous ingest pipeline decode/featurize in place
    val plane = Array.tabulate(2 * 2 * 3)(i => (i * 3 + 1).toByte)
    val mem = MemoryStream[(Long, Array[Byte])]
    val decoded = Multimodal.planeStats(Multimodal.decodeBmp(
      mem.toDF().toDF("doc_id", "payload"), "doc_id"))
    val q = decoded.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("bmp_stream_out").start()
    try {
      mem.addData(1L -> Multimodal.encodeBmp(2, 2, plane),
        2L -> "not a bmp".getBytes("US-ASCII"))
      q.processAllAvailable()
      mem.addData(3L -> Multimodal.encodeBmp(2, 2, plane))
      q.processAllAvailable()
      val got = spark.table("bmp_stream_out").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // garbage dropped; both batches decode to identical channel means
      assert(got.keySet == Set(1L, 3L), got.toString)
      assert(got(1L) == got(3L) && got(1L) == (1 + 10 + 19 + 28) / 4.0)
    } finally q.stop()
  }

  test("audio decode + features run unchanged on a stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Multimodal
    // same property as the image stream test: decodeWav/wavFeatures are
    // stateless mapPartitions, so continuous audio ingest featurizes with
    // the exact batch operators
    val pcm = Array[Byte](0xE8.toByte, 0x03, 0x18, 0xFC.toByte) // 1000, -1000
    val mem = MemoryStream[(Long, Array[Byte])]
    val feats = Multimodal.wavFeatures(Multimodal.decodeWav(
      mem.toDF().toDF("doc_id", "payload"), "doc_id"))
    val q = feats.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wav_stream_out").start()
    try {
      mem.addData(1L -> Multimodal.encodeWav(8000, 1, pcm),
        2L -> "not audio".getBytes("US-ASCII"))
      q.processAllAvailable()
      mem.addData(3L -> Multimodal.encodeWav(16000, 1, pcm))
      q.processAllAvailable()
      val got = spark.table("wav_stream_out").collect()
        .map(r => r.getLong(0) -> (r.getDouble(2), r.getLong(3))).toMap
      assert(got.keySet == Set(1L, 3L), got.toString)
      // identical PCM across batches -> identical features; one crossing
      assert(got(1L) == got(3L) && got(1L) == ((1000.0, 1L)))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps per-key running stats across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Evt]
    val q = StreamingOps.runningStats(mem.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("stats_out").start()
    try {
      mem.addData(Evt(ts(0, 1), 1, "a", 2.0), Evt(ts(0, 2), 1, "a", 9.0))
      q.processAllAvailable()
      mem.addData(Evt(ts(0, 3), 1, "a", 4.0), Evt(ts(0, 4), 2, "b", 1.0))
      q.processAllAvailable()
      val byUser = spark.table("stats_out").as[KeyStats].collect()
        .groupBy(_.user_id).map { case (u, xs) => u -> xs.maxBy(_.n) }
      assert(byUser(1L) == KeyStats(1L, 3, 15.0, 9.0))
      assert(byUser(2L) == KeyStats(2L, 1, 1.0, 1.0))
    } finally q.stop()
  }

  test("streaming decontamination: static eval set, flag once, clean docs pass") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    // static eval set (the held-out suite), hashed distinct 3-grams
    val evalDocs = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val evalSh = Dedup.hashShingles(
        Dedup.shingles(evalDocs, "text", "doc_id", 3, dedup = false), "doc_id")
      .select("sh_h").distinct()

    val mem = MemoryStream[(Long, String)]
    val flagged = StreamingOps.decontaminateStream(
      mem.toDF().toDF("doc_id", "text"), evalSh, "text", "doc_id")
    assert(flagged.isStreaming)
    val q = flagged.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("decon_out").start()
    try {
      // batch 1: doc 1 shares "quick brown fox", doc 2 is clean
      mem.addData((1L, "saw the quick brown fox today"), (2L, "nothing shared here at all"))
      q.processAllAvailable()
      assert(spark.table("decon_out").collect().map(_.getLong(0)).toSet == Set(1L))
      // batch 2: doc 1 re-ingested (no re-emit), doc 3 contaminated
      mem.addData((1L, "saw the quick brown fox today"), (3L, "brown fox jumps often"))
      q.processAllAvailable()
      assert(spark.table("decon_out").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    } finally q.stop()
  }

  test("streaming quantile gate: static t-digest thresholds, stream ≡ batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.TextOps
    import org.apache.spark.sql.functions.col
    // the already-ingested corpus fixes the per-stratum thresholds — the
    // approx (t-digest) path, i.e. what a production refresh job computes
    val corpus = Seq(
      (1L, "en", 10.0), (2L, "en", 20.0), (3L, "en", 30.0), (4L, "en", 40.0),
      (5L, "de", 100.0), (6L, "de", 200.0), (7L, "de", 300.0), (8L, "de", 400.0)
    ).toDF("doc_id", "lang", "score")
    val thresholds = TextOps.quantileThresholds(
      corpus, "lang", col("score"), q = 0.25, exact = false)
    // doc 15 arrives in a stratum the threshold frame has never seen —
    // the gate must RETAIN it (kept = 0, thresh null), not drop it
    val incoming = Seq((11L, "en", 1.0), (12L, "en", 35.0),
      (13L, "de", 5.0), (14L, "de", 350.0), (15L, "fr", 9.0))
    val batchOut = TextOps.applyThresholds(
        incoming.toDF("doc_id", "lang", "score"),
        thresholds, "doc_id", "lang", col("score"))
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, String, Double)]
    val gated = StreamingOps.quantileGate(
      mem.toDF().toDF("doc_id", "lang", "score"),
      thresholds, "doc_id", "lang", col("score"))
    assert(gated.isStreaming)
    val q = gated.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("qgate_out").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val got = spark.table("qgate_out").collect().map(_.toSeq).toSet
      assert(got == batchOut) // stream ≡ batch, row for row
      // gate semantics: below-minimum rows flagged 0, top rows kept,
      // novel-stratum row retained conservatively (not silently dropped)
      val kept = got.map(r => r.head -> r.last).toMap
      assert(kept(11L) == 0 && kept(13L) == 0)
      assert(kept(12L) == 1 && kept(14L) == 1)
      assert(kept.contains(15L) && kept(15L) == 0, s"novel stratum: $kept")
    } finally q.stop()
  }

  test("frozen unigram LM scores a stream identically to batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.TextOps
    import org.apache.spark.sql.DataFrame
    // the model is a STATIC artifact (trained once); micro-batches score
    // against it inside foreachBatch — the ingest-gate shape
    val corpus = Seq((1L, "a a b"), (2L, "b c d")).toDF("doc_id", "text")
    val model = TextOps.unigramModel(corpus, "text").cache()
    val incoming = Seq((10L, "a b zzz"), (11L, "c c"))
    val batchScores = TextOps.unigramXentAgainst(
        incoming.toDF("doc_id", "text"), model, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(batchScores.contains(10L), "OOV doc must still score")

    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.concurrent.TrieMap[Long, (Long, Double)]()
    val fn: (DataFrame, Long) => Unit = (b, _) => {
      TextOps.unigramXentAgainst(b.toDF("doc_id", "text"), model,
          "text", "doc_id")
        .collect().foreach(r => got(r.getLong(0)) = (r.getLong(1), r.getDouble(2)))
      ()
    }
    val q = mem.toDF().writeStream.foreachBatch(fn).start()
    try {
      mem.addData(incoming.head)
      q.processAllAvailable()
      mem.addData(incoming(1))
      q.processAllAvailable()
      assert(got.toMap == batchScores, s"stream ${got.toMap} vs batch $batchScores")
    } finally { q.stop(); model.unpersist() }
  }

  test("drift monitor: per-batch KL against a frozen model, stream ≡ batch, appended with batch ids") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.TextOps
    // last known-good corpus trains the static reference model
    val corpus = Seq((1L, "a a b"), (2L, "b c d")).toDF("doc_id", "text")
    val model = TextOps.unigramModel(corpus, "text").cache()
    // batch 0 looks like the corpus; batch 1 is a drifted snapshot
    val b0 = Seq(("srcA", "a b c"), ("srcA", "a d"))
    val b1 = Seq(("srcB", "zzz zzz zzz qqq"))
    val expect0 = TextOps.unigramDriftAgainst(
        b0.toDF("source", "text"), model, "text", "source")
      .collect().map(r => (r.getString(0),
        r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val expect1 = TextOps.unigramDriftAgainst(
        b1.toDF("source", "text"), model, "text", "source")
      .collect().map(r => (r.getString(0),
        r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val path = java.nio.file.Files.createTempDirectory("graft_drift").toString
    graft.cli.Cleanup.deleteOnExit(path)
    val mem = MemoryStream[(String, String)]
    val q = graft.streaming.StreamingOps.driftMonitor(
        mem.toDF().toDF("source", "text"), model, "text", "source",
        s"$path/out")
      .option("checkpointLocation", s"$path/ckpt").start()
    try {
      mem.addData(b0: _*)
      q.processAllAvailable()
      mem.addData(b1: _*)
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$path/out")
        .collect().map(r => r.getLong(r.fieldIndex("batch_id")) ->
          ((r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))))
      val byBatch = rows.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).toSet }
      assert(byBatch(0L) == expect0, s"batch 0: ${byBatch(0L)} vs $expect0")
      assert(byBatch(1L) == expect1, s"batch 1: ${byBatch(1L)} vs $expect1")
      // the drifted snapshot reads as the outlier the monitor exists for
      val kl0 = expect0.head._4
      val kl1 = expect1.head._4
      assert(kl1 > kl0, s"drifted batch must out-diverge: $kl1 vs $kl0")
    } finally { q.stop(); model.unpersist() }
  }

  test("PSI monitor: per-batch numeric drift against frozen reference edges, stream ≡ batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.TextOps
    val ref = Seq(1L, 2L, 3L, 4L).map(v => ("r", v)).toDF("src", "v").cache()
    val b0 = Seq(("A", 1L), ("A", 4L))          // mirrors the reference
    val b1 = Seq(("B", 100L), ("B", 200L))      // everything in the top bin
    def batchPsi(rows: Seq[(String, Long)]) =
      TextOps.psiDrift(rows.toDF("src", "v"), ref, "v", "src", bins = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val path = java.nio.file.Files.createTempDirectory("graft_psi").toString
    graft.cli.Cleanup.deleteOnExit(path)
    val mem = MemoryStream[(String, Long)]
    val q = graft.streaming.StreamingOps.psiMonitor(
        mem.toDF().toDF("src", "v"), ref, "v", "src", s"$path/out", bins = 2)
      .option("checkpointLocation", s"$path/ckpt").start()
    try {
      mem.addData(b0: _*)
      q.processAllAvailable()
      mem.addData(b1: _*)
      q.processAllAvailable()
      val got = spark.read.parquet(s"$path/out").collect()
        .map(r => r.getLong(r.fieldIndex("batch_id")) ->
          ((r.getString(0), r.getLong(1), r.getDouble(2))))
      val byBatch = got.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).toSet }
      assert(byBatch(0L) == batchPsi(b0), s"${byBatch(0L)} vs ${batchPsi(b0)}")
      assert(byBatch(1L) == batchPsi(b1), s"${byBatch(1L)} vs ${batchPsi(b1)}")
      val psi1 = byBatch(1L).head._3
      assert(psi1 > 0.2, s"shifted batch must clear the 0.2 bar: $psi1")
    } finally { q.stop(); ref.unpersist() }
  }

  test("surgical strip at ingest: eval-overlapping spans excised per micro-batch, stream ≡ batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Dedup
    // static eval set; w = 2 so "leak one leak two" is contaminated
    val evalDf = Seq((100L, "leak one leak two")).toDF("doc_id", "text")
    val b0 = Seq((1L, "clean doc here"), (2L, "prefix leak one leak two suffix"))
    val b1 = Seq((3L, "leak one leak two"))    // entirely contaminated
    def batchStrip(rows: Seq[(Long, String)]) =
      Dedup.stripContaminatedSpans(rows.toDF("doc_id", "text"), evalDf,
          "text", "doc_id", w = 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val path = java.nio.file.Files.createTempDirectory("graft_strip").toString
    graft.cli.Cleanup.deleteOnExit(path)
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.stripContaminatedStream(
        mem.toDF().toDF("doc_id", "text"), evalDf, "text", "doc_id",
        w = 2, s"$path/out")
      .option("checkpointLocation", s"$path/ckpt").start()
    try {
      mem.addData(b0: _*)
      q.processAllAvailable()
      mem.addData(b1: _*)
      q.processAllAvailable()
      val got = spark.read.parquet(s"$path/out").collect()
        .map(r => r.getLong(r.fieldIndex("doc_id")) ->
          ((r.getLong(r.fieldIndex("batch_id")),
            r.getString(r.fieldIndex("text"))))).toMap
      val exp0 = batchStrip(b0)
      val exp1 = batchStrip(b1)
      assert(got(1L) == ((0L, exp0(1L))) && got(2L) == ((0L, exp0(2L))),
        s"$got vs $exp0")
      assert(got(3L) == ((1L, exp1(3L))), s"$got vs $exp1")
      assert(got(1L)._2 == "clean doc here", "clean doc must survive verbatim")
      assert(got(2L)._2 == "prefix suffix", s"surgical excision: ${got(2L)}")
      assert(got(3L)._2 == "", "fully contaminated doc strips to empty")
    } finally q.stop()
  }

  test("stateless curation ops (redact, split) apply unchanged to a stream") {
    // the map-only curation operators are column arithmetic, so the SAME
    // operator call works on readStream frames — incremental ingest
    // curation needs no second implementation
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.TextOps
    def curate(df: org.apache.spark.sql.DataFrame) =
      TextOps.withHashSplit(TextOps.redactPii(df, "text", "doc_id"), "doc_id")
    val rows = Seq((1L, "mail a@b.io now"), (2L, "nothing here"))
    val mem = MemoryStream[(Long, String)]
    val red = curate(mem.toDF().toDF("doc_id", "text"))
    assert(red.isStreaming)
    val q = red.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("curate_out").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("curate_out").collect().map(_.toSeq).toSet
      val batch = curate(rows.toDF("doc_id", "text")).collect().map(_.toSeq).toSet
      assert(got == batch) // stream ≡ batch, row for row
      assert(got.exists(_.contains("mail <EMAIL> now")))
    } finally q.stop()
  }

  test("Gopher quality gate and PQ encode apply unchanged to a stream") {
    // both are pure projections (gopherFlags column arithmetic; pqEncode a
    // native expression over plan-literal codebooks), so the ingest gate
    // and the index-encode stage run on readStream frames as-is
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.{Similarity, TextOps}
    val good = ("the quick brown fox jumps over with lazy dogs today " * 6).trim
    val docs = Seq((1L, good), (2L, "too short"))
    val mem = MemoryStream[(Long, String)]
    val gated = TextOps.gopherFlags(mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id")
    assert(gated.isStreaming)
    val q = gated.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gopher_out").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("gopher_out").collect().map(_.toSeq).toSet
      val batch = TextOps.gopherFlags(docs.toDF("doc_id", "text"),
        "text", "doc_id").collect().map(_.toSeq).toSet
      assert(got == batch, s"stream $got vs batch $batch")
    } finally q.stop()

    val vecs = Seq((1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(-1.0f)))
    val cb = Similarity.pqCollect(
      Similarity.pqTrain(vecs.toDF("vec_id", "embedding"), "vec_id",
        "embedding", m = 2, dsub = 4, ksub = 2, iters = 0),
      m = 2, dsub = 4, ksub = 2)
    val vmem = MemoryStream[(Long, Array[Float])]
    val enc = Similarity.pqEncode(vmem.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", cb)
    assert(enc.isStreaming)
    val q2 = enc.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("pq_out").start()
    try {
      vmem.addData(vecs: _*)
      q2.processAllAvailable()
      val got = spark.table("pq_out").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val batch = Similarity.pqEncode(vecs.toDF("vec_id", "embedding"),
          "vec_id", "embedding", cb)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(got == batch, s"stream $got vs batch $batch")
    } finally q2.stop()
  }

  test("frozen logistic quality gate scores a stream identically to batch") {
    // hashedLogisticScore is one map-only projection over plan-literal
    // weights — the model-based ingest gate runs on readStream frames
    // unchanged, no retrofit
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.TextOps
    val wts = Seq(311, -977, 65, -430, 812, -25, 540, -688)
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "delta epsilon"),
      (3L, "zeta"))
    val mem = MemoryStream[(Long, String)]
    val gated = TextOps.hashedLogisticScore(mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id", wts, biasMilli = 50L)
    assert(gated.isStreaming)
    val q = gated.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("logistic_out").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("logistic_out").collect().map(_.toSeq).toSet
      val batch = TextOps.hashedLogisticScore(docs.toDF("doc_id", "text"),
          "text", "doc_id", wts, biasMilli = 50L)
        .collect().map(_.toSeq).toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
