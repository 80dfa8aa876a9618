package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Library-level tests for the training-data pipeline operators: the parts
  * the oracle queries can't cover — LSH actually *finding* injected
  * near-dups, the mapPartitions multimodal path, ANN probing.
  */
class OperatorSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
  // docs 1/2 near-identical, 3 identical to 1, 4 unrelated
  lazy val docs = Seq(
    (1L, base),
    (2L, base.replace("beta", "betax")),
    (3L, base),
    (4L, "one two three four five six seven eight nine ten")
  ).toDF("doc_id", "text")

  test("RTBF band index: forget hides a doc from probes, purge is physical, verify stays green") {
    import graft.operators.{Dedup, Rtbf}
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_rtbf_band"
    graft.cli.Cleanup.deleteOnExit(path)
    new java.io.File(path).delete()
    val old = docs.where(col("doc_id") <= 3) // 1, 2, 3 (1 ≈ 2, 1 == 3)
    def sig(df: org.apache.spark.sql.DataFrame) = {
      val s0 = df.where(col("text").isNotNull).select(col("doc_id"),
        graft.functions.MinHashSig.minhash_sig(col("text"), 8).as("__sig"))
      Dedup.lshBands(s0.select(col("doc_id") +:
        (0 until 8).map(i => element_at(col("__sig"), i + 1).as(s"m$i")): _*),
        "doc_id", 8, 4)
    }
    Dedup.bandIndexWrite(sig(old), "doc_id", 4, path, maxBucket = 10)
    val batch = sig(docs.where(col("doc_id") === 4)
      .select(lit(9L).as("doc_id"), lit(base).as("text")))
    def probe() = Dedup.incrementalPairs(Dedup.bandIndexRead(spark, path),
      batch, "doc_id", 4).collect().map(_.getLong(0)).toSet
    assert(probe() == Set(1L, 2L, 3L), "pre-forget: all three collide")
    Dedup.bandIndexForget(spark, path, Seq(1L).toDF("doc_id"), "doc_id")
    assert(probe() == Set(2L, 3L), "tombstoned doc must vanish from probes")
    // forget is idempotent; physical rows remain until purge
    Dedup.bandIndexForget(spark, path, Seq(1L).toDF("doc_id"), "doc_id")
    assert(spark.read.parquet(s"$path/bands")
      .where(col("doc_id") === 1L).count() > 0)
    Dedup.bandIndexPurge(spark, path)
    assert(spark.read.parquet(s"$path/bands")
      .where(col("doc_id") === 1L).count() == 0, "purge must be physical")
    assert(!Rtbf.hasTombstones(spark, path), "purge clears the tombstones")
    assert(probe() == Set(2L, 3L), "purged probe equals tombstoned probe")
    assert(Dedup.bandIndexVerify(spark, path, maxBucket = 10).isEmpty,
      "sizes sidecar must be refreshed to the post-purge counts")
    // delete-then-append round trip: a fresh doc appends normally after
    // the purge and becomes probe-visible; the forgotten id stays gone
    Dedup.bandIndexWrite(sig(Seq((7L, base)).toDF("doc_id", "text")),
      "doc_id", 4, path, maxBucket = 10, append = true)
    assert(probe() == Set(2L, 3L, 7L))
  }

  test("RTBF URL-key index: a forgotten doc is neither keeper nor copy; purge is physical") {
    import graft.operators.{Dedup, Rtbf}
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_rtbf_url"
    graft.cli.Cleanup.deleteOnExit(path)
    // docs 1 and 2 are canonical twins; doc 3 is unique
    val batch = Seq(
      (1L, "http://x.example/p/1?a=1&b=2"),
      (2L, "HTTP://X.EXAMPLE:80/p/1?b=2&a=1#f"),
      (3L, "http://x.example/p/3")).toDF("doc_id", "url")
    assert(Dedup.urlIndexAppendBatch(path, batch, "url", "doc_id", 0L))
    def dups() = Dedup.urlIndexDuplicates(spark, path).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(dups() == Map(1L -> 2L, 3L -> 1L))
    // forgetting the KEEPER promotes the twin; the forgotten id vanishes
    Dedup.urlIndexForget(spark, path, Seq(1L).toDF("doc_id"), "doc_id")
    assert(dups() == Map(2L -> 1L, 3L -> 1L))
    assert(spark.read.parquet(s"$path/keys")
      .where(col("doc_id") === 1L).count() == 1, "physical until purge")
    Dedup.urlIndexPurge(spark, path)
    assert(!Rtbf.hasTombstones(spark, path))
    assert(spark.read.parquet(s"$path/keys")
      .where(col("doc_id") === 1L).count() == 0, "purge must be physical")
    assert(dups() == Map(2L -> 1L, 3L -> 1L))
    // the replay guard survives the purge: later appends still apply
    assert(!Dedup.urlIndexAppendBatch(path,
      Seq((9L, "http://x.example/p/9")).toDF("doc_id", "url"),
      "url", "doc_id", 0L))
    assert(Dedup.urlIndexAppendBatch(path,
      Seq((9L, "http://x.example/p/9")).toDF("doc_id", "url"),
      "url", "doc_id", 1L))
    assert(dups() == Map(2L -> 1L, 3L -> 1L, 9L -> 1L))
  }

  test("portableHash matches the md5-derived constant") {
    val got = Seq("hello").toDF("w")
      .select(TextOps.portableHash(col("w"), 42)).head().getLong(0)
    assert(got == 88733634095193746L) // int(md5('42:hello')[:15], 16)
  }

  test("minhash+LSH candidate pairs find the injected near/exact dups") {
    val sh = Dedup.shingles(docs, "text", "doc_id", 1)
    val sig = Dedup.minHash(sh, "doc_id", 8)
    val banded = Dedup.lshBands(sig, "doc_id", 8, 4)
    val pairs = Dedup.lshCandidatePairs(banded, "doc_id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)), s"exact dup must collide in every band: $pairs")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 3L)),
      s"near dup should collide in some band: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated doc must not be a candidate: $pairs")
    // jaccard verification of candidates
    val j = Dedup.jaccardPairs(sh, Dedup.lshCandidatePairs(banded, "doc_id", 4),
        "doc_id").collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 3L)) == 1.0)
    j.get((1L, 2L)).foreach(v => assert(v > 0.8 && v < 1.0))
  }

  test("jaccardPairs (hashed joins) equals an exact token-set replay on random docs") {
    // the hash-keyed intersection joins must be value-identical to plain
    // set arithmetic on the token text (collisions are ~2^-60; any real
    // divergence is a bug in the hashing/join rewrite)
    val vocab = Array("red", "blue", "green", "gold", "gray", "teal",
      "pink", "onyx", "rust", "sage")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val docsR = (1L to 30L).map { i =>
        i -> (0 until 3 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.length)))
      }
      val df = docsR.map { case (i, ws) => (i, ws.mkString(" ")) }.toDF("doc_id", "text")
      val pairRows = (0 until 20).map { _ =>
        (1L + rnd.nextInt(30), 1L + rnd.nextInt(30))
      }.filter(p => p._1 < p._2).distinct
      val pairsDf = pairRows.toDF("a", "b")
      val sh = Dedup.shingles(df, "text", "doc_id", 1)
      val got = Dedup.jaccardPairs(sh, pairsDf, "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val sets = docsR.map { case (i, ws) => i -> ws.toSet }.toMap
      pairRows.foreach { case (a, b) =>
        val want = BigDecimal(
          sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got((a, b)) - want) < 1e-9, s"seed $seed pair ($a,$b)")
      }
    }
  }

  test("lshStarEdges are connectivity-equivalent to clique pairs, but linear") {
    // a bucket-heavy fixture: three clusters of identical docs (mega-bucket
    // shape) plus a singleton
    val many = ((1L to 9L).map(i => (i, base)) ++
      (10L to 14L).map(i => (i, base.replace("alpha", "zeta"))) ++
      Seq((15L, "one two three four five six seven eight nine ten")))
      .toDF("doc_id", "text")
    val sig = Dedup.minHash(Dedup.shingles(many, "text", "doc_id", 1), "doc_id", 8)
    val banded = Dedup.lshBands(sig, "doc_id", 8, 4)
    val clique = Dedup.lshCandidatePairs(banded, "doc_id", 4)
    val star = Dedup.lshStarEdges(banded, "doc_id", 4)
    // linear vs quadratic: a 9-doc bucket is 8 star edges vs 36 clique pairs
    assert(star.count() < clique.count())
    assert(star.count() <= 14 * 4) // <= (nodes-1) x bands
    def comps(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.connectedComponentsStats(many.select("doc_id"), pairs, "doc_id") match {
        case r =>
          val m = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
          graft.engine.Checkpoints.release(r.labels); m
      }
    assert(comps(star) == comps(clique))
  }

  test("capped candidate pairs exclude mega-buckets and report them") {
    val many = ((1L to 9L).map(i => (i, base)) ++
      (10L to 14L).map(i => (i, "the quick brown fox jumps over the lazy dog")) ++
      Seq((15L, "one two three four five six seven eight nine ten")))
      .toDF("doc_id", "text")
    val sig = Dedup.minHash(Dedup.shingles(many, "text", "doc_id", 1), "doc_id", 8)
    val banded = Dedup.lshBands(sig, "doc_id", 8, 4)
    val full = Dedup.lshCandidatePairs(banded, "doc_id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (capped, skipped) = Dedup.lshCandidatePairsCapped(banded, "doc_id", 4, maxBucket = 5)
    val cp = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sk = skipped.collect()
    // the 9-doc cluster collides in every band -> its buckets exceed the
    // cap and are reported; the 5-doc cluster's pairs survive
    assert(sk.nonEmpty && sk.forall(_.getLong(2) > 5))
    assert(cp.subsetOf(full))
    assert(cp.contains((10L, 11L)), s"under-cap bucket pairs must survive: $cp")
    assert(!cp.exists(p => p._1 <= 9L && p._2 <= 9L),
      s"mega-bucket cliques must be excluded: $cp")
  }

  test("simhash: identical docs equal, near-dups close in Hamming distance") {
    val sh = Dedup.shingles(docs, "text", "doc_id", 1)
    val hs = Dedup.simHash(sh, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(3L))
    val near = java.lang.Long.bitCount(hs(1L) ^ hs(2L))
    val far = java.lang.Long.bitCount(hs(1L) ^ hs(4L))
    assert(near < far, s"near=$near far=$far")
  }

  test("3-gram shingles slide correctly") {
    val sh = Dedup.shingles(Seq((1L, "a b c d")).toDF("doc_id", "text"),
      "text", "doc_id", 3).collect().map(_.getString(1)).toSet
    assert(sh == Set("a b c", "b c d"))
  }

  test("multimodal mapPartitions decode stays in lockstep with declarative stub") {
    val withBin = Multimodal.withBinaryPayload(docs, "text")
    val viaPartitions = Multimodal.decodeMeta(spark, withBin, "doc_id")
      .orderBy("doc_id").collect().toSeq
    val declarative = Multimodal.stubMetaColumns(withBin, "doc_id", "payload")
      .orderBy("doc_id").collect().toSeq
    assert(viaPartitions == declarative)
  }

  test("brute-force ANN: query vector itself ranks first with cos 1.0") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" === 7).head().getSeq[Float](1).toArray
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .collect()
    assert(top.head.getLong(0) == 7L && top.head.getDouble(1) == 1.0)
  }

  test("LSH-bucketed ANN returns the query vector from its own bucket") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.cos(i * 3 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" === 5).head().getSeq[Float](1).toArray
    val got = Similarity.annLsh(spark, vecs, "vec_id", "embedding", q, 10, planes = 8)
      .collect()
    assert(got.nonEmpty && got.head.getLong(0) == 5L,
      s"query's own bucket must contain it first: ${got.mkString(",")}")
  }

  test("multi-probe LSH widens the single-bucket candidate set monotonically") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.cos(i * 3 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" === 5).head().getSeq[Float](1).toArray
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.getLong(0)).toSet
    val h0 = ids(Similarity.annLshMultiProbe(spark, vecs, "vec_id", "embedding",
      q, 40, planes = 8, hamming = 0))
    val h1 = ids(Similarity.annLshMultiProbe(spark, vecs, "vec_id", "embedding",
      q, 40, planes = 8, hamming = 1))
    val single = ids(Similarity.annLsh(spark, vecs, "vec_id", "embedding",
      q, 40, planes = 8))
    assert(h0 == single, "hamming=0 must equal the single-bucket search")
    assert(single.subsetOf(h1), "wider probe must contain the narrow results")
    assert(h1.contains(5L))
  }

  test("native per-row simhash32 equals the grouped shingle formulation") {
    val grouped = Dedup.simHash(Dedup.shingles(docs, "text", "doc_id", 1), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = docs.select(col("doc_id"),
        graft.functions.SimHash32.simhash32(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == grouped)
  }

  test("multimodal frame sampling chunks the payload; resize crops to budget") {
    val withP = graft.operators.Multimodal.withBinaryPayload(docs, "text")
    val frames = graft.operators.Multimodal
      .frameSample(withP, "doc_id", "payload", 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      assert(r.getLong(1) % 2 == 0, "only every 2nd frame sampled")
      assert(r.getString(3).length <= r.getLong(2) * 2, "hex at most chunk*2 chars")
    }
    // reassembling frames 0..n of one doc must be a prefix of the payload hex
    val d1 = frames.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(d1.nonEmpty && d1.head.getLong(1) == 0L)
    val resized = graft.operators.Multimodal
      .resizeStub(withP, "doc_id", "payload", 8, 4).collect()
    resized.foreach { r =>
      assert(r.getInt(1) == 8 && r.getInt(2) == 4 && r.getLong(3) <= 32)
    }
  }

  test("PPM decode: real P6 header parse — comments, whitespace, rejects, pixel plane") {
    def ppm(header: String, pixels: Array[Byte]): Array[Byte] =
      header.getBytes("US-ASCII") ++ pixels
    val px = Array.tabulate(2 * 2 * 3)(i => (i * 7 + 3).toByte)
    // header parse directly: comments and arbitrary whitespace are legal
    assert(Multimodal.parsePpmHeader(ppm("P6\n2 2\n255\n", px))
      .contains((2, 2, 255, 11)))
    assert(Multimodal.parsePpmHeader(
      ppm("P6\n# a comment\n 2\t2 # dims\n255\n", px)).map(t => (t._1, t._2, t._3))
      .contains((2, 2, 255)))
    // rejects: bad magic (P3 = ASCII ppm), 2-byte samples, missing tokens,
    // and a digit glued to the magic (no whitespace after 'P6')
    assert(Multimodal.parsePpmHeader(ppm("P3\n2 2\n255\n", px)).isEmpty)
    assert(Multimodal.parsePpmHeader(ppm("P6\n2 2\n65535\n", px)).isEmpty)
    assert(Multimodal.parsePpmHeader(ppm("P6\n2\n255\n", px)).isEmpty)
    assert(Multimodal.parsePpmHeader(ppm("P62 2\n255\n", px)).isEmpty)

    val rows = Seq(
      1L -> ppm("P6\n2 2\n255\n", px),                    // valid
      2L -> ppm("P6\n# hi\n2 2\n255\n", px),              // valid, comment
      3L -> ppm("P6\n4 4\n255\n", px),                    // truncated plane
      4L -> "not an image".getBytes("US-ASCII"),          // garbage
      5L -> ppm("P6\n2 2\n255\n", px ++ Array[Byte](9, 9)) // trailing junk ok
    ).toDF("doc_id", "payload")
    val got = Multimodal.decodePpm(rows, "doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getAs[Array[Byte]](5).toSeq))
      .toMap
    // malformed/truncated blobs drop; valid ones decode byte-exact
    assert(got.keySet == Set(1L, 2L, 5L))
    got.values.foreach { case (w, h, m, pix) =>
      assert(w == 2 && h == 2 && m == 255 && pix == px.toSeq)
    }
    // the decoded pixel plane feeds featureExtract like any payload
    val feats = Multimodal.featureExtract(spark,
        Multimodal.decodePpm(rows, "doc_id"), "doc_id", "pixels")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.keySet == Set(1L, 2L, 5L))
    feats.values.foreach(v => assert(v.size == 16 && math.abs(v.sum - 1f) < 1e-3))
    // identical pixel planes -> identical features, regardless of header form
    assert(feats(1L) == feats(2L) && feats(1L) == feats(5L))
  }

  test("temperature sampling: smallest stratum keeps all, dominant flattens by sqrt") {
    val rows = (1 to 900).map(i => (i.toLong,
      if (i <= 600) "en" else if (i <= 850) "de" else "fr"))
    val df = rows.toDF("doc_id", "lang")
    def audit(d: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Long)] =
      TextOps.temperatureSampleFlag(d, "doc_id", "lang")
        .groupBy("lang").agg(count(lit(1)).as("n"), max("__thr").as("t"),
          sum("__kept").as("k"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = audit(df)
    // smallest stratum (fr, 50 docs): threshold = scale -> keeps everything
    assert(got("fr") == ((50L, 1000000L, 50L)), got.toString)
    // dominant stratum: threshold = floor(sqrt(50/600) * 1e6) exactly
    assert(got("en")._2 == math.floor(math.sqrt(50.0 / 600) * 1e6).toLong)
    // kept share tracks the threshold (hash-uniform within a loose band)
    val (nEn, tEn, kEn) = got("en")
    assert(math.abs(kEn.toDouble / nEn - tEn / 1e6) < 0.08,
      s"en kept $kEn of $nEn vs p=${tEn / 1e6}")
    // content-stable: physical repartitioning changes nothing
    assert(audit(df.repartition(7)) == got)
  }

  test("bruteForceTopKBatch equals per-query bruteForceTopK loops") {
    val vecs = Seq(
      0L -> Array(1f, 0f, 0f), 1L -> Array(0f, 1f, 0f),
      2L -> Array(0.9f, 0.1f, 0f), 3L -> Array(0f, 0.2f, 1f),
      4L -> Array(0.5f, 0.5f, 0f), 5L -> Array(-1f, 0f, 0f))
      .toDF("vec_id", "embedding")
    val queries = vecs.where(col("vec_id") < 2)
    val batch = Similarity.bruteForceTopKBatch(vecs, queries,
        "vec_id", "embedding", 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    assert(batch.keySet == Set(0L, 1L))
    for (q <- Seq(0L, 1L)) {
      val qv = vecs.where(col("vec_id") === q)
        .head().getSeq[Float](1).toArray
      val loop = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", qv, 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q) == loop, s"query $q: ${batch(q)} vs $loop")
    }
    // each query ranks itself first at cos 1.0
    assert(batch(0L).head == (0L, 1.0) && batch(1L).head == (1L, 1.0))
  }

  test("bloom decontamination: superset of exact keeps, measured fp bound") {
    // controlled-overlap corpus: 15 contaminated docs share the 3-gram
    // "alpha beta gamma" with the eval set; 85 clean docs use per-doc
    // vocabularies so no real overlap exists
    val eval = (1 to 20).map(i => (1000L + i, s"mark$i alpha beta gamma tail$i end$i"))
    val contam = (1 to 15).map(i => (i.toLong, s"noise$i alpha beta gamma other$i"))
    val clean = (16 to 100).map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    val evalSh = Dedup.hashShingles(Dedup.shingles(
      eval.toDF("doc_id", "text"), "text", "doc_id", 3, dedup = false), "doc_id")
    val corpusSh = Dedup.hashShingles(Dedup.shingles(
      (contam ++ clean).toDF("doc_id", "text"), "text", "doc_id", 3,
      dedup = false), "doc_id")
    // exact flags (the q62 broadcast-join formulation, replayed inline)
    val exact = corpusSh.join(broadcast(evalSh.select("sh_h").distinct()), "sh_h")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(exact == (1 to 15).map(_.toLong).toSet)
    // tight filter: identical to exact (expected fps ~ probes * 1e-6 ≈ 0)
    val (bf, stats) = Dedup.shingleBloom(evalSh)
    val bloom = Dedup.bloomHits(corpusSh, "doc_id", bf)
      .collect().map(_.getLong(0)).toSet
    assert(bloom == exact, s"fpp 1e-6 must be fp-free at this size")
    assert(stats.nItems ==
      evalSh.select("sh_h").distinct().count() && stats.bitSize > 0)
    // loose filter: fps become measurable and stay within the advertised
    // bound — flags are a SUPERSET of exact (no contaminated doc missed),
    // and the per-probe fp rate is the fpp order of magnitude
    val (bfLoose, _) = Dedup.shingleBloom(evalSh, fpp = 0.2)
    val loose = Dedup.bloomHits(corpusSh, "doc_id", bfLoose)
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(loose), "bloom must never miss a contaminated doc")
    val cleanProbes = corpusSh.join(evalSh.select("sh_h").distinct(),
      Seq("sh_h"), "left_anti").select("sh_h").distinct().count()
    val fpProbes = corpusSh.join(evalSh.select("sh_h").distinct(),
        Seq("sh_h"), "left_anti")
      .select("sh_h").distinct().collect()
      .count(r => bfLoose.mightContainLong(r.getLong(0)))
    assert(fpProbes <= math.max(3, (3.0 * 0.2 * cleanProbes).toLong),
      s"fp rate $fpProbes/$cleanProbes must be within 3x of fpp 0.2")
  }

  test("BMP decode: hand-authored bytes pin bottom-up/BGR/stride; reject matrix") {
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def header(w: Int, h: Int, size: Int, off: Int = 54, dib: Int = 40,
        planes: Int = 1, bits: Int = 24, comp: Int = 0): Array[Byte] =
      "BM".getBytes("US-ASCII") ++ le32(size) ++ le32(0) ++ le32(off) ++
        le32(dib) ++ le32(w) ++ le32(h) ++ le16(planes) ++ le16(bits) ++
        le32(comp) ++ le32(size - 54) ++ Array.fill[Byte](16)(0)
    // 2x2 logical top-down RGB plane = bytes 1..12; the FILE stores it
    // bottom-up, BGR, with 2 stride-pad bytes per row — all hand-written
    // here so decode is pinned against the spec, not against encodeBmp
    val pixFile = Array[Byte](9, 8, 7, 12, 11, 10, 0, 0,
      3, 2, 1, 6, 5, 4, 0, 0)
    val good = header(2, 2, 54 + 16) ++ pixFile
    val rows = Seq(
      1L -> good,
      2L -> (header(2, 2, 54 + 16, bits = 8) ++ pixFile),  // wrong bit depth
      3L -> (header(2, 2, 54 + 16, comp = 1) ++ pixFile),  // compressed (RLE)
      4L -> (header(2, 4, 54 + 32) ++ pixFile),            // truncated plane
      5L -> (header(2, -2, 54 + 16) ++ pixFile),           // top-down (negative h)
      6L -> "XX garbage".getBytes("US-ASCII"))             // bad magic
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeBmp(rows, "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L))
    val r1 = got(1L)
    assert(r1.getInt(1) == 2 && r1.getInt(2) == 2 && r1.getLong(3) == 12)
    assert(r1.getAs[Array[Byte]](4).toSeq == (1 to 12).map(_.toByte).toSeq)
    // encode -> decode round-trip at a width with 3 pad bytes (stride 12)
    val plane = Array.tabulate(3 * 2 * 3)(i => (40 + i * 5).toByte)
    val rt = Multimodal.decodeBmp(
        Seq(9L -> Multimodal.encodeBmp(3, 2, plane)).toDF("doc_id", "payload"),
        "doc_id")
      .collect()
    assert(rt.length == 1 && rt.head.getAs[Array[Byte]](4).toSeq == plane.toSeq)
    // the normalized plane feeds planeStats exactly like decodePpm output
    val st = Multimodal.planeStats(Multimodal.decodeBmp(
        Seq(1L -> good).toDF("doc_id", "payload"), "doc_id")).collect()
    assert(st.length == 1 && st.head.getDouble(1) == (1 + 4 + 7 + 10) / 4.0)
  }

  test("decodeAny dispatches by magic: same plane from either format, garbage drops") {
    val plane = Array.tabulate(2 * 2 * 3)(i => (i * 7 + 3).toByte)
    val rows = Seq(
      1L -> ("P6\n2 2\n255\n".getBytes("US-ASCII") ++ plane),
      2L -> Multimodal.encodeBmp(2, 2, plane),
      3L -> "neither format".getBytes("US-ASCII"),
      4L -> ("P6\n4 4\n255\n".getBytes("US-ASCII") ++ plane)) // truncated ppm
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeAny(rows, "doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getAs[Array[Byte]](5).toSeq)).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == "ppm" && got(2L)._1 == "bmp")
    // both formats normalize to the SAME top-down RGB plane
    assert(got(1L)._2 == plane.toSeq && got(2L)._2 == plane.toSeq)
  }

  test("ImageIO routes: PNG round-trips byte-exact, JPEG/GIF shape-pinned, rejects") {
    val plane = Array.tabulate(3 * 2 * 3)(i => (i * 11 + 5).toByte)
    // PNG is lossless: decode(encodePng(plane)) == plane, byte for byte
    assert(Multimodal.imageIoDecodeBytes(Multimodal.encodePng(3, 2, plane))
      .exists { case (w, h, px) => w == 3 && h == 2 && px.sameElements(plane) })
    // dispatch: all five magics through ONE decodeAny pass; the PNG plane
    // is byte-exact; JPEG (DCT) and GIF (the JDK writer quantizes through
    // a SAMPLED palette even under 256 distinct colors — measured, not
    // assumed) pin tag + dims with pixels codec-defined; truncated PNG
    // drops
    val gifBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(
        {
          val img = new java.awt.image.BufferedImage(
            3, 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var i = 0
          val bgr = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData
          while (i < plane.length) {
            bgr(i) = plane(i + 2); bgr(i + 1) = plane(i + 1); bgr(i + 2) = plane(i)
            i += 3
          }
          img
        }, "gif", bos)
      bos.toByteArray
    }
    val png = Multimodal.encodePng(3, 2, plane)
    val rows = Seq(
      1L -> png,
      2L -> Multimodal.encodeJpeg(3, 2, plane),
      3L -> gifBytes,
      4L -> png.take(12),                              // truncated png
      5L -> ("P6\n3 2\n255\n".getBytes("US-ASCII") ++ plane),
      6L -> Multimodal.encodeBmp(3, 2, plane))
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeAny(rows, "doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getAs[Array[Byte]](5).toSeq))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L, 6L), s"got ${got.keySet}")
    assert(got(1L) == (("png", 3, 2, plane.toSeq)))
    assert(got(3L)._1 == "gif" && got(3L)._2 == 3 && got(3L)._3 == 2 &&
      got(3L)._4.length == plane.length)
    assert(got(5L)._4 == plane.toSeq && got(6L)._4 == plane.toSeq)
    // JPEG: dims and tag exact; pixels are the codec's business — pin
    // determinism (same bytes -> same plane) and shape, not values
    assert(got(2L)._1 == "jpeg" && got(2L)._2 == 3 && got(2L)._3 == 2 &&
      got(2L)._4.length == plane.length)
    val again = Multimodal.decodeAny(rows, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](5).toSeq).toMap
    assert(again(2L) == got(2L)._4, "JPEG decode must be deterministic in-JVM")
    // and the JVM codec keeps a smooth plane recognizably close (JPEG is
    // lossy, not random): mean abs error under 16/255 on this gradient
    val mae = got(2L)._4.zip(plane.toSeq)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / plane.length
    assert(mae < 16.0, s"JPEG mean abs error $mae")
  }

  test("animated GIF round-trip: every frame byte-exact; non-GIF and corrupt payloads drop") {
    // pins decodeGifFrames' per-task-reader internals (the round-16
    // ImageIO de-contention): multi-frame exactness over the indexed
    // 256-gray palette, frame order, and the drop-don't-crash contract
    val frames = Seq(
      Array.tabulate(12)(i => (i * 7).toByte),
      Array.tabulate(12)(i => (255 - i * 3).toByte),
      Array.tabulate(12)(i => (i * i % 251).toByte))
    val gif = Multimodal.encodeAnimatedGif(4, 3, frames)
    val rows = Seq(
      1L -> gif,
      2L -> Multimodal.encodePng(4, 3, Array.fill(36)(9.toByte)), // non-GIF
      3L -> gif.take(20))                                         // corrupt
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeGifFrames(rows, "doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getAs[Array[Byte]](4).toSeq)))
      .toMap
    assert(got.keySet.map(_._1) == Set(1L), s"got ${got.keySet}")
    frames.zipWithIndex.foreach { case (f, i) =>
      val (w, h, px) = got((1L, i))
      assert(w == 4 && h == 3, s"frame $i dims $w x $h")
      // gray v encodes to palette index v and decodes to (v, v, v)
      val want = f.flatMap(v => Seq(v, v, v)).toSeq
      assert(px == want, s"frame $i plane mismatch")
    }
  }

  test("plane stats from decoded pixels: hand-checked channels, feeds ANN") {
    def ppm(header: String, pixels: Array[Byte]): Array[Byte] =
      header.getBytes("US-ASCII") ++ pixels
    // 2x1 image: pixels (10, 100, 200), (30, 140, 240) — channel means and
    // buckets are hand-computable: R mean 20 (bucket 0), G mean 120
    // (buckets 1, 2), B mean 220 (bucket 3 twice)
    val px = Array(10, 100, 200, 30, 140, 240).map(_.toByte)
    val rows = Seq(
      1L -> ppm("P6\n2 1\n255\n", px),
      2L -> ppm("P6\n# c\n2 1\n255\n", px),          // same plane, other header
      3L -> "garbage".getBytes("US-ASCII"))           // dropped by decode
      .toDF("doc_id", "payload")
    val stats = Multimodal.planeStats(
        Multimodal.decodePpm(rows, "doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(stats.keySet == Set(1L, 2L))
    val s1 = stats(1L)
    assert(s1.getDouble(1) == 20.0 && s1.getDouble(2) == 120.0 &&
      s1.getDouble(3) == 220.0)
    // histograms: header bytes must NOT contaminate the buckets
    assert(s1.getLong(4) == 2 && s1.getLong(5) == 0)              // R: bucket 0 x2
    assert(s1.getLong(9) == 1 && s1.getLong(10) == 1)             // G: buckets 1, 2
    assert(s1.getLong(15) == 2 && s1.getLong(12) == 0)            // B: bucket 3 x2
    // identical planes under different headers -> identical stats
    assert(s1.toSeq.tail == stats(2L).toSeq.tail)
    // the stats repack into the (id, array<float>) ANN shape and rank
    val feats = Multimodal.planeFeatureVector(
      Multimodal.planeStats(Multimodal.decodePpm(rows, "doc_id")))
    val fRows = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(fRows(1L).size == 15 && fRows(1L) == fRows(2L))
    val top = graft.operators.Similarity
      .bruteForceTopK(feats, "doc_id", "features", fRows(1L).toArray, 2).collect()
    assert(top.map(_.getLong(0)).toSet == Set(1L, 2L) &&
      top.forall(_.getDouble(1) == 1.0))
  }

  test("multimodal feature extraction feeds the ANN operators") {
    val withP = graft.operators.Multimodal.withBinaryPayload(docs, "text")
    val feats = graft.operators.Multimodal.featureExtract(spark, withP, "doc_id")
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.size == 16 && math.abs(v.sum - 1.0f) < 1e-3, s"doc ${r.getLong(0)}: $v")
    }
    // the typed (id, array<float>) output plugs into the similarity ops
    val q = rows.head.getSeq[Float](1).toArray
    val top = graft.operators.Similarity
      .bruteForceTopK(feats, "doc_id", "features", q, 3).collect()
    assert(top.head.getLong(0) == rows.head.getLong(0) && top.head.getDouble(1) == 1.0)
  }

  test("native per-row fingerprint64 equals the grouped explode+sum formulation") {
    val grouped = TextOps.fingerprint(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = docs.select(col("doc_id"),
        graft.functions.Fingerprint.fingerprint64(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == grouped)
  }

  test("native per-row minhash_sig equals the grouped shingle formulation") {
    val grouped = Dedup.minHash(Dedup.shingles(docs, "text", "doc_id", 1), "doc_id", 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    val native = docs.select(col("doc_id"),
        graft.functions.MinHashSig.minhash_sig(col("text"), 8))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(native == grouped)
    // n-gram form: the per-row kernel folds the 3-gram explode+groupBy
    // with IDENTICAL signatures; the caller contract drops docs shorter
    // than n tokens (the grouped spec emits no row for them)
    val grouped3 = Dedup.minHash(Dedup.shingles(docs, "text", "doc_id", 3), "doc_id", 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    val native3 = docs
      .where(TextOps.tokenCount(col("text")) >= 3)
      .select(col("doc_id"),
        graft.functions.MinHashSig.minhash_sig(col("text"), 8, ngram = 3))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(native3 == grouped3)
    // a 2-token doc is OUT of both forms
    val short = Seq((99L, "two words")).toDF("doc_id", "text")
    assert(Dedup.minHash(Dedup.shingles(short, "text", "doc_id", 3),
      "doc_id", 8).count() == 0)
  }

  test("shuffle-free LSH buckets equal the exploded-groupBy formulation") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.cos(i * 3 + d).toFloat))
    }.toDF("vec_id", "embedding")
    // the JVM coefficient mirror is bit-identical to the column derivation
    val coefCol = Seq((3, 5)).toDF("p", "d")
      .select(Similarity.planeCoef(col("p"), col("d"))).head().getDouble(0)
    assert(coefCol == Similarity.planeCoefJvm(3, 5))
    val native = Similarity.lshBuckets(vecs, "vec_id", "embedding", 8, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = Similarity.lshBucketsHof(vecs, "vec_id", "embedding", 8, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val spec = Similarity.lshBucketsExploded(spark, vecs, "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof && hof == spec)
    // driver-side mirror (annLsh's query-bucket path) is bit-equal too
    val jvm = vecs.collect().map { r =>
      r.getLong(0) -> Similarity.lshBucketJvm(
        r.getSeq[Float](1).map(_.toDouble).toArray, 8)
    }.toMap
    assert(jvm == native)
  }

  test("connected components collapse transitive candidate chains to the min id") {
    val nodes = (1L to 12L).toDF("doc_id")
    // a 7-node chain (forces propagation past one hop), one pair given in
    // reversed order, and a singleton
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
      (8L, 9L), (11L, 10L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 7L).forall(got(_) == 1L), got.toString)
    assert(got(8L) == 8L && got(9L) == 8L)
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(got(12L) == 12L)
  }

  test("connectedComponents converges in O(log diameter) and reports it") {
    val nodes = (1L to 16L).toDF("doc_id")
    val pairs = (1L to 15L).map(i => (i, i + 1)).toDF("a", "b")
    // force the distributed loop: this pin is about ITS round count
    spark.conf.set(Dedup.CcLocalEdgeLimitKey, "0")
    val r =
      try Dedup.connectedComponentsStats(nodes, pairs, "doc_id")
      finally spark.conf.unset(Dedup.CcLocalEdgeLimitKey)
    assert(r.converged)
    // pointer jumping: a 16-node chain (diameter 15) must converge in far
    // fewer than 15 rounds (log-ish; +1 round to observe the fixpoint)
    assert(r.iterations <= 8, s"iterations = ${r.iterations}")
    val got = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((1L to 16L).forall(got(_) == 1L))
    graft.engine.Checkpoints.release(r.labels)
  }

  test("connectedComponents reports non-convergence at maxIter") {
    val nodes = (1L to 16L).toDF("doc_id")
    val pairs = (1L to 15L).map(i => (i, i + 1)).toDF("a", "b")
    val r = Dedup.connectedComponentsStats(nodes, pairs, "doc_id", maxIter = 1)
    assert(!r.converged && r.iterations == 1)
    // labels are still emitted for every node (documented: upper bounds)
    assert(r.labels.count() == 16)
    graft.engine.Checkpoints.release(r.labels)
  }

  test("connectedComponents matches driver union-find on random graphs") {
    // independent oracle: in-memory union-find over the same edge list,
    // seeded pseudo-random graphs of mixed density (incl. isolated nodes)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 30 + rnd.nextInt(30)
      val edges = Seq.fill(20 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong + 1L, rnd.nextInt(n).toLong + 1L))
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (1 to n).map(i => i.toLong -> {
        // path-compress to the canonical minimum (union by min above)
        find(i).toLong
      }).toMap
      val r = Dedup.connectedComponentsStats(
        (1L to n.toLong).toDF("doc_id"), edges.toDF("a", "b"), "doc_id")
      val got = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      graft.engine.Checkpoints.release(r.labels)
      assert(r.converged, s"seed $seed did not converge")
      assert(got == want, s"seed $seed: n=$n edges=${edges.size}")
    }
  }

  test("connectedComponents evaluates its edge input exactly once") {
    // the loop-invariance pin: an accumulator in the pair pipeline counts
    // how many times each edge row is produced across the WHOLE cc run —
    // pre-checkpoint-fix this was (1 + iterations) x rows. Pinned on the
    // DISTRIBUTED loop (forced via the conf gate); the local path reads
    // the same one-evaluation checkpoint by construction.
    val acc = spark.sparkContext.longAccumulator("edgeEvals")
    val tick = udf { (x: Long) => acc.add(1L); x }
    val nodes = (1L to 16L).toDF("doc_id")
    val pairs = (1L to 15L).map(i => (i, i + 1)).toDF("a", "b")
      .withColumn("a", tick(col("a")))
    spark.conf.set(Dedup.CcLocalEdgeLimitKey, "0")
    val r =
      try Dedup.connectedComponentsStats(nodes, pairs, "doc_id")
      finally spark.conf.unset(Dedup.CcLocalEdgeLimitKey)
    assert(r.converged && r.iterations >= 2)
    assert(acc.value == 15L, s"edge pipeline evaluated ${acc.value / 15.0} times")
    graft.engine.Checkpoints.release(r.labels)
  }

  test("connectedComponents: small-graph local path equals the loop, releases its checkpoints") {
    // the scale-adaptive fork (one union-find task under the edge-count
    // gate) must be label-identical to the pointer-jumping loop on the
    // same graphs — including isolated nodes (left join fills self)
    val sc = spark.sparkContext
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val n = 30 + rnd.nextInt(30)
      val edges = Seq.fill(20 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong + 1L, rnd.nextInt(n).toLong + 1L))
      val nodes = (1L to n.toLong).toDF("doc_id")
      val pairs = edges.toDF("a", "b")
      val before = sc.getPersistentRDDs.size
      val local = Dedup.connectedComponentsStats(nodes, pairs, "doc_id")
      assert(local.converged && local.iterations == 0,
        "gate should have chosen the local path")
      // only the returned labels frame may stay pinned
      assert(sc.getPersistentRDDs.size == before + 1,
        s"local path leaked: ${sc.getPersistentRDDs.size - before - 1}")
      val gotLocal = local.labels.collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      graft.engine.Checkpoints.release(local.labels)
      spark.conf.set(Dedup.CcLocalEdgeLimitKey, "0")
      val loop =
        try Dedup.connectedComponentsStats(nodes, pairs, "doc_id")
        finally spark.conf.unset(Dedup.CcLocalEdgeLimitKey)
      assert(loop.iterations >= 1, "conf gate should have forced the loop")
      val gotLoop = loop.labels.collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      graft.engine.Checkpoints.release(loop.labels)
      assert(gotLocal == gotLoop, s"seed $seed: local != loop")
    }
  }

  test("connectedComponents releases every superseded checkpoint") {
    val sc = spark.sparkContext
    val nodes = (1L to 12L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("a", "b")
    val before = sc.getPersistentRDDs.size
    val r = Dedup.connectedComponentsStats(nodes, pairs, "doc_id")
    // only the returned labels frame may remain pinned — the edge set and
    // every intermediate round must have been released
    assert(sc.getPersistentRDDs.size == before + 1,
      s"leaked checkpoints: ${sc.getPersistentRDDs.size - before - 1}")
    graft.engine.Checkpoints.release(r.labels)
    assert(sc.getPersistentRDDs.size == before)
  }

  test("Checkpoints.mark truncates lineage; release frees the blocks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val df = graft.engine.Checkpoints.mark(
      spark.range(100).toDF("x").where(col("x") > 10))
    assert(sc.getPersistentRDDs.size == before + 1)
    // lineage is gone: the plan is a single materialized-RDD leaf
    assert(df.queryExecution.analyzed.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]))
    graft.engine.Checkpoints.release(df)
    assert(sc.getPersistentRDDs.size == before)
  }

  test("incrementalPairs: batch vs persisted index, self-pairs excluded") {
    val idxPath = s"${sys.props("java.io.tmpdir")}/graft_test_incr_idx"
    graft.cli.Cleanup.deleteOnExit(idxPath)
    // index = docs 1,2 (near-dups) and 4 (unrelated)
    val corpus = docs.where(col("doc_id").isin(1L, 2L, 4L))
    val sigC = Dedup.minHash(Dedup.shingles(corpus, "text", "doc_id", 1), "doc_id", 8)
    Dedup.bandIndexWrite(Dedup.lshBands(sigC, "doc_id", 8, 4), "doc_id", 4, idxPath)
    val index = Dedup.bandIndexRead(spark, idxPath)
    assert(Dedup.bandIndexSkipped(spark, idxPath).isEmpty) // uncapped build
    // batch = doc 3 (exact dup of 1) plus a RE-INGESTED doc 1
    val batch = docs.where(col("doc_id").isin(1L, 3L))
    val sigB = Dedup.minHash(Dedup.shingles(batch, "text", "doc_id", 1), "doc_id", 8)
    val got = Dedup.incrementalPairs(index,
        Dedup.lshBands(sigB, "doc_id", 8, 4), "doc_id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 3L)) && got.contains((2L, 3L)), s"$got")
    assert(got.contains((2L, 1L)), s"re-ingested doc must pair with its dups: $got")
    assert(!got.contains((1L, 1L)), s"self-pair must be excluded: $got")
    assert(!got.exists(p => p._1 == 4L), s"unrelated index doc must not pair: $got")
    // a-side ids come from the index, b-side from the batch — never swapped
    assert(got.forall { case (a, b) => Set(1L, 2L, 4L)(a) && Set(1L, 3L)(b) })

    // capped build: over-cap buckets land in the skipped sidecar and are
    // absent from the queryable band rows
    val cappedPath = s"${sys.props("java.io.tmpdir")}/graft_test_incr_idx_capped"
    graft.cli.Cleanup.deleteOnExit(cappedPath)
    Dedup.bandIndexWrite(Dedup.lshBands(sigC, "doc_id", 8, 4), "doc_id", 4,
      cappedPath, maxBucket = 1)
    val kept = Dedup.bandIndexRead(spark, cappedPath)
    val skipped = Dedup.bandIndexSkipped(spark, cappedPath)
    assert(skipped.count() > 0) // docs 1/2 share at least one band bucket
    assert(kept.groupBy("bi", "k").count().where(col("count") > 1).isEmpty)
    assert(kept.join(skipped,
      kept("bi") === skipped("band_idx") && kept("k") === skipped("key")).isEmpty)
  }

  test("bandIndexWrite append: cap decided over combined size — straddling buckets stay bounded") {
    val idxPath = s"${sys.props("java.io.tmpdir")}/graft_test_band_straddle"
    graft.cli.Cleanup.deleteOnExit(idxPath)
    // hand-crafted single-band frames: bucket = the band0 value
    def banded(rows: (Long, Long)*) = rows.toDF("doc_id", "band0")
    def keyCount(k: Long): Long =
      Dedup.bandIndexRead(spark, idxPath).where(col("k") === k).count()
    def skippedSizes: Map[Long, Long] =
      Dedup.bandIndexSkipped(spark, idxPath).collect()
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // build, cap=3: bucket 7 (2 docs) kept; bucket 9 (4 docs) skipped
    Dedup.bandIndexWrite(banded(1L -> 7L, 2L -> 7L,
        11L -> 9L, 12L -> 9L, 13L -> 9L, 14L -> 9L),
      "doc_id", 1, idxPath, maxBucket = 3)
    assert(keyCount(7L) == 2 && keyCount(9L) == 0)
    assert(skippedSizes == Map(9L -> 4L))
    // append within the cap: combined 3 <= 3, admitted
    Dedup.bandIndexWrite(banded(3L -> 7L), "doc_id", 1, idxPath,
      maxBucket = 3, append = true)
    assert(keyCount(7L) == 3)
    // append past the cap: the appended rows are excluded, the in-index
    // bucket never exceeds the cap, and skipped records the true total —
    // the straddling bucket the per-batch cap used to miss
    Dedup.bandIndexWrite(banded(4L -> 7L, 5L -> 7L), "doc_id", 1, idxPath,
      maxBucket = 3, append = true)
    assert(keyCount(7L) == 3)
    assert(skippedSizes(7L) == 5L)
    // a bucket skipped at BUILD stays excluded even when a later batch
    // alone would fit (its historical rows are gone — admitting new ones
    // would present a partial bucket as complete)
    Dedup.bandIndexWrite(banded(15L -> 9L), "doc_id", 1, idxPath,
      maxBucket = 3, append = true)
    assert(keyCount(9L) == 0)
    assert(skippedSizes(9L) == 5L)

    // capped appends onto an UNCAPPED build: no bandsizes sidecar exists,
    // so every append falls back to counting the band rows — the cap must
    // still hold and no partial sidecar may be started (a mid-life sidecar
    // would under-count buckets it never touched)
    val p2 = s"${sys.props("java.io.tmpdir")}/graft_test_band_uncapped"
    graft.cli.Cleanup.deleteOnExit(p2)
    def keyCount2(k: Long): Long =
      Dedup.bandIndexRead(spark, p2).where(col("k") === k).count()
    Dedup.bandIndexWrite(banded(1L -> 5L, 2L -> 5L, 3L -> 5L), "doc_id", 1, p2)
    Dedup.bandIndexWrite(banded(4L -> 5L), "doc_id", 1, p2,
      maxBucket = 3, append = true)
    assert(keyCount2(5L) == 3)
    Dedup.bandIndexWrite(banded(5L -> 5L), "doc_id", 1, p2,
      maxBucket = 3, append = true)
    assert(keyCount2(5L) == 3)
    val skip2 = Dedup.bandIndexSkipped(spark, p2).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(skip2(5L) == 5L) // true total across both refused appends
    assert(!new java.io.File(s"$p2/bandsizes").exists(), "no partial sidecar")

    // an UNCAPPED append onto a CAPPED index is refused: it would
    // blind-append past the cap and leave the size sidecar stale
    val e = intercept[IllegalArgumentException] {
      Dedup.bandIndexWrite(banded(20L -> 7L), "doc_id", 1, idxPath,
        append = true)
    }
    assert(e.getMessage.contains("capped band index"), e.getMessage)
  }

  test("bandIndexVerify: healthy index clean; torn appends flagged; rebuild clears sidecars") {
    def banded(rows: (Long, Long)*) = rows.toDF("doc_id", "band0")
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_band_verify"
    graft.cli.Cleanup.deleteOnExit(path)
    // capped build: bucket 7 kept (2 rows), bucket 9 skipped (4 rows)
    Dedup.bandIndexWrite(banded(1L -> 7L, 2L -> 7L,
        11L -> 9L, 12L -> 9L, 13L -> 9L, 14L -> 9L),
      "doc_id", 1, path, maxBucket = 3)
    assert(Dedup.bandIndexVerify(spark, path, maxBucket = 3).isEmpty,
      "a healthy index must verify clean")
    // torn append simulation 1: rows reach bands but the crash loses the
    // bandsizes update — recount disagrees with the sidecar
    banded(3L -> 7L).select(col("doc_id"), lit(0).as("bi"),
        col("band0").as("k"))
      .write.mode("append").parquet(s"$path/bands")
    val torn1 = Dedup.bandIndexVerify(spark, path).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(torn1.toSeq == Seq((7L, "size_mismatch", 2L, 3L)), torn1.toSeq.toString)
    // torn append simulation 2: rows of a SKIPPED bucket land in bands
    // (should never be admitted) and a brand-new bucket has no size row
    banded(15L -> 9L, 16L -> 42L).select(col("doc_id"), lit(0).as("bi"),
        col("band0").as("k"))
      .write.mode("append").parquet(s"$path/bands")
    val torn2 = Dedup.bandIndexVerify(spark, path).collect()
      .map(r => (r.getLong(1), r.getString(2))).toSet
    assert(torn2.contains((9L, "skipped_leak")) &&
      torn2.contains((42L, "missing_size")), torn2.toString)
    // over_cap fires only when the caller states the cap
    assert(Dedup.bandIndexVerify(spark, path, maxBucket = 2).collect()
      .exists(r => r.getLong(1) == 7L && r.getString(2) == "over_cap"))
    // an uncapped REBUILD must drop the stale cap sidecars: phantom
    // skipped buckets of the discarded index would otherwise survive
    Dedup.bandIndexWrite(banded(1L -> 7L), "doc_id", 1, path)
    assert(Dedup.bandIndexSkipped(spark, path).isEmpty)
    assert(!new java.io.File(s"$path/bandsizes").exists() &&
      !new java.io.File(s"$path/skipped").exists(), "stale sidecars dropped")
    assert(Dedup.bandIndexVerify(spark, path).isEmpty)
  }

  test("bandIndexWrite append cap: randomized multi-append sequential replay") {
    // independent oracle: an in-memory sequential replay of the cap spec
    // over random bucket assignments split across random appends —
    // invariants: bands never exceeds the cap for any bucket at any
    // point, exclusion is sticky, skipped records the true total-so-far
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val cap = 2 + rnd.nextInt(4)
      val nBuckets = 3 + rnd.nextInt(5)
      val path =
        s"${sys.props("java.io.tmpdir")}/graft_test_band_rand_$seed"
      graft.cli.Cleanup.deleteOnExit(path)
      var docId = 0L
      val batches = (0 until 2 + rnd.nextInt(3)).map { _ =>
        (0 until 5 + rnd.nextInt(20)).map { _ =>
          docId += 1; (docId, (rnd.nextInt(nBuckets) + 1).toLong)
        }
      }
      // sequential replay state
      val bandsN = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      val skipN = scala.collection.mutable.Map[Long, Long]()
      batches.zipWithIndex.foreach { case (rows, i) =>
        Dedup.bandIndexWrite(rows.toDF("doc_id", "band0"), "doc_id", 1,
          path, maxBucket = cap, append = i > 0)
        rows.groupBy(_._2).foreach { case (k, rs) =>
          val add = rs.size.toLong
          if (skipN.contains(k)) skipN(k) += add // sticky exclusion
          else {
            val combined = bandsN(k) + add
            if (combined > cap) skipN(k) = combined // straddle: total incl. in-index rows
            else bandsN(k) = combined
          }
        }
        // the invariant that must hold AFTER EVERY write, not just at the end
        val gotBands = Dedup.bandIndexRead(spark, path)
          .groupBy("k").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotBands.values.forall(_ <= cap), s"seed $seed write $i: $gotBands")
        assert(gotBands == bandsN.toMap.filter(_._2 > 0), s"seed $seed write $i")
      }
      val gotSkip = Dedup.bandIndexSkipped(spark, path).collect()
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(gotSkip == skipN.toMap, s"seed $seed skipped: got $gotSkip want $skipN")
    }
  }

  test("repetitionRatio counts distinct vs total n-grams") {
    val rows = Seq(
      (1L, "a b c a b c a b c"),  // 7 total 3-grams, 3 distinct
      (2L, "u v w x y z"),        // 4 total, all distinct
      (3L, "one two"),            // < 3 tokens: excluded
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionRatio(rows, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((7L, 3L, 0.571429)))
    assert(got(2L) == ((4L, 4L, 0.0)))
  }

  test("hashSplit is deterministic, partition-invariant, and boundary-exact") {
    val ids = (0L until 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = TextOps.hashSplit(ids, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // same assignment regardless of physical layout (the randomSplit trap)
    val b = TextOps.hashSplit(ids.repartition(13), "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(a == b)
    a.values.foreach { case (bucket, split) =>
      assert(bucket >= 0 && bucket < 100)
      val want = if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
      assert(split == want)
    }
    // all three splits are populated and roughly proportioned at n=200
    val sizes = a.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set("train", "val", "test"))
    assert(sizes("train") > sizes("val") && sizes("train") > sizes("test"))
  }

  test("stratifiedSample keeps per-stratum hash fractions, no RNG") {
    val rows = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    val kept = TextOps.stratifiedSample(rows, "doc_id", "lang",
      Map("en" -> 0.5), default = 1.0)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 200L) // default 1.0: stratum kept whole
    assert(byLang("en") > 60L && byLang("en") < 140L) // ~0.5 of 200, hash-variance bound
    // the flag form marks exactly the sampled rows (q59's single-scan path)
    val flagged = TextOps.sampleFlag(rows, "doc_id", "lang", Map("en" -> 0.5))
    assert(flagged.where(col("__kept") === 1).count() == kept.count())
    // determinism: a rerun keeps the identical id set
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = TextOps.stratifiedSample(rows.repartition(7), "doc_id", "lang",
      Map("en" -> 0.5)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("Checkpoints.release reaches checkpoints through derived frames") {
    // the Bench/Verify contract: releasing a query RESULT (projection/sort
    // over a checkpoint-returning operator, e.g. q54's labels.orderBy)
    // frees the underlying blocks — release walks the analyzed plan, not
    // just a bare mark()ed frame
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val ck = graft.engine.Checkpoints.mark(spark.range(50).toDF("x"))
    val derived = ck.where(col("x") > 5).select((col("x") * 2).as("y"))
      .orderBy("y")
    assert(derived.count() == 44)
    graft.engine.Checkpoints.release(derived)
    assert(sc.getPersistentRDDs.size == before)
  }

  test("kmeansCentroids at iters=6 runs in bounded time (no lineage blowup)") {
    val sc = spark.sparkContext
    val vecs = (0L until 40L)
      .map(i => (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat - 6f)))
      .toDF("vec_id", "embedding")
    val before = sc.getPersistentRDDs.size
    val t0 = System.nanoTime()
    val cents = Similarity.kmeansCentroids(vecs, "vec_id", "embedding", k = 4, iters = 6)
    assert(cents.count() == 4)
    val secs = (System.nanoTime() - t0) / 1e9
    // without the per-round checkpoint this re-executes ~2^6 subtrees
    assert(secs < 60.0, s"took $secs s")
    // only the final round's k x dims table stays pinned
    assert(sc.getPersistentRDDs.size == before + 1)
    graft.engine.Checkpoints.release(cents)
    assert(sc.getPersistentRDDs.size == before)
  }

  test("exact dedup keeps min id per content") {
    val kept = Dedup.exact(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept(1L) == 2L && kept(2L) == 1L && kept(4L) == 1L && !kept.contains(3L))
  }

  test("packChunks: exclusive cumsum per group, budget arithmetic, partition-invariant") {
    // group a: 100+100+80+90 tokens at budget 128 -> chunks 0,0,1,2
    //   before: 0, 100, 200, 280 -> chunk 0, 0, 1, 2; offsets 0, 100, 72, 24
    // group b independent: restarts at chunk 0
    val rows = Seq((1L, "a", 100L), (2L, "a", 100L), (3L, "a", 80L),
      (4L, "a", 90L), (5L, "b", 50L), (6L, "b", 100L))
    val df = rows.toDF("doc_id", "source", "nt")
    def packed(d: org.apache.spark.sql.DataFrame) =
      TextOps.packChunks(d, "doc_id", Seq("source"), col("nt"), 128)
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    val got = packed(df)
    assert(got == Set((1L, 0L, 0L), (2L, 0L, 100L), (3L, 1L, 72L),
      (4L, 2L, 24L), (5L, 0L, 0L), (6L, 0L, 50L)), s"got $got")
    // content-stable under physical repartitioning (window order is by id)
    assert(packed(df.repartition(7)) == got)
    // an unfiltered corpus (null/zero counts): fail-fast by default,
    // dropInvalid filters the offending rows and packs the rest unchanged
    val dirty = (rows ++ Seq((7L, "a", 0L))).toDF("doc_id", "source", "nt")
      .withColumn("nt", when(col("doc_id") === 5L, lit(null)).otherwise(col("nt")))
    intercept[org.apache.spark.SparkThrowable] {
      TextOps.packChunks(dirty, "doc_id", Seq("source"), col("nt"), 128).collect()
    }
    val dropped = TextOps.packChunks(dirty, "doc_id", Seq("source"), col("nt"),
        128, dropInvalid = true)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    assert(dropped == got - ((5L, 0L, 0L)) - ((6L, 0L, 50L)) + ((6L, 0L, 0L)),
      s"invalid rows dropped, survivors repacked: $dropped")
  }

  test("packSpans: straddling docs split at boundaries, spans tile and reassemble") {
    val rows = Seq((1L, "a", 100L), (2L, "a", 200L), (3L, "a", 60L),
      (4L, "b", 300L)).toDF("doc_id", "source", "nt")
    def spans(d: org.apache.spark.sql.DataFrame) =
      TextOps.packSpans(d, "doc_id", Seq("source"), col("nt"), 128)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
    val got = spans(rows)
    // hand-computed: group a cumsum 0/100/300, group b restarts at 0
    assert(got == Set(
      (1L, 0L, 0L, 0L, 100L),                                      // fits chunk 0
      (2L, 0L, 100L, 0L, 28L), (2L, 1L, 0L, 28L, 128L),            // straddles
      (2L, 2L, 0L, 156L, 44L),
      (3L, 2L, 44L, 0L, 60L),                                      // packs after
      (4L, 0L, 0L, 0L, 128L), (4L, 1L, 0L, 128L, 128L),            // exact tiles
      (4L, 2L, 0L, 256L, 44L)), got.toString)
    // invariants: per-doc spans sum to n_tokens; doc_offsets are contiguous
    val byDoc = got.groupBy(_._1)
    assert(byDoc(2L).toSeq.sortBy(_._4).map(_._5).sum == 200L)
    // partition-invariant (window orders by id)
    assert(spans(rows.repartition(5)) == got)
  }

  test("packing and selection invariants hold on seeded random corpora") {
    // independent oracle: a sequential in-memory replay of each operator's
    // spec over the same rows — random sizes, strata, and physical
    // partitioning (the operators promise partition-invariance)
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(100)
      val rows = (1 to n).map(i => (i.toLong,
        s"s${rnd.nextInt(4)}", 1L + rnd.nextInt(120)))
      val df = rows.toDF("id", "g", "nt").repartition(1 + rnd.nextInt(7))
      val budget = 128

      // packChunks: replay the exclusive cumsum per group sequentially
      val wantPack = rows.groupBy(_._2).flatMap { case (_, grp) =>
        var cum = 0L
        grp.sortBy(_._1).map { case (id, _, nt) =>
          val r = (id, cum / budget, cum % budget); cum += nt; r
        }
      }.map(r => r._1 -> (r._2, r._3)).toMap
      val gotPack = TextOps.packChunks(df, "id", Seq("g"), col("nt"), budget)
        .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
      assert(gotPack == wantPack, s"seed $seed packChunks")

      // budgetSelect: replay the greedy fill (score = nt desc, id asc)
      val bud = 600L
      val wantSel = rows.groupBy(_._2).flatMap { case (_, grp) =>
        var cum = 0L
        grp.sortBy(t => (-t._3, t._1)).flatMap { case (id, _, nt) =>
          cum += nt; if (cum <= bud) Some(id -> cum) else None
        }
      }.toMap
      val gotSel = TextOps.budgetSelect(df, "id", "g", col("nt"), col("nt"), bud)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(gotSel == wantSel, s"seed $seed budgetSelect")

      // groupQuota: replay the per-group top-k
      val k = 1 + rnd.nextInt(5)
      val wantQ = rows.groupBy(_._2).flatMap { case (_, grp) =>
        grp.sortBy(t => (-t._3, t._1)).take(k).map(_._1)
      }.toSet
      val gotQ = TextOps.groupQuota(df, "id", "g", col("nt"), k)
        .collect().map(_.getLong(0)).toSet
      assert(gotQ == wantQ, s"seed $seed groupQuota")
    }
  }

  test("packText assembles chunk members in id order with the separator") {
    val rows = Seq((1L, "a", "one", 100L), (2L, "a", "two", 100L),
      (3L, "a", "three", 80L), (5L, "b", "solo", 50L))
    val df = rows.toDF("doc_id", "source", "text", "nt")
    val r = TextOps.packText(df, "doc_id", Seq("source"), "text",
        col("nt"), 128, sep = " | ")
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getString(4))).toMap
    // a: doc1 (before 0) and doc2 (before 100) share chunk 0; doc3
    // (before 200) starts chunk 1; b restarts at chunk 0
    assert(r(("a", 0L)) == (2L, 200L, "one | two"), s"got $r")
    assert(r(("a", 1L)) == (1L, 80L, "three"))
    assert(r(("b", 0L)) == (1L, 50L, "solo"))
  }

  test("quantileKeep: exact per-stratum threshold; approx path agrees here") {
    // stratum x: values 1..4 -> p25 (linear interpolation) = 1.75
    val df = Seq((1L, "x", 1), (2L, "x", 2), (3L, "x", 3), (4L, "x", 4),
      (5L, "y", 10), (6L, "y", 20)).toDF("id", "s", "v")
    val r = TextOps.quantileKeep(df, "id", "s", col("v"), 0.25)
      .collect().map(x => x.getLong(0) -> (x.getDouble(3), x.getInt(4))).toMap
    assert(r(1L) == (1.75, 0) && r(2L) == (1.75, 1) && r(4L) == (1.75, 1))
    assert(r(5L)._2 == 0 && r(6L)._2 == 1) // y: p25 = 12.5
    // the scale path (t-digest) returns a MEMBER value, not an
    // interpolation — same schema, threshold inside the stratum's range,
    // and kept must be internally consistent with the approx threshold
    val a = TextOps.quantileKeep(df, "id", "s", col("v"), 0.25, exact = false)
      .collect().map(x => (x.getLong(0), x.getDouble(2), x.getDouble(3), x.getInt(4)))
    assert(a.forall { case (_, v, th, k) => (v >= th) == (k == 1) })
    assert(a.filter(_._1 <= 4).forall { case (_, _, th, _) => th >= 1 && th <= 4 })
  }

  test("groupQuota keeps k best per stratum, ties to smallest id") {
    val df = Seq((1L, "a", 5), (2L, "a", 9), (3L, "a", 9), (4L, "a", 7),
      (5L, "b", 1)).toDF("id", "s", "sc")
    val r = TextOps.groupQuota(df, "id", "s", col("sc"), k = 2)
      .collect().map(x => x.getLong(0) -> x.getInt(3)).toMap
    // a: 9(id2) rank1, 9(id3) rank2, 7(id4) out; b: lone row kept
    assert(r == Map(2L -> 1, 3L -> 2, 5L -> 1), s"got $r")
  }

  test("budgetSelect fills the budget best-first; overflow row drops") {
    val df = Seq(
      (1L, "a", 10, 400L), (2L, "a", 9, 500L), (3L, "a", 8, 200L),
      (4L, "b", 1, 2000L)).toDF("id", "s", "sc", "nt")
    val r = TextOps.budgetSelect(df, "id", "s", col("sc"), col("nt"), 1000L)
      .collect().map(x => x.getLong(0) -> x.getLong(4)).toMap
    // a: 400 (cum 400), 500 (cum 900), 200 would hit 1100 > 1000 -> out
    // b: first row already over budget -> stratum empty
    assert(r == Map(1L -> 400L, 2L -> 900L), s"got $r")
  }

  test("clusterBalancedSample: at most cap per cell, lowest ids win, small cells intact") {
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cell", "ce")
    // cell 0: ids 1,2,3,4 (x-axis); cell 1: ids 10,11 (y-axis)
    val vecs = Seq(
      (1L, Seq(0.9, 0.1)), (2L, Seq(0.8, 0.2)), (3L, Seq(0.95, 0.05)),
      (4L, Seq(0.7, 0.3)), (10L, Seq(0.1, 0.9)), (11L, Seq(0.2, 0.8))
    ).toDF("vec_id", "embedding")
    val r = graft.operators.Similarity
      .clusterBalancedSample(vecs, "vec_id", "embedding", cents, cap = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2))))
      .toMap
    assert(r.values.map(_._1).toSet == Set(0L, 1L))
    // cell 0 keeps ids 1 and 2 (lowest), drops 3 and 4; cell 1 under cap
    assert(r(1L)._2 && r(2L)._2 && !r(3L)._2 && !r(4L)._2)
    assert(r(10L)._2 && r(11L)._2)
  }

  test("Bucketed.writeBucketed: one file per bucket, read-back exact") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val path = java.nio.file.Files.createTempDirectory("bkt_spec").toString
    graft.sources.Bucketed.writeBucketed(spark, df, "bkt_spec_t",
      s"$path/t", buckets = 4, key = "k")
    // one file per bucket is what lets sorted-bucket metadata feed the
    // join without a per-query sort
    val files = new java.io.File(s"$path/t").listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, files.map(_.getName).mkString(", "))
    val back = spark.table("bkt_spec_t")
    assert(back.count() == 100L)
    assert(back.agg(sum("k")).head().getLong(0) == 5050L)
    spark.sql("DROP TABLE bkt_spec_t")
  }

  test("dropBoilerplateLines: df>=minDf lines go, order survives, in-doc repeats count once") {
    val df = Seq(
      (1L, "alpha body one\nshared footer\nunique to one"),
      (2L, "beta body two\nshared footer\nunique to two"),
      (3L, "gamma body three\nshared footer"),
      // doc 4 repeats the footer INTERNALLY: df still counts it once per
      // doc, and the rewrite drops BOTH occurrences
      (4L, "shared footer\ndelta body four\nshared footer"),
      (5L, "epsilon body five\nno footer here")
    ).toDF("doc_id", "text")
    val r = TextOps.dropBoilerplateLines(df, "text", "doc_id", minDf = 4)
      .select("doc_id", "text_clean", "n_lines", "n_removed")
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    // footer df = 4 (docs 1-4) >= minDf; every other line df <= 1
    assert(r(1L) == (("alpha body one\nunique to one", 3L, 1L)))
    assert(r(2L) == (("beta body two\nunique to two", 3L, 1L)))
    assert(r(3L) == (("gamma body three", 2L, 1L)))
    assert(r(4L) == (("delta body four", 3L, 2L)))
    assert(r(5L) == (("epsilon body five\nno footer here", 2L, 0L)))
    // below the bar: df = 4 < minDf = 5 keeps everything byte-identical
    val keep = TextOps.dropBoilerplateLines(df, "text", "doc_id", minDf = 5)
      .select("doc_id", "text_clean", "n_removed").collect()
    assert(keep.forall(_.getLong(2) == 0L))
    assert(keep.map(x => x.getLong(0) -> x.getString(1)).toMap ==
      df.collect().map(x => x.getLong(0) -> x.getString(1)).toMap)
    // a document that is ALL boilerplate rewrites to the empty string
    val all = Seq((1L, "only line"), (2L, "only line"), (3L, "only line"))
      .toDF("doc_id", "text")
    val gone = TextOps.dropBoilerplateLines(all, "text", "doc_id", minDf = 2)
      .select("text_clean", "n_removed").collect()
    assert(gone.forall(x => x.getString(0) == "" && x.getLong(1) == 1L))
  }

  test("redactPii: emails, IPv4, long digit runs; short runs survive") {
    val df = Seq(
      (1L, "mail a.b+c@x-corp.io and d@e.org stay out"),
      (2L, "10.0.0.1 leads and trails 192.168.254.7"),
      (3L, "id 123456789 yes but 12345678 is too short"),
      (4L, "mixed u42@h.net at 8.8.8.8 ref 987654321012")
    ).toDF("doc_id", "text")
    val r = TextOps.redactPii(df, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getLong(2))).toMap
    assert(r(1L) == ("mail <EMAIL> and <EMAIL> stay out", 2L))
    assert(r(2L) == ("<IP> leads and trails <IP>", 2L))
    assert(r(3L) == ("id <ID> yes but 12345678 is too short", 1L))
    assert(r(4L) == ("mixed <EMAIL> at <IP> ref <ID>", 3L))
  }

  test("redactPii overlap: IPv4-shaped email domain counts as ONE redaction") {
    val df = Seq((1L, "u@1.2.3.4.com wrote")).toDF("doc_id", "text")
    val r = TextOps.redactPii(df, "text", "doc_id").head()
    // the email regex consumes the whole address; the IP count runs on the
    // email-redacted text, so n_pii == replacements actually made
    assert(r.getString(1) == "<EMAIL> wrote" && r.getLong(2) == 1L)
  }

  test("columnStats: nulls, NDV, and min/max in one long-form pass") {
    val df = Seq(
      (1L, Some("b")), (2L, None), (3L, Some("a")), (3L, Some("a"))
    ).toDF("k", "v")
    val r = graft.operators.Stats.columnStats(df, Seq("k", "v"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4),
          x.getString(5)))).toMap
    assert(r("k") == ((4L, 0L, 3L, "1", "3")))
    assert(r("v") == ((4L, 1L, 2L, "a", "b")))
  }

  test("histogram: bucket bounds partition the span; counts conserve; uniform estimate is exact") {
    import graft.operators.Stats
    // values 0..99, 4 buckets of exactly 25
    val df = (0L until 100L).toDF("v")
    val h = Stats.histogram(df, "v", 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(h == Map(0L -> ((0L, 24L, 25L)), 1L -> ((25L, 49L, 25L)),
      2L -> ((50L, 74L, 25L)), 3L -> ((75L, 99L, 25L))))
    // a mid-bucket range on uniform data estimates exactly
    val est = Stats.histogramRangeEstimate(
      Stats.histogram(df, "v", 4), lit(30L), lit(69L))
      .collect().head.getLong(0)
    assert(est == 40L)
    // a column spanning most of the 64-bit range overflows the BIGINT
    // bucket arithmetic — the guard fails loud instead of wrapping
    val wide = Seq(Long.MinValue, 0L, Long.MaxValue).toDF("v")
    val e = intercept[Exception] { Stats.histogram(wide, "v", 4).collect() }
    assert((e.getMessage != null && e.getMessage.contains("overflows")) ||
      Option(e.getCause).exists(_.getMessage.contains("overflows")))
    // the frozen-bound partial matches the direct build's buckets when
    // the freeze equals the corpus span, and merges additively
    val p0 = Stats.histogramPartial(df.where(col("v") < 50), "v", 4, 0L, 99L)
    val p1 = Stats.histogramPartial(df.where(col("v") >= 50), "v", 4, 0L, 99L)
    val merged = p0.unionByName(p1).groupBy("bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Stats.histogram(df, "v", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(merged == direct)
  }

  test("histogramRefreeze: nested widening remaps exactly; unaligned demands the fact table; delete partials survive") {
    import graft.operators.{Sketch, Stats}
    def freshPath(name: String): String = {
      val p = s"${sys.props("java.io.tmpdir")}/graft_test_$name"
      graft.cli.Cleanup.deleteOnExit(p)
      val f = new java.io.File(p)
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete() }
      if (f.exists) rm(f)
      p
    }
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // EXACT tier: old [0,7]x4 (width-2 buckets) nests in [-8,7]x8
    // (width-2 buckets, shifted ids) — history rewrites by relabel,
    // including a DELETE partial, with no data rescan
    val p = freshPath("hist_refreeze")
    val vals = Seq(0L, 1L, 2L, 3L, 6L, 7L, 7L)
    import spark.implicits._
    assert(Sketch.sketchAppendBatch(p,
      Stats.histogramPartial(vals.toDF("v"), "v", 4, 0L, 7L), 0L))
    assert(Stats.histogramForget(Seq(7L).toDF("v"), "v", 4, 0L, 7L, p, 1L))
    assert(Stats.histogramRefreeze(spark, p, 4, 0L, 7L, -8L, 7L),
      "width-aligned widening must take the exact remap tier")
    val kept = vals.diff(Seq(7L))
    // reference: one fresh partial of the kept rows under the NEW bounds
    // (the direct data-derived histogram would pick a different span)
    val ref = freshPath("hist_refreeze_ref")
    assert(Sketch.sketchAppendBatch(ref,
      Stats.histogramPartial(kept.toDF("v"), "v", 4, -8L, 7L), 0L))
    assert(m(Stats.histogramRead(spark, p, 4, -8L, 7L)) ==
      m(Stats.histogramRead(spark, ref, 4, -8L, 7L)),
      "remapped history must equal a fresh build under the new bounds")
    // ingest continues under the new bounds; the marker survived, so a
    // replayed old batch id still no-ops
    assert(!Sketch.sketchAppendBatch(p,
      Stats.histogramPartial(Seq(-8L).toDF("v"), "v", 4, -8L, 7L), 1L))
    assert(Sketch.sketchAppendBatch(p,
      Stats.histogramPartial(Seq(-8L, -8L).toDF("v"), "v", 4, -8L, 7L), 2L))
    assert(m(Stats.histogramRead(spark, p, 4, -8L, 7L)) ==
      m(Stats.histogram((kept ++ Seq(-8L, -8L)).toDF("v"), "v", 4)))
    // UNALIGNED tier: [0,49]x4 -> [0,79]x4 does NOT nest (old bucket
    // [13,24] straddles the new width-20 boundary at 20; note a span
    // that exactly DOUBLES always nests — old bucket k lands in new
    // bucket k/2 — which is why the unaligned probe uses 1.6x) —
    // without the fact rows it must refuse, with them it rebuilds
    val p2 = freshPath("hist_refreeze2")
    val vals2 = Seq(0L, 10L, 25L, 44L, 49L)
    assert(Sketch.sketchAppendBatch(p2,
      Stats.histogramPartial(vals2.toDF("v"), "v", 4, 0L, 49L), 0L))
    intercept[IllegalArgumentException] {
      Stats.histogramRefreeze(spark, p2, 4, 0L, 49L, 0L, 79L)
    }
    assert(!Stats.histogramRefreeze(spark, p2, 4, 0L, 49L, 0L, 79L,
      fact = Some((vals2.toDF("v"), "v"))),
      "unaligned widening must take the rebuild tier")
    assert(Sketch.sketchAppendBatch(p2,
      Stats.histogramPartial(Seq(79L, 60L).toDF("v"), "v", 4, 0L, 79L), 1L))
    assert(m(Stats.histogramRead(spark, p2, 4, 0L, 79L)) ==
      m(Stats.histogram((vals2 ++ Seq(79L, 60L)).toDF("v"), "v", 4)))
    // shrinking is refused outright
    intercept[IllegalArgumentException] {
      Stats.histogramRefreeze(spark, p2, 4, 0L, 79L, 0L, 49L)
    }
    // over-deletion fails loud at read time
    val p3 = freshPath("hist_refreeze3")
    assert(Sketch.sketchAppendBatch(p3,
      Stats.histogramPartial(Seq(1L).toDF("v"), "v", 4, 0L, 7L), 0L))
    assert(Stats.histogramForget(Seq(1L, 1L).toDF("v"), "v", 4, 0L, 7L,
      p3, 1L))
    val e2 = intercept[Exception] {
      Stats.histogramRead(spark, p3, 4, 0L, 7L).collect()
    }
    assert((e2.getMessage != null && e2.getMessage.contains("negative")) ||
      Option(e2.getCause).exists(_.getMessage.contains("negative")))
  }

  test("suppressSmallGroups: no published group under k; mass conserves") {
    import graft.operators.Stats
    val df = (Seq.fill(9)(("en", "a")) ++ Seq.fill(3)(("en", "b")) ++
      Seq.fill(2)(("fr", "a")) ++ Seq.fill(7)(("de", "c")))
      .toDF("lang", "source")
    val r = Stats.suppressSmallGroups(df, Seq("lang", "source"), k = 5)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r == Map(("en", "a") -> 9L, ("de", "c") -> 7L,
      ("<other>", "<other>") -> 5L))
    assert(r.values.sum == 21L, "release must still sum to the corpus")
    r.foreach { case (k2, n) => assert(n >= 5, s"$k2 isolates $n < k") }
    // an UNDER-k suppression bucket is withheld entirely (one lone group
    // of size 1 must not publish as '<other>' n=1)
    val r2 = Stats.suppressSmallGroups(
        (Seq.fill(9)(("en", "a")) :+ (("fr", "b"))).toDF("lang", "source"),
        Seq("lang", "source"), k = 5)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r2 == Map(("en", "a") -> 9L), "under-k <other> row must drop")
    // a legitimate key value equal to the sentinel fails loud instead of
    // silently merging into the suppression bucket
    val e = intercept[Exception] {
      Stats.suppressSmallGroups(
        Seq.fill(6)(("<other>", "a")).toDF("lang", "source"),
        Seq("lang", "source"), k = 5).collect()
    }
    assert(e.getMessage.contains("reserved value"))
  }

  test("urlBlocklist rejects unknown rule kinds; luhnValid rejects the empty string") {
    val bad = Seq(("host", "x.com"), ("host_sufix", "typo.net"))
      .toDF("kind", "pattern")
    val urls = Seq((1L, "http://x.com/a")).toDF("doc_id", "url")
    val e = intercept[IllegalArgumentException] {
      TextOps.urlBlocklist(urls, "url", "doc_id", bad)
    }
    assert(e.getMessage.contains("host_sufix"))
    val empty = Seq((1L, "")).toDF("i", "s")
      .select(TextOps.luhnValid($"s")).collect().head.getBoolean(0)
    assert(!empty, "the empty string must not validate (0 = 0 mod 10)")
  }

  test("urlBlocklist: segment boundaries, subdomain suffixes, precedence, canonicalization") {
    val rules = Seq(
      ("host", "bad.com"),
      ("host_suffix", "evil.net"),
      ("path_prefix", "ok.com/p/1")).toDF("kind", "pattern")
    val urls = Seq(
      (1L, "http://bad.com/x"),            // host-exact
      (2L, "http://BAD.COM:80/y"),         // canonicalization catches it
      (3L, "http://a.b.evil.net/z"),       // deep subdomain via suffix
      (4L, "http://evil.net/z"),           // the domain itself via suffix
      (5L, "http://notevil.net/z"),        // NOT a label boundary: kept
      (6L, "https://ok.com/p/1/deep"),     // prefix subtree
      (7L, "https://ok.com/p/10"),         // /p/10 != /p/1: kept
      (8L, "http://bad.com/p/1")           // host wins precedence
    ).toDF("doc_id", "url")
    val r = TextOps.urlBlocklist(urls, "url", "doc_id", rules)
      .collect().map(x => x.getLong(0) -> ((x.getBoolean(2), x.getString(3))))
      .toMap
    assert(r(1L) == ((true, "host")))
    assert(r(2L) == ((true, "host")))
    assert(r(3L) == ((true, "host_suffix")))
    assert(r(4L) == ((true, "host_suffix")))
    assert(r(5L) == ((false, "")), "suffix must respect label boundaries")
    assert(r(6L) == ((true, "path_prefix")))
    assert(r(7L) == ((false, "")), "prefix must respect segment boundaries")
    assert(r(8L) == ((true, "host")), "host outranks path_prefix")
  }

  test("scriptProfile: codepoint counts (surrogate pairs = 1), deterministic dominance") {
    // U+20001 is CJK ext-B: a surrogate PAIR in the JVM, one codepoint
    val extB = new String(Character.toChars(0x20001))
    val df = Seq(
      (1L, s"ab $extB$extB$extB 12"),   // 3 cjk codepoints, not 6
      (2L, "abc 123"),                   // latin ties digit? 3 vs 3: latin wins
      (3L, "!!! ??"),                    // other only
      (4L, "一丁 ab")            // cjk ties latin: cjk wins
    ).toDF("doc_id", "text")
    val r = TextOps.scriptProfile(df, "text", "doc_id")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getString(5)))).toMap
    assert(r(1L) == ((2L, 3L, 2L, 0L, "cjk")),
      s"ext-B must count as codepoints: ${r(1L)}")
    assert(r(2L) == ((3L, 0L, 3L, 0L, "latin")))
    assert(r(3L) == ((0L, 0L, 0L, 5L, "other")))
    assert(r(4L) == ((2L, 2L, 0L, 0L, "cjk")))
  }

  test("stripHtml: tags become boundaries, entities decode amp-last, clean text passes through") {
    val df = Seq(
      (1L, "<p>a</p><p>b</p>"),             // tags must NOT fuse a and b
      (2L, "x &amp;lt; y"),                  // literal "&lt;" in source: ONE decode
      (3L, "<a href=\"u\">link</a> &quot;q&quot; &#39;s&#39;"),
      (4L, "plain  text   here")             // only whitespace collapse
    ).toDF("doc_id", "text")
    val r = TextOps.stripHtml(df, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2)))).toMap
    assert(r(1L) == ((4L, "a b")))
    assert(r(2L) == ((0L, "x &lt; y")), "amp-last decode must not cascade")
    assert(r(3L) == ((2L, "link \"q\" 's'")))
    assert(r(4L) == ((0L, "plain text here")))
  }

  test("luhnValid: known-valid and check-digit-perturbed numbers separate") {
    import org.apache.spark.sql.functions.col
    // 4532015112830366 is Luhn-valid; each single check-digit change fails
    val rows = ("4532015112830366" +:
      (0 to 9).filter(_ != 6).map(d => s"453201511283036$d")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val got = rows.toDF("i", "s")
      .select(col("i"), TextOps.luhnValid(col("s")).as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(0L))
    (1L to 9L).foreach(i => assert(!got(i), s"row $i must fail Luhn"))
  }

  test("redactCards: only checksum-valid candidates redact; multiple per doc all fold") {
    val df = Seq(
      // one valid, one invalid in the same doc
      (1L, "pay 4532015112830366 not 1234567812345678 thanks"),
      // two valid cards both redact (the fold, not a single replace)
      (2L, "a 4532015112830366 b 4716108999716531 c"),
      // 15 digits: no candidate at all
      (3L, "order 453201511283036 shipped"),
      (4L, "no digits here"),
      // a 17-digit run whose first 16 digits are Luhn-valid is NOT a
      // candidate (digit-boundary anchoring) and must stay untouched
      (5L, "id 45320151128303667 x"),
      // a valid card whose digits also sit INSIDE a longer run elsewhere:
      // only the standalone occurrence redacts
      (6L, "pay 4532015112830366 ref 345320151128303669")
    ).toDF("doc_id", "text")
    val r = TextOps.redactCards(df, "text", "doc_id")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((2L, 1L, "pay <CARD> not 1234567812345678 thanks")))
    assert(r(2L) == ((2L, 2L, "a <CARD> b <CARD> c")))
    assert(r(3L) == ((0L, 0L, "order 453201511283036 shipped")))
    assert(r(4L) == ((0L, 0L, "no digits here")))
    assert(r(5L) == ((0L, 0L, "id 45320151128303667 x")))
    assert(r(6L) == ((1L, 1L, "pay <CARD> ref 345320151128303669")))
  }

  test("snapshotDiff: all four statuses classify; a changed doc reports its NEW group") {
    val v1 = Seq(
      (1L, "g1", "same"), (2L, "g1", "old text"), (3L, "g2", "gone"),
      (5L, "g1", "moved body")
    ).toDF("id", "g", "text")
    val v2 = Seq(
      (1L, "g1", "same"), (2L, "g1", "new text"), (4L, "g2", "fresh"),
      (5L, "g2", "moved body CHANGED")
    ).toDF("id", "g", "text")
    val r = graft.operators.Dedup.snapshotDiff(v1, v2, "id", "text", Seq("g"))
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3)))).toMap
    assert(r(("g1", "unchanged")) == ((1L, 1L)))
    assert(r(("g1", "changed")) == ((1L, 2L)))
    assert(r(("g2", "removed")) == ((1L, 3L)))
    assert(r(("g2", "added")) == ((1L, 4L)))
    // doc 5 changed AND moved g1 -> g2: reported under its current home
    assert(r(("g2", "changed")) == ((1L, 5L)))
    assert(r.size == 5)
  }

  test("rrfFuse: hand-computed integer fusion, overlap outranks single-tier hits") {
    // tier A ranks (x,1),(y,2); tier B ranks (y,1),(z,2)
    // y: 10^9//62 + 10^9//61 = 16129032 + 16393442 = 32522474 (2 lists)
    // x: 10^9//61 = 16393442;  z: 10^9//62 = 16129032
    val rankings = Seq(
      (1L, "x", 1), (1L, "y", 2), (1L, "y", 1), (1L, "z", 2)
    ).toDF("q_id", "id", "rank")
    val got = graft.operators.Similarity
      .rrfFuse(rankings, "q_id", "id", "rank", topK = 10)
      .orderBy("fused_rank")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(got.toSeq == Seq(("y", 32522474L, 2L, 1), ("x", 16393442L, 1L, 2),
      ("z", 16129032L, 1L, 3)), s"got ${got.toSeq}")
  }

  test("hardNegatives: only different-label vectors rank; order by cosine") {
    // query 0 (label 0) along axis-1; same-label near-twin must be
    // EXCLUDED even though it is the most similar vector in the corpus
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f), 0),
      (1L, Seq(1f, 0.01f, 0f), 0),  // same label: excluded
      (2L, Seq(1f, 1f, 0f), 1),     // cos ~0.7071
      (3L, Seq(0.9f, 0.1f, 0f), 2), // cos ~0.9939 -> top negative
      (4L, Seq(0f, 1f, 0f), 1)      // cos 0
    ).toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity.hardNegatives(
      rows, rows.where($"vec_id" === 0), "vec_id", "embedding", "label", 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(4)))
    assert(got.toSeq == Seq((3L, 2, 1), (2L, 1, 2), (4L, 1, 3)),
      s"got ${got.toSeq}")
  }

  test("keepersBy: max-score member wins, ties break to min id, losers listed") {
    val labeled = Seq(
      // component 1: clear max score on a non-minimal id
      (1L, 1L, 10L), (2L, 1L, 30L), (3L, 1L, 20L),
      // component 4: score TIE between 4 and 6 -> min id 4 keeps
      (4L, 4L, 50L), (5L, 4L, 10L), (6L, 4L, 50L),
      // singleton
      (9L, 9L, 7L)
    ).toDF("doc_id", "component", "score")
    val r = graft.operators.Dedup.keepersBy(labeled, "doc_id", "score")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(r(2L) == (3L, 2L, "1,3"), s"got $r")   // 2 has max score 30
    assert(r(4L) == (3L, 2L, "5,6"), s"got $r")   // tie 50/50 -> min id 4
    assert(r(9L) == (1L, 0L, ""), s"got $r")      // singleton: no losers
    assert(r.size == 3)
  }

  test("temperatureRepeatFactor: largest stratum keeps 1 copy, integer p is exact") {
    // counts 16 ('big'), 4 ('small'): alpha=0.5 -> p = sqrt(16/4) = 2
    // EXACTLY, so the fractional flag never fires — every small-stratum
    // doc gets exactly 2 copies, every big-stratum doc exactly 1
    val df = ((1 to 16).map(i => (i.toLong, "big")) ++
      (101 to 104).map(i => (i.toLong, "small"))).toDF("id", "lang")
    val r = TextOps.temperatureRepeatFactor(df, "id", "lang")
      .groupBy("lang").agg(
        min("__copies").as("lo"), max("__copies").as("hi"),
        sum("__copies").as("total"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("big") == (1L, 1L, 16L), s"got $r")
    assert(r("small") == (2L, 2L, 8L), s"got $r")
    // fractional p: counts 9 vs 4 -> p = 1.5 -> copies in {1, 2} with a
    // deterministic hash flag; E[total] = 6, and determinism means the
    // SAME total every run (pin the observed value's bounds, not the RNG)
    val df2 = ((1 to 9).map(i => (i.toLong, "big")) ++
      (101 to 104).map(i => (i.toLong, "small"))).toDF("id", "lang")
    val copies = TextOps.temperatureRepeatFactor(df2, "id", "lang")
      .where(col("lang") === "small").select("__copies")
      .collect().map(_.getLong(0)).toSeq
    assert(copies.forall(c => c == 1L || c == 2L), s"got $copies")
    val rerun = TextOps.temperatureRepeatFactor(df2, "id", "lang")
      .where(col("lang") === "small").select("__copies")
      .collect().map(_.getLong(0)).toSeq
    assert(copies == rerun, "flag must be deterministic across runs")
  }

  test("WAV decode: hand-authored RIFF bytes, negative samples, chunk walk, rejects") {
    import graft.operators.Multimodal
    // hand-checked mono PCM: samples 1000, -1000, 32767, -32768
    val pcm = Array[Byte](
      0xE8.toByte, 0x03, // 1000
      0x18, 0xFC.toByte, // -1000
      0xFF.toByte, 0x7F, // 32767
      0x00, 0x80.toByte) // -32768
    val wav = Multimodal.encodeWav(8000, 1, pcm)
    val got = Multimodal.wavDecodeBytes(wav).get
    assert(got.sample_rate == 8000 && got.channels == 1 && got.n_frames == 4)
    assert(got.pcm.toSeq == pcm.toSeq)
    // mean over (1000, -1000, 32767, -32768) = -0.25
    assert(got.mean_amp == -0.25, s"got ${got.mean_amp}")
    // a LIST chunk between fmt and data must be walked over, not rejected
    val withList = {
      val list = "LIST".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
      val (head, tail) = wav.splitAt(36) // before the data chunk
      val out = head ++ list ++ tail.drop(0)
      // fix the RIFF size (offset 4): total - 8
      val t = out.clone()
      val sz = t.length - 8
      t(4) = sz.toByte; t(5) = (sz >> 8).toByte
      t(6) = (sz >> 16).toByte; t(7) = (sz >> 24).toByte
      t
    }
    assert(Multimodal.wavDecodeBytes(withList).exists(_.pcm.toSeq == pcm.toSeq),
      "chunk walk must skip LIST and find data")
    // reject matrix: bad magic, non-PCM audioFormat, 8-bit samples,
    // truncated data declaration, stereo frame misalignment
    def mut(o: Int, v: Int): Array[Byte] = {
      val t = wav.clone(); t(o) = v.toByte; t }
    assert(Multimodal.wavDecodeBytes("XIFF".getBytes ++ wav.drop(4)).isEmpty)
    assert(Multimodal.wavDecodeBytes(mut(20, 3)).isEmpty)  // IEEE float fmt
    assert(Multimodal.wavDecodeBytes(mut(34, 8)).isEmpty)  // 8-bit
    assert(Multimodal.wavDecodeBytes(mut(40, 99)).isEmpty) // data len > avail
    assert(Multimodal.wavDecodeBytes(mut(22, 3)).isEmpty)  // 8 B % (2*3ch) != 0
    // the Spark seam drops garbage and keeps good rows
    val rows = Seq(1L -> wav, 2L -> "not audio".getBytes("US-ASCII"))
      .toDF("doc_id", "payload")
    val decoded = Multimodal.decodeWav(rows, "doc_id").collect()
    assert(decoded.length == 1 && decoded.head.getLong(0) == 1L)
    // features from the DECODED samples: all three sign transitions
    // count as strict crossings, peak is |−32768|, rms matches the
    // hand-summed squares
    val f = Multimodal.wavFeatures(Multimodal.decodeWav(rows, "doc_id"))
      .head()
    assert(f.getLong(1) == 4 && f.getLong(3) == 3 && f.getInt(4) == 32768,
      s"got $f")
    val sumSq = 1000L * 1000 * 2 + 32767L * 32767 + 32768L * 32768
    assert(f.getDouble(2) == math.sqrt(sumSq.toDouble / 4), s"got $f")
  }

  test("resizePlane: hand-checked 2x2 block floor-averages, crop, drop") {
    import graft.operators.Multimodal
    // 4x2 plane; channel c of output pixel (x2=0) averages the 2x2 block
    // rows: pixel (x, y) channel values = 10*(y*4+x) + c
    val px = Array.tabulate(4 * 2 * 3) { i =>
      val pix = i / 3; val c = i % 3; (10 * pix + c).toByte
    }
    def ppm(w: Int, h: Int, p: Array[Byte]) =
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ p
    val rows = Seq(
      1L -> ppm(4, 2, px),
      // 5x3 with f=2: crops to 2x1 (x=4 column and y=2 row dropped)
      2L -> ppm(5, 3, Array.tabulate(5 * 3 * 3)(i => (i % 120).toByte)),
      // 1x1 with f=2: no full block -> dropped
      3L -> ppm(1, 1, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizePlane(
        Multimodal.decodePpm(rows, "doc_id"), 2)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).toSeq)).toMap
    assert(out.keySet == Set(1L, 2L))
    val (w1, h1, p1) = out(1L)
    assert(w1 == 2 && h1 == 1)
    // block for out pixel 0: input pixels 0,1,4,5 -> channel c average
    // = (0 + 10 + 40 + 50)/4 + c = 25 + c; out pixel 1: pixels 2,3,6,7
    // -> (20+30+60+70)/4 + c = 45 + c
    assert(p1 == Seq(25, 26, 27, 45, 46, 47).map(_.toByte), s"got $p1")
    assert(out(2L)._1 == 2 && out(2L)._2 == 1)
    // factor 1 is the identity
    val id1 = Multimodal.resizePlane(
        Multimodal.decodePpm(Seq(1L -> ppm(4, 2, px)).toDF("doc_id", "payload"),
          "doc_id"), 1)
      .head().getAs[Array[Byte]](3)
    assert(id1.toSeq == px.toSeq)
  }

  test("append-form operators refuse to clobber existing columns") {
    val df = Seq((1L, "x", 1)).toDF("id", "bucket", "v")
    val e = intercept[IllegalArgumentException](
      TextOps.withHashSplit(df, "id"))
    assert(e.getMessage.contains("bucket"))
    val df2 = Seq((1L, "x", 1)).toDF("id", "rank", "v")
    intercept[IllegalArgumentException](
      TextOps.groupQuota(df2, "id", "v", col("v"), 1))
  }

  test("editVerifiedPairs: hand-checked distances, length-gap prune, threshold") {
    val corpus = Seq(
      (1L, "abcdefghij"),            // len 10
      (2L, "abcdefghix"),            // dist 1 from doc 1 -> sim 0.9
      (3L, "abcdefghij"),            // identical to doc 1 -> sim 1.0
      (4L, "abcdefghij" * 3),        // len 30: gap 20 > 0.2*30 -> pruned
      (5L, "zyxwvutsrq")             // len 10 but dist 10 -> sim 0.0
    ).toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("a", "b")
    val r = Dedup.editVerifiedPairs(corpus, cands, "text", "doc_id", 0.8)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getDouble(3))).toMap
    assert(r((1L, 2L)) == (1L, 0.9), s"got $r")
    assert(r((1L, 3L)) == (0L, 1.0), s"got $r")
    assert(r.size == 2, s"(1,4) must be length-pruned and (1,5) sub-threshold: $r")
    // boundary: dist 2 on len 10 = sim 0.8 is KEPT (filter is >=)
    val edge = Dedup.editVerifiedPairs(
      Seq((1L, "abcdefghij"), (2L, "abcdefghxy")).toDF("doc_id", "text"),
      Seq((1L, 2L)).toDF("a", "b"), "text", "doc_id", 0.8).collect()
    assert(edge.length == 1 && edge.head.getDouble(3) == 0.8)
  }

  test("unigramXent: hand-computed corpus cross-entropy") {
    // counts: a=2, b=2, c=1, T=5
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = TextOps.unigramXent(df, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // d1: 3 tokens, each with c=2 -> xent = ln(5/2) = 0.9163
    assert(r(1L) == (3L, 0.9163), s"got $r")
    // d2: (ln(5/2) + ln(5/1)) / 2 = 1.2629
    assert(r(2L) == (2L, 1.2629), s"got $r")
  }

  test("unigramXentAgainst: frozen model, OOV backoff, self-scored equivalence") {
    // model: "a a b" -> a=2, b=1, T=3
    val model = TextOps.unigramModel(Seq((1L, "a a b")).toDF("doc_id", "text"), "text")
    // score "a c": a in-vocab (c=2), c OOV -> count 1
    // xent = (ln(3/2) + ln(3/1)) / 2 = 0.7520
    val r = TextOps.unigramXentAgainst(
        Seq((10L, "a c")).toDF("doc_id", "text"), model, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(10L) == (2L, 0.7520), s"got $r")
    // scoring a corpus against its OWN model == the self-scored form
    val corpus = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val self = TextOps.unigramXent(corpus, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    val frozen = TextOps.unigramXentAgainst(corpus,
        TextOps.unigramModel(corpus, "text"), "text", "doc_id")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(self == frozen, s"self $self vs frozen $frozen")
  }

  test("repeatedSpans: overlap and adjacency merge, within-doc repeats, report, strip") {
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "a b c d e"),   // "a b","b c","c d" all shared -> one span [0,3]
      (2L, "x b c d y"),   // dup "b c","c d" only -> span [1,3]
      (3L, "p q"),          // no duplicated windows
      (4L, "z z z"),        // within-doc repeat of "z z" -> whole doc [0,2]
      (5L, "a b c d"),      // all three windows dup -> one span [0,3]
      (6L, "a b x c d")     // dup at pos 0 and pos 3: two separate spans
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(corpus, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(spans == Set(
      (1L, 0, 3, 3L), (2L, 1, 3, 2L), (4L, 0, 2, 2L), (5L, 0, 3, 3L),
      (6L, 0, 1, 1L), (6L, 3, 4, 1L)),    // gap at token 2 keeps them apart
      s"got $spans")
    val rep = Dedup.repeatedSpanReport(corpus, "text", "doc_id", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rep(1L) == (5L, 3L, 1L, 0.8), s"got ${rep(1L)}")
    assert(rep(3L) == (2L, 0L, 0L, 0.0), s"got ${rep(3L)}")
    assert(rep(4L) == (3L, 2L, 1L, 1.0), s"got ${rep(4L)}")
    assert(rep(6L) == (5L, 2L, 2L, 0.8), s"got ${rep(6L)}")
    val stripped = Dedup.stripRepeatedSpans(corpus, "text", "doc_id", 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stripped(3L) == "p q", "span-free doc must come back unchanged")
    assert(stripped(5L) == "", "entirely-duplicated doc strips to empty")
    assert(stripped(6L) == "x", s"got '${stripped(6L)}'")
    assert(stripped(1L) == "e", s"got '${stripped(1L)}'")
  }

  test("sq8Quantize: floor(x+0.5) convention, zero vector, int8 recall") {
    val v = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.sq8Quantize(v, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getSeq[Int](3))).toMap
    // scale 127; -0.5*127 + 0.5 = -63.0 -> floor -63 (half rounds UP,
    // the convention both engines replay); 0.25*127 + 0.5 = 32.25 -> 32
    assert(q(1L)._1 == 127.0 && q(1L)._2 == Seq(127, -63, 32, 0), s"got $q")
    assert(q(2L)._1 == 0.0 && q(2L)._2 == Seq(0, 0, 0, 0), s"got $q")

    // quantization keeps ranking: top-5 by int8 cosine vs float cosine
    // on a seeded random corpus — recall@5 >= 4/5
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    def top5(scored: org.apache.spark.sql.DataFrame): Seq[Long] =
      scored.orderBy(col("cos").desc, col("vec_id"))
        .limit(6).collect().map(_.getLong(0)).toSeq.filter(_ != 0L).take(5)
    val floatTop = top5(vecs.crossJoin(
        broadcast(vecs.where(col("vec_id") === 0).select(col("embedding").as("qe"))))
      .select(col("vec_id"), Similarity.cosine(
        col("embedding").cast("array<double>"), col("qe").cast("array<double>")).as("cos")))
    val codes = Similarity.sq8Quantize(vecs, "vec_id", "embedding")
      .select(col("vec_id"), col("sq_code"))
    val intTop = top5(codes.crossJoin(
        broadcast(codes.where(col("vec_id") === 0).select(col("sq_code").as("qc"))))
      .select(col("vec_id"), Similarity.cosine(
        col("sq_code").cast("array<double>"), col("qc").cast("array<double>")).as("cos")))
    assert(floatTop.toSet.intersect(intTop.toSet).size >= 4,
      s"float $floatTop vs int8 $intTop")
  }

  test("Jsonl round-trip: nulls, escapes, and unicode survive; FAILFAST rejects garbage") {
    import graft.sources.Jsonl
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_test").toString
    val df = Seq(
      (1L, "plain text", "en"),
      (2L, "quotes \" backslash \\ tab\tnewline\nend", "en"),
      (3L, null.asInstanceOf[String], "de"),
      (4L, "unicode é中😀", "fr")
    ).toDF("doc_id", "text", "lang")
    Jsonl.write(df, s"$dir/docs")
    val back = Jsonl.read(spark, s"$dir/docs", df.schema)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(back(1L) == ("plain text", "en"))
    assert(back(2L) == ("quotes \" backslash \\ tab\tnewline\nend", "en"))
    assert(back(3L) == (null, "de"), "omitted null field must read back as NULL")
    assert(back(4L) == ("unicode é中😀", "fr"))
    assert(back.size == 4)
    // a corrupt line: PERMISSIVE yields an all-null row, FAILFAST throws
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.json"),
      "{\"doc_id\": 1, \"text\": \"ok\"}\nnot json at all\n".getBytes("UTF-8"))
    val perm = Jsonl.read(spark, s"$dir/bad.json", df.schema).collect()
    assert(perm.length == 2 && perm.count(_.isNullAt(0)) == 1)
    intercept[org.apache.spark.SparkException] {
      Jsonl.read(spark, s"$dir/bad.json", df.schema, failFast = true).collect()
    }
  }

  test("PQ: seeded books, encode argmin with ties to smallest code, ADC exact") {
    // m=2 subspaces x dsub=2 dims, ksub=2, iters=0: the codebooks are
    // vectors 0 and 1's subvectors verbatim — every assignment is
    // hand-checkable
    val corpus = Seq(
      (0L, Array(0.0f, 0.0f, 10.0f, 10.0f)),
      (1L, Array(4.0f, 4.0f, 0.0f, 0.0f)),
      (2L, Array(0.5f, 0.5f, 0.2f, 0.0f)),
      (3L, Array(2.0f, 2.0f, 5.0f, 5.0f)) // both subspaces equidistant
    ).toDF("vec_id", "embedding")
    val cb = Similarity.pqCollect(
      Similarity.pqTrain(corpus, "vec_id", "embedding",
        m = 2, dsub = 2, ksub = 2, iters = 0), m = 2, dsub = 2, ksub = 2)
    val enc = Similarity.pqEncode(corpus, "vec_id", "embedding", cb)
    val codes = enc.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(codes(0L) == List(0, 0) && codes(1L) == List(1, 1), s"got $codes")
    assert(codes(2L) == List(0, 1), s"got $codes")
    assert(codes(3L) == List(0, 0), s"ties must take the smallest code: $codes")

    // ADC distance on the Spark side == m lookups into the same table
    // replayed driver-side
    val q = Array(0.5, 0.5, 0.2, 0.0)
    val dt = cb.distTable(q)
    val adc = enc.select(col("vec_id"),
        Similarity.pqAdcDistance(col("pq_code"), cb, q).as("adist"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    codes.foreach { case (id, cs) =>
      val want = cs.zipWithIndex.map { case (c, s) => dt(s)(c) }.sum
      assert(math.abs(adc(id) - want) < 1e-9, s"vec $id: ${adc(id)} vs $want")
    }
  }

  test("DSIR: hand-computed log-ratio weights; target-like docs outrank pool-like docs") {
    // raw pool: doc 1 is target-like ('a a b'), doc 2 is not ('c c d');
    // target corpus: 'a b a' twice -> counts a=4, b=2, total 6
    val raw = Seq((1L, "a a b"), (2L, "c c d")).toDF("doc_id", "text")
    val tgt = Seq((10L, "a b a"), (11L, "a b a")).toDF("doc_id", "text")
    val got = TextOps.dsirWeights(raw, tgt, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // raw counts over the pool: a=2, b=1, c=2, d=1, total 6
    def w(tf: Map[String, Long], tc: Map[String, Long], rc: Map[String, Long]) =
      BigDecimal(tf.map { case (t, n) =>
        n * (math.log(tc.getOrElse(t, 1L).toDouble / 6.0)
          - math.log(rc(t).toDouble / 6.0))
      }.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tc = Map("a" -> 4L, "b" -> 2L)
    val rc = Map("a" -> 2L, "b" -> 1L, "c" -> 2L, "d" -> 1L)
    assert(got(1L)._1 == 3L && got(2L)._1 == 3L)
    assert(got(1L)._2 == w(Map("a" -> 2L, "b" -> 1L), tc, rc), got.toString)
    assert(got(2L)._2 == w(Map("c" -> 2L, "d" -> 1L), tc, rc), got.toString)
    // the target-like doc must carry the higher importance weight
    assert(got(1L)._2 > got(2L)._2)
  }

  test("weightedSample: A-ES keys replay from md5, heavier rows win more often") {
    // expected key for one row, computed independently of the operator
    def key(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"97:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / math.pow(2, 60)
      BigDecimal(-math.log(u) / w).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rows = (1L to 200L).map(i => (i, if (i <= 100) 1000.0 else 1.0))
    val df = rows.toDF("doc_id", "wt")
    val got = TextOps.weightedSample(df, "doc_id", col("wt"), k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // keys match the independent md5 replay exactly
    got.foreach { case (id, w, k) =>
      assert(k == key(id, w), s"doc $id: $k vs ${key(id, w)}")
    }
    // the sample is the global 20 smallest keys
    val wantTop = rows.map { case (i, w) => (key(i, w), i) }.sorted.take(20)
      .map(_._2).toSet
    assert(got.map(_._1).toSet == wantTop)
    // 1000x-weighted rows should dominate the sample
    val heavy = got.count(_._1 <= 100)
    assert(heavy >= 18, s"only $heavy/20 heavy rows sampled")
  }

  test("topNgramCharFraction: hand-checked counts, deterministic tie-break, short-doc drop") {
    val fx = Seq(
      (1L, "a b a b c"),    // "a b" x2 -> 2*3/9
      (2L, "x y z"),        // all grams count 1 -> tie -> "y z" (lex max)
      (3L, "w"),            // shorter than n: dropped
      (4L, "s s s s")       // "s s" x3 overlapping -> 3*3/7
    ).toDF("doc_id", "text")
    val got = TextOps.topNgramCharFraction(fx, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getDouble(3))).toMap
    assert(!got.contains(3L))
    assert(got(1L) == ("a b", 2, BigDecimal(6.0 / 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble), got.toString)
    assert(got(2L) == ("y z", 1, 0.6), got.toString)
    assert(got(4L) == ("s s", 3, BigDecimal(9.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble), got.toString)
  }

  test("contaminatedSpans: cross-set hits merge to maximal spans; clean docs report zero") {
    // w=4; eval holds "a b c d e" (windows: 'a b c d', 'b c d e')
    val evalSet = Seq((1000L, "a b c d e")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x a b c d e y z"),      // overlapping hits at pos 1,2 -> one span 1..5
      (2L, "p q r s t u v w"),      // clean
      (3L, "a b c d q q a b c d e") // two disjoint spans: 0..3 and 6..10
    ).toDF("doc_id", "text")
    val spans = Dedup.contaminatedSpans(corpus, evalSet, "text", "doc_id", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(spans == Set((1L, 1, 5, 2L), (3L, 0, 3, 1L), (3L, 6, 10, 2L)),
      spans.toString)
    val rep = Dedup.contaminationSpanReport(corpus, evalSet, "text", "doc_id", 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rep(1L) == ((8L, 2L, 1L, BigDecimal(5.0 / 8)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)), rep.toString)
    assert(rep(2L) == ((8L, 0L, 0L, 0.0)), rep.toString)
    assert(rep(3L) == ((11L, 3L, 2L, BigDecimal(9.0 / 11)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)), rep.toString)
  }

  test("BM25: hand-computed idf/length-norm; rarer terms and shorter docs score higher") {
    val fx = Seq(
      (1L, "spark spark query"),      // tf(spark)=2, len 3
      (2L, "spark table row value"),  // tf(spark)=1, len 4
      (3L, "merge sort join"),        // tf(merge)=1, len 3
      (4L, "alpha beta gamma delta")  // no hits -> absent
    ).toDF("doc_id", "text")
    val got = TextOps.bm25(fx, "text", "doc_id", Seq("spark", "merge"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!got.contains(4L))
    // independent replay: N=4, avgLen=3.5; df(spark)=2, df(merge)=1
    def idf(dfc: Double) = math.log(1 + (4.0 - dfc + 0.5) / (dfc + 0.5))
    def s(tf: Double, dl: Double, dfc: Double) =
      idf(dfc) * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.5))
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((1L, r4(s(2, 3, 2)))), got.toString)
    assert(got(2L) == ((1L, r4(s(1, 4, 2)))), got.toString)
    assert(got(3L) == ((1L, r4(s(1, 3, 1)))), got.toString)
    // the rarer term (merge, df=1) outscores the common one at equal tf/len
    assert(got(3L)._2 > got(2L)._2 && got(3L)._2 > 0)
  }

  test("weightedSamplePerStratum: per-stratum quotas, keys match the global sampler") {
    val rows = (1L to 60L).map(i => (i, if (i % 2 == 0) "a" else "b", 10.0 + i))
    val df = rows.toDF("doc_id", "lang", "wt")
    val got = TextOps.weightedSamplePerStratum(df, "doc_id", "lang",
        col("wt"), kPerStratum = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getInt(4)))
    assert(got.count(_._2 == "a") == 5 && got.count(_._2 == "b") == 5)
    // within each stratum the kept keys are that stratum's 5 smallest,
    // cross-checked against the global sampler restricted to the stratum
    Seq("a", "b").foreach { lang =>
      val want = TextOps.weightedSample(df.where(col("lang") === lang),
          "doc_id", col("wt"), k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toList
      val mine = got.filter(_._2 == lang).sortBy(_._4).map(t => (t._1, t._3)).toList
      assert(mine == want, s"$lang: $mine vs $want")
    }
  }

  test("curriculumBuckets: quartile thresholds split a known distribution; monotone in score") {
    // scores 1..100: quartile thresholds 25.75/50.5/75.25 -> 25 each
    // (score > t semantics on exact interpolated thresholds)
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("doc_id", "s")
    val got = TextOps.curriculumBuckets(df, "doc_id", "s", nBuckets = 4)
      .collect().map(r => r.getDouble(1) -> r.getInt(2)).sortBy(_._1)
    assert((1 to 4).forall(b => got.count(_._2 == b) == 25), got.toString)
    // monotone: a higher score never lands in a lower bucket
    got.sliding(2).foreach { case Array((_, b1), (_, b2)) =>
      assert(b1 <= b2)
    }
  }

  test("Gopher rules: every rule fires on its crafted violator") {
    val good = ("the quick brown fox jumps over with lazy dogs today " * 6).trim
    val fx = Seq(
      (1L, good),                                  // 60 words, clean prose
      (2L, "the end with"),                        // word-count floor
      (3L, "a # b ... c"),                         // symbols
      (4L, "- one\n- two\n* three\n• four\nplain"), // 4/5 bullet lines
      (5L, "first...\nsecond...\nthird"),          // 2/3 ellipsis lines
      (6L, "aa bb cc"),                            // mean word length 2.0
      (7L, "123 456 7 8 abc"),                     // alpha ratio 0.2
      (8L, "the of and extra words")               // 3 required stopwords
    ).toDF("doc_id", "text")
    val g = TextOps.gopherFlags(fx, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(g(1L).getAs[Boolean]("keep"), s"good doc must keep: ${g(1L)}")
    assert(g(1L).getAs[Int]("n_words") == 60)
    assert(!g(2L).getAs[Boolean]("keep") && g(2L).getAs[Int]("stop_hits") == 2)
    assert(g(3L).getAs[Double]("symbol_ratio") == 0.4, g(3L).toString) // (1+1)/5
    assert(g(4L).getAs[Double]("bullet_ratio") == 0.8, g(4L).toString)
    assert(g(5L).getAs[Double]("ellipsis_ratio") == 0.6667, g(5L).toString)
    assert(g(6L).getAs[Double]("mean_word_len") == 2.0)
    assert(g(7L).getAs[Double]("alpha_ratio") == 0.2, g(7L).toString)
    assert(g(8L).getAs[Int]("stop_hits") == 3)
  }

  test("IVF-PQ: nprobe=k search equals the full ADC-dot ranking; pruning drops only unprobed cells") {
    // 4 tight clusters x 8 members in 8 dims; m=2/dsub=4/ksub=4
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextDouble() * 10 - 5))
    val vecs = (0L until 32L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqCollect(
      Similarity.pqTrain(vecs, "vec_id", "embedding",
        m = 2, dsub = 4, ksub = 4, iters = 2), m = 2, dsub = 4, ksub = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val idx = Similarity.ivfPqBuild(spark, vecs, "vec_id", "embedding",
      k = 4, cb = cb, path = dir)
    val qv = vecs.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    // probing ALL cells = the unpruned ADC-cosine ranking over the corpus
    val all = Similarity.ivfPqSearch(idx, cb, qv, nprobe = 4, topK = 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val dt = cb.dotTable(qv)
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val norms = vecs.select(col("vec_id"),
        Similarity.l2sq(col("embedding").cast("array<double>"),
          array((0 until 8).map(_ => lit(0.0)): _*)).as("n2"))
      .collect().map(r => r.getLong(0) -> math.sqrt(r.getDouble(1))).toMap
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val want = codes.map { case (id, cs) =>
      id -> BigDecimal(cs.zipWithIndex.map { case (c, s) => dt(s)(c) }.sum
        / norms(id) / qn).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    all.foreach { case (id, acos) =>
      assert(math.abs(acos - want(id)) <= 1e-4, s"vec $id: $acos vs ${want(id)}")
    }
    // nprobe=1 returns only the query's own cell — a strict subset, led
    // by the same best hit
    val pruned = Similarity.ivfPqSearch(idx, cb, qv, nprobe = 1, topK = 32)
      .collect().map(_.getLong(0)).toSet
    assert(pruned.subsetOf(all.map(_._1).toSet) && pruned.size < 32)
    assert(pruned.contains(all.maxBy(_._2)._1),
      s"best overall hit must live in the probed cell: $pruned")
  }

  test("IVF-PQ append: new vectors searchable without retraining; batch retry no-ops; rebuild clears marker") {
    val rnd = new scala.util.Random(31)
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextDouble() * 10 - 5))
    val base = (0L until 32L).map { i =>
      (i, centers((i % 4).toInt).map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }
    val vecs = base.toDF("vec_id", "embedding")
    val cb = Similarity.pqCollect(
      Similarity.pqTrain(vecs, "vec_id", "embedding",
        m = 2, dsub = 4, ksub = 4, iters = 1), m = 2, dsub = 4, ksub = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_app").toString
    val idx = Similarity.ivfPqBuild(spark, vecs, "vec_id", "embedding",
      k = 4, cb = cb, path = dir)
    // a new vector near cluster 1's center, appended via the guarded path
    val nv = Seq((100L, centers(1).map(x => (x + 0.05).toFloat)))
      .toDF("vec_id", "embedding")
    assert(Similarity.ivfPqAppendBatch(idx, cb, nv, "embedding", batchId = 0L))
    // the retry must not double-append
    assert(!Similarity.ivfPqAppendBatch(idx, cb, nv, "embedding", batchId = 0L))
    assert(idx.corpus.where(col("vec_id") === 100L).count() == 1)
    // the appended vector is retrieved by a query at cluster 1's center
    val hits = Similarity.ivfPqSearch(idx, cb,
        centers(1), nprobe = 1, topK = 5)
      .collect().map(_.getLong(0)).toSet
    assert(hits.contains(100L), s"appended vector not retrieved: $hits")
    // a rebuild resets the marker: batch 0 applies again afterwards
    Similarity.ivfPqBuild(spark, vecs, "vec_id", "embedding",
      k = 4, cb = cb, path = dir)
    assert(Similarity.ivfPqAppendBatch(idx, cb, nv, "embedding", batchId = 0L))
  }

  test("IVF-PQ compact + drift: appends fragment, compaction bounds files with identical results, drift flags a shifted ingest") {
    val rnd = new scala.util.Random(61)
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextDouble() * 10 - 5))
    def mk(ids: Range, shift: Double) = ids.map { i =>
      (i.toLong, centers(i % 4).map(x => (x + shift + rnd.nextGaussian() * 0.1).toFloat))
    }
    val vecs = mk(0 until 32, 0.0).toDF("vec_id", "embedding")
    val cb = Similarity.pqCollect(
      Similarity.pqTrain(vecs, "vec_id", "embedding",
        m = 2, dsub = 4, ksub = 4, iters = 1), m = 2, dsub = 4, ksub = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_cmp").toString
    val idx = Similarity.ivfPqBuild(spark, vecs, "vec_id", "embedding",
      k = 4, cb = cb, path = dir)
    (0 until 5).foreach { b =>
      Similarity.ivfPqAppend(idx, cb,
        mk((100 + b * 4) until (104 + b * 4), 0.0).toDF("vec_id", "embedding"),
        "embedding")
    }
    val fragmented = Similarity.ivfPqCellFiles(idx).values.max
    assert(fragmented > 1, s"appends should fragment: $fragmented")
    val before = Similarity.ivfPqSearch(idx, cb, centers(1), nprobe = 4,
      topK = 20).collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val maxFiles = Similarity.ivfPqCompact(idx, targetRecordsPerFile = 1000)
    assert(maxFiles == 1, s"52 rows at 1000/file must compact to 1: $maxFiles")
    val after = Similarity.ivfPqSearch(idx, cb, centers(1), nprobe = 4,
      topK = 20).collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(after == before, "compaction must not change search results")
    // drift on the faithful source reads ~0; a shifted ingest reads high
    val calm = Similarity.ivfPqDrift(idx, vecs, "embedding", 1.0)
      .agg(max("drift")).head().getDouble(0)
    val shifted = Similarity.ivfPqDrift(idx,
        mk(0 until 32, 3.0).toDF("vec_id", "embedding"), "embedding", 1.0)
      .agg(max("drift")).head().getDouble(0)
    assert(calm < 0.01, s"un-drifted corpus must read ~0: $calm")
    assert(shifted > 10 * math.max(calm, 1e-6),
      s"shifted ingest must separate: $shifted vs $calm")
  }

  test("bandIndexCompact: fewer files, identical candidates, verify stays green") {
    import graft.operators.Dedup
    val mkDocs = (off: Int) => (0 until 8).map(i =>
      ((off + i).toLong, s"$base token$i extra words here")).toDF("doc_id", "text")
    def banded(df: org.apache.spark.sql.DataFrame) =
      Dedup.lshBands(Dedup.minHash(
        Dedup.shingles(df, "text", "doc_id", 2), "doc_id", 8), "doc_id", 8, 4)
    val dir = java.nio.file.Files.createTempDirectory("bandcmp").toString
    Dedup.bandIndexWrite(banded(mkDocs(0)), "doc_id", 4, dir, maxBucket = 100)
    (1 to 4).foreach(b => Dedup.bandIndexWrite(banded(mkDocs(b * 10)),
      "doc_id", 4, dir, maxBucket = 100, append = true))
    val probe = banded(Seq((999L, base)).toDF("doc_id", "text"))
    val before = Dedup.incrementalPairs(
        Dedup.bandIndexRead(spark, dir), probe, "doc_id", 4)
      .collect().map(_.toSeq).toSet
    val files = Dedup.bandIndexCompact(spark, dir, targetRecordsPerFile = 100000)
    assert(files >= 1 && files <= 4, s"compacted file count: $files")
    val after = Dedup.incrementalPairs(
        Dedup.bandIndexRead(spark, dir), probe, "doc_id", 4)
      .collect().map(_.toSeq).toSet
    assert(after == before, "compaction must not change candidates")
    assert(Dedup.bandIndexVerify(spark, dir, maxBucket = 100).isEmpty,
      "verify must stay green after compaction")
  }

  test("IVF-PQ batch: one pruned scan equals the single-query loop, query by query") {
    val rnd = new scala.util.Random(41)
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextDouble() * 10 - 5))
    val vecs = (0L until 40L).map { i =>
      (i, centers((i % 4).toInt).map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqCollect(
      Similarity.pqTrain(vecs, "vec_id", "embedding",
        m = 2, dsub = 4, ksub = 4, iters = 1), m = 2, dsub = 4, ksub = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_b").toString
    val idx = Similarity.ivfPqBuild(spark, vecs, "vec_id", "embedding",
      k = 4, cb = cb, path = dir)
    val batch = Similarity.ivfPqSearchIndexedBatch(idx, cb,
        vecs.where(col("vec_id") < 3), "embedding", nprobe = 2, topK = 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toList
      }
    (0L until 3L).foreach { qid =>
      val qv = vecs.where(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray
      val single = Similarity.ivfPqSearch(idx, cb, qv, nprobe = 2, topK = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      assert(batch(qid) == single, s"query $qid: ${batch(qid)} vs $single")
    }
  }

  test("PQ re-rank: shortlist=corpus equals exact L2; narrow shortlist stays exact on survivors") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 40L)
      .map(i => (i, Array.fill(8)((rnd.nextDouble() * 4 - 2).toFloat)))
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqCollect(
      Similarity.pqTrain(vecs, "vec_id", "embedding",
        m = 2, dsub = 4, ksub = 4, iters = 1), m = 2, dsub = 4, ksub = 4)
    val qv = vecs.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    // an all-corpus shortlist degenerates to exact L2 top-k
    val exact = vecs.select(col("vec_id"),
        round(Similarity.l2sq(col("embedding").cast("array<double>"),
          array(qv.toIndexedSeq.map(lit): _*)), 4).as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val full = Similarity.pqSearchRerank(vecs, "vec_id", "embedding", cb, qv,
        shortlist = 40, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(full == exact, s"$full vs $exact")
    // a narrow shortlist returns exact distances for whatever survives ADC
    val narrow = Similarity.pqSearchRerank(vecs, "vec_id", "embedding", cb, qv,
        shortlist = 15, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val exactAll = exact.toMap
    narrow.foreach { case (id, d2) =>
      exactAll.get(id).foreach(e => assert(d2 == e, s"vec $id: $d2 vs $e"))
    }
    assert(narrow.contains(0L) && narrow(0L) == 0.0, "self-match must survive")
  }

  test("PQ: trained search recovers the query's cluster (recall vs exact L2)") {
    // 8 tight clusters x 10 members; seeded init picks one vector per
    // cluster (ids 0..7 are clusters 0..7), 2 Lloyd rounds refine. Exact
    // and ADC top-10 must both be the query's own cluster.
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextDouble() * 10 - 5))
    val vecs = (0L until 80L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqCollect(
      Similarity.pqTrain(vecs, "vec_id", "embedding",
        m = 4, dsub = 4, ksub = 8, iters = 2), m = 4, dsub = 4, ksub = 8)
    val qv = vecs.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val pqTop = Similarity.pqSearchAdc(
        Similarity.pqEncode(vecs, "vec_id", "embedding", cb),
        "vec_id", cb, qv, 10)
      .collect().map(_.getLong(0)).toSet
    val exactTop = vecs.select(col("vec_id"),
        Similarity.l2sq(col("embedding").cast("array<double>"),
          array(qv.map(lit).toIndexedSeq: _*)).as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    assert(exactTop == (0L until 80L by 8).toSet, s"exact top-10 $exactTop")
    assert(pqTop.intersect(exactTop).size >= 8,
      s"recall@10 too low: pq $pqTop vs exact $exactTop")
  }

  test("SemDeDup: within-cell groups close transitively, lowest-centroid-cosine kept, cross-cell dups missed by design") {
    val cents = Seq(0L -> Seq(1.0, 0.0, 0.0, 0.0), 1L -> Seq(0.0, 1.0, 0.0, 0.0))
    val vecs = Seq(
      (10L, Array(1.00, 0.05, 0.0, 0.0)), // cell 0, dup group {10,11,15}
      (11L, Array(0.99, 0.08, 0.0, 0.0)), //   lowest cent_cos -> the keeper
      (15L, Array(1.00, 0.02, 0.0, 0.0)),
      (12L, Array(0.90, 0.40, 0.0, 0.0)), // cell 0 singleton (cos to 10 ~ .92 < tau)
      (13L, Array(0.05, 1.00, 0.0, 0.0)), // cell 1 pair {13,14}: 14 = 2*13, so
      (14L, Array(0.10, 2.00, 0.0, 0.0)), //   cent_cos ties EXACTLY -> id 13 kept
      (16L, Array(0.72, 0.69, 0.0, 0.0)), // cell 0 \ cos(16,17) ~ .999 but split
      (17L, Array(0.69, 0.72, 0.0, 0.0))  // cell 1 / across cells: NOT deduped
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding", cents, tau = 0.99)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getBoolean(4)))).toMap
    // transitive group {10,11,15} in cell 0: one component, keeper = 11
    assert(Set(10L, 11L, 15L).map(out(_)._2).size == 1)
    assert(!out(10L)._3 && out(11L)._3 && !out(15L)._3,
      s"keeper must be the lowest-cent_cos member: $out")
    // {13,14} tie on rounded cent_cos -> smaller id kept
    assert(out(13L)._2 == out(14L)._2 && out(13L)._3 && !out(14L)._3)
    // singleton keeps itself
    assert(out(12L)._3 && out(12L)._2 == 12L)
    // the published approximation: near-identical vectors assigned to
    // different cells never pair
    assert(out(16L)._1 == 0L && out(17L)._1 == 1L)
    assert(out(16L)._2 != out(17L)._2 && out(16L)._3 && out(17L)._3)
  }

  test("hashedLogisticScore: hand-computed integer logit, per-occurrence weights, integer keep boundary") {
    // independent bucket recomputation straight from md5 (the portable
    // hash contract), not through TextOps
    def bucket(w: String, seed: Int, d: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$seed:$w".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      (BigInt(hex, 16) % d).toInt
    }
    val wts = Seq(5, -7, 11, 13)
    val in = Seq((1L, "aa bb aa"), (2L, "zz"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextOps.hashedLogisticScore(in, "text", "doc_id", wts,
        biasMilli = 100L, seed = 97)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    val exp1 = 100L + 2L * wts(bucket("aa", 97, 4)) + wts(bucket("bb", 97, 4))
    assert(out(1L) == ((3L, exp1, exp1 >= 0)), s"got ${out(1L)}, want logit $exp1")
    val exp2 = 100L + wts(bucket("zz", 97, 4))
    assert(out(2L) == ((1L, exp2, exp2 >= 0)))
    assert(!out.contains(3L), "null text must be dropped")
    // keep flips exactly at logit_milli = 0 (decided in integer space)
    val boundary = TextOps.hashedLogisticScore(
        Seq((9L, "aa")).toDF("doc_id", "text"), "text", "doc_id", wts,
        biasMilli = -wts(bucket("aa", 97, 4)).toLong, seed = 97)
      .head()
    assert(boundary.getLong(2) == 0L && boundary.getBoolean(4) &&
      boundary.getDouble(3) == 0.5)
  }

  test("mixtureAllocation: cap binds on scarce strata, downsample is exact, empty stratum reports shortfall") {
    val in = Seq(
      ("A", "t1 t2 t3 t4 t5"), ("A", "t1 t2 t3 t4 t5"), // 10 tokens
      ("B", "u1 u2 u3 u4"),                             // 4 tokens
      ("D", Seq.fill(100)("w").mkString(" "))           // 100 tokens
    ).toDF("lang", "text")
    val out = TextOps.mixtureAllocation(in, "lang",
        TextOps.tokenCount(col("text")),
        Seq("A" -> 600, "B" -> 300, "D" -> 50, "C" -> 50),
        budgetTokens = 100L, maxEpochsMilli = 1500L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // (available, desired, epochs_milli, allocated, shortfall)
    assert(out("A") == ((10L, 60L, 1500L, 15L, 45L)), s"cap binds: ${out("A")}")
    assert(out("B") == ((4L, 30L, 1500L, 6L, 24L)))
    assert(out("D") == ((100L, 5L, 50L, 5L, 0L)), s"exact downsample: ${out("D")}")
    assert(out("C") == ((0L, 5L, 0L, 0L, 5L)), s"empty stratum: ${out("C")}")
  }

  test("bigramXentAgainst: hand-computed add-one conditionals; unseen bigram/prefix back off; short docs drop") {
    // train: bigrams (a b)x2, (a c)x1 -> c1(a)=3; V={a,b,c}=3
    val train = Seq((10L, "a b"), (11L, "a b"), (12L, "a c"))
      .toDF("doc_id", "text")
    // "a b a d": p(a b)=(2+1)/(3+3)=1/2; p(b a)=(0+1)/(0+3)=1/3 (unseen
    // prefix); p(a d)=(0+1)/(3+3)=1/6 (unseen bigram, seen prefix)
    // xent = (ln2 + ln3 + ln6)/3 = 1.1945
    val score = Seq((1L, "a b a d"), (2L, "q")).toDF("doc_id", "text")
    val out = TextOps.bigramXentAgainst(score, train, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, 1.1945)), s"${out(1L)}")
    assert(!out.contains(2L), "a 1-token doc has no bigram")
  }

  test("oovRate: hand-computed counts; all-known and all-unknown docs hit the boundaries") {
    val in = Seq(
      (1L, "cat dog worm bird"), // vocab {cat,dog}: 2 oov of 4
      (2L, "cat dog dog"),       // 0 oov
      (3L, "worm bird"),         // all oov
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextOps.oovRate(in, "text", "doc_id", Seq("cat", "dog"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 2L, 0.5)), s"${out(1L)}")
    assert(out(2L) == ((3L, 0L, 0.0)), s"${out(2L)}")
    assert(out(3L) == ((2L, 2L, 1.0)), s"${out(3L)}")
    assert(!out.contains(4L), "null text drops")
  }

  test("imageDHash: gradient plane sets every bit, flat plane none; 9x8 grid is exact on a 9x8 image") {
    def plane(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        px((y * w + x) * 3 + c) = f(x, y).toByte
      px
    }
    val in = Seq(
      (1L, 9, 8, plane(9, 8)((x, _) => x * 10)),  // brightness rises rightward
      (2L, 9, 8, plane(9, 8)((_, _) => 77)),      // flat
      (3L, 9, 8, plane(9, 8)((x, _) => 240 - x * 10)) // falls rightward
    ).toDF("doc_id", "width", "height", "pixels")
    val got = Multimodal.imageDHash(in).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // on a 9-wide image the sample grid is the identity: x_i = i, so the
    // rising gradient compares strictly brighter at every bit
    assert(got(1L) == ((0xffffL, 0xffffL, 0xffffL, 0xffffL)), s"${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0L, 0L)), s"flat: ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 0L, 0L)), s"falling is never brighter: ${got(3L)}")
  }

  test("dhashNearDupPairs: shared band surfaces the pair, exact hamming verifies, disjoint hashes never pair") {
    val hs = Seq(
      (1L, 0xaaaaL, 0x1234L, 0x0f0fL, 0x7777L),
      (2L, 0xaaaaL, 0x1234L, 0x0f0fL, 0x7777L), // exact re-upload of 1
      (3L, 0xaaabL, 0x1234L, 0x0f0fL, 0x7777L), // 1 bit off in band 0
      (4L, 0x5555L, 0x4321L, 0xf0f0L, 0x8888L)  // no band in common
    ).toDF("doc_id", "b0", "b1", "b2", "b3")
    val got = Multimodal.dhashNearDupPairs(hs, "doc_id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)), s"$got")
    // hamming gate: the 1-bit pair disappears at maxHamming = 0
    val strict = Multimodal.dhashNearDupPairs(hs, "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 2L)), s"$strict")
  }

  test("image dedup components: dHash pairs close transitively; isolated image keeps its own label") {
    val hs = Seq(
      (1L, 0xaaaaL, 0x1234L, 0x0f0fL, 0x7777L),
      (2L, 0xaaaaL, 0x1234L, 0x0f0fL, 0x7777L),
      (3L, 0xaaabL, 0x1234L, 0x0f0fL, 0x7777L),
      (4L, 0x5555L, 0x4321L, 0xf0f0L, 0x8888L)
    ).toDF("doc_id", "b0", "b1", "b2", "b3")
    val pairs = Multimodal.dhashNearDupPairs(hs, "doc_id", maxHamming = 8)
    val labels = Dedup.connectedComponents(hs.select("doc_id"), pairs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L), s"$labels")
  }

  test("audioFingerprint: rising envelope sets every bit, flat none; stride is exact at n=130") {
    def pcm(f: Int => Int): Array[Byte] = {
      val b = new Array[Byte](130 * 2)
      for (k <- 0 until 130) {
        val v = f(k)
        b(2 * k) = (v & 0xff).toByte; b(2 * k + 1) = ((v >> 8) & 0xff).toByte
      }
      b
    }
    // n = 130 makes the sample grid the exact stride-2 sequence, so a
    // strictly rising |amp| compares greater at every one of the 64 bits
    val in = Seq((1L, pcm(k => k * 10)), (2L, pcm(_ => 500)),
      (3L, pcm(k => (129 - k) * 10))).toDF("doc_id", "pcm")
    val got = Multimodal.audioFingerprint(in).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((0xffffL, 0xffffL, 0xffffL, 0xffffL)), s"${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0L, 0L)), s"flat: ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 0L, 0L)), s"falling never louder: ${got(3L)}")
    // an empty clip fingerprints as silence, never an index crash
    val empty = Multimodal.audioFingerprint(
      Seq((9L, Array.empty[Byte])).toDF("doc_id", "pcm")).head()
    assert((empty.getLong(1), empty.getLong(2), empty.getLong(3),
      empty.getLong(4)) == ((0L, 0L, 0L, 0L)))
  }

  test("audioSpectralFingerprint: integer DFT bands; survives the quiet-clip gain edit the envelope hash misses") {
    def pcm(f: Int => Int): Array[Byte] = {
      val b = new Array[Byte](160 * 2)
      for (k <- 0 until 160) {
        val v = f(k) & 0xffff
        b(2 * k) = (v & 0xff).toByte; b(2 * k + 1) = ((v >> 8) & 0xff).toByte
      }
      b
    }
    // a QUIET clip — a slowly growing tone at frame-frequency 4 over a
    // small noise floor: the regime where level edits break the envelope
    // hash (probed |amp| points are small; halving collapses near-ties
    // and flips strict-> comparisons en masse) while the spectral hash
    // holds (the tone's band energy dominates each frame and just scales
    // by ~1/4, preserving the adjacent-frame comparisons)
    val p4 = Array(0, 1, 0, -1)
    def quiet(k: Int): Int =
      p4(k % 4) * ((16 + 5 * k) / 8) + 2 * ((k % 2) - 1)
    val in = Seq(
      (1L, pcm(quiet)),                 // original quiet clip
      (2L, pcm(k => quiet(k) / 2))      // the same clip at half gain
    ).toDF("doc_id", "pcm")
    def hamming(fps: Map[Long, (Long, Long, Long, Long)]): Int = {
      val (a, b) = (fps(1L), fps(2L))
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3) + java.lang.Long.bitCount(a._4 ^ b._4)
    }
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val env = hamming(collect(Multimodal.audioFingerprint(in)))
    val spec = hamming(collect(Multimodal.audioSpectralFingerprint(in)))
    assert(env > 8, s"the envelope hash must break on the quiet gain edit: $env")
    assert(spec <= 2, s"the spectral hash must survive it: $spec")
    // an empty clip fingerprints as silence, never a crash
    val empty = Multimodal.audioSpectralFingerprint(
      Seq((9L, Array.empty[Byte])).toDF("doc_id", "pcm")).head()
    assert((empty.getLong(1), empty.getLong(2), empty.getLong(3),
      empty.getLong(4)) == ((0L, 0L, 0L, 0L)))
    // the fixed-point tables are the documented StrictMath artifact
    import graft.operators.Multimodal.SpectralTables
    assert(SpectralTables.cos(0)(0) == 8192L && SpectralTables.sin(0)(0) == 0L)
    assert(SpectralTables.cos(0)(4) == 0L && SpectralTables.sin(0)(4) == 8192L,
      s"k=1,j=4 is the quarter period: ${SpectralTables.cos(0)(4)}")
  }

  test("dhash index: incremental probe equals the full pair scan restricted to index-vs-batch pairs") {
    val hs = Seq(
      (1L, 0xaaaaL, 0x1234L, 0x0f0fL, 0x7777L),
      (2L, 0xaaaaL, 0x1234L, 0x0f0fL, 0x7777L),
      (3L, 0xaaabL, 0x1234L, 0x0f0fL, 0x7777L),
      (4L, 0x5555L, 0x4321L, 0xf0f0L, 0x8888L)
    ).toDF("doc_id", "b0", "b1", "b2", "b3")
    val full = Multimodal.dhashNearDupPairs(hs, "doc_id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_dhidx_t").toString
    graft.cli.Cleanup.deleteOnExit(dir)
    Multimodal.dhashIndexWrite(hs.where(col("doc_id") <= 2), "doc_id", dir)
    val inc = Multimodal.dhashIncrementalPairs(spark, dir,
        hs.where(col("doc_id") > 2), "doc_id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = full.filter(p => p._1 <= 2 && p._2 > 2)
    assert(inc == expected && inc.nonEmpty,
      s"incremental $inc vs full-restricted $expected")
  }

  test("decodePpmFrames: container walk parses every frame, mixed geometry, malformed tail drops cleanly") {
    def ppm(w: Int, h: Int, fill: Byte): Array[Byte] = {
      val px = Array.fill(w * h * 3)(fill)
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
    }
    // three frames with DIFFERENT geometry back to back
    val good = ppm(2, 2, 10) ++ ppm(3, 1, 20) ++ ppm(1, 4, 30)
    // two good frames then a malformed header: parsed frames survive
    val torn = ppm(2, 2, 40) ++ ppm(2, 2, 50) ++ "PX garbage".getBytes("US-ASCII")
    val out = Multimodal.decodePpmFrames(
        Seq((1L, good), (2L, torn)).toDF("doc_id", "payload"),
        "doc_id", "payload")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getAs[Array[Byte]](4).distinct.toSeq)))
      .toMap
    assert(out.keySet == Set((1L, 0), (1L, 1), (1L, 2), (2L, 0), (2L, 1)),
      s"frame set: ${out.keySet}")
    assert(out((1L, 0)) == ((2, 2, Seq(10.toByte))))
    assert(out((1L, 1)) == ((3, 1, Seq(20.toByte))),
      "geometry may change mid-container")
    assert(out((1L, 2)) == ((1, 4, Seq(30.toByte))))
    assert(out((2L, 1)) == ((2, 2, Seq(50.toByte))),
      "frames before the malformed tail must survive")
  }

  test("dhashNearDupPairsCapped: mega-bucket excluded from pairing, sub-cap bands still pair, skipped surfaced") {
    // ids 1..5 all share band 0 (a 5-member mega-bucket — the flat-image
    // regime); only 1 and 2 also share band 1 (sub-cap). All other band
    // values are unique per id.
    val hs = (1L to 5L).map { i =>
      (i, 0x1111L, if (i <= 2) 0x2222L else 0x2220L + i,
        0x3300L + i, 0x4400L + i)
    }.toDF("doc_id", "b0", "b1", "b2", "b3")
    val uncapped = Multimodal.dhashNearDupPairs(hs, "doc_id", maxHamming = 64)
    try assert(uncapped.count() == 10, "uncapped: all 10 pairs via the mega-bucket")
    finally graft.engine.Checkpoints.release(uncapped)
    val (pairs, skipped) =
      Multimodal.dhashNearDupPairsCapped(hs, "doc_id", maxHamming = 64,
        maxBucket = 4)
    try {
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L)),
        s"only the sub-cap band-1 bucket may pair: $got")
      val sk = skipped.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(sk == Set((0, 0x1111L, 5L)), s"skipped must be surfaced: $sk")
    } finally graft.engine.Checkpoints.release(pairs)
  }

  test("capped dhash index: combined-size cap across appends, probe exclusion, refuse uncapped append, replay-safe") {
    def row(i: Long, b0: Long, b1: Long) = (i, b0, b1, 0x3300L + i, 0x4400L + i)
    val dir = java.nio.file.Files.createTempDirectory("graft_dhcap_t").toString
    graft.cli.Cleanup.deleteOnExit(dir)
    // build: bucket (0, 0x1111) holds ids 1,2 — under the cap of 3
    Multimodal.dhashIndexWrite(
      Seq(row(1L, 0x1111L, 0x2221L), row(2L, 0x1111L, 0x2222L))
        .toDF("doc_id", "b0", "b1", "b2", "b3"),
      "doc_id", dir, maxBucket = 3)
    // append ids 3,4 in the same band-0 bucket: combined 4 > 3 — the
    // straddle append must move the bucket to skipped (total-seen 4)
    val batch1 = Seq(row(3L, 0x1111L, 0x2223L), row(4L, 0x1111L, 0x2224L))
      .toDF("doc_id", "b0", "b1", "b2", "b3")
    assert(Multimodal.dhashAppendBatch(dir, batch1, "doc_id", 0L, maxBucket = 3))
    val sk1 = Multimodal.dhashIndexSkipped(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(sk1 == Set((0, 0x1111L, 4L)), s"straddle bucket must skip: $sk1")
    // torn-append RETRY: crash landed the sidecar writes but not the
    // marker — delete the marker and re-apply the SAME batch id; the
    // batch-tagged base exclusion must re-derive identical totals
    // instead of reading its own torn rows and double-counting
    graft.sources.Markers.delete(spark, s"$dir/lastbatch")
    assert(Multimodal.dhashAppendBatch(dir, batch1, "doc_id", 0L, maxBucket = 3))
    val skR = Multimodal.dhashIndexSkipped(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(skR == Set((0, 0x1111L, 4L)),
      s"torn retry must not double-count the batch: $skR")
    assert(Multimodal.dhashIndexVerify(spark, dir).count() == 0,
      "index must verify consistent after the torn retry")
    // probe a batch image that shares ONLY the skipped band: no pairs
    val probeFlat = Multimodal.dhashIncrementalPairs(spark, dir,
      Seq(row(90L, 0x1111L, 0x9999L)).toDF("doc_id", "b0", "b1", "b2", "b3"),
      "doc_id", maxHamming = 64)
    assert(probeFlat.count() == 0, "skipped bucket must not pair")
    // a batch image sharing a sub-cap band (id 2's b1) still pairs
    val probeOk = Multimodal.dhashIncrementalPairs(spark, dir,
      Seq(row(91L, 0x7777L, 0x2222L)).toDF("doc_id", "b0", "b1", "b2", "b3"),
      "doc_id", maxHamming = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probeOk == Set((2L, 91L)), s"sub-cap bands must still pair: $probeOk")
    // pre-skipped bucket stays skipped; total keeps growing
    assert(Multimodal.dhashAppendBatch(dir,
      Seq(row(5L, 0x1111L, 0x2225L)).toDF("doc_id", "b0", "b1", "b2", "b3"),
      "doc_id", 1L, maxBucket = 3))
    val sk2 = Multimodal.dhashIndexSkipped(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(sk2 == Set((0, 0x1111L, 5L)), s"pre-skipped total must grow: $sk2")
    // uncapped append onto a capped index is refused outright
    intercept[IllegalArgumentException] {
      Multimodal.dhashAppendBatch(dir,
        Seq(row(6L, 0x6666L, 0x2226L)).toDF("doc_id", "b0", "b1", "b2", "b3"),
        "doc_id", 2L)
    }
    // metadata is consistent, and a torn-append replay (hash rows landing
    // twice) neither changes probe results nor trips the verifier
    assert(Multimodal.dhashIndexVerify(spark, dir).count() == 0,
      "verifier must be clean after normal build+appends")
    val before = Multimodal.dhashIncrementalPairs(spark, dir,
      Seq(row(91L, 0x7777L, 0x2222L)).toDF("doc_id", "b0", "b1", "b2", "b3"),
      "doc_id", maxHamming = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    batch1.write.mode("append").parquet(s"$dir/hashes")
    val after = Multimodal.dhashIncrementalPairs(spark, dir,
      Seq(row(91L, 0x7777L, 0x2222L)).toDF("doc_id", "b0", "b1", "b2", "b3"),
      "doc_id", maxHamming = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, "replayed hash rows must not change the probe")
    assert(Multimodal.dhashIndexVerify(spark, dir).count() == 0,
      "exact replay duplicates must not trip the distinct recount")
  }

  test("bpeTokens: greedy longest-match, codepoint fallback never splits surrogate pairs, count composes") {
    def toks(text: String, vocab: Seq[String]): Seq[String] =
      Seq(Tuple1(text)).toDF("text")
        .select(TextOps.bpeTokens(col("text"), vocab).as("t"))
        .head().getSeq[String](0)
    // greedy longest-match: "abc" beats "ab" beats "a"; unmatched chars
    // fall back one at a time
    assert(toks("abcab xyz", Seq("a", "ab", "abc")) ==
      Seq("abc", "ab", "x", "y", "z"))
    // normalization matches tokens(): trim + lower before the walk
    assert(toks("  ABCab  ", Seq("abc", "ab")) == Seq("abc", "ab"))
    // MULTI-BYTE boundaries: a 2-byte BMP char (é) and a 4-byte astral
    // char (U+1D11E, a surrogate PAIR in the JVM) each fall back as ONE
    // codepoint token — the DuckDB substring/length semantics the oracle
    // replays; splitting the pair would emit two broken halves
    assert(toks("café", Seq("caf")) == Seq("caf", "é"))
    val astral = new String(Character.toChars(0x1D11E))
    assert(toks(s"ab${astral}ab c", Seq("ab")) ==
      Seq("ab", astral, "ab", "c"))
    // a vocab entry never matches ACROSS the astral char
    assert(toks(s"a${astral}b", Seq("ab")) == Seq("a", astral, "b"))
    // count = size of the token array
    val n = Seq(Tuple1("abcab")).toDF("text")
      .select(TextOps.tokenCountBpe(col("text"), Seq("a", "ab", "abc"))
        .cast("long")).head().getLong(0)
    assert(n == 2L)
    // the walk stays codegen-healthy (native expression, no fallback)
    graft.tools.CodegenGuard.reset()
    val big = (0L until 200L).map(i => (i, s"value table window $i"))
      .toDF("doc_id", "text")
      .select(TextOps.bpeTokens(col("text"),
        graft.queries.LlmQueries.BpeVocab).as("t"))
    big.collect()
    graft.tools.CodegenGuard.assertHealthy("bpeTokens pipeline")
  }

  test("alignmentFilter: zero-norm (NaN-cosine) and null embeddings are DROPPED, not kept by NaN-orders-last") {
    // Spark orders NaN above every double, so a bare `cos >= tau` keeps
    // exactly the dead-encoder rows — the guard must drop them
    val pairs = Seq(
      (1L, Array(1.0, 0.0), Array(0.99, 0.1)),      // aligned
      (2L, Array(0.0, 0.0), Array(1.0, 0.0)),       // zero-norm caption
      (3L, Array(1.0, 0.0), Array(0.0, 0.0)),       // zero-norm image
      (4L, null.asInstanceOf[Array[Double]], Array(1.0, 0.0)) // null
    ).toDF("id", "ea", "eb")
    val got = Similarity.alignmentFilter(pairs, "ea", "eb", 0.9)
      .select("id", "keep").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(got == Seq((1L, true), (2L, false), (3L, false), (4L, false)),
      s"got $got")
    // the NaN rides the score column so callers can quarantine it
    val sc = Similarity.alignmentScore(pairs, "ea", "eb")
      .where(col("id") === 2).select("align_cos").head()
    assert(sc.getDouble(0).isNaN)
    // the QUANTILE variant excludes the dead rows too — unguarded, a NaN
    // would both rank above every threshold AND pollute the percentile
    val strat = pairs.withColumn("src", lit("s"))
    val qk = Similarity.alignmentQuantileKeep(strat, "id", "src",
        "ea", "eb", 0.25)
      .collect().map(r => (r.getLong(0), r.getInt(4))).toMap
    assert(qk.keySet == Set(1L),
      s"NaN/null pairs must not reach the quantile gate: $qk")
    assert(qk(1L) == 1)
  }

  test("bpeModelWrite/Read: the trained tokenizer round-trips parquet — merge order, alphabet, and both apply paths intact") {
    val corpus = Seq(Tuple1("abab abab cdcd cd ab")).toDF("text")
    val m = TextOps.bpeTrainModel(corpus, "text", 4, 10)
    assert(m.merges.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    TextOps.bpeModelWrite(m, spark, dir)
    val back = TextOps.bpeModelRead(spark, dir)
    assert(back == m, s"model must round-trip exactly:\n$m\n$back")
    // and the restored artifact drives both apply kernels identically
    val probe = Seq(Tuple1("ababcd xyz")).toDF("text")
    def run(v: Seq[String]) = probe
      .select(TextOps.bpeTokens(col("text"), v)).head().getSeq[String](0)
    assert(run(back.vocab) == run(m.vocab))
    def runMo(ms: Seq[(String, String)]) = probe
      .select(TextOps.bpeTokensMergeOrder(col("text"), ms))
      .head().getSeq[String](0)
    assert(runMo(back.merges.map(x => (x.left_sym, x.right_sym))) ==
      runMo(m.merges.map(x => (x.left_sym, x.right_sym))))
    // torn rebuild detection: a crash between the two overwrites leaves
    // one side from a DIFFERENT model — the read must fail fast, never
    // assemble new merges with an old alphabet
    val other = TextOps.bpeTrainModel(
      Seq(Tuple1("xyxy xy zz")).toDF("text"), "text", 2, 10)
    val dir2 = java.nio.file.Files.createTempDirectory("bpe_model2").toString
    TextOps.bpeModelWrite(other, spark, dir2)
    spark.read.parquet(s"$dir2/merges")
      .write.mode("overwrite").parquet(s"$dir/merges")
    val e = intercept[IllegalArgumentException] {
      TextOps.bpeModelRead(spark, dir)
    }
    assert(e.getMessage.contains("torn"), e.getMessage)
  }

  test("bpeTokensMergeOrder: training-order replay — diverges from greedy longest-match where ranks demand it") {
    def mo(text: String, merges: Seq[(String, String)]): Seq[String] =
      Seq(Tuple1(text)).toDF("text")
        .select(TextOps.bpeTokensMergeOrder(col("text"), merges).as("t"))
        .head().getSeq[String](0)
    // merges [(b,c), (a,b)]: rank 1 fires first, so "abc" -> a·bc —
    // while GREEDY longest-match over the same learned vocabulary
    // {a,b,c,ab,bc} picks ab·c. The two apply disciplines are NOT the
    // same function; the engine gates both (q140 greedy, q158 merge
    // order)
    assert(mo("abc", Seq("b" -> "c", "a" -> "b")) == Seq("a", "bc"))
    val greedy = Seq(Tuple1("abc")).toDF("text")
      .select(TextOps.bpeTokens(col("text"),
        Seq("a", "b", "c", "ab", "bc")).as("t"))
      .head().getSeq[String](0)
    assert(greedy == Seq("ab", "c"))
    // merge chaining through earlier products: [(a,b), (ab,c)] fuses the
    // whole word
    assert(mo("abc", Seq("a" -> "b", "ab" -> "c")) == Seq("abc"))
    // left-to-right non-overlapping application (the trainer's loop)
    assert(mo("aaa", Seq("a" -> "a")) == Seq("aa", "a"))
    // train -> merge-order apply round-trips: a sampled word's tokens ARE
    // its final training segmentation ("abab" under 2 merges -> [abab])
    val m = TextOps.bpeTrainModel(
      Seq(Tuple1("abab abab")).toDF("text"), "text", 2, 10)
    assert(mo("abab", m.merges.map(x => (x.left_sym, x.right_sym))) ==
      Seq("abab"))
    // codegen-healthy (native expression, no interpreted fallback)
    graft.tools.CodegenGuard.reset()
    (0L until 100L).map(i => (i, s"table window $i")).toDF("doc_id", "text")
      .select(TextOps.bpeTokensMergeOrder(col("text"),
        Seq("t" -> "a", "ta" -> "b")).as("t"))
      .collect()
    graft.tools.CodegenGuard.assertHealthy("bpeTokensMergeOrder pipeline")
  }

  test("pocketLogit: native kernel pinned bit-identical to the HOF executable spec; codegen-healthy") {
    import graft.operators.TextOps
    val m = TextOps.PocketModel(
      Seq(7L, -3L, 11L, -5L, 2L, 9L, -1L, 4L, 13L, -8L, 6L, -2L, 5L,
        -7L, 3L, 10L, 17L, -23L), dims = 16, seed = 53,
      pocketRound = 1, pocketErrors = 0L)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  MIXED Case   And   Runs  of Spaces ",
      "single",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "café naïve über",      // multi-byte
      "" // empty text: one empty token, n = 1 — both forms must agree
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text")
    val both = df.select(col("id"),
        TextOps.pocketLogit(col("text"), m).as("native"),
        TextOps.pocketLogitHof(col("text"), m).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"native/HOF divergence at id ${r.getLong(0)}: " +
          s"${r.getLong(1)} vs ${r.getLong(2)}")
    }
    // the native kernel stays inside whole-stage codegen
    graft.tools.CodegenGuard.reset()
    (0L until 200L).map(i => (i, s"table window value $i"))
      .toDF("doc_id", "text")
      .select(TextOps.pocketLogit(col("text"), m).as("l"))
      .collect()
    graft.tools.CodegenGuard.assertHealthy("pocketLogit pipeline")
  }

  test("charGramLogit: native kernel pinned bit-identical to the HOF executable spec; codegen-healthy") {
    import graft.operators.TextOps
    val dims = 8
    val w = Seq(7L, -3L, 11L, -5L, 2L, 9L, -1L, 4L, 0L, -23L) // dims + 2
    val texts = Seq(
      "the quick brown fox",
      "  MIXED Case   And   Runs  of Spaces ",
      "x",                    // single char: padding still yields grams
      "café naïve über",      // multi-byte codepoints
      "一二三",   // CJK, no whitespace
      ""                      // empty: '  ' -> one gram
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val both = texts.toDF("id", "text").select(col("id"),
        TextOps.charGramLogit(col("text"), w, dims, 59).as("native"),
        TextOps.charGramLogitHof(col("text"), w, dims, 59).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"native/HOF divergence at id ${r.getLong(0)}: " +
          s"${r.getLong(1)} vs ${r.getLong(2)}")
    }
    graft.tools.CodegenGuard.reset()
    (0L until 200L).map(i => (i, s"table window value $i"))
      .toDF("doc_id", "text")
      .select(TextOps.charGramLogit(col("text"), w, dims, 59).as("l"))
      .collect()
    graft.tools.CodegenGuard.assertHealthy("charGramLogit pipeline")
  }

  test("langNaiveBayesTrain/langIdPredict: disjoint-script classes separate; argmax ties break to the first label") {
    import graft.operators.TextOps
    val train = (Seq.fill(6)("aa ab ba") ++ Seq.fill(4)("zz zy yz"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t,
        if (i < 6) "aa_lang" else "zz_lang") }
      .toDF("doc_id", "text", "lang")
    val m = TextOps.langNaiveBayesTrain(train, "text", "doc_id", "lang",
      dims = 16, seed = 59)
    assert(m.labels == Seq("aa_lang", "zz_lang"))
    // length slot zero; prior of the 6-doc class above the 4-doc class
    assert(m.weights.values.forall(_.apply(16) == 0L))
    assert(m.weights("aa_lang").last > m.weights("zz_lang").last)
    val pred = TextOps.langIdPredict(
      Seq((100L, "ab ab aa"), (101L, "zy zz yz")).toDF("doc_id", "text"),
      "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(pred == Map(100L -> "aa_lang", 101L -> "zz_lang"))
  }

  test("vocabGrowth: exact equal-rank checkpoints, first-appearance counting, the curve flattens when vocabulary stops growing") {
    // docs 0-4 introduce two fresh words each; docs 5-9 only repeat —
    // the Heap's curve must flatten at 10 from bin 2 on
    val dd = (0L until 10L)
      .map(i => (i, if (i < 5) s"w$i x$i" else "w0 x0"))
      .toDF("doc_id", "text")
    val got = TextOps.vocabGrowth(dd, "text", "doc_id", bins = 5)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (0L, 1L, 2L, 4L, 4L), (1L, 3L, 4L, 8L, 8L), (2L, 5L, 6L, 12L, 10L),
      (3L, 7L, 8L, 16L, 10L), (4L, 9L, 10L, 20L, 10L)), got.toString)
  }

  test("hostReport: canonical variants collapse before the page count; exact milli arithmetic; non-URLs land under the empty host") {
    val rows = Seq(
      (1L, "http://A.com:80/x/?b=2&a=1", "w w w"),
      (2L, "HTTP://a.com/x?a=1&b=2", "w w w w"), // same canonical page as 1
      (3L, "https://a.com:443/y", "w w"),
      (4L, "not a url", "w")
    ).toDF("doc_id", "url", "text")
    val got = TextOps.hostReport(rows, "url", "text", maxDupMilli = 300L)
      .orderBy("host").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("", "a.com"),
      "unparseable URLs must report under the empty host, not vanish")
    val acom = got(1)
    // 3 docs, 2 canonical pages (case/port/slash/query-order collapse),
    // dup share floor(1000/3) = 333, mean tokens floor(9000/3) = 3000
    assert((acom.getLong(1), acom.getLong(2)) == (3L, 2L))
    assert(acom.getLong(3) == 333L)
    assert(acom.getLong(4) == 3000L)
    assert(!acom.getBoolean(5), "333 > 300 must drop the host")
    assert(got(0).getLong(1) == 1L && got(0).getBoolean(5))
  }

  test("wordPieceTrainModel: likelihood-gain argmax diverges from BPE's frequency argmax; exact scaled scores; ties fall to (left, right); learned vocab plugs into the greedy kernel") {
    // pair (a,b) is the most FREQUENT (4) but its symbols are common
    // (count(a) = count(b) = 10), while (c,d) is rarer (3) yet fully
    // predictive (count(c) = count(d) = 3): score(c,d) = 3/9 beats
    // score(a,b) = 4/100 — WordPiece merges cd first, BPE merges ab
    val corpus = Seq(Tuple1((Seq.fill(4)("ab") ++ Seq.fill(3)("aa") ++
      Seq.fill(3)("bb") ++ Seq.fill(3)("cd")).mkString(" "))).toDF("text")
    val wp = TextOps.wordPieceTrainModel(corpus, "text", 1, 10)
    assert(wp.merges.map(m => (m.merge_rank, m.left_sym, m.right_sym,
      m.merged, m.pair_count, m.score_scaled)) ==
      Seq((1L, "c", "d", "cd", 3L, 333333333333333333L)),
      wp.merges.toString)
    val bpe = TextOps.bpeTrainModel(corpus, "text", 1, 10)
    assert(bpe.merges.head.merged == "ab",
      "the frequency objective must pick the other pair")
    // equal scaled scores fall to (left, right) codepoint order
    val wt = TextOps.wordPieceTrainModel(
      Seq(Tuple1("ab ab cd cd")).toDF("text"), "text", 2, 10)
    assert(wt.merges.map(m => (m.merged, m.score_scaled)) ==
      Seq(("ab", 500000000000000000L), ("cd", 500000000000000000L)))
    // apply is greedy longest-match over the learned vocabulary — the
    // existing kernel, new model
    val toks = Seq(Tuple1("cd ab")).toDF("text")
      .select(TextOps.bpeTokens(col("text"), wp.vocab).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("cd", "a", "b"))
  }

  test("wordPieceModelWrite/Read: exact round-trip including scores; torn rebuild fails fast") {
    val m = TextOps.wordPieceTrainModel(
      Seq(Tuple1("abab abab cd cd cd")).toDF("text"), "text", 3, 10)
    val dir = java.nio.file.Files.createTempDirectory("wp_model").toString
    TextOps.wordPieceModelWrite(m, spark, dir)
    assert(TextOps.wordPieceModelRead(spark, dir) == m)
    // tear: alphabet side overwritten by a different model's write
    val other = TextOps.wordPieceTrainModel(
      Seq(Tuple1("xy xy")).toDF("text"), "text", 1, 10)
    TextOps.wordPieceModelWrite(other, spark, s"$dir-other")
    val src = new java.io.File(s"$dir-other/alphabet")
    val dst = new java.io.File(s"$dir/alphabet")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(dst)
    assert(src.renameTo(dst))
    val torn = intercept[IllegalArgumentException] {
      TextOps.wordPieceModelRead(spark, dir)
    }
    assert(torn.getMessage.contains("torn wordpiece model"))
  }

  test("unigramTokens: Viterbi argmax — score beats greed, ties prefer fewer pieces then byte-lexicographic seg; unk steps whole codepoints") {
    import graft.operators.TextOps.{UnigramLmModel, UnigramPiece}
    def model(lpUnk: Long, ps: (String, Long)*): UnigramLmModel =
      UnigramLmModel(ps.map { case (p, lp) => UnigramPiece(p, 1L, lp) },
        lpUnk)
    def toks(text: String, m: UnigramLmModel): Seq[String] =
      Seq(Tuple1(text)).toDF("text")
        .select(TextOps.unigramTokens(col("text"), m).as("t"))
        .head().getSeq[String](0)
    // VITERBI beats greedy: longest-match would take "abc" (lp -100000),
    // the decode takes ab·c (-20000) — the discipline that separates
    // this kernel from bpeTokens
    assert(toks("abc", model(-500000L,
      "ab" -> -10000L, "abc" -> -100000L, "c" -> -10000L)) ==
      Seq("ab", "c"))
    // equal score -> FEWER pieces wins: a·b and ab both sum to -20000
    assert(toks("ab", model(-500000L,
      "a" -> -10000L, "b" -> -10000L, "ab" -> -20000L)) == Seq("ab"))
    // full (score, n_pieces) tie -> byte-lexicographic smallest SEG
    // string: seg(a.bc) < seg(ab.c) (the U+0001 separator sorts
    // below every printable byte), so a·bc must win
    assert(toks("abc", model(-500000L, "ab" -> -10000L, "c" -> -10000L,
      "a" -> -10000L, "bc" -> -10000L)) == Seq("a", "bc"))
    // normalization matches tokens(): trim + lower before the decode;
    // whitespace words decode independently
    assert(toks("  AB ab  ", model(-500000L, "ab" -> -10000L)) ==
      Seq("ab", "ab"))
    // unk steps ONE codepoint at lpUnk — and only where the single
    // codepoint is out-of-vocabulary (never preferred over a piece)
    assert(toks("za", model(-500000L, "a" -> -10000L)) == Seq("z", "a"))
    // a surrogate PAIR unk-steps as one codepoint, never a broken half,
    // and pieces never match across it
    val astral = new String(Character.toChars(0x1D11E))
    assert(toks(s"ab${astral}ab", model(-500000L, "ab" -> -10000L)) ==
      Seq("ab", astral, "ab"))
    assert(toks(s"a${astral}b", model(-500000L, "ab" -> -10000L,
      "a" -> -10000L, "b" -> -10000L)) == Seq("a", astral, "b"))
    // the unk penalty participates in the argmax: a path with one
    // in-vocab piece + one unk beats all-unk when lpUnk is harsh
    assert(toks("zab", model(-500000L, "ab" -> -10000L, "za" -> -600000L,
      "b" -> -10000L)) == Seq("z", "ab"))
    // codegen-healthy (native expression, no interpreted fallback)
    graft.tools.CodegenGuard.reset()
    val m = model(-500000L, "ta" -> -10000L, "b" -> -20000L,
      "t" -> -30000L, "a" -> -30000L, "l" -> -30000L, "e" -> -30000L)
    (0L until 200L).map(i => (i, s"table $i")).toDF("doc_id", "text")
      .select(TextOps.unigramTokens(col("text"), m).as("t"))
      .collect()
    graft.tools.CodegenGuard.assertHealthy("unigramTokens pipeline")
  }

  test("unigramTrainModel: seed substring counts, hard-EM pruning, single-codepoint floor, fixed-point scores, apply round-trip") {
    // corpus: "abab" x2, "ab" x1. Seed counts (maxPieceLen 4):
    // a:5 b:5 ab:5 ba:2 aba:2 bab:2 abab:2, total 23. Round 1 decodes
    // abab -> [abab] (ln(2/23) beats 2*ln(5/23)) and ab -> [ab], so
    // usage prunes ba/aba/bab and floors the unused singles at 1.
    val m = TextOps.unigramTrainModel(
      Seq(Tuple1("abab abab ab")).toDF("text"), "text",
      maxPieceLen = 4, sampleWords = 10, iters = 2)
    assert(m.pieces.map(p => (p.piece, p.cnt)) ==
      Seq(("a", 1L), ("ab", 1L), ("abab", 2L), ("b", 1L)),
      s"pruning + floor must leave exactly the used pieces and floored " +
        s"singles in codepoint order: ${m.pieces}")
    // fixed-point score law: floor(ln(cnt/total)*1e4 + 0.5), total 5
    def lp(c: Long) =
      Math.floor(Math.log(c.toDouble / 5.0) * 10000.0 + 0.5).toLong
    assert(m.pieces.map(_.lp) == Seq(lp(1), lp(1), lp(2), lp(1)))
    // lpUnk: one e-fold (10^4 fixed-point nats) below the worst piece
    assert(m.lpUnk == m.pieces.map(_.lp).min - 10000L)
    // train -> apply round-trips: a sampled word's tokens ARE its final
    // training segmentation
    val got = Seq(Tuple1("abab ab")).toDF("text")
      .select(TextOps.unigramTokens(col("text"), m).as("t"))
      .head().getSeq[String](0)
    assert(got == Seq("abab", "ab"))
    // determinism: retraining yields the identical model
    val m2 = TextOps.unigramTrainModel(
      Seq(Tuple1("abab abab ab")).toDF("text"), "text", 4, 10, 2)
    assert(m2 == m)
    // the cap bites deterministically: sampleWords = 1 keeps only the
    // most frequent word ("abab"), whose decode uses no "ab" piece —
    // so "ab" is PRUNED and the model is just {abab} + floored singles
    val capped = TextOps.unigramTrainModel(
      Seq(Tuple1("abab abab ab")).toDF("text"), "text", 4, 1, 2)
    assert(capped.pieces.map(p => (p.piece, p.cnt)) ==
      Seq(("a", 1L), ("abab", 2L), ("b", 1L)))
  }

  test("bpeTrainModel: tie-break by (count DESC, left, right); merges apply left-to-right non-overlapping; cap bites deterministically") {
    // "ab" x3 and "cd" x3 tie on pair count: ('a','b') < ('c','d') under
    // the (left, right) order, so rank 1 MUST be a+b. Rank 2 is then c+d.
    val tied = Seq.fill(3)("ab cd").mkString(" ")
    val m1 = TextOps.bpeTrainModel(
      Seq(Tuple1(tied)).toDF("text"), "text", 2, 10)
    assert(m1.merges.map(m => (m.merge_rank, m.left_sym, m.right_sym,
      m.merged)) == Seq((1L, "a", "b", "ab"), (2L, "c", "d", "cd")))
    assert(m1.merges.forall(_.pair_count == 3L))
    // overlapping-pair application: "aaa" under merge (a,a) fuses
    // LEFT-TO-RIGHT non-overlapping -> [aa, a]; the pair count that wins
    // the round still counts BOTH overlapping occurrences (2 per word,
    // the Sennrich convention) — so round 1 sees count 2, and round 2's
    // segmentation [aa, a] yields pair (aa, a)
    val m2 = TextOps.bpeTrainModel(
      Seq(Tuple1("aaa")).toDF("text"), "text", 2, 10)
    assert(m2.merges.map(m => (m.merged, m.pair_count)) ==
      Seq(("aa", 2L), ("aaa", 1L)))
    // histogram cap: top-sampleWords by (count DESC, word ASC) — with
    // cap 1 only the most frequent word trains, so the learned merges
    // never mention the dropped word's letters
    val m3 = TextOps.bpeTrainModel(
      Seq(Tuple1("xy xy zq")).toDF("text"), "text", 5, 1)
    assert(m3.merges.map(_.merged) == Seq("xy"), s"got ${m3.merges}")
    assert(m3.alphabet == Seq("x", "y"))
    // early stop: every sampled word fused to one symbol -> no pairs left
    assert(m3.merges.size == 1)
    // vocab = alphabet ++ merged, the greedy-apply model artifact
    assert(m3.vocab == Seq("x", "y", "xy"))
    // tie-breaks compare symbols in CODEPOINT order (= the oracle's
    // binary UTF-8 collation), never UTF-16 code units: an astral
    // symbol (U+1D11E, surrogate lead 0xD834) must rank ABOVE a BMP
    // U+F901 — Java's compareTo would invert that and flip the winner
    val astral = new String(Character.toChars(0x1D11E))
    val bmp = "\uF901"
    val m4 = TextOps.bpeTrainModel(
      Seq(Tuple1(s"${astral}a ${bmp}a")).toDF("text"), "text", 1, 10)
    assert(m4.merges.head.left_sym == bmp,
      s"codepoint order must win the tie: ${m4.merges.head}")
    assert(m4.alphabet == Seq("a", bmp, astral))
  }

  test("video winnow: chroma (+1,-1) noise flips payload bytes but never a dHash bit; every 4-frame trimmed clip is recovered") {
    // (a) luma invariance on actual bytes: same plane, chroma-shifted
    val w = 6; val h = 4; val npix = w * h * 3
    val text = ("the quick brown fox jumps over the lazy dog padding" * 3)
      .substring(0, npix)
    def ppm(plane: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"P6\n$w $h\n255\n".getBytes("US-ASCII"))
      bos.write(plane); bos.toByteArray
    }
    val clean = text.getBytes("US-ASCII")
    val noisy = clean.clone()
    var p = 0
    while (p + 1 < noisy.length) {
      if (noisy(p) < 127 && noisy(p + 1) > 0) {
        noisy(p) = (noisy(p) + 1).toByte
        noisy(p + 1) = (noisy(p + 1) - 1).toByte
      }
      p += 3
    }
    assert(!java.util.Arrays.equals(clean, noisy),
      "noise must actually change the payload")
    val hashes = Multimodal.imageDHash(Multimodal.decodePpm(
        Seq((1L, ppm(clean)), (2L, ppm(noisy))).toDF("doc_id", "payload"),
        "doc_id", "payload"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(hashes(1L) == hashes(2L),
      s"luma-preserving noise must not move the dHash: $hashes")
    // (b) the winnow guarantee, structurally: a shared run of
    // w + k - 1 = 3 frame hashes shares >= 1 fingerprint, so every
    // 4-frame video (doc_id % 3 == 2) MUST pair with its trimmed+noisy
    // re-encode leg in q154
    val got = graft.queries.LlmQueries.queries("q154_video_winnow")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs001 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where("text IS NOT NULL AND doc_id % 3 = 2")
      .select("doc_id").collect().map(_.getLong(0))
    assert(docs001.nonEmpty)
    val missing = docs001.filterNot(i => got.contains((i, i + 700000L)))
    assert(missing.isEmpty,
      s"4-frame trimmed clips not recovered: ${missing.take(10).toSeq}")
  }

  test("hashSplitBy: every member of a group shares bucket+split; bucket replays from raw md5 of the KEY") {
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 40L), (5L, 50L))
      .toDF("doc_id", "component")
    val out = TextOps.hashSplitBy(labels, col("component")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    out.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1 &&
        rows.map(_._4).distinct.length == 1,
        s"component $c must not straddle splits: ${rows.mkString(", ")}") }
    def bucket(k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      BigInt(md.digest(s"42:$k".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15), 16).toLong % 100
    }
    out.foreach { case (id, c, b, s) =>
      assert(b == bucket(c), s"doc $id bucket keyed on the component")
      val exp = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == exp, s"doc $id split from the bucket")
    }
  }

  test("lengthBucketBatches: dense per-bucket ranks in md5 order; floor-division batches; partition-invariant") {
    val in = (1L to 20L).map(i =>
      (i, Seq.fill((i % 6).toInt + 1)("w").mkString(" "))).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextOps.lengthBucketBatches(df, "doc_id",
          TextOps.tokenCount(col("text")), Seq(2L, 4L), batchSize = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
    val out = run(in)
    def h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      BigInt(md.digest(s"17:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15), 16).toLong
    }
    out.foreach { case (id, n, b, rk, bi) =>
      assert(n == (id % 6) + 1, s"doc $id token count")
      assert(b == (if (n > 2) 1L else 0L) + (if (n > 4) 1L else 0L),
        s"doc $id bucket")
      assert(bi == (rk - 1) / 2, s"doc $id batch index")
    }
    out.groupBy(_._3).foreach { case (b, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length),
        s"bucket $b ranks must be dense 1..n")
      assert(rows.sortBy(_._4).map(_._1).toSeq ==
        rows.sortBy(r => (h(r._1), r._1)).map(_._1).toSeq,
        s"bucket $b order must follow the md5 shuffle key")
    }
    assert(run(in.repartition(7)).sortBy(_._1).toSeq == out.sortBy(_._1).toSeq,
      "assignment must be partition-invariant")
  }

  test("mixtureApply: whole epochs + md5-derived fractional flag; the recipe drives membership") {
    val in = Seq(
      (1L, "a", "w w w w w"), (2L, "a", "w w w w w"), // available = 10
      (3L, "b", "w w"),                               // available = 2
      (4L, "c", "w")                                  // not in the recipe
    ).toDF("doc_id", "lang", "text")
    // a: desired 15, epochs min(3000, 15000//10) = 1500 -> 1 + frac 500
    // b: desired 15, epochs min(3000, 15000//2)  = 3000 -> exactly 3
    val out = TextOps.mixtureApply(in, "doc_id", "lang",
        TextOps.tokenCount(col("text")), Seq("a" -> 500, "b" -> 500),
        budgetTokens = 30L, maxEpochsMilli = 3000L)
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        ((r.getLong(r.fieldIndex("epochs_milli")),
          r.getLong(r.fieldIndex("__copies"))))).toMap
    assert(!out.contains(4L), "stratum outside the recipe must drop")
    assert(out(3L) == ((3000L, 3L)), s"capped stratum: ${out(3L)}")
    // the fractional flag replayed from raw md5, independent of TextOps
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      BigInt(md.digest(s"93:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15), 16).toLong % 1000
    }
    for (id <- Seq(1L, 2L)) {
      assert(out(id)._1 == 1500L, s"doc $id epochs: ${out(id)}")
      assert(out(id)._2 == 1L + (if (bucket(id) < 500) 1L else 0L),
        s"doc $id copies must follow the md5 bucket: ${out(id)}")
    }
  }

  test("semDedupRecall: counts the cross-cell misses exactly on the crafted fixture") {
    val cents = Seq(0L -> Seq(1.0, 0.0, 0.0, 0.0), 1L -> Seq(0.0, 1.0, 0.0, 0.0))
    val vecs = Seq(
      (10L, Array(1.00, 0.05, 0.0, 0.0)), (11L, Array(0.99, 0.08, 0.0, 0.0)),
      (15L, Array(1.00, 0.02, 0.0, 0.0)), (12L, Array(0.90, 0.40, 0.0, 0.0)),
      (13L, Array(0.05, 1.00, 0.0, 0.0)), (14L, Array(0.10, 2.00, 0.0, 0.0)),
      (16L, Array(0.72, 0.69, 0.0, 0.0)), (17L, Array(0.69, 0.72, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    // ground truth at tau=.99: {10,11},{10,15},{11,15},{13,14},{16,17} = 5
    // pairs; the 16-17 pair straddles cells -> within = 4, recall = 0.8
    val r = Similarity.semDedupRecall(vecs, "vec_id", "embedding", cents,
      tau = 0.99).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((5L, 4L, 1L, 0.8)), s"got $r")
    // nothing to find -> recall reports 1.0, not a division error
    val empty = Similarity.semDedupRecall(
        Seq((1L, Array(1.0, 0.0, 0.0, 0.0)),
            (2L, Array(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, tau = 0.99).head()
    assert(empty.getLong(0) == 0L && empty.getDouble(3) == 1.0)
  }

  test("winnowFingerprints: matches an independent brute-force winnower; shared runs share a fingerprint") {
    // reference implementation straight from the paper: slide the window,
    // take the rightmost minimum — computed from raw md5, not TextOps
    def winnowRef(text: String, k: Int, w: Int, seed: Int): Set[(Int, Long)] = {
      def h(s: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        BigInt(md.digest(s"$seed:$s".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(15), 16).toLong
      }
      val hs = text.trim.toLowerCase.split("\\s+").toSeq
        .sliding(k).map(g => h(g.mkString(" "))).toVector
      (0 to math.max(hs.size - w, 0)).map { s =>
        val idx = s until math.min(s + w, hs.size)
        val best = idx.minBy(i => (hs(i), -i))
        (best, hs(best))
      }.toSet
    }
    val rnd = new scala.util.Random(3)
    val words = Vector("ka", "lo", "mi", "ne", "os", "pu", "qa", "re", "su", "tu")
    val longDoc = Seq.fill(40)(words(rnd.nextInt(words.size))).mkString(" ")
    val shared = "zz yy xx ww vv uu" // 6 tokens = w + k - 1
    val docA = longDoc + " " + shared
    val docB = shared + " " + Seq.fill(20)(words(rnd.nextInt(words.size))).mkString(" ")
    val shortDoc = "aa bb cc dd" // 2 grams < w: one truncated window
    val in = Seq((1L, docA), (2L, docB), (3L, shortDoc)).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(in, "text", "doc_id", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(got(1L) == winnowRef(docA, 3, 4, 131), "doc A vs reference")
    assert(got(2L) == winnowRef(docB, 3, 4, 131), "doc B vs reference")
    assert(got(3L) == winnowRef(shortDoc, 3, 4, 131) && got(3L).size == 1,
      s"short doc keeps its single truncated window: ${got(3L)}")
    // the paper's guarantee: a shared w+k-1 run shares >= 1 fingerprint HASH
    val fpsA = got(1L).map(_._2); val fpsB = got(2L).map(_._2)
    assert(fpsA.intersect(fpsB).nonEmpty, "shared 6-token run must collide")
  }

  test("winnowCandidatePairs: overlap scored from distinct fingerprint sets; minShared gates") {
    val rnd = new scala.util.Random(3)
    val words = Vector("ka", "lo", "mi", "ne", "os", "pu", "qa", "re", "su", "tu")
    val longDoc = Seq.fill(40)(words(rnd.nextInt(words.size))).mkString(" ")
    val shared = "zz yy xx ww vv uu" // 6 tokens = w + k - 1: must collide
    val docA = longDoc + " " + shared
    val docB = shared + " " + Seq.fill(20)(words(rnd.nextInt(words.size))).mkString(" ")
    val in = Seq((1L, docA), (2L, docB), (3L, "aa bb cc dd")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(in, "text", "doc_id", k = 3, w = 4)
    // expected from the collected DISTINCT fingerprint-value sets
    val sets = fps.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exp = (for {
      a <- sets.keys; b <- sets.keys if a < b
      n = sets(a).intersect(sets(b)).size if n >= 1
    } yield (a, b, n.toLong,
      math.rint(n.toDouble / (sets(a).size + sets(b).size - n) * 1e6) / 1e6)).toSet
    val got = Dedup.winnowCandidatePairs(fps, "doc_id", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == exp, s"got $got vs expected $exp")
    assert(got.exists(p => p._1 == 1L && p._2 == 2L),
      "docs sharing a w+k-1-token run must pair")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      "disjoint doc must not pair")
    // raising minShared above the max shared count empties the result
    val maxShared = got.map(_._3).max
    assert(Dedup.winnowCandidatePairs(fps, "doc_id",
      minShared = maxShared.toInt + 1).isEmpty)
  }

  test("winnow index: the incremental probe equals the full pair scan restricted to cross-split pairs") {
    val rnd = new scala.util.Random(3)
    val words = Vector("ka", "lo", "mi", "ne", "os", "pu", "qa", "re", "su", "tu")
    val longDoc = Seq.fill(40)(words(rnd.nextInt(words.size))).mkString(" ")
    val shared = "zz yy xx ww vv uu"
    val in = Seq(
      (1L, longDoc + " " + shared),
      (2L, shared + " " + Seq.fill(20)(words(rnd.nextInt(words.size))).mkString(" ")),
      (3L, "aa bb cc dd")).toDF("doc_id", "text")
    def fps(d: org.apache.spark.sql.DataFrame) =
      Dedup.winnowFingerprints(d, "text", "doc_id", k = 3, w = 4)
    val full = Dedup.winnowCandidatePairs(fps(in), "doc_id", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_winidx_t").toString
    graft.cli.Cleanup.deleteOnExit(dir)
    Dedup.winnowIndexWrite(fps(in.where(col("doc_id") === 1)), "doc_id", dir)
    val inc = Dedup.winnowIncrementalPairs(spark, dir,
        fps(in.where(col("doc_id") =!= 1)), "doc_id", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val expected = full.filter(p => p._1 == 1L)
    assert(inc == expected && inc.nonEmpty,
      s"incremental $inc vs full-restricted $expected")
  }

  test("winnowIndexVerify: green on a clean build, flags a torn append (fps landed, sizes did not)") {
    val in = Seq((1L, "aa bb cc dd ee ff gg"), (2L, "hh ii jj kk ll mm"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(in, "text", "doc_id", k = 3, w = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_winver_t").toString
    graft.cli.Cleanup.deleteOnExit(dir)
    Dedup.winnowIndexWrite(fps, "doc_id", dir)
    assert(Dedup.winnowIndexVerify(spark, dir).isEmpty, "clean build verifies")
    // simulate the crash window: batch fps rows appended, sizes sidecar not
    Dedup.winnowFingerprints(
        Seq((3L, "nn oo pp qq rr ss")).toDF("doc_id", "text"),
        "text", "doc_id", k = 3, w = 4)
      .select(col("fp"), col("doc_id"))
      .write.mode("append").parquet(s"$dir/fps")
    val torn = Dedup.winnowIndexVerify(spark, dir).collect()
    assert(torn.map(_.getLong(0)).toSet == Set(3L),
      s"torn doc must be flagged: ${torn.mkString(", ")}")
  }

  test("spanLeakageRate: planted straddling dup reads 1000 milli; fresh doc reads 0") {
    val run = (1 to 12).map(i => s"t$i").mkString(" ") // 12 tokens: 5 windows
    val train = Seq((1L, run), (2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (10L, run),                                        // exact dup: all spans leak
      (11L, "v1 v2 v3 v4 " + run.split(" ").take(8).mkString(" ")), // 1 of 5 leaks
      (12L, (1 to 9).map(i => s"z$i").mkString(" "))     // fresh: 0
    ).toDF("doc_id", "text")
    val out = Dedup.spanLeakageRate(probe, train, "text", "doc_id", w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L) == ((5L, 5L, 1000L)), s"${out(10L)}")
    assert(out(11L) == ((5L, 1L, 200L)), s"${out(11L)}")
    assert(out(12L) == ((2L, 0L, 0L)), s"${out(12L)}")
  }

  test("packingEfficiency: pad-to-longest waste, hand-computed; zero-waste batches report 0") {
    val in = Seq(
      (1L, 2L, 0L, 0L), (2L, 4L, 0L, 0L), // padded 8, waste 2 -> 250 milli
      (3L, 3L, 0L, 1L),                   // singleton: zero waste
      (4L, 5L, 1L, 0L), (5L, 5L, 1L, 0L)  // equal lengths: zero waste
    ).toDF("doc_id", "n_tokens", "bucket", "batch_idx")
    val out = TextOps.packingEfficiency(in).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(out((0L, 0L)) == ((2L, 4L, 6L, 8L, 250L)), s"${out((0L, 0L))}")
    assert(out((0L, 1L)) == ((1L, 3L, 3L, 3L, 0L)))
    assert(out((1L, 0L)) == ((2L, 5L, 10L, 10L, 0L)))
  }

  test("epochSchedule: each epoch equals the single-epoch shuffle under seed base+e; epochs differ") {
    val in = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val sched = TextOps.epochSchedule(in, "doc_id", epochs = 3, baseSeed = 23)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0)).toMap
    def epochOrder(e: Long): Seq[Long] =
      (1L to 100L).map(rk => sched((e, rk)))
    for (e <- 1 to 3) {
      val single = TextOps.shuffleOrder(in, "doc_id", seed = 23 + e)
        .orderBy("order_idx").collect().map(_.getLong(0)).toSeq
      assert(epochOrder(e) == single,
        s"epoch $e must equal shuffleOrder(seed=${23 + e})")
    }
    assert(epochOrder(1) != epochOrder(2) && epochOrder(2) != epochOrder(3),
      "epochs must be independent permutations")
  }

  test("winnow index: a replayed append neither inflates n_shared nor hides from the verifier") {
    val in = Seq((1L, "aa bb cc dd ee ff gg hh ii")).toDF("doc_id", "text")
    val batch = Seq((50L, "cc dd ee ff gg hh zz ww")).toDF("doc_id", "text")
    def fps(d: org.apache.spark.sql.DataFrame) =
      Dedup.winnowFingerprints(d, "text", "doc_id", k = 3, w = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_winrep_t").toString
    graft.cli.Cleanup.deleteOnExit(dir)
    Dedup.winnowIndexWrite(fps(in), "doc_id", dir)
    assert(Dedup.winnowAppendBatch(dir, fps(batch), "doc_id", 0L))
    def probe = Dedup.winnowIncrementalPairs(spark, dir,
        fps(Seq((99L, "cc dd ee ff gg hh qq")).toDF("doc_id", "text")),
        "doc_id", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = probe
    assert(before.nonEmpty)
    // crash-replay simulation: the batch's fps land AGAIN (the marker
    // blocks the API path, so write raw — the exact torn window)
    fps(batch).select(col("fp"), col("doc_id"))
      .write.mode("append").parquet(s"$dir/fps")
    assert(probe == before,
      "duplicated index rows must not change probe counts")
    // the OTHER torn window: crash between the sizes append and the marker
    // write, then retry — the sizes sidecar rows double; the defensive
    // max-aggregate must keep the probe emitting each pair exactly once
    fps(batch).select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
      .write.mode("append").parquet(s"$dir/sizes")
    val probeRows = Dedup.winnowIncrementalPairs(spark, dir,
        fps(Seq((99L, "cc dd ee ff gg hh qq")).toDF("doc_id", "text")),
        "doc_id", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(probeRows.toSet == before && probeRows.length == before.size,
      s"doubled sizes rows must not duplicate probe pairs: ${probeRows.toSeq}")
    val flagged = Dedup.winnowIndexVerify(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(flagged == Set(50L),
      s"the replayed doc must be flagged raw != distinct: $flagged")
  }

  test("shuffleOrder: dense 1..n permutation, reproducible, seed-dependent, actually shuffled") {
    val in = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def order(seed: Int): Seq[Long] =
      TextOps.shuffleOrder(in, "doc_id", seed)
        .orderBy("order_idx").collect().map(_.getLong(0)).toSeq
    val o11 = order(11)
    assert(o11.sorted == (0L until 200L), "must be a permutation of the ids")
    assert(order(11) == o11, "same seed must reproduce the identical order")
    assert(order(12) != o11, "a new seed is a fresh permutation")
    assert(o11 != (0L until 200L).toSeq, "hash order must not be id order")
    val idx = TextOps.shuffleOrder(in, "doc_id", 11)
      .select("order_idx").collect().map(_.getLong(0)).sorted
    assert(idx.toSeq == (1L to 200L), "ranks must be dense 1..n with no gaps")
  }

  test("semDedupIncremental: batch checked against the materialized corpus, min-id dup_of, empty cells keep") {
    val cents = Seq(0L -> Seq(1.0, 0.0, 0.0, 0.0), 1L -> Seq(0.0, 1.0, 0.0, 0.0))
    val centsDf = cents.toDF("cell", "ce")
    val corpus = Seq(
      (10L, Array(1.0, 0.0, 0.0, 0.0)),   // cell 0
      (12L, Array(1.0, 0.001, 0.0, 0.0)), // cell 0 — second match for the dup
      (11L, Array(0.0, 1.0, 0.0, 0.0))    // cell 1
    ).toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_semdd_inc").toString
    graft.cli.Cleanup.deleteOnExit(path)
    val idx = Similarity.ivfBuild(spark, corpus, "vec_id", "embedding",
      k = 2, path = path, centroids = Some(centsDf))
    val batch = Seq(
      (20L, Array(1.0, 0.01, 0.0, 0.0)), // dup of BOTH 10 and 12 -> min 10
      (21L, Array(0.7, 0.7, 0.0, 0.0)),  // cell 0, cos ~ .71 < tau -> keep
      (22L, Array(0.0, -1.0, 0.0, 0.0))  // cell 0 (0 > -1), no match -> keep
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedupIncremental(idx,
        Similarity.collectCentroids(centsDf), batch, tau = 0.99)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3)), r.getBoolean(4))).toMap
    assert(out(20L) == ((10L, false)), s"min-id dup: ${out(20L)}")
    assert(out(21L) == ((-1L, true)))
    assert(out(22L) == ((-1L, true)))
    // self-pair guard: a batch vector whose id is ALREADY indexed (the
    // at-least-once foreachBatch retry after a committed append) must not
    // report itself as its own duplicate at cosine 1.0
    val replay = Seq((10L, Array(1.0, 0.0, 0.0, 0.0)),
      (11L, Array(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val rp = Similarity.semDedupIncremental(idx,
        Similarity.collectCentroids(centsDf), replay, tau = 0.99)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3)), r.getBoolean(4))).toMap
    assert(rp(10L) == ((12L, false)),
      s"replayed 10 must dup against 12, never itself: ${rp(10L)}")
    assert(rp(11L) == ((-1L, true)),
      s"replayed 11 has no OTHER match and must keep: ${rp(11L)}")
  }

  test("semDedup: a zero-norm embedding never edges (NaN >= tau must not collapse its cell)") {
    val cents = Seq(0L -> Seq(1.0, 0.0))
    val vecs = Seq(
      (1L, Array(1.0, 0.0)),   // cell 0
      (2L, Array(1.0, 1e-9)),  // near-dup of 1, cell 0
      (3L, Array(5.0, 0.3)),   // cell 0, NOT a dup of 1/2 at tau=0.999
      (4L, Array(0.0, 0.0))    // degenerate zero-norm, lands in cell 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding", cents,
      tau = 0.999)
    try {
      val rows = out.collect()
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
      // without the guard, 4's NaN cosine orders >= tau against EVERY
      // cell member and the whole cell collapses into one component
      assert(rows(1L)._1 == rows(2L)._1, "the real dup pair must merge")
      assert(rows(3L)._1 != rows(1L)._1,
        s"3 is not a duplicate and must keep its own component: $rows")
      assert(rows(4L) == ((4L, true)),
        s"the zero-norm row must keep as its own component: ${rows(4L)}")
    } finally graft.engine.Checkpoints.release(out)
    // incremental form: a zero-norm BATCH vector keeps (never dup_of)
    val path = java.nio.file.Files.createTempDirectory("graft_semdd_zn").toString
    graft.cli.Cleanup.deleteOnExit(path)
    val idx = Similarity.ivfBuild(spark,
      vecs.where(col("vec_id") <= 3L), "vec_id", "embedding",
      k = 1, path = path, centroids = Some(cents.toDF("cell", "ce")))
    val inc = Similarity.semDedupIncremental(idx,
        Similarity.collectCentroids(cents.toDF("cell", "ce")),
        Seq((9L, Array(0.0, 0.0))).toDF("vec_id", "embedding"), tau = 0.999)
      .collect().head
    assert(inc.isNullAt(3) && inc.getBoolean(4),
      s"zero-norm batch vector must keep: $inc")
  }

  test("unigramDrift: hand-checked KL, identical stratum at zero, missing-term smoothing") {
    // corpus: A = "x x y", B = "x y z"; vocab {x,y,z}, N=6, V=3
    val df = Seq(("A", "x x y"), ("B", "x y z")).toDF("src", "text")
    val out = TextOps.unigramDrift(df, "text", "src")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def kl(cs: Map[String, Int], ns: Int): Double = {
      val tot = Map("x" -> 3, "y" -> 2, "z" -> 1)
      val (nn, v) = (6, 3)
      val bits = tot.keys.toSeq.sorted.map { w =>
        val p = (cs.getOrElse(w, 0) + 1).toDouble / (ns + v)
        val q = (tot(w) + 1).toDouble / (nn + v)
        p * (math.log(p / q) / math.log(2.0))
      }.sum
      BigDecimal(bits).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out("A") == ((3L, 2L, kl(Map("x" -> 2, "y" -> 1), 3))),
      s"got ${out("A")}")
    assert(out("B") == ((3L, 3L, kl(Map("x" -> 1, "y" -> 1, "z" -> 1), 3))),
      s"got ${out("B")}")
    // a stratum identical to the corpus distribution has zero drift
    val same = Seq(("A", "x y"), ("B", "x y")).toDF("src", "text")
    val z = TextOps.unigramDrift(same, "text", "src")
      .collect().map(_.getDouble(3))
    assert(z.forall(_ == 0.0), s"identical strata must be at 0: ${z.toSeq}")
    // terms_used counts only the stratum's own vocabulary (B lacks z)
    val out2 = TextOps.unigramDrift(
        Seq(("A", "x z"), ("B", "x x")).toDF("src", "text"), "text", "src")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out2 == Map("A" -> 2L, "B" -> 1L), s"got $out2")
  }

  test("unigramDriftAgainst: frozen reference, union-vocab smoothing, novel-term charge") {
    import graft.operators.TextOps
    val model = TextOps.unigramModel(
      Seq((1L, "x x y")).toDF("doc_id", "text"), "text")
    // a batch with the model's exact distribution and size diverges zero
    val z = TextOps.unigramDriftAgainst(
        Seq(("A", "x x y")).toDF("src", "text"), model, "text", "src")
      .collect().head
    assert(z.getDouble(3) == 0.0, s"identical batch must be at 0: $z")
    // a novel term enters the union vocab: charged against the model's
    // smoothing floor, finite, and positive
    val drifted = TextOps.unigramDriftAgainst(
        Seq(("B", "zzz zzz x")).toDF("src", "text"), model, "text", "src")
      .collect().head
    assert(drifted.getLong(1) == 3L && drifted.getLong(2) == 2L, s"$drifted")
    assert(!drifted.getDouble(3).isNaN && !drifted.getDouble(3).isInfinite
      && drifted.getDouble(3) > 0.0, s"$drifted")
    // hand-check: vocab {x,y,zzz} V=3, model n=3; batch B n=3
    val p = Seq("x" -> 1, "y" -> 0, "zzz" -> 2).map { case (_, c) => (c + 1).toDouble / 6 }
    val q = Seq("x" -> 2, "y" -> 1, "zzz" -> 0).map { case (_, c) => (c + 1).toDouble / 6 }
    val kl = p.zip(q).map { case (pi, qi) => pi * (math.log(pi / qi) / math.log(2.0)) }.sum
    val expect = BigDecimal(kl).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(drifted.getDouble(3) == expect, s"${drifted.getDouble(3)} vs $expect")
  }

  test("psiDrift: hand-checked bins and PSI, identical stratum at zero, tie goes low") {
    import graft.operators.TextOps
    // reference [1,2,3,4]: bins=2 edge = quantile_cont(0.5) = 2.5
    val ref = Seq(1L, 2L, 3L, 4L).map(v => ("r", v)).toDF("src", "v")
    // A sits entirely below the edge, B entirely above, C mirrors ref
    val scored = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L),
      ("C", 1L), ("C", 2L), ("C", 3L), ("C", 4L)).toDF("src", "v")
    val out = TextOps.psiDrift(scored, ref, "v", "src", bins = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def psi(cs: Seq[Int], cr: Seq[Int]): Double = {
      val (ns, nr, b) = (cs.sum, cr.sum, cs.length)
      val x = cs.zip(cr).map { case (c, r0) =>
        val p = (c + 1).toDouble / (ns + b); val q = (r0 + 1).toDouble / (nr + b)
        (p - q) * math.log(p / q)
      }.sum
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out("A") == ((2L, psi(Seq(2, 0), Seq(2, 2)))), s"got ${out("A")}")
    assert(out("B") == ((2L, psi(Seq(0, 2), Seq(2, 2)))), s"got ${out("B")}")
    // C matches the reference distribution AND size: exactly zero
    assert(out("C") == ((4L, 0.0)), s"got ${out("C")}")
    assert(out("A")._2 > 0.2 && out("B")._2 > 0.2,
      "a fully shifted stratum must clear the conventional 0.2 bar")
    // tie rule: a value EQUAL to an edge bins low (strictly-greater count)
    val tied = TextOps.psiDrift(
        Seq(("T", 25L)).toDF("src", "v"),
        Seq(10L, 20L, 30L, 40L).map(v => ("r", v)).toDF("src", "v"),
        "v", "src", bins = 2)
      .collect().head
    // edge = 25.0; 25 > 25 is false -> bin 0; PSI of (1,0) vs (2,2)
    assert(tied.getDouble(2) == psi(Seq(1, 0), Seq(2, 2)), s"$tied")
  }

  test("bqQuantize: sign-bit packing incl. bit 63; search ranks the query itself at hamming 0") {
    // 4-dim: bits at dims 0 and 3 (zero and negative clear) -> 0b1001
    val small = Seq((1L, Array(1.0f, -1.0f, 0.0f, 0.5f))).toDF("vec_id", "embedding")
    val code = Similarity.bqQuantize(small, "vec_id", "embedding")
      .collect().head.getLong(1)
    assert(code == 9L, s"expected 0b1001, got $code")
    // dim 63 set -> the sign bit of the packed long (negative value)
    val hi = Seq((2L, Array.tabulate(64)(i => if (i == 63) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val hiCode = Similarity.bqQuantize(hi, "vec_id", "embedding")
      .collect().head.getLong(1)
    assert(hiCode == Long.MinValue, s"got $hiCode")
    // end-to-end: the query vector itself is hamming 0 and cosine 1 at rank 1
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 80L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val out = Similarity.bqSearchRerank(vecs, vecs.where(col("vec_id") === 3L),
        "vec_id", "embedding", shortlist = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    assert(out.length == 5)
    assert(out.head == ((3L, 3L, 0L, 1.0, 1)), s"got ${out.head}")
    assert(out.forall(_._1 == 3L))
    // >64 dims would silently alias bits (Java shift is mod 64) — the
    // operator must fault loudly instead
    val wide = Seq((9L, Array.fill(65)(1.0f))).toDF("vec_id", "embedding")
    val err = intercept[Exception](
      Similarity.bqQuantize(wide, "vec_id", "embedding").collect())
    assert(err.getMessage != null &&
      (err.getMessage.contains("bqQuantize") ||
        Option(err.getCause).exists(_.getMessage.contains("bqQuantize"))),
      s"expected the loud 64-dim fault, got: ${err.getMessage}")
  }

  test("matryoshkaRecall: full-dim truncation is recall 1; a planted tail-flip drops it") {
    // 2 dims; query [1, 0]: full ranking prefers 10 (aligned), but the
    // FIRST-dim truncation sees only dim 0 where 11 ties ahead by id
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (10L, Array(0.9f, 0.1f)),
      (11L, Array(0.9f, -2.0f))
    ).toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") === 1L)
    val full = Similarity.matryoshkaRecall(vecs, q, "vec_id", "embedding",
        dim = 2, k = 2).collect().head
    assert(full.getLong(1) == 2L && full.getDouble(2) == 1.0, s"$full")
    val cut = Similarity.matryoshkaRecall(vecs, q, "vec_id", "embedding",
        dim = 1, k = 2).collect().head
    // dim-1 cosines all tie at 1.0 -> top-2 by id = {1, 10}; full top-2
    // = {1, 10} too... assert against the independently computed truth
    val fullTop = Similarity.bruteForceTopKBatch(vecs, q, "vec_id", "embedding", 2)
      .collect().map(_.getLong(1)).toSet
    val truncTop = Similarity.bruteForceTopKBatch(
        vecs.withColumn("embedding", slice(col("embedding"), 1, 1)),
        q.withColumn("embedding", slice(col("embedding"), 1, 1)),
        "vec_id", "embedding", 2)
      .collect().map(_.getLong(1)).toSet
    val expect = (fullTop & truncTop).size
    assert(cut.getLong(1) == expect.toLong &&
      cut.getDouble(2) == expect / 2.0, s"$cut vs overlap $expect")
  }

  test("matryoshkaRecall: oversized dim faults loudly instead of clamping to recall 1") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") === 1L)
    val err = intercept[Exception](
      Similarity.matryoshkaRecall(vecs, q, "vec_id", "embedding",
        dim = 3, k = 1).collect())
    assert(err.getMessage != null &&
      (err.getMessage.contains("matryoshkaRecall") ||
        Option(err.getCause).exists(_.getMessage.contains("matryoshkaRecall"))),
      s"expected the loud oversized-dim fault, got: ${err.getMessage}")
  }

  test("matryoshkaRecall: a zero prefix drops from the truncated ranking instead of faulting") {
    // vec 9's first dim is zero: valid at full dimension, directionless
    // under dim-1 truncation — it must neither fault the job (ANSI
    // divide-by-zero) nor be retrievable by the prefix store
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.8f, 0.1f)),
      (9L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") === 1L)
    val out = Similarity.matryoshkaRecall(vecs, q, "vec_id", "embedding",
      dim = 1, k = 2).collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L,
      s"truncated top-2 should be {1, 2} (9 dropped): ${out.toSeq}")
    // a zero-prefix QUERY keeps its row with recall 0
    val qz = vecs.where(col("vec_id") === 9L)
    val zq = Similarity.matryoshkaRecall(vecs, qz, "vec_id", "embedding",
      dim = 1, k = 2).collect().head
    assert(zq.getLong(1) == 0L && zq.getDouble(2) == 0.0, s"$zq")
  }

  test("alignmentScore: a caller column colliding with a norm temporary fails loudly") {
    val pairs = Seq((1L, Array(1.0f), Array(1.0f), "x"))
      .toDF("id", "ea", "eb", "__align_na")
    val err = intercept[IllegalArgumentException](
      Similarity.alignmentScore(pairs, "ea", "eb"))
    assert(err.getMessage.contains("__align_na"), err.getMessage)
  }

  test("assignCellsLit: literal-centroid assignment equals the broadcast-join formulation") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "embedding")
    val centsDf = Seq(
      (0L, Seq.fill(8)(rnd.nextDouble())),
      (1L, Seq.fill(8)(rnd.nextDouble() - 1)),
      (2L, Seq.fill(8)(rnd.nextDouble() * 2 - 1))).toDF("cell", "ce")
    val viaJoin = Similarity.assignCells(vecs, "vec_id", "embedding", centsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLit = Similarity.assignCellsLit(vecs, "vec_id", "embedding",
        Similarity.collectCentroids(centsDf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaJoin == viaLit)
  }

  test("packBinsBfd: hand-checked best-fit-decreasing; next-fit baseline uses more bins; oversized doc isolates") {
    // budget 10; sizes desc: 6(a) 5(b) 4(c) 3(d) 2(e)
    // BFD: a->bin0(6); b->bin1(5); c->bin0? 6+4=10 fits -> bin0(10);
    //      d->bin1(5+3=8); e->bin1(8+2=10). Bins: 2.
    val df = Seq((1L, 6L), (2L, 5L), (3L, 4L), (4L, 3L), (5L, 2L))
      .toDF("id", "tok").withColumn("g", lit("x"))
    val bfd = TextOps.packBinsBfd(df, "id", Seq("g"), col("tok"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bfd == Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 1L), bfd)
    // next-fit in id order: 6 -> b0; 5 doesn't fit b0 -> b1; 4 doesn't
    // fit b1(5+4=9 fits!) -> b1; 3 doesn't fit b1(9+3) -> b2; 2 -> b2.
    val nf = TextOps.packBinsNextFit(df, "id", Seq("g"), col("tok"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(nf == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L), nf)
    assert(bfd.values.toSet.size <= nf.values.toSet.size)
    // an over-budget document opens its own overfull singleton
    val big = TextOps.packBinsBfd(
        Seq((1L, 25L), (2L, 5L)).toDF("id", "tok").withColumn("g", lit("x")),
        "id", Seq("g"), col("tok"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(big(1L) != big(2L), big)
    // the packChunks precondition holds here too
    val err = intercept[Exception](TextOps.packBinsBfd(
      Seq((1L, 0L)).toDF("id", "tok").withColumn("g", lit("x")),
      "id", Seq("g"), col("tok"), 10).collect())
    assert(err.getMessage != null && (err.getMessage.contains("packBins") ||
      Option(err.getCause).exists(_.getMessage.contains("packBins"))))
  }

  test("pocketPerceptronTrain: separable toy converges to zero errors; apply agrees with the label") {
    // label = "long doc": 8-token docs vs 2-token docs — separable by
    // the length feature alone
    val docs = (0L until 20L).map { i =>
      val long = i % 2 == 0
      (i, if (long) "aa bb cc dd ee ff gg hh" else "aa bb")
    }.toDF("doc_id", "text")
    val label = size(TextOps.tokens(col("text"))) >= 5
    val m = TextOps.pocketPerceptronTrain(docs, "text", "doc_id", label,
      dims = 4, rounds = 6, seed = 53)
    assert(m.pocketErrors == 0L, s"pocket errors ${m.pocketErrors}")
    assert(m.weights.size == 6)
    val scored = TextOps.pocketScore(docs, "text", "doc_id", m)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0L until 20L).foreach { i =>
      assert(scored(i) == (i % 2 == 0), s"doc $i")
    }
    // integer determinism: a second fit is bit-identical
    val m2 = TextOps.pocketPerceptronTrain(docs, "text", "doc_id", label,
      dims = 4, rounds = 6, seed = 53)
    assert(m2 == m)
  }

  test("canonicalUrl: RFC 3986 cosmetic variants collapse, genuine differences survive") {
    def canon(u: String): String =
      Seq(Tuple1(u)).toDF("u")
        .select(TextOps.canonicalUrl(col("u"))).collect().head.getString(0)
    // case, default port, trailing slash, query order, fragment
    assert(canon("HTTP://Example.COM:80/a/b/?y=2&x=1#frag") ==
      "http://example.com/a/b?x=1&y=2")
    assert(canon("https://example.com:443/a") == "https://example.com/a")
    assert(canon("http://example.com/") == "http://example.com")
    assert(canon("http://example.com/?") == "http://example.com")
    // non-default port, path case, and a different path are significant
    assert(canon("http://example.com:8080/A") == "http://example.com:8080/A")
    assert(canon("http://example.com/a") != canon("http://example.com/b"))
    // https default-port stripping is scheme-aware
    assert(canon("http://example.com:443/a") == "http://example.com:443/a")
    // no scheme: pass through trimmed, untouched
    assert(canon("  not a url  ") == "not a url")
    // urlDedup collapses exactly the cosmetic variants
    val df = Seq(
      (1L, "http://a.com/x?p=1&q=2"),
      (2L, "HTTP://A.COM:80/x/?q=2&p=1"),
      (3L, "http://a.com/y?p=1&q=2")
    ).toDF("doc_id", "url")
    val got = Dedup.urlDedup(df, "url", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L), (3L, 1L)), got)
  }

  test("tokensScriptAware: per-codepoint CJK, surrogate pairs stay whole, Latin keeps word boundaries") {
    // U+20000 (CJK ext-B) is a surrogate PAIR in UTF-16 — the codepoint
    // class must match it as ONE token, never split the surrogates
    val extB = new String(Character.toChars(0x20000))
    val df = Seq((1L, s"abc$extB def漢字 x")).toDF("id", "text")
    val got = df.select(TextOps.tokensScriptAware(col("text")))
      .collect().head.getSeq[String](0)
    assert(got == Seq("abc", extB, "def", "漢", "字", "x"), got)
    // hangul + kana segment too; plain Latin is untouched
    val got2 = Seq((1L, "한글とカナ plain words")).toDF("id", "text")
      .select(TextOps.tokensScriptAware(col("text")))
      .collect().head.getSeq[String](0)
    assert(got2 == Seq("한", "글", "と", "カ", "ナ", "plain", "words"), got2)
    // the whitespace tokenizer sees the same CJK run as ONE token — the
    // coarsening q173 makes measurable
    val ws = Seq((1L, "한글とカナ")).toDF("id", "text")
      .select(TextOps.tokens(col("text"))).collect().head.getSeq[String](0)
    assert(ws == Seq("한글とカナ"), ws)
  }

  test("shingles(segment): catches an unsegmented-CJK near-dup the whitespace mode cannot see") {
    val df = Seq(
      (1L, "漢字一二三四五"),
      (2L, "漢字一二三四八"),   // shares 4 of 5 codepoint 3-grams with 1
      (3L, "九十百千万億兆")
    ).toDF("doc_id", "text")
    val sa = Dedup.shingles(df, "text", "doc_id", 3, segment = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sa.count(_._1 == 1L) == 5, sa)
    val shared = sa.filter(_._1 == 1L).map(_._2) &
      sa.filter(_._1 == 2L).map(_._2)
    assert(shared.size == 4, shared)
    // whitespace mode: each doc is one token -> no 3-grams at all
    val ws = Dedup.shingles(df, "text", "doc_id", 3)
    assert(ws.count() == 0L)
    // normalize would silently delete the CJK — composing is a loud error
    val err = intercept[IllegalArgumentException](
      Dedup.shingles(df, "text", "doc_id", 3,
        normalize = true, segment = true))
    assert(err.getMessage.contains("mutually exclusive"), err.getMessage)
  }
}
