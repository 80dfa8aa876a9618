package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N evidence run for the curation-side operators added in round 7:
  * PII redaction (map-only regex pass), deterministic hash split
  * (map-only), sequence packing (one group-key window), and the
  * per-stratum quantile gate (t-digest path). The claims under test: the
  * map-only passes scale with row count and never shuffle; packing's cost
  * is one hash exchange + per-group sort; the approx quantile gate stays
  * map-side combinable (no per-stratum value buffering).
  *
  * Corpus shape: `n` synthetic docs, deterministic text derived from the
  * id (templated words + an id-dependent email/ip/number trailer so the
  * redaction regexes do real work on every row), 20 sources × 5 langs as
  * the group keys — the testdata's shape at 10^7 rows.
  *
  * Usage: `sbt "runMain graft.tools.LargeCurationBench [n]"`
  * Default n = 10,000,000. Results recorded in BASELINE.md
  * ("Large-N curation evidence").
  */
object LargeCurationBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-34s $s%9.2f s"); (r, s)
    }
    import graft.operators.TextOps

    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val wordArr = array(words.map(lit).toIndexedSeq: _*)
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        element_at(wordArr, (pmod(col("id"), lit(12)) + 1).cast("int")),
        element_at(wordArr, (pmod(col("id") * 7, lit(12)) + 1).cast("int")),
        element_at(wordArr, (pmod(col("id") * 31, lit(12)) + 1).cast("int")),
        lit("contact"),
        concat(lit("u"), col("id").cast("string"), lit("@example.com")),
        lit("from"),
        concat(lit("10.0."), pmod(col("id"), lit(256)).cast("string"), lit(".7")),
        lit("ref"),
        concat(lit("90012345"), col("id").cast("string"))).as("text"),
      concat(lit("src"), pmod(col("id"), lit(20)).cast("string")).as("source"),
      element_at(array(lit("en"), lit("de"), lit("fr"), lit("es"), lit("zh")),
        (pmod(col("id"), lit(5)) + 1).cast("int")).as("lang"))

    println(s"n = $n docs (synthetic, deterministic)")

    val (_, tRedact) = time("redactPii (map-only)") {
      TextOps.redactPii(docs, "text", "doc_id")
        .agg(sum("n_pii")).collect()(0).getLong(0)
    }
    println(f"  redact throughput: ${n / tRedact / 1e6}%.1f M docs/s")

    time("hashSplit (map-only)") {
      TextOps.hashSplit(docs, "doc_id")
        .groupBy("split").count().collect()
    }

    // finer partition cols than the sf0.1 query (source × lang, 100
    // groups): the scale knob the operator scaladoc prescribes — group
    // count, not corpus size, bounds per-task window work
    time("packChunks (group-key window)") {
      TextOps.packChunks(docs, "doc_id", Seq("source", "lang"),
          TextOps.tokenCount(col("text")), 2048)
        .agg(max("chunk_id")).collect()
    }

    // the one curation op that carries TEXT through a per-group buffer
    // (collect_list in the chunk assembly) — its memory profile is the
    // claim worth evidencing: chunk populations are budget-bounded by
    // construction, so the buffer is ~chunkTokens of text per group,
    // never a stratum's worth
    time("packText (text through collect_list)") {
      TextOps.packText(
          docs.select(col("doc_id"), col("source"), col("lang"), col("text")),
          "doc_id", Seq("source", "lang"), "text",
          TextOps.tokenCount(col("text")), 2048)
        .agg(count(lit(1)).as("n_chunks"),
          max(length(col("chunk_text"))).as("max_chunk_chars")).collect()
    }

    time("quantileKeep (t-digest path)") {
      TextOps.quantileKeep(docs, "doc_id", "lang",
          TextOps.tokenCount(col("text")), q = 0.25, exact = false)
        .groupBy("lang", "kept").count().collect()
    }

    time("groupQuota (window per stratum)") {
      TextOps.groupQuota(docs.select(col("doc_id"),
          col("source"), col("lang"),
          TextOps.tokenCount(col("text")).as("nt")),
          "doc_id", "source", col("nt"), k = 1000)
        .groupBy("source").count().collect()
    }

    time("budgetSelect (window per stratum)") {
      TextOps.budgetSelect(docs.select(col("doc_id"), col("lang"),
          TextOps.tokenCount(col("text")).as("nt")),
          "doc_id", "lang", col("nt"), col("nt"), budget = 1000000L)
        .groupBy("lang").count().collect()
    }

    // --- crawl-to-corpus composition (round 14, the q241 pipeline) ---
    // the IDENTICAL require-gated code path the gate runs (every plant's
    // recovery asserted inside), at nCc docs: WARC fixture written to
    // disk, read back through the record parser, and the full eleven
    // stages to the split — ONE wall number for the whole composition
    // plus the funnel. Text: >= 40 tokens with stopwords (the binding
    // quality rule keeps prose) and id-salted tails so 8-gram decon
    // windows are verbatim-unique per doc.
    val nCc = math.max(n / 5, 100000L)
    // 10 four-word prose blocks with a PER-DOC-UNIQUE salt token after
    // each: >= 40 real tokens with stopwords (quality keeps), and the
    // longest token run shared across docs is 4 < 8 — no cross-doc
    // 8-gram exists except on verbatim copies, so decon drops exactly
    // the surviving eval members (and the require stays meaningful)
    val ccBlocks = Seq(
      "the quick brown fox", "jumps over the lazy", "dog and runs to",
      "the river of words", "that have been written", "with care for every",
      "reader and the story", "goes on and on", "through the long night",
      "while stars shine over")
    val ccText = concat_ws(" ",
      ccBlocks.zipWithIndex.flatMap { case (b, i) =>
        Seq(lit(b),
          concat(lit("s"), col("id").cast("string"), lit(s"x$i")))
      }: _*)
    val ccDocs = spark.range(nCc).select(
      col("id").as("doc_id"), ccText.as("text"))
    val ccPath = s"${sys.props("java.io.tmpdir")}/graft_large_crawlcorpus"
    graft.cli.Cleanup.deleteOnExit(ccPath)
    val (_, tCc) = time(s"crawl-to-corpus ($nCc docs, all stages)") {
      graft.queries.LlmQueries.buildCrawlCorpus(spark, ccDocs, ccPath)
    }
    println(f"  composition throughput: ${nCc / tCc / 1e3}%.1f K docs/s")
    spark.read.parquet(s"$ccPath/funnel")
      .orderBy("stage_idx").collect().foreach { r =>
        println(f"  stage ${r.getInt(0)}%2d ${r.getString(1)}%-14s " +
          f"n=${r.getLong(2)}%10d checksum=${r.getLong(3)}")
      }

    spark.stop()
  }
}
