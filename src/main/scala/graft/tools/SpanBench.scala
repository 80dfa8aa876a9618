package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N evidence run for the exact-substring span family
  * (`Dedup.spanWindows` / `repeatedSpans` / `contaminatedSpans` —
  * q96/q105): a deterministic synthetic corpus with PLANTED duplicated
  * spans, at document counts the sf testdata can't reach.
  *
  * Corpus: `n` docs of 40 unique-per-doc tokens; every 10th doc carries
  * the same 12-token litany spliced into its middle (so ~n/10 docs share
  * a cross-corpus duplicated span and the rest contribute only unique
  * windows). Eval set for the contamination leg: 100 synthetic docs
  * containing the litany — every carrier doc is contaminated at exactly
  * the planted positions.
  *
  * Claims under test:
  *  - window generation is map-only and linear in corpus tokens;
  *  - occurrence counting / eval membership exchange ONLY the 8 B window
  *    hash + position (never window text) — payload measured here;
  *  - the per-doc merge is linear in hit positions, and hit positions
  *    are bounded by planted-span occurrences, not corpus size;
  *  - span outputs land exactly on the planted offsets at any n.
  *
  * Usage: `sbt "runMain graft.tools.SpanBench [n]"` (default 1_000_000).
  * Results recorded in BASELINE.md ("Large-N span evidence") and
  * `bench/large_span_1e6.txt`.
  */
object SpanBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
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
      println(f"$name%-44s $s%9.2f s"); (r, s)
    }
    import graft.operators.Dedup

    // 40 tokens/doc, unique per doc (token = "t<doc>_<i>"); carriers
    // (doc % 10 == 0) splice the litany at token offset 14..25
    val litany = (0 until 12).map(i => s"lit$i").mkString(" ")
    val uniq = (from: Int, until: Int) =>
      concat_ws(" ", (from until until).map(k =>
        concat(lit(s"t"), col("id"), lit(s"_$k"))): _*)
    val text = when(pmod(col("id"), lit(10)) === 0,
        concat_ws(" ", uniq(0, 14), lit(litany), uniq(100, 114)))
      .otherwise(uniq(0, 40))
    val docs = spark.range(n)
      .select(col("id").as("doc_id"), text.as("text"))
      .cache()
    println(s"n = $n docs, 40 tokens each, ${n / 10} litany carriers")
    time("corpus materialize")(docs.count())

    val w = 8
    val (hit, _) = time(s"repeatedSpans w=$w (count + merge + audit)")(
      Dedup.repeatedSpans(docs, "text", "doc_id", w)
        .agg(count(lit(1)).as("n"),
          min("span_start"), max("span_end"), max(col("doc_id") % 10))
        .head())
    println(s"spans: ${hit.getLong(0)} (expect ${n / 10}); " +
      s"offsets ${hit.get(1)}..${hit.get(2)} (expect 14..25); " +
      s"all carriers: doc_id%10 max = ${hit.get(3)} (expect 0)")

    val evalDocs = spark.range(100)
      .select((col("id") + 10000000L).as("doc_id"),
        concat(lit("e"), col("id"), lit(" "), lit(litany), lit(" x y z"))
          .as("text"))
    val (_, _) = time(s"contaminatedSpans w=$w vs 100-doc eval set")(
      Dedup.contaminatedSpans(docs, evalDocs, "text", "doc_id", w).count())
    val cs = Dedup.contaminatedSpans(docs, evalDocs, "text", "doc_id", w)
      .agg(count(lit(1)), min("span_start"), max("span_end")).head()
    println(s"contaminated spans: ${cs.getLong(0)} (expect ${n / 10}); " +
      s"offsets ${cs.get(1)}..${cs.get(2)} (expect 14..25)")

    // shuffle payload: the occurrence-count exchange carries (wh, ...) —
    // measure on-wire bytes/window-row of the whole pipeline (the
    // ShuffleBytes traversal: every exchange of the final plan)
    val winRows = n * (40 - w + 1)
    val rs = Dedup.repeatedSpans(docs, "text", "doc_id", w)
    rs.collect()
    val shuffled = graft.plans.PlanWalk.flatten(rs.queryExecution.executedPlan)
      .collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
      }.sum
    println(f"window rows: $winRows%,d; total shuffle wire ${shuffled / 1e6}%.1f MB " +
      f"= ${shuffled.toDouble / winRows}%.1f B/window-row (hash+pos, never text)")

    // the STRIP (q163's shape) at the same n: excise every duplicated
    // span and rebuild — carriers must come back as exactly their 28
    // unique tokens (litany gone, nothing else touched), non-carriers
    // verbatim. One agg audits the whole rebuilt corpus.
    val (audit, _) = time(s"stripRepeatedSpans w=$w (excise + rebuild + audit)")(
      Dedup.stripRepeatedSpans(docs, "text", "doc_id", w)
        .agg(
          sum(when(pmod(col("doc_id"), lit(10)) === 0 &&
            size(graft.operators.TextOps.tokens(col("text"))) === 28 &&
            instr(col("text"), "lit") === 0, 1L).otherwise(0L))
            .as("carriers_ok"),
          sum(when(pmod(col("doc_id"), lit(10)) =!= 0 &&
            size(graft.operators.TextOps.tokens(col("text"))) === 40, 1L)
            .otherwise(0L)).as("clean_ok"))
        .head())
    println(s"strip audit: carriers rebuilt litany-free ${audit.getLong(0)} " +
      s"(expect ${n / 10}); non-carriers verbatim ${audit.getLong(1)} " +
      s"(expect ${n - n / 10})")
    require(audit.getLong(0) == n / 10 && audit.getLong(1) == n - n / 10,
      "strip audit failed")
    spark.stop()
  }
}
