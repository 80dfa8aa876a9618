package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N evidence run for the drift-monitor family
  * (`TextOps.unigramDrift` / `unigramDriftAgainst` / `psiDrift` —
  * q165/q167/q168): a deterministic synthetic corpus with ONE planted
  * drifted source, at document counts the sf testdata can't reach.
  *
  * Corpus: `n` docs across 20 sources; every doc carries 20 words drawn
  * deterministically from a 90k-term vocabulary — except source `src7`,
  * whose docs draw from a disjoint 10k-term tail (vocabulary shift, the
  * q165/q167 signal) AND carry 35 words (length shift, the q168 PSI
  * signal).
  *
  * Claims under test:
  *  - the tokenize → (source, word) count aggregate is ONE map-side-
  *    combinable pass over ~20n token occurrences (never a second scan:
  *    corpus totals / model totals re-aggregate the counts);
  *  - the smoothing grid is vocab × sources (~2M rows at 100k terms),
  *    independent of n;
  *  - PSI's edge vector is one bounded aggregate broadcast back, binning
  *    map-only, the grid bins × sources;
  *  - at any n the planted source is the UNIQUE argmax of all three
  *    monitors (require-gated).
  *
  * Usage: `sbt "runMain graft.tools.DriftBench [n]"` (default
  * 10_000_000; 64g driver heap recommended at that n). Results recorded
  * in BASELINE.md ("Large-N drift evidence") and `bench/large_drift.txt`.
  */
object DriftBench {
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
      println(f"$name%-52s $s%9.2f s"); (r, s)
    }
    import graft.operators.TextOps

    // word k of doc id: deterministic spread over the vocab; the drifted
    // source re-maps into the disjoint tail and writes 15 extra words
    def word(k: Int, tail: Boolean): org.apache.spark.sql.Column = {
      val h = pmod(xxhash64(col("id") * 31 + k), lit(if (tail) 10000L else 90000L))
      concat(lit(if (tail) "z" else "w"), h)
    }
    val normal = concat_ws(" ", (0 until 20).map(word(_, tail = false)): _*)
    val drifted = concat_ws(" ", (0 until 35).map(word(_, tail = true)): _*)
    val docs = spark.range(n).select(
        col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
        when(pmod(col("id"), lit(20)) === 7, drifted).otherwise(normal)
          .as("text"))
      .cache()
    println(s"n = $n docs, 20 sources, src7 planted drifted " +
      "(disjoint 10k-term tail vocab + 35-word docs)")
    time("corpus materialize")(docs.count())

    val (kl, _) = time("unigramDrift (self-referential, q165 shape)")(
      TextOps.unigramDrift(docs, "text", "source")
        .orderBy(desc("kl_bits")).limit(3).collect())
    println("  top KL: " + kl.map(r =>
      s"${r.getString(0)}=${r.getDouble(3)}").mkString(", "))
    require(kl.head.getString(0) == "src7", "planted source must lead q165")
    require(kl.head.getDouble(3) > 2 * kl(1).getDouble(3),
      "planted source must out-diverge decisively")

    val (_, tm) = time("unigramModel over the 19 clean sources")(
      TextOps.unigramModel(
        docs.where(col("source") =!= "src7"), "text").cache().count())
    val model = TextOps.unigramModel(
      docs.where(col("source") =!= "src7"), "text").cache()
    val (klf, _) = time("unigramDriftAgainst the frozen model (q167 shape)")(
      TextOps.unigramDriftAgainst(docs, model, "text", "source")
        .orderBy(desc("kl_bits")).limit(3).collect())
    println("  top frozen-KL: " + klf.map(r =>
      s"${r.getString(0)}=${r.getDouble(3)}").mkString(", "))
    require(klf.head.getString(0) == "src7", "planted source must lead q167")

    val scored = docs.select(col("doc_id"), col("source"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
    val ref = scored.where(col("source") =!= "src7")
    val (psi, _) = time("psiDrift on token count vs clean reference (q168 shape)")(
      TextOps.psiDrift(scored, ref, "n_tok", "source")
        .orderBy(desc("psi")).limit(3).collect())
    println("  top PSI: " + psi.map(r =>
      s"${r.getString(0)}=${r.getDouble(2)}").mkString(", "))
    require(psi.head.getString(0) == "src7", "planted source must lead q168")
    require(psi.head.getDouble(2) > 0.2,
      "planted length shift must clear the conventional 0.2 bar")
    println(f"model build wall (one pass, reusable artifact): $tm%.2f s")
    spark.stop()
  }
}
