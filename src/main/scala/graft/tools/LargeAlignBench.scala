package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N evidence run for the paired-modality alignment gate
  * (`Similarity.alignmentFilter` / `alignmentQuantileKeep` — q152/q153,
  * the gate leg of the q159 curation pipeline): a deterministic
  * synthetic pair table with PLANTED misaligned and dead-encoder rows,
  * at pair counts the sf testdata can't reach.
  *
  * Corpus: `n` (text, image) embedding pairs, 16-d; the image side of
  * an aligned pair is the text side scaled by 1.1 (cosine exactly 1);
  * every 1000th pair is PLANTED misaligned (image = −text, cosine −1);
  * every 5000th + 1 is a DEAD-ENCODER row (image all-zero → NaN score,
  * the q152 drop contract). Components are md5-derived
  * ([[graft.operators.Similarity.planeCoef]] — no RNG, reruns
  * identical) and offset by +2 so no aligned pair is zero-norm.
  *
  * Claims under test:
  *  - the score is one map-only pass (no exchange added to the pair
  *    scan — the q152 PlanSpec pin, here measured as wall-clock at 10⁶);
  *  - the absolute-τ gate recovers EXACTLY the planted misaligned set
  *    and drops every dead-encoder row (NaN never sails through,
  *    require-gated);
  *  - the per-stratum quantile form (approx_percentile, the documented
  *    100 TB flip) prices its threshold pass at one map-side-combinable
  *    aggregate and its gate still excludes every planted misaligned
  *    pair.
  *
  * Usage: `sbt "runMain graft.tools.LargeAlignBench [n]"` (default
  * 1_000_000). Results recorded in `bench/large_align.txt` and
  * BASELINE.md ("Large-N alignment evidence").
  */
object LargeAlignBench {
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
      println(f"$name%-46s $s%9.2f s"); (r, s)
    }
    import graft.operators.Similarity

    val dims = 16
    val misEvery = 1000L
    val deadEvery = 5000L
    // text side: md5-derived components shifted to [1, 3] (never
    // zero-norm); image side: aligned = 1.1x text, misaligned = -text,
    // dead = zeros
    val ea = transform(sequence(lit(0), lit(dims - 1)), d =>
      (Similarity.planeCoef(col("id"), d) + lit(2.0)).cast("float"))
    val eb = when(pmod(col("id"), lit(deadEvery)) === 1,
        transform(sequence(lit(0), lit(dims - 1)), _ => lit(0.0f)))
      .when(pmod(col("id"), lit(misEvery)) === 0,
        transform(ea, v => -v))
      .otherwise(transform(ea, v => v * lit(1.1f)))
    val pairs = spark.range(n)
      .select(col("id").as("pair_id"), ea.as("ea"), eb.as("eb"),
        pmod(col("id"), lit(4)).cast("int").as("src"))
      .cache()
    val nMis = pairs.where(pmod(col("pair_id"), lit(misEvery)) === 0 &&
      pmod(col("pair_id"), lit(deadEvery)) =!= 1).count()
    val nDead = pairs.where(pmod(col("pair_id"), lit(deadEvery)) === 1).count()
    println(s"n = $n pairs, $dims-d; planted: $nMis misaligned, " +
      s"$nDead dead-encoder")
    time("pair table materialize")(pairs.count())

    // absolute-tau gate: one map-only pass; audit the whole verdict
    // frame in one aggregate
    val (audit, _) = time("alignmentFilter tau=0.3 (score + gate + audit)")(
      Similarity.alignmentFilter(pairs, "ea", "eb", tau = 0.3)
        .agg(
          sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
          sum(when(!col("keep") &&
            pmod(col("pair_id"), lit(misEvery)) === 0 &&
            pmod(col("pair_id"), lit(deadEvery)) =!= 1, 1L).otherwise(0L))
            .as("mis_dropped"),
          sum(when(!col("keep") && isnan(col("align_cos")), 1L)
            .otherwise(0L)).as("dead_dropped"),
          sum(when(col("keep") && (isnan(col("align_cos")) ||
            col("align_cos") < 0.3), 1L).otherwise(0L)).as("bad_keeps"))
        .head())
    println(s"  kept ${audit.getLong(0)} " +
      s"(expect ${n - nMis - nDead}); misaligned dropped " +
      s"${audit.getLong(1)}/$nMis; dead dropped ${audit.getLong(2)}/$nDead; " +
      s"NaN-or-below-tau keeps ${audit.getLong(3)} (expect 0)")
    require(audit.getLong(0) == n - nMis - nDead &&
      audit.getLong(1) == nMis && audit.getLong(2) == nDead &&
      audit.getLong(3) == 0L, "alignment gate audit failed")

    // per-stratum quantile gate at the 100 TB setting (approx
    // thresholds, t-digest): every planted misaligned id is a multiple
    // of 1000, hence ≡ 0 mod 4 — they ALL land in stratum 0 as its
    // bottom 0.4%. q = 0.008 puts each stratum's threshold above that
    // block (t-digest rank error 1e-4 ≪ the 0.4% margin), so the gate
    // must drop exactly the planted pairs and keep every aligned one
    val (qk, _) = time("alignmentQuantileKeep q=0.008 approx, 4 strata")(
      Similarity.alignmentQuantileKeep(pairs, "pair_id", "src",
          "ea", "eb", q = 0.008, exact = false)
        .agg(
          // quantileKeep's kept is an INT flag (0/1), not boolean
          sum(when(col("kept") === 1, 1L).otherwise(0L)).as("kept"),
          sum(when(col("kept") === 1 &&
            pmod(col("pair_id"), lit(misEvery)) === 0, 1L).otherwise(0L))
            .as("mis_kept"))
        .head())
    println(s"  kept ${qk.getLong(0)} of ${n - nDead} scored " +
      s"(expect ${n - nDead - nMis}); misaligned kept ${qk.getLong(1)} " +
      s"(expect 0)")
    require(qk.getLong(0) == n - nDead - nMis && qk.getLong(1) == 0L,
      "quantile gate audit failed")
    spark.stop()
  }
}
