package graft.tools

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Large-N evidence run for the image-dedup family (q121/q122 shape):
  * dHash over a synthetic image corpus orders of magnitude beyond the
  * testdata, then banded-hamming near-dup pairs. The claims under test:
  * hashing is a map-only decode-stage pass (linear throughput, nothing
  * shuffles but the 32 B of bands); the pair stage is bounded by
  * band-bucket population (candidates ≈ n × mean bucket, never n²); and
  * the planted near-dups are recovered EXACTLY — a 1-byte edit moves a
  * dHash ≤ 1 bit, so every planted pair shares ≥ 3 of 4 bands and
  * nothing random survives the hamming ≤ 3 verify (P ≈ 2⁻⁴⁵ per
  * candidate).
  *
  * Corpus shape: n deterministic 16×16 RGB planes from a splitmix-style
  * byte generator; doc i ≡ 1 (mod 10) clones doc i−1 and flips one byte
  * of the first pixel — n/10 planted near-dup pairs, everything else
  * noise. Deterministic (no RNG): reruns comparable.
  *
  * Usage: `SPARK_DRIVER_MEM=32g sbt "runMain graft.tools.LargeDHashBench [n] [flat]"`
  * Default n = 1,000,000 images. Results recorded in BASELINE.md
  * ("Large-N image-dedup evidence").
  *
  * `pipeline` (implies `flat`) runs the FULL q137 curation shape on the
  * MIXED corpus a real crawl looks like: 80% avalanche images carrying
  * the planted near-dups (doc ids ≡ 0,1 mod 10 — never flat, so their
  * recovery through the cap must be EXACT and is `require`d), 20% flat
  * images (ids ≡ 8,9 mod 10) collapsing onto mega-buckets the cap
  * excludes. Stages: capped pairs → pointer-jump closure → per-cluster
  * keeper (pixel mass, ties to the smallest id) → component-keyed
  * leak-safe split — the end-to-end wall the cap exists to bound, with
  * the keeper/split invariants asserted exactly (one keeper per
  * cluster = the minimum id at tied mass; a cluster never straddles
  * splits).
  *
  * `flat` switches the generator to the NEAR-LINEAR byte function that
  * was this bench's recorded failed first attempt — the mega-bucket
  * regime (brightness gradients mostly seed-independent, the corpus
  * collapses onto a handful of band values; the real-world analogue is
  * flat/letterboxed images and silence-heavy audio). In that mode the
  * UNCAPPED self-join's candidate count (Σ|bucket|², computed from the
  * bucket sizes, never materialized) is printed next to what
  * [[graft.operators.Multimodal.dhashNearDupPairsCapped]] actually
  * generates under a 1000-member bucket cap — the bounded-coverage
  * evidence, with the skipped buckets and their would-be candidate mass
  * reported alongside (partial planted recovery is the documented trade
  * in this regime: those members belong on a triage path, not in a
  * verified-pair join).
  */
object LargeDHashBench {
  final case class Img(doc_id: Long, width: Int, height: Int,
      pixels: Array[Byte])

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val pipelineMode = args.contains("pipeline")
    val flatMode = args.contains("flat") || pipelineMode
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%9.2f s"); r
    }
    val W = 16; val H = 16
    val imgs = spark.range(n).as(Encoders.LONG).mapPartitions { it =>
      it.map { boxed =>
        val i = boxed.longValue
        val seed = if (i % 10 == 1) i - 1 else i
        // pipeline mode mixes the regimes: flat mega-bucket images are
        // the ids ≡ 8,9 (mod 10), disjoint from the planted clone pairs
        // at ids ≡ 0,1 — the cap must exclude the former and not cost
        // one planted pair of the latter
        val flatImg = flatMode && (!pipelineMode || i % 10 >= 8)
        val px = new Array[Byte](W * H * 3)
        var j = 0
        while (j < px.length) {
          if (flatImg) {
            // the recorded failed first attempt, kept ON PURPOSE as the
            // mega-bucket generator: near-linear in (seed, j), so every
            // image's brightness GRADIENT is mostly seed-independent and
            // the corpus collapses onto a handful of identical dHashes
            px(j) = (((seed * 31 + j * 167) >>> 3) & 0xff).toByte
          } else {
            // splitmix64 of (seed, j): full-avalanche bytes — a realistic
            // hash distribution (distinct buckets, bounded populations)
            var z = seed * 0x9e3779b97f4a7c15L + j * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            px(j) = ((z ^ (z >>> 31)) & 0xff).toByte
          }
          j += 1
        }
        if (i % 10 == 1) px(0) = (px(0) ^ 0x7f).toByte
        Img(i, W, H, px)
      }
    }(Encoders.product[Img]).toDF()

    import graft.operators.Multimodal
    // 1. map-only hashing throughput; materialize once for the pair legs
    val hashed = time(s"dHash $n images") {
      graft.engine.Checkpoints.mark(Multimodal.imageDHash(imgs))
    }
    // 2. band-bucket population — the pair stage's fan-out bound
    val bucketStats = time("band-bucket stats") {
      hashed.select(explode(array(
          Seq("b0", "b1", "b2", "b3").zipWithIndex.map { case (c, i) =>
            struct(lit(i).as("band"), col(c).as("v")) }: _*)).as("e"))
        .groupBy("e.band", "e.v").agg(count(lit(1)).as("c"))
        .agg(max("c").as("max"), avg("c").as("mean"), count(lit(1)).as("nb"))
        .head()
    }
    println(s"buckets: max=${bucketStats.getLong(0)} " +
      f"mean=${bucketStats.getDouble(1)}%.1f distinct=${bucketStats.getLong(2)}")
    if (flatMode) {
      // 3-flat. the mega-bucket regime: quote the UNCAPPED candidate mass
      // (Σ|bucket|² over the sizes — never materialized), then run the
      // CAPPED machine and show candidates are bounded by construction
      val sizes = hashed.select(explode(array(
          Seq("b0", "b1", "b2", "b3").zipWithIndex.map { case (c, i) =>
            struct(lit(i).as("band"), col(c).as("v")) }: _*)).as("e"))
        .groupBy("e.band", "e.v").agg(count(lit(1)).as("c"))
      val cap = 1000
      val half = expr("(c * (c - 1)) div 2")
      val mass = sizes.agg(
          sum(half).as("uncapped"),
          sum(when(col("c") <= cap, half).otherwise(lit(0L))).as("capped"),
          sum(when(col("c") > cap, lit(1L)).otherwise(0L)).as("nskip"))
        .head()
      println(s"uncapped candidates=${mass.getLong(0)} " +
        s"capped(<=$cap) candidates=${mass.getLong(1)} " +
        s"skipped buckets=${mass.getLong(2)}")
      val (p, sk) = Multimodal.dhashNearDupPairsCapped(hashed, "doc_id",
        maxHamming = 3, maxBucket = cap)
      val pairs = time(s"CAPPED near-dup pairs (bucket<=$cap)") {
        graft.engine.Checkpoints.mark(p)
      }
      val total = pairs.count()
      val planted = pairs
        .where(col("a") % 10 === 0 && col("b") === col("a") + 1).count()
      val skRows = sk.agg(count(lit(1)).as("n"),
        coalesce(sum("size"), lit(0L)).as("members")).head()
      if (pipelineMode) {
        println(s"pairs=$total planted_recovered=$planted " +
          s"expected_planted=${n / 10}")
        require(planted == n / 10,
          s"planted recovery under the cap must be exact: $planted != ${n / 10}")
      } else
        println(s"pairs=$total planted_recovered=$planted " +
          s"expected_planted=${n / 10} (partial recovery is the documented " +
          "bounded-coverage trade in this regime)")
      println(s"skipped: ${skRows.getLong(0)} buckets, " +
        s"${skRows.getLong(1)} member rows excluded (surfaced, not silent)")
      if (pipelineMode) {
        // q137 end-to-end on the mega-bucket corpus: the capped pairs
        // feed closure → keeper → split, and the invariants that make
        // the output SHIPPABLE are asserted exactly
        import graft.operators.{Dedup, TextOps}
        val labels = time("pointer-jump closure") {
          graft.engine.Checkpoints.mark(Dedup.connectedComponents(
            hashed.select("doc_id"), pairs, "doc_id"))
        }
        val curated = time("keeper + leak-safe split") {
          // every synthetic image is 16×16, so pixel mass ties and the
          // keeper MUST be each cluster's minimum id — an exact oracle
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("component")
            .orderBy(col("__score").desc, col("doc_id").asc)
          val cur = TextOps.hashSplitBy(
            labels.withColumn("__score", lit(W.toLong * H))
              .withColumn("keep", row_number().over(w) === 1)
              .select("doc_id", "component", "keep"),
            col("component"))
          graft.engine.Checkpoints.mark(cur)
        }
        val stats = curated.groupBy("component").agg(
            count(lit(1)).as("sz"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("nk"),
            min("doc_id").as("mn"),
            min(when(col("keep"), col("doc_id"))).as("kid"),
            countDistinct("split").as("nsplit"))
          .agg(count(lit(1)).as("ncomp"),
            sum(when(col("nk") =!= 1L, 1L).otherwise(0L)).as("badk"),
            sum(when(col("kid") =!= col("mn"), 1L).otherwise(0L)).as("badmin"),
            sum(when(col("nsplit") =!= 1L, 1L).otherwise(0L)).as("badsplit"),
            max("sz").as("maxsz"))
          .head()
        println(s"components=${stats.getLong(0)} " +
          s"largest=${stats.getLong(4)} " +
          s"bad_keeper_count=${stats.getLong(1)} " +
          s"keeper_not_min=${stats.getLong(2)} " +
          s"split_straddles=${stats.getLong(3)}")
        require(stats.getLong(1) == 0 && stats.getLong(2) == 0 &&
          stats.getLong(3) == 0,
          "keeper/split invariants violated")
        graft.engine.Checkpoints.release(curated)
        graft.engine.Checkpoints.release(labels)
      }
      graft.engine.Checkpoints.release(pairs)
    } else {
      // 3. banded pair scan + exact verify; planted recovery must be exact
      val pairs = time("near-dup pairs (hamming<=3)") {
        val p = Multimodal.dhashNearDupPairs(hashed, "doc_id", maxHamming = 3)
        graft.engine.Checkpoints.mark(p)
      }
      val total = pairs.count()
      val planted = pairs
        .where(col("a") % 10 === 0 && col("b") === col("a") + 1).count()
      println(s"pairs=$total planted_recovered=$planted expected=${n / 10}")
      require(planted == n / 10, s"planted recovery $planted != ${n / 10}")
      graft.engine.Checkpoints.release(pairs)
    }
    graft.engine.Checkpoints.release(hashed)
    spark.stop()
  }
}
