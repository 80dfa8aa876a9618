package graft.tools

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Large-N evidence run for the learned quality-classifier family
  * (q175 train / q111 apply / q189 calibration shapes) at corpus
  * scale. Claims under test:
  *
  *  - TRAINING is one tokenize pass into a cached integer feature
  *    frame (≤ dims+2 rows per doc) plus `rounds` × two
  *    map-side-combinable aggregates — wall scales with corpus size,
  *    not with (corpus × rounds × vocabulary).
  *  - The pocket selection actually learns: each class carries its
  *    own marker token in ten of its thirty word slots ("qualitymarker"
  *    vs "boilerplate", hashing to buckets 4 vs 5 under the model
  *    seed) — equal lengths and balanced classes, so the signal lives
  *    purely in two hashed-bucket features with no length confound,
  *    and the class means differ in a direction the batch updates find
  *    immediately (a uniform negative class would sit exactly ON the
  *    two-round batch hyperplane — the geometry, not the data size, is
  *    what a plant here has to respect). Separation is require-gated,
  *    not eyeballed.
  *  - APPLY is the native codegen kernel
  *    ([[graft.functions.PocketLogit]]) — M docs/s, map-only.
  *  - CALIBRATION at n: the decile table materializes in seconds and
  *    concentrates ≥ 99% of the planted positives in the top five
  *    deciles (positives are 50% of the corpus by construction).
  *
  * Corpus: n docs of 30 words drawn deterministically (splitmix64)
  * from a 1000-word vocabulary; the last ten word slots carry the
  * class marker (quality vs boilerplate — cf. CCNet-style page chrome).
  * No RNG: reruns comparable.
  *
  * Usage: `SPARK_DRIVER_MEM=32g sbt "runMain graft.tools.LargeQualityBench [n]"`
  * Default n = 2,000,000 docs. Results recorded in
  * bench/large_quality.txt.
  */
object LargeQualityBench {
  final case class Doc(doc_id: Long, text: String)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
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
      println(f"$name%-40s $s%9.2f s"); (r, s)
    }
    def mix(a: Long, b: Long): Long = {
      var z = a * 0x9e3779b97f4a7c15L + b * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val words: Array[String] = Array.tabulate(1000) { w =>
      val len = 3 + (math.abs(mix(w, 7)) % 8).toInt
      val sb = new StringBuilder
      var j = 0
      while (j < len) {
        sb += ('a' + (math.abs(mix(w, 100 + j)) % 26).toInt).toChar
        j += 1
      }
      sb.result()
    }
    val Marker = "qualitymarker"
    val AntiMarker = "boilerplate"
    val wordsB = spark.sparkContext.broadcast(words)
    val docs = spark.range(n).as(Encoders.LONG).mapPartitions { it =>
      val ws = wordsB.value
      it.map { boxed =>
        val i = boxed.longValue
        val sb = new StringBuilder
        val marked = i % 2 == 0
        var j = 0
        while (j < 30) {
          if (j > 0) sb += ' '
          if (j >= 20) sb ++= (if (marked) Marker else AntiMarker)
          else sb ++= ws((math.abs(mix(i, j)) % ws.length).toInt)
          j += 1
        }
        Doc(i, sb.result())
      }
    }(Encoders.product[Doc]).toDF()
    docs.cache()
    println(s"corpus: ${docs.count()} docs (every 2nd marked)")

    import graft.operators.TextOps
    val label = array_contains(TextOps.tokens(col("text")), Marker)

    // 1. TRAINING: one feature pass + rounds x two aggregates
    val (model, tTrain) = time("pocketPerceptronTrain (16 dims, 12 rnds)") {
      TextOps.pocketPerceptronTrain(docs, "text", "doc_id", label,
        dims = 16, rounds = 12, seed = 53)
    }
    println(s"pocket: round ${model.pocketRound}, " +
      s"errors ${model.pocketErrors} of $n " +
      f"(${model.pocketErrors * 100.0 / n}%.3f%%)")
    require(model.pocketErrors <= n / 100,
      s"planted separation not learned: ${model.pocketErrors} errors")

    // 2. APPLY throughput: native codegen kernel, map-only
    val (kept, tApply) = time("pocketScore apply (native kernel)") {
      TextOps.pocketScore(docs, "text", "doc_id", model)
        .where(col("keep")).count()
    }
    println(f"apply: $kept kept of $n, ${n / tApply / 1e6}%.2f M docs/s")

    // 3. CALIBRATION at n: decile table + planted-concentration gate
    val (cal, tCal) = time("pocketCalibration (10 deciles)") {
      val df = TextOps.pocketCalibration(docs, "text", "doc_id", model, label)
      try df.orderBy("decile").collect()
      finally graft.engine.Checkpoints.release(df)
    }
    cal.foreach(r => println(
      f"  decile ${r.getLong(0)}%2d  n=${r.getLong(1)}%9d  " +
        f"pos_milli=${r.getLong(3)}%4d  " +
        f"logit=[${r.getLong(4)}%12d, ${r.getLong(5)}%12d]"))
    val posTotal = cal.map(r => r.getLong(2)).sum
    val posTop5 = cal.filter(_.getLong(0) < 5).map(_.getLong(2)).sum
    println(f"positives: $posTotal total, $posTop5 in top-5 deciles " +
      f"(${posTop5 * 100.0 / posTotal}%.2f%%)")
    require(posTop5 * 100 >= posTotal * 99,
      "calibration must concentrate >= 99% of positives in the top five deciles")
    require(posTotal == (n + 1) / 2,
      s"label arithmetic drifted: $posTotal positives, expected ${(n + 1) / 2}")
    spark.stop()
    val _ = (tTrain, tCal)
  }
}
