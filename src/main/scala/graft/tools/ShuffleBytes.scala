package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Measures what the round-8 shuffle-payload fixes actually move: for each
  * hash-keyed operator, the summed exchange payload (the SQL `dataSize` /
  * `shuffle bytes written` metrics of every ShuffleExchangeLike in the
  * executed plan) against an inline reconstruction of the text-keyed form
  * it replaced. The claim under test: keying dedup/shingle exchanges on a
  * 60-bit hash instead of content bytes shrinks the shuffle by roughly
  * the content/8B ratio — the property that turns a 100 TB corpus shuffle
  * into a per-doc-constant one.
  *
  * Usage: `sbt "runMain graft.tools.ShuffleBytes [sfDir]"`. Results in
  * BASELINE.md ("Shuffle-payload evidence") + bench/shuffle_payload.txt.
  */
object ShuffleBytes {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // summed over every exchange in the FINAL plan: (in-memory dataSize,
    // on-wire shuffle bytes written — post-serialization, pre-fetch);
    // PlanWalk is the same traversal the PlanSpec pins use
    def exchangeBytes(df: DataFrame): (Long, Long) = {
      df.collect() // collect() executes THIS queryExecution (count() plans a new one)
      val shuffles = graft.plans.PlanWalk.flatten(df.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      val data = shuffles.map(s =>
        s.metrics.get("dataSize").map(_.value).getOrElse(0L)).sum
      val wire = shuffles.map(s =>
        s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)).sum
      (data, wire)
    }
    def row(name: String, df: DataFrame): Unit = {
      val (data, wire) =
        // release any checkpointed leaves after measuring: the jaccard
        // variants materialize shingle sets, and pinned blocks would put
        // later measurements under artificial memory pressure
        try exchangeBytes(df) finally graft.engine.Checkpoints.release(df)
      println(f"$name%-44s dataSize ${data / 1024.0}%9.1f KiB   wire ${wire / 1024.0}%9.1f KiB")
    }

    val docs = spark.read.parquet(s"$d/documents.parquet")
    import graft.operators.{Dedup, TextOps}

    println(s"corpus: $d (${docs.count()} docs)")

    // exact dedup: sha2 group key vs the raw-text group key it replaced
    row("exact dedup, sha2 key (shipped)",
      Dedup.exact(docs, "text", "doc_id"))
    row("exact dedup, raw-text key (replaced)",
      docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
        .select("keep_id", "copies"))

    // repetition ratio: hashed shingle distinct vs text shingle distinct
    row("repetitionRatio, hashed distinct (shipped)",
      TextOps.repetitionRatio(docs, "text", "doc_id"))
    row("repetitionRatio, text distinct (replaced)", {
      val toks = TextOps.tokens(col("text"))
      val dis = Dedup.shingles(docs.where(col("text").isNotNull),
          "text", "doc_id", 3)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_distinct"))
      docs.where(col("text").isNotNull && size(toks) >= 3)
        .select(col("doc_id"), (size(toks) - 2).cast("long").as("n_total"))
        .join(dis, "doc_id")
        .select(col("doc_id"), col("n_total"), col("n_distinct"),
          round(lit(1) - col("n_distinct").cast("double") / col("n_total"), 6)
            .as("rep_ratio"))
    })

    // adjacent-pair Jaccard: hashed intersection joins vs text joins
    row("jaccardAdjacent, hashed joins (shipped)",
      Dedup.jaccardAdjacent(docs, "text", "doc_id"))
    row("jaccardAdjacent, text joins (replaced)", {
      val sh = graft.engine.Checkpoints.mark(
        Dedup.shingles(docs, "text", "doc_id", 1))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = sh.select(col("doc_id").as("a"), col("shingle"))
      val b = sh.select((col("doc_id") - 1).as("a"), col("shingle"))
      val inter = a.join(b, Seq("a", "shingle")).groupBy("a")
        .agg(count(lit(1)).as("n_inter"))
      sizes.select(col("doc_id").as("a"), col("n").as("na"))
        .join(sizes.select((col("doc_id") - 1).as("a"), col("n").as("nb")), "a")
        .join(inter, Seq("a"), "left")
        .select(col("a"), col("a") + 1 as "b",
          round(coalesce(col("n_inter"), lit(0)).cast("double") /
            (col("na") + col("nb") - coalesce(col("n_inter"), lit(0))), 6)
            .as("jaccard"))
    })

    spark.stop()
  }
}
