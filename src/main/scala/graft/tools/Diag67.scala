package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-leg timing of the q67 curation pipeline (exact dedup, token band,
  * repetition gate, split audit) with stage/task counts — the diagnostic
  * that attributed q67's cost to the shingle explode re-running the
  * tokenizing split once per shingle (fixed in [[graft.operators.Dedup
  * .shingles]] by materializing the token array across the explode).
  * Usage: runMain graft.tools.Diag67 [sfDir]
  */
object Diag67 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        }
      })
    def time[A](name: String)(f: => A): A = {
      stages.set(0); taskMs.set(0)
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"$name%-28s $s%8.2f s  stages=${stages.get}%3d taskTime=${taskMs.get / 1000.0}%7.1f s")
      r
    }
    import graft.operators.{Dedup, TextOps}
    val docs = spark.read.parquet(s"$d/documents.parquet")
    println(s"docs: ${docs.count()}")
    docs.groupBy("lang").count().collect() // warm
    time("exact dedup")(Dedup.exact(docs, "text", "doc_id").count())
    time("3-gram shingles")(
      Dedup.shingles(docs, "text", "doc_id", 3).count())
    time("repetitionRatio")(
      TextOps.repetitionRatio(docs, "text", "doc_id").count())
    (1 to 3).foreach { i =>
      time(s"full q67 run $i")(
        graft.queries.LlmQueries.curationPipeline(spark, d).count())
    }
    spark.stop()
  }
}
