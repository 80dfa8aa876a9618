package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives the interactive CLI end-to-end in a real forked JVM (sbt's own
  * stdin handling can't exercise the prompt loop): picks a dataset, runs a
  * query, and checks that a parse error re-prompts instead of exiting.
  */
class CliSpec extends AnyFunSuite {

  test("driver contract: queries and oracleSql are the SAME key set (no silent rows-only downgrades)") {
    // a query registered without an oracle silently downgrades the
    // driver's gate to rows-only; an oracle without a query is dead SQL
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries-only: ${(q -- o).toSeq.sorted.mkString(", ")}; " +
      s"oracle-only: ${(o -- q).toSeq.sorted.mkString(", ")}")
    assert(q.size >= 172, s"coverage regressed: ${q.size} registered queries")
  }

  // must mirror build.sbt's jdk17AddOpens (Spark 4 on JDK 17 outside
  // spark-submit)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("interactive CLI: dataset pick, smoke query, parse-error re-prompt") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_test").toFile
    graft.cli.Cleanup.deleteOnExit(dir.getPath)
    (1 to 80).map(i => (i.toLong, (i % 13) * 1.5))
      .toDF("time_id", "c")
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "smoke.parquet").getPath)

    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    val cp = Seq(
      new java.io.File("target/scala-2.13/classes").getAbsolutePath,
      "/opt/spark/jars/*").mkString(java.io.File.pathSeparator)
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.cli.Main", dir.getPath)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_MASTER", "local[4]")
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val stdin = new java.io.PrintWriter(proc.getOutputStream)
    // bad pick -> re-prompt; pick 1; parse error -> re-prompt; real query; quit
    stdin.println("99")
    stdin.println("1")
    stdin.println("SELEC nonsense")
    stdin.println("SELECT time_id, offset IN_DOMAIN [1, 50], [2, 5] FROM smoke.c " +
      "WHERE avg_amp() in [5, 10] MAX LIMIT 3")
    stdin.println("quit")
    stdin.close()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val finished = proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    assert(finished, s"CLI did not exit; output so far:\n${out.takeRight(2000)}")
    assert(proc.exitValue() == 0, s"exit ${proc.exitValue()}:\n${out.takeRight(2000)}")
    assert(out.contains("1: smoke"), out.takeRight(2000))
    assert(out.contains("Please choose a correct number"), out.takeRight(2000))
    assert(out.contains("Connected to smoke dataset"), out.takeRight(2000))
    assert(out.contains("parse error:"), out.takeRight(2000))
    assert("\\d+ result\\(s\\):".r.findFirstIn(out).isDefined, out.takeRight(2000))
    assert(out.contains("time_id="), out.takeRight(2000))
  }
}
