package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHash
import graft.functions.RollingHash.rolling_hash

class FunctionsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rolling_hash codegen path matches the reference implementation") {
    val inputs = Seq("", "a", "hello world", "order matters", "matters order",
      "Ünïcödé 💡 bytes", "x" * 500)
    val got = inputs.toDF("s").select(col("s"), rolling_hash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s =>
      assert(got(s) == RollingHash.eval(s.getBytes("UTF-8")), s"for '$s'")
    }
    // order sensitivity — the property the bag-of-words fingerprint lacks
    assert(got("order matters") != got("matters order"))
  }

  test("rolling_hash registers as a SQL function") {
    RollingHash.register(spark)
    val got = spark.sql("SELECT rolling_hash('hello world') AS h").head().getLong(0)
    assert(got == RollingHash.eval("hello world".getBytes("UTF-8")))
  }

  test("GraftExtensions installs rolling_hash without an imperative register") {
    // newSession() builds a fresh SessionState: the temp function installed
    // by register() above is gone, but the extensions-injected one (from
    // spark.sql.extensions=graft.GraftExtensions on the test session) stays
    val fresh = spark.newSession()
    val got = fresh.sql("SELECT rolling_hash('hello world') AS h").head().getLong(0)
    assert(got == RollingHash.eval("hello world".getBytes("UTF-8")))
  }

  test("rolling_hash stays inside whole-stage codegen") {
    // spark.range is a codegen source (a literal local table would be
    // constant-folded into a LocalTableScan via the interpreted path)
    val df = spark.range(100)
      .select(rolling_hash(concat(lit("doc "), col("id"))).as("h"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // a codegen'd project stage prints as *(n) Project
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan.take(1000))
    assert(rows.map(_.getLong(0)).toSet ==
      (0 until 100).map(i => RollingHash.eval(s"doc $i".getBytes("UTF-8"))).toSet)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assume(wh.contains("tmp") || wh.contains("target"))
    val left = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    val right = (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bl")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_br")
    val joined = spark.table("graft_bl").join(spark.table("graft_br"), "k")
    withAutoBroadcastOff {
      val j = spark.table("graft_bl").join(spark.table("graft_br"), "k")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      // co-located buckets: no shuffle Exchange feeding the join
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2500))
    }
    assert(joined.count() == 1000)
  }

  private def withAutoBroadcastOff[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
