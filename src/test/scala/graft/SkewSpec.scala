package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.operators.Skew.SaltedAgg

class SkewSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows share one hot key
  lazy val fact = (1 to 2000).map { i =>
    (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble, i.toLong)
  }.toDF("key", "v", "id")

  test("salted two-phase aggregation equals the plain aggregation") {
    val plain = fact.groupBy("key")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"), max("v").as("max_v"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val salted = Skew.saltedAgg(fact, col("key"), col("id"), 8, Seq(
        SaltedAgg("v", sum, sum, "sum_v"),
        SaltedAgg("v", c => count(c), c => sum(c), "n"),
        SaltedAgg("v", max, max, "max_v")))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(salted == plain)
  }

  test("salted dim join equals the plain join") {
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B")).toDF("key", "label")
    val plain = fact.join(dim, "key").agg(count(lit(1)), sum("v")).head()
    val salted = Skew.saltedJoin(fact, dim, "key", 8, col("id"))
      .agg(count(lit(1)), sum("v")).head()
    assert(salted == plain)
  }
}
