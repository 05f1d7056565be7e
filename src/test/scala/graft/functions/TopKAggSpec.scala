package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession
import graft.functions.GraftFunctions.topk_min

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  test("topk_min keeps the k smallest per group, sorted ascending") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      ("a", 5L), ("a", 1L), ("a", 9L), ("a", 3L), ("a", 7L),
      ("b", 42L),
      ("c", 2L), ("c", 2L), ("c", 1L)).toDF("g", "v")
    val got = df.groupBy("g").agg(topk_min(col("v"), 3).as("ks"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got === Map(
      "a" -> Seq(1L, 3L, 5L), "b" -> Seq(42L), "c" -> Seq(1L, 2L, 2L)))
  }

  test("topk_min matches sort_array+slice on many groups (fallback regime)") {
    graft.functions.GraftFunctions.register(spark)
    // 1000 groups x ~20 rows: far beyond the 128-key ObjectHashAggregate
    // threshold in the test session, so this exercises the sort-based
    // fallback path and partial-merge correctness
    val df = spark.range(20000).select(
      (col("id") % 1000).as("g"), (col("id") * 7919 % 104729).as("v"))
    val got = df.groupBy("g").agg(topk_min(col("v"), 4).as("ks"))
    val want = df.groupBy("g").agg(
      slice(sort_array(collect_list(col("v"))), 1, 4).as("ks"))
    assert(got.join(want.withColumnRenamed("ks", "want"), "g")
      .filter(col("ks") =!= col("want")).count() === 0)
  }

  test("buffer serde round-trips") {
    val b = new LongTopK(3)
    Seq(9L, 2L, 5L, 1L, 8L).foreach(b.add)
    val back = LongTopK.fromBytes(3, b.toBytes)
    assert(back.result.toSeq === Seq(1L, 2L, 5L))
    val other = new LongTopK(3)
    Seq(0L, 4L).foreach(other.add)
    back.addAll(other)
    assert(back.result.toSeq === Seq(0L, 1L, 2L))
  }
}
