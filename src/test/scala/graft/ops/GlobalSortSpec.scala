package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession

class GlobalSortSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  test("withGlobalRank equals single-partition row_number, computed in parallel") {
    val df = (0 until 500).map { i =>
      (if (i % 3 == 0) "node" else if (i % 3 == 1) "way" else "relation",
        (i * 7919 % 100).toLong, i % 7 + 1, i.toLong)
    }.toDF("obj_type", "id", "version", "eid").repartition(7)

    val got = GlobalSort.withGlobalRank(df, partitions = 5,
        col("obj_type"), col("id"), col("version"), col("eid"))
      .select("rn", "eid").as[(Long, Long)].collect().sortBy(_._1)

    val want = df.orderBy("obj_type", "id", "version", "eid")
      .select("eid").as[Long].collect()

    assert(got.map(_._1).toSeq === (1L to 500L))
    assert(got.map(_._2).toSeq === want.toSeq)
  }

  test("ranks are dense and unique across partition boundaries") {
    val df = Seq.fill(64)(("x", 1L, 1, 0L)).zipWithIndex
      .map { case ((t, i, v, _), idx) => (t, i, v, idx.toLong) }
      .toDF("obj_type", "id", "version", "eid")
    val rns = GlobalSort.withGlobalRank(df, partitions = 4,
      col("obj_type"), col("id"), col("version"), col("eid"))
      .select("rn").as[Long].collect().sorted
    assert(rns.toSeq === (1L to 64L))
  }
}
