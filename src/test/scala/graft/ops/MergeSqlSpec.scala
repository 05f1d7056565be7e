package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession

/**
 * The Iceberg MERGE INTO statement DeltaApply emits must (a) parse as valid
 * Spark SQL — Catalyst parses MERGE without Iceberg jars; only analysis
 * needs the catalog — and (b) encode exactly the semantics
 * applyChangeBatch implements, clause by clause, so the jar-drop swap
 * cannot drift.
 */
class MergeSqlSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark

  val sql = DeltaApply.mergeIntoSql("geo.node_geoms", "node_batch", "id",
    Seq("lon", "lat"))

  test("emitted MERGE INTO parses as Spark SQL") {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    assert(plan.toString.contains("MergeIntoTable") ||
      plan.getClass.getSimpleName.contains("Merge"))
  }

  test("clause order encodes applyChangeBatch semantics") {
    val norm = sql.replaceAll("\\s+", " ")
    val del = norm.indexOf("WHEN MATCHED AND s.action = 'delete' THEN DELETE")
    val upd = norm.indexOf("WHEN MATCHED THEN UPDATE SET t.lon = s.lon, t.lat = s.lat")
    val ins = norm.indexOf(
      "WHEN NOT MATCHED AND s.action <> 'delete' THEN INSERT (id, lon, lat) VALUES (s.id, s.lon, s.lat)")
    // delete must precede the unconditional update (first matching clause
    // wins in MERGE), and the insert must gate out deletes of absent keys
    assert(del >= 0 && upd >= 0 && ins >= 0)
    assert(del < upd)
  }
}
