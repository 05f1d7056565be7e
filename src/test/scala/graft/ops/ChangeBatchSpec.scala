package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession

/**
 * Reference-semantics fixtures: the scenarios of tests/data/insert_node.osc,
 * modify_node.osc, delete_node.osc and the moved-node dependency closure,
 * expressed as tiny changes/snapshot DataFrames (FIXTURES.md §2).
 */
class ChangeBatchSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  // (seq, eid, obj_type, id, version, deleted, action, ts, lon, lat)
  def changesDf(rows: (Long, Long, String, Long, Int, Int, String, Timestamp, Double, Double)*) =
    rows.toDF("seq", "eid", "obj_type", "id", "version", "deleted", "action", "ts", "lon", "lat")

  test("classify: deleted -> delete, version 1 -> create, else modify") {
    val df = changesDf(
      (0L, 1L, "node", 1L, 1, 0, "", ts(1), 0.0, 0.0),
      (0L, 2L, "node", 2L, 3, 0, "", ts(2), 0.0, 0.0),
      (0L, 3L, "node", 3L, 5, 1, "", ts(3), 0.0, 0.0))
    val got = ChangeBatch.classify(df).select("id", "action2").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "create", 2L -> "modify", 3L -> "delete"))
  }

  test("dedupLatestVersion: version desc, deleted-wins tiebreak, ts desc") {
    val df = changesDf(
      (0L, 1L, "node", 7L, 2, 0, "modify", ts(1), 1.0, 1.0),
      (0L, 2L, "node", 7L, 3, 0, "modify", ts(2), 2.0, 2.0),  // higher version wins
      (0L, 3L, "node", 8L, 4, 0, "modify", ts(3), 3.0, 3.0),
      (0L, 4L, "node", 8L, 4, 1, "delete", ts(1), 4.0, 4.0),  // same version: deleted wins
      (0L, 5L, "way", 7L, 1, 0, "create", ts(1), 0.0, 0.0))   // distinct obj_type kept
    val got = ChangeBatch.dedupLatestVersion(df)
      .select("obj_type", "id", "eid").as[(String, Long, Long)].collect().toSet
    assert(got === Set(("node", 7L, 2L), ("node", 8L, 4L), ("way", 7L, 5L)))
  }

  test("locationDiff: unseen modify reclassifies as create (NodeHandler null branch)") {
    val modified = Seq((1L, 10.0, 10.0), (2L, 20.0, 20.0), (3L, 30.0, 30.0))
      .toDF("id", "lon", "lat")
    val snapshot = Seq((1L, 10.0, 10.0), (2L, 99.0, 99.0)).toDF("id", "lon", "lat")
    val got = ChangeBatch.locationDiff(modified, snapshot)
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "modified", 2L -> "moved", 3L -> "create"))
  }

  test("dependency closure: moved node dirties referencing way; anti-join excludes changefile objects") {
    // snapshot: nodes 1..3; way 10=[1,2], way 11=[3]; rel 100={way 10}, rel 101={node 3}, rel 102={way 11}
    val nodeGeoms = Seq((1L, 0.0, 0.0), (2L, 1.0, 1.0), (3L, 2.0, 2.0)).toDF("id", "lon", "lat")
    val wayMembers = Seq((10L, 1L, 1), (10L, 2L, 2), (11L, 3L, 1)).toDF("way_id", "node_id", "pos")
    val relMembers = Seq(
      (100L, 10L, "way", "outer", 1), (101L, 3L, "node", "", 1), (102L, 11L, "way", "", 1))
      .toDF("rel_id", "member_id", "member_type", "role", "pos")
    // change batch: node 1 moved; node 3 deleted; way 11 itself in the change file;
    // rel 102 itself in the change file
    val compacted = changesDf(
      (0L, 1L, "node", 1L, 2, 0, "modify", ts(1), 5.0, 5.0),
      (0L, 2L, "node", 3L, 2, 1, "delete", ts(1), 0.0, 0.0),
      (0L, 3L, "way", 11L, 2, 0, "modify", ts(1), 0.0, 0.0),
      (0L, 4L, "relation", 102L, 2, 0, "modify", ts(1), 0.0, 0.0))
    val (dirtyWays, dirtyRels) = ChangeBatch.dependencyClosure(
      compacted, nodeGeoms, wayMembers, relMembers)
    // way 10 dirtied by moved node 1; way 11 excluded (in change file)
    assert(dirtyWays.as[Long].collect().toSet === Set(10L))
    // rel 100 via dirty way 10, rel 101 via deleted node 3; rel 102 excluded
    assert(dirtyRels.as[Long].collect().toSet === Set(100L, 101L))
  }

  test("referencedNodesOfWays excludes nodes already in the change file") {
    val wayMembers = Seq((10L, 1L, 1), (10L, 2L, 2), (11L, 9L, 1)).toDF("way_id", "node_id", "pos")
    val wayIds = Seq(10L).toDF("way_id")
    val changeNodes = Seq(2L).toDF("id")
    val got = ChangeBatch.referencedNodesOfWays(wayIds, wayMembers, changeNodes)
      .as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("applyChangeBatch: delete removes, modify-unseen inserts, modify replaces") {
    val snapshot = Seq((1L, 0.0, 0.0), (2L, 1.0, 1.0)).toDF("id", "lon", "lat")
    val compacted = Seq(
      (1L, "delete", 9.0, 9.0),   // delete existing
      (2L, "modify", 5.0, 5.0),   // replace
      (3L, "modify", 7.0, 7.0),   // unseen modify -> insert (WHEN NOT MATCHED)
      (4L, "delete", 0.0, 0.0))   // delete absent: idempotent no-op
      .toDF("id", "action", "lon", "lat")
    val got = DeltaApply.applyChangeBatch(snapshot, compacted)
      .as[(Long, Double, Double)].collect().toSet
    assert(got === Set((2L, 5.0, 5.0), (3L, 7.0, 7.0)))
    val (deleted, upserted) = DeltaApply.mergeMetrics(snapshot, compacted)
    assert(deleted === 2L && upserted === 2L)
  }

  test("applyGeometryOnly touches only geometry columns of targeted rows") {
    val snapshot = Seq((1L, "f1", "g1"), (2L, "f2", "g2")).toDF("id", "fact", "geom")
    val updates = Seq((2L, "g2x")).toDF("id", "geom")
    val got = DeltaApply.applyGeometryOnly(snapshot, updates, "id", Seq("geom"))
      .as[(Long, String, String)].collect().toSet
    assert(got === Set((1L, "f1", "g1"), (2L, "f2", "g2x")))
  }
}
