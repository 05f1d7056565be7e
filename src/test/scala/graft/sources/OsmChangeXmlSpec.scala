package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession

/**
 * OsmChange XML ingestion, covering the same change shapes the reference's
 * fixtures exercise (insert/modify/delete node, created way with ordered nd
 * refs + tags, relation with typed/role'd members; reference:
 * tests/data/insert_node.osc, modify_node.osc, delete_node.osc, test.osc).
 * Fixture content here is authored fresh, not copied.
 */
class OsmChangeXmlSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  val osc: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<osmChange version="0.6" generator="graft-test">
      |  <create>
      |    <node id="101" version="1" timestamp="2024-01-02T03:04:05Z" lon="7.8529086" lat="47.9949601">
      |      <tag k="amenity" v="bench"/>
      |    </node>
      |    <way id="201" version="1" timestamp="2024-01-02T03:04:06Z">
      |      <nd ref="101"/>
      |      <nd ref="102"/>
      |      <nd ref="103"/>
      |      <tag k="highway" v="path"/>
      |      <tag k="surface" v="gravel"/>
      |    </way>
      |  </create>
      |  <modify>
      |    <node id="102" version="4" timestamp="2024-01-02T03:05:00Z" lon="7.8600000" lat="47.9900000"/>
      |    <relation id="301" version="2" timestamp="2024-01-02T03:05:01Z">
      |      <member type="way" ref="201" role="outer"/>
      |      <member type="node" ref="101" role=""/>
      |      <tag k="type" v="multipolygon"/>
      |    </relation>
      |  </modify>
      |  <delete>
      |    <node id="103" version="2" timestamp="2024-01-02T03:06:00Z" lon="7.9" lat="47.9"/>
      |  </delete>
      |  <modify>
      |    <node id="104" version="7" timestamp="2024-01-02T03:07:00Z" lon="-0.1" lat="51.5"/>
      |  </modify>
      |</osmChange>
      |""".stripMargin

  def readFixture(): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("osc")
    Files.writeString(dir.resolve("a.osc"), osc)
    OsmChangeXml.read(spark, dir.toString + "/*.osc")
  }

  test("flattens all envelopes with action, kind, ids and versions") {
    val rows = readFixture()
      .select("action", "obj_type", "id", "version")
      .as[(String, String, Long, Int)].collect().toSet
    assert(rows === Set(
      ("create", "node", 101L, 1),
      ("create", "way", 201L, 1),
      ("modify", "node", 102L, 4),
      ("modify", "relation", 301L, 2),
      ("modify", "node", 104L, 7),
      ("delete", "node", 103L, 2)))
  }

  test("node coordinates, timestamps and tag maps survive") {
    val n = readFixture().filter($"id" === 101).collect().head
    assert(n.getAs[Double]("lon") === 7.8529086)
    assert(n.getAs[Double]("lat") === 47.9949601)
    assert(n.getAs[Map[String, String]]("tags") === Map("amenity" -> "bench"))
    assert(n.getAs[java.sql.Timestamp]("ts").toInstant.toString === "2024-01-02T03:04:05Z")
  }

  test("way nd refs keep document order; relation members keep type/ref/role order") {
    val w = readFixture().filter($"id" === 201).collect().head
    assert(w.getAs[Seq[Long]]("nd_refs") === Seq(101L, 102L, 103L))
    assert(w.getAs[Map[String, String]]("tags") ===
      Map("highway" -> "path", "surface" -> "gravel"))
    val r = readFixture().filter($"id" === 301)
      .selectExpr("members").as[Seq[(String, Long, String)]].collect().head
    assert(r === Seq(("way", 201L, "outer"), ("node", 101L, "")))
  }

  test("feeds the change-batch classifier (P1 semantics)") {
    import org.apache.spark.sql.functions._
    val classified = graft.ops.ChangeBatch.classify(
      readFixture()
        .withColumn("deleted", when(col("action") === "delete", 1).otherwise(0))
        .drop("action"))
    val acts = classified.select("id", "action2").as[(Long, String)].collect().toMap
    assert(acts(101L) === "create")  // version 1
    assert(acts(102L) === "modify")
    assert(acts(103L) === "delete")  // deleted flag
    assert(acts(104L) === "modify")
  }
}
