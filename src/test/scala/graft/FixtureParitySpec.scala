package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.ops.{ChangeBatch, DeltaApply, GeometryBuild}
import graft.sources.OsmChangeXml

/**
 * Fixture-parity end-to-end tests (SURVEY.md §5): synthesized equivalents
 * of the reference's tests/data fixtures — insert_node.osc /
 * modify_node.osc / delete_node.osc / test.osc / 427.osc — driven through
 * S1 (OsmChange XML scan) → P1 classify → J2 location-diff → MERGE →
 * geometry build, with results asserted against the osm2rdf golden outputs
 * recorded in tests/data/node.ttl and tests/data/way.ttl. Golden strings
 * (WKT at precision 7, envelope corner walk, rounded length) are cited
 * values the engine must REPRODUCE from raw coordinates, not inputs.
 */
class FixtureParitySpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  private def writeOsc(body: String): String = {
    val dir = Files.createTempDirectory("osc_fixture")
    Files.writeString(dir.resolve("f.osc"),
      s"""<?xml version='1.0' encoding='UTF-8'?><osmChange version="0.6">$body</osmChange>""")
    dir.toString + "/*.osc"
  }

  private def readOsc(body: String) =
    OsmChangeXml.read(spark, writeOsc(body))
      .withColumn("deleted", when(col("action") === "delete", 1).otherwise(0))

  // reference: tests/data/insert_node.osc — node 1 v37 @ (13.5690032, 42.7957187)
  private val node1 =
    """<node id="1" version="37" timestamp="2024-07-07T19:48:37Z" lat="42.7957187" lon="13.5690032"><tag k="man_made" v="mast"/></node>"""

  private def emptySnap = Seq.empty[(Long, Double, Double)].toDF("id", "lon", "lat")

  test("insert_node.osc: create → snapshot row; POINT + degenerate envelope match node.ttl") {
    val classified = ChangeBatch.classify(readOsc(s"<create>$node1</create>"))
    // v37 means the version-based classifier says modify
    // (reference: src/osm/OsmObjectHelper.cpp:281-286) ...
    assert(classified.select("action2").head.getString(0) === "modify")
    // ... and J2 against a store that has never seen id 1 reclassifies it
    // as a create (reference: src/osm/NodeHandler.cpp:70-76)
    val diffed = ChangeBatch.locationDiff(
      classified.filter(col("action2") === "modify").select("id", "lon", "lat"), emptySnap)
    assert(diffed.select("status").head.getString(0) === "create")
    val snap = DeltaApply.applyChangeBatch(emptySnap,
      classified.select(col("id"), col("action2").as("action"), col("lon"), col("lat")))
    val wkt = GeometryBuild.buildNodeGeoms(snap).select("wkt").head.getString(0)
    assert(wkt === "POINT(13.5690032 42.7957187)") // golden: tests/data/node.ttl
    val env = spark.range(1)
      .select(st_envelope(lit(wkt))).head.getString(0)
    // golden: node.ttl osm2rdfgeom:envelope — the point 5x
    assert(env === ("POLYGON((" + Seq.fill(5)("13.5690032 42.7957187").mkString(",") + "))"))
  }

  test("modify_node.osc + delete_node.osc: move updates in place, delete removes, idempotent") {
    val prior = Seq((1L, 1.0, 2.0)).toDF("id", "lon", "lat")
    val mod = ChangeBatch.classify(readOsc(s"<modify>$node1</modify>"))
    val diffed = ChangeBatch.locationDiff(mod.select("id", "lon", "lat"), prior)
    assert(diffed.select("status").head.getString(0) === "moved")
    val afterMod = DeltaApply.applyChangeBatch(prior,
      mod.select(col("id"), col("action2").as("action"), col("lon"), col("lat")))
    assert(afterMod.as[(Long, Double, Double)].collect().toSet ===
      Set((1L, 13.5690032, 42.7957187)))

    val del = ChangeBatch.classify(readOsc(s"<delete>$node1</delete>"))
      .select(col("id"), col("action2").as("action"), col("lon"), col("lat"))
    val afterDel = DeltaApply.applyChangeBatch(afterMod, del)
    assert(afterDel.count() === 0)
    // DELETE WHERE is idempotent (reference: QueryWriter.cpp:51-65)
    assert(DeltaApply.applyChangeBatch(afterDel, del).count() === 0)
  }

  // reference: tests/data/wayWithReferences.osm — way 6177369's member
  // nodes in <nd> order; goldens in tests/data/way.ttl
  private val way6177369Nodes = Seq(
    (625256L, 1.5388551, 42.5077891), (12188412742L, 1.5390663, 42.5077919),
    (625257L, 1.5389817, 42.507805), (12188412753L, 1.5386306, 42.507799),
    (5981148547L, 1.5393683, 42.508683), (12029676311L, 1.5406269, 42.5087285),
    (2287019214L, 1.5407031, 42.5087367), (5043815480L, 1.5426687, 42.5089421),
    (262892996L, 1.5427093, 42.5091105))

  private def ringVerts(wkt: String): Seq[(Double, Double)] = {
    val inner = wkt.stripPrefix("POLYGON((").stripSuffix("))")
    val pts = inner.split(",").toSeq.map { p =>
      val Array(x, y) = p.trim.split(" "); (x.toDouble, y.toDouble)
    }
    pts.dropRight(1) // closure vertex
  }

  private def cyclicallyEqual(a: Seq[(Double, Double)], b: Seq[(Double, Double)]): Boolean =
    a.size == b.size && (a.indices.exists(r => a.drop(r) ++ a.take(r) == b) ||
      { val ar = a.reverse; ar.indices.exists(r => ar.drop(r) ++ ar.take(r) == b) })

  test("way.ttl: LINESTRING, envelope, length, hull, OBB parity for way 6177369") {
    val members = way6177369Nodes.zipWithIndex
      .map { case ((nid, _, _), i) => (6177369L, nid, i + 1) }
      .toDF("way_id", "node_id", "pos")
    val nodes = way6177369Nodes.toDF("id", "lon", "lat")
    val row = GeometryBuild.buildWayGeoms(members, nodes).head()

    val goldenLine = "LINESTRING(" + way6177369Nodes
      .map { case (_, x, y) => f"$x%.7f $y%.7f" }.mkString(",") + ")"
    assert(row.getAs[String]("wkt") === goldenLine) // golden: way.ttl geo:asWKT
    // golden: way.ttl osm2rdfgeom:envelope (string-identical corner walk)
    assert(row.getAs[String]("envelope") ===
      "POLYGON((1.5386306 42.5077891,1.5386306 42.5091105,1.5427093 42.5091105,1.5427093 42.5077891,1.5386306 42.5077891))")
    // golden: way.ttl osm2rdf:length "0.005285" (6-decimal rounding)
    assert(f"${row.getAs[Double]("length")}%.6f" === "0.005285")
    // golden: way.ttl osm2rdfgeom:convex_hull — same ring up to start/orientation
    val goldenHull = ringVerts(
      "POLYGON((1.5386306 42.5077990,1.5393683 42.5086830,1.5427093 42.5091105,1.5426687 42.5089421,1.5390663 42.5077919,1.5388551 42.5077891,1.5386306 42.5077990))")
    assert(cyclicallyEqual(ringVerts(row.getAs[String]("convex_hull")), goldenHull),
      s"hull mismatch: ${row.getAs[String]("convex_hull")}")
    // golden: way.ttl osm2rdfgeom:obb. osm2rdf's OBB is a DIFFERENT (and
    // looser) rectangle than our rotating-calipers minimum-area box
    // (golden area 8.57e-6 vs ours 3.24e-6), so exact-string parity is not
    // meaningful; the behavioral contract is: a 4-corner rectangle that
    // contains every member point, no looser than the reference's.
    def ringArea(r: Seq[(Double, Double)]): Double = {
      val s = r.indices.map { i =>
        val (x1, y1) = r(i); val (x2, y2) = r((i + 1) % r.size)
        x1 * y2 - x2 * y1
      }.sum
      math.abs(s) / 2
    }
    def containsAll(rect: Seq[(Double, Double)], pts: Seq[(Double, Double)]): Boolean =
      pts.forall { case (px, py) =>
        val crosses = rect.indices.map { i =>
          val (x1, y1) = rect(i); val (x2, y2) = rect((i + 1) % rect.size)
          (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        }
        crosses.forall(_ >= -1e-8) || crosses.forall(_ <= 1e-8)
      }
    val goldenObb = ringVerts(
      "POLYGON((1.5409501 42.5105785,1.5427682 42.5090613,1.5404487 42.5062818,1.5386306 42.5077990,1.5409501 42.5105785))")
    val obb = ringVerts(row.getAs[String]("obb"))
    assert(obb.size === 4)
    assert(containsAll(obb, way6177369Nodes.map(n => (n._2, n._3))))
    assert(ringArea(obb) <= ringArea(goldenObb) + 1e-9)
  }

  test("test.osc: created way's forward references resolve to its full nd list (J7)") {
    // test.osc shape: one <create> way with a long ordered nd list
    val refs = (1L to 140L).map(i => 7600000000L + i)
    val nds = refs.map(r => s"""<nd ref="$r"/>""").mkString
    val osc = s"""<create><way id="6281774" version="9" timestamp="2024-09-18T13:53:06Z">$nds</way></create>"""
    val df = readOsc(osc)
    assert(df.select(size(col("nd_refs"))).head.getInt(0) === 140) // order preserved
    val wayIds = df.filter(col("obj_type") === "way").select(col("id").as("way_id"))
    val members = df.select(col("id").as("way_id"),
        posexplode(col("nd_refs"))).withColumnRenamed("col", "node_id")
    val referenced = ChangeBatch.referencedNodesOfWays(
      wayIds, members, emptySnap.select("id"))
    assert(referenced.as[Long].collect().toSet === refs.toSet)
  }

  test("427.osc: multi-envelope minute diff applies moves and deletes in one batch") {
    // 427.osc shape: interleaved <modify>/<delete> envelopes, nodes only
    val osc =
      """<modify>
        |<node id="95062502" version="4" timestamp="2024-08-02T10:00:33Z" lat="61.0839772" lon="28.9811903"/>
        |<node id="95062503" version="3" timestamp="2024-08-02T10:00:33Z" lat="61.0866849" lon="28.9827982"/>
        |</modify>
        |<delete>
        |<node id="178709586" version="8" timestamp="2024-08-02T10:00:33Z" lat="61.0734574" lon="28.9908047"/>
        |</delete>
        |<modify>
        |<node id="178709589" version="10" timestamp="2024-08-02T10:00:33Z" lat="61.0822524" lon="28.9741996"/>
        |</modify>""".stripMargin.replace("\n", "")
    // the XML scan carries no event ordinal; compaction's final tiebreaker
    // needs one — ids are unique within this diff, so reuse them
    val batch = ChangeBatch.classify(readOsc(osc)).withColumn("eid", col("id"))
    val prior = Seq(
      (95062502L, 28.0, 61.0), (95062503L, 28.0, 61.0),
      (178709586L, 28.99, 61.07), (178709589L, 28.0, 61.0),
      (999L, 5.0, 5.0)).toDF("id", "lon", "lat")
    val compacted = ChangeBatch.dedupLatestVersion(batch)
    val after = DeltaApply.applyChangeBatch(prior,
      compacted.select(col("id"), col("action2").as("action"), col("lon"), col("lat")))
      .as[(Long, Double, Double)].collect()
      .map { case (id, lon, lat) => id -> ((lon, lat)) }.toMap
    assert(!after.contains(178709586L))           // deleted
    assert(after(95062502L) === ((28.9811903, 61.0839772))) // moved
    assert(after(178709589L) === ((28.9741996, 61.0822524)))
    assert(after(999L) === ((5.0, 5.0)))          // untouched survivor
    assert(after.size === 4)
  }
}
