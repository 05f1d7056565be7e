package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/**
 * Geometry materialization — the Spark-native replacement for the vendored
 * osm2rdf conversion stage (reference: src/osm/Osm2ttl.cpp:91-112; golden
 * outputs tests/data/{node,way}.ttl).
 *
 * Member order is restored from the explicit `pos` column, never from input
 * row order — exactly like the reference re-sorts GROUP_CONCAT-parsed members
 * by position (reference: src/osm/OsmObjectHelper.cpp:193-203, 265-277) —
 * via `sort_array(collect_list(struct(pos, ...)))`, which is deterministic
 * regardless of shuffle arrival order.
 *
 * The LINESTRING text is assembled from built-ins (transform + format_string
 * + array_join) so the whole build stays codegen-friendly; derived columns
 * (envelope, centroid, convex hull, OBB, length) come from the native
 * expressions. WKT precision is fixed at 7 decimals
 * (reference: include/config/Config.h:36).
 */
object GeometryBuild {

  /** node_geoms -> (id, wkt, cell) point materialization. */
  def buildNodeGeoms(nodeGeoms: DataFrame, cellRes: Int = 12): DataFrame =
    nodeGeoms.select(
      col("id"),
      st_point(col("lon"), col("lat")).as("wkt"),
      cell_encode(col("lon"), col("lat"), lit(cellRes)).as("cell"))

  /**
   * Way geometry from ordered members (A2 + F12): join members to node
   * locations, reassemble per way ordered by pos, emit LINESTRING plus the
   * derived-geometry column family.
   */
  def buildWayGeoms(wayMembers: DataFrame, nodeGeoms: DataFrame,
                    withDerived: Boolean = true): DataFrame = {
    val located = wayMembers
      .join(nodeGeoms.withColumnRenamed("id", "node_id"), Seq("node_id"))
    val assembled = located
      .groupBy(col("way_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("node_id"), col("lon"), col("lat")))).as("pts"))
      .withColumn("wkt",
        concat(lit("LINESTRING("),
          array_join(transform(col("pts"),
            p => format_string("%.7f %.7f", p.getField("lon"), p.getField("lat"))), ","),
          lit(")")))
      .withColumn("n_points", size(col("pts")))
      .drop("pts")
    if (!withDerived) assembled
    else assembled
      .withColumn("length", st_length(col("wkt")))
      .withColumn("envelope", st_envelope(col("wkt")))
      .withColumn("centroid", st_centroid(col("wkt")))
      .withColumn("convex_hull", st_convex_hull(col("wkt")))
      .withColumn("obb", st_obb(col("wkt")))
  }

  /**
   * F12 area path for ways: CLOSED ways (first member node == last member
   * node, >= 4 points) become POLYGON geometry with a shoelace `area`
   * column — osm2rdf emits polygon geometry + osm2rdf:area for area ways
   * while open ways stay LINESTRINGs (reference: invoked
   * src/osm/Osm2ttl.cpp:91-112, golden area/polygon rows in
   * tests/data/way.ttl). Same plan shape as [[buildWayGeoms]]: one
   * members-to-locations equi-join, one per-way aggregation; the closure
   * predicate and the area expression are per-row — no extra shuffle.
   */
  def buildWayPolygons(wayMembers: DataFrame, nodeGeoms: DataFrame): DataFrame = {
    val located = wayMembers
      .join(nodeGeoms.withColumnRenamed("id", "node_id"), Seq("node_id"))
    located
      .groupBy(col("way_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("node_id"), col("lon"), col("lat")))).as("pts"))
      .withColumn("n_points", size(col("pts")))
      .filter(col("n_points") >= 4 &&
        element_at(col("pts"), 1).getField("node_id") ===
          element_at(col("pts"), -1).getField("node_id"))
      .withColumn("wkt",
        concat(lit("POLYGON(("),
          array_join(transform(col("pts"),
            p => format_string("%.7f %.7f", p.getField("lon"), p.getField("lat"))), ","),
          lit("))")))
      .withColumn("area", st_area(col("wkt")))
      .select(col("way_id"), col("wkt"), col("area"), col("n_points"))
  }

  /**
   * F12 multipolygon assembly for relations: each `outer`-role way member
   * contributes one ring (force-closed by repeating its first node when the
   * way is open — the assembly half of osm2rdf's area handling for
   * multipolygon/boundary relations, reference: src/osm/Osm2ttl.cpp:91-112,
   * golden tests/data/relation.ttl; ring stitching of PARTIAL rings split
   * across several ways is not reproduced — each outer way is assumed to be
   * a full ring, which the synthesized fixtures satisfy). Relation area =
   * sequential sum of ring shoelace areas in (pos, member_id) order; WKT is
   * the MULTIPOLYGON of the rings in the same order. This is the geometry
   * the P2 modified-areas set ([[ChangeBatch.areaRelations]]) dirties.
   *
   * Plan shape: members⋈rings equi-join (ring side built once from
   * way_members⋈node_geoms), one per-relation aggregation. All arithmetic
   * is sequential-fold, so a DuckDB oracle reproduces it bit-for-bit.
   */
  def buildRelPolygons(relMembers: DataFrame, wayMembers: DataFrame,
                       nodeGeoms: DataFrame): DataFrame = {
    val located = wayMembers
      .join(nodeGeoms.withColumnRenamed("id", "node_id"), Seq("node_id"))
    val rings = located
      .groupBy(col("way_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("node_id"), col("lon"), col("lat")))).as("pts"))
      .withColumn("ring", when(
        element_at(col("pts"), 1).getField("node_id") ===
          element_at(col("pts"), -1).getField("node_id"), col("pts"))
        .otherwise(concat(col("pts"), array(element_at(col("pts"), 1)))))
      .withColumn("ring_txt",
        array_join(transform(col("ring"),
          p => format_string("%.7f %.7f", p.getField("lon"), p.getField("lat"))), ","))
      .withColumn("ring_area",
        st_area(concat(lit("POLYGON(("), col("ring_txt"), lit("))"))))
      .select(col("way_id").as("member_id"), col("ring_txt"), col("ring_area"))
    relMembers
      .filter(col("member_type") === "way" && col("role") === "outer")
      .join(rings, Seq("member_id"))
      .groupBy(col("rel_id"))
      .agg(sort_array(collect_list(struct(
        col("pos"), col("member_id"), col("ring_txt"), col("ring_area")))).as("m"))
      .select(col("rel_id"),
        size(col("m")).cast("long").as("n_rings"),
        aggregate(transform(col("m"), r => r.getField("ring_area")),
          lit(0.0), (a, b) => a + b).as("area"),
        concat(lit("MULTIPOLYGON("),
          array_join(transform(col("m"),
            r => concat(lit("(("), r.getField("ring_txt"), lit("))"))), ","),
          lit(")")).as("wkt"))
  }

  /**
   * Relation "geometry" assembly (A3): ordered member list with roles, plus
   * the hasCompleteGeometry flag — true only when every member resolves
   * (reference: osm2rdf:hasCompleteGeometry in tests/data/relation.ttl).
   * Node members resolve against node_geoms; way members against built way
   * geoms; relation members are not chased (disabled rel-of-rel branch,
   * reference: src/osm/OsmChangeHandler.cpp:270-285).
   */
  def buildRelGeoms(relMembers: DataFrame, nodeGeoms: DataFrame,
                    wayGeoms: DataFrame): DataFrame = {
    val nodePts = nodeGeoms.select(col("id").as("member_id"),
      st_point(col("lon"), col("lat")).as("member_wkt"))
      .withColumn("member_type", lit("node"))
    val wayLines = wayGeoms.select(col("way_id").as("member_id"),
      col("wkt").as("member_wkt"))
      .withColumn("member_type", lit("way"))
    val resolved = relMembers.join(nodePts.unionByName(wayLines),
      Seq("member_id", "member_type"), "left_outer")
    resolved
      .groupBy(col("rel_id"))
      .agg(
        sort_array(collect_list(struct(
          col("pos"), col("member_id"), col("member_type"), col("role"),
          coalesce(col("member_wkt"), lit(""))))).as("members"),
        (count(lit(1)) === count(col("member_wkt"))).as("has_complete_geometry"))
      .withColumn("n_members", size(col("members")))
  }
}
