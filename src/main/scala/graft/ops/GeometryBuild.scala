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
