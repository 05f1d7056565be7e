package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * The reference's OsmChange dataflow, re-expressed as declarative DataFrame
 * transforms (reference: src/osm/OsmChangeHandler.cpp:60-178 — classify ->
 * location-diff -> reverse-reference closure -> forward-reference closure,
 * all driven by set joins against the snapshot store).
 *
 * Inputs use the derived-table schemas (graft.gen.DerivedTables): changes
 * (seq, eid, obj_type, id, version, deleted, action, ts, lon, lat),
 * node_geoms (id, lon, lat), way_members (way_id, node_id, pos),
 * rel_members (rel_id, member_id, member_type, role, pos).
 */
object ChangeBatch {

  /**
   * P1 change-action classifier: deleted -> delete, version == 1 -> create,
   * else modify (reference: src/osm/OsmObjectHelper.cpp:281-286,
   * NodeHandler/WayHandler/RelationHandler.cpp classify loops).
   */
  def classify(changes: DataFrame): DataFrame =
    changes.withColumn("action2",
      when(col("deleted") === 1, "delete")
        .when(col("version") === 1, "create")
        .otherwise("modify"))

  /**
   * P2 area-relation predicate: of the classified records, the modified
   * relations whose type tag is multipolygon or boundary — these enter the
   * modified-AREAS set (their assembled polygon geometry must be rebuilt)
   * in addition to the plain modified-relations set
   * (reference: src/osm/RelationHandler.cpp:41-49).
   * Expects a classified batch (`action2` from [[classify]]) carrying the
   * `rel_type` tag column.
   */
  def areaRelations(classified: DataFrame): DataFrame =
    classified.filter(col("obj_type") === "relation" &&
      col("action2") === "modify" &&
      col("rel_type").isin("multipolygon", "boundary"))

  /**
   * O1 last-writer-wins compaction: keep exactly one record per
   * (obj_type, id), ordered by version DESC, deleted DESC, ts DESC —
   * the reference's merge-sort + unique_copy comparator verbatim
   * (reference: include/osm/OsmFileHelper.h:42-101, comparator :42-55).
   * Ensures each object is processed once regardless of how many change
   * files were merged (idempotent replay from checkpoint).
   */
  def dedupLatestVersion(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("obj_type"), col("id"))
      .orderBy(col("version").desc, col("deleted").desc, col("ts").desc, col("eid").desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * J2 location-diff check with null-branch reclassification
   * (reference: src/osm/NodeHandler.cpp:48-80): modified nodes left-outer
   * join the snapshot; no snapshot row -> reclassified 'create'; equal
   * location -> 'modified'; moved location -> 'moved' (geometry dirty).
   */
  def locationDiff(modifiedNodes: DataFrame, nodeGeoms: DataFrame): DataFrame = {
    val snap = nodeGeoms
      .withColumnRenamed("lon", "snap_lon")
      .withColumnRenamed("lat", "snap_lat")
    modifiedNodes.join(snap, Seq("id"), "left_outer")
      .withColumn("status",
        when(col("snap_lon").isNull, "create")
          .when(col("snap_lon") === col("lon") && col("snap_lat") === col("lat"), "modified")
          .otherwise("moved"))
      .drop("snap_lon", "snap_lat")
  }

  /**
   * J3 + J9: ways whose geometry is dirtied by moved/deleted nodes, minus
   * ways already present in the change file (the anti-join is the dominant
   * idiom of the whole reference pipeline —
   * reference: src/sparql/QueryWriter.cpp:342-353 for the semi-join,
   * src/osm/ReferencesHandler.cpp:27-61 for the not-in-changefile guard).
   */
  def waysToUpdateGeometry(dirtyNodeIds: DataFrame, wayMembers: DataFrame,
                           changeWayIds: DataFrame): DataFrame =
    wayMembers
      .join(dirtyNodeIds.hint("broadcast").withColumnRenamed("id", "node_id"),
        Seq("node_id"), "left_semi")
      .select(col("way_id"))
      .distinct()
      .join(changeWayIds.withColumnRenamed("id", "way_id"), Seq("way_id"), "left_anti")

  /**
   * J4 + J5 + J9: relations referencing dirty nodes or dirty/changed ways,
   * minus relations in the change file
   * (reference: src/osm/OsmChangeHandler.cpp:232-268).
   * Relation-of-relation propagation is deliberately NOT chased, matching
   * the reference's disabled rel-of-rel branch
   * (reference: src/osm/OsmChangeHandler.cpp:270-285).
   */
  def relationsToUpdateGeometry(dirtyNodeIds: DataFrame, dirtyWayIds: DataFrame,
                                relMembers: DataFrame, changeRelIds: DataFrame): DataFrame = {
    val viaNodes = relMembers.filter(col("member_type") === "node")
      .join(dirtyNodeIds.hint("broadcast").withColumnRenamed("id", "member_id"),
        Seq("member_id"), "left_semi")
    val viaWays = relMembers.filter(col("member_type") === "way")
      .join(dirtyWayIds.hint("broadcast").withColumnRenamed("way_id", "member_id"),
        Seq("member_id"), "left_semi")
    viaNodes.select(col("rel_id")).unionByName(viaWays.select(col("rel_id")))
      .distinct()
      .join(changeRelIds.withColumnRenamed("id", "rel_id"), Seq("rel_id"), "left_anti")
  }

  /**
   * J7: forward references — node ids referenced by the given ways, minus
   * nodes already in the change file (reference:
   * src/sparql/QueryWriter.cpp:316-326, ReferencesHandler.cpp:64-99).
   */
  def referencedNodesOfWays(wayIds: DataFrame, wayMembers: DataFrame,
                            changeNodeIds: DataFrame): DataFrame =
    wayMembers
      .join(wayIds.hint("broadcast"), Seq("way_id"), "left_semi")
      .select(col("node_id"))
      .distinct()
      .join(changeNodeIds.withColumnRenamed("id", "node_id"), Seq("node_id"), "left_anti")

  /**
   * J8: member ids of the given relations, split by member type
   * (reference: src/sparql/QueryWriter.cpp:329-339,
   * OsmDataFetcherQLever.cpp:280-302 splits by URI namespace; here the type
   * is a typed column, so the split is two filters).
   */
  def relationMemberSplit(relIds: DataFrame, relMembers: DataFrame): (DataFrame, DataFrame) = {
    val members = relMembers.join(relIds.hint("broadcast"), Seq("rel_id"), "left_semi")
    val nodeIds = members.filter(col("member_type") === "node")
      .select(col("member_id").as("node_id")).distinct()
    val wayIds = members.filter(col("member_type") === "way")
      .select(col("member_id").as("way_id")).distinct()
    (nodeIds, wayIds)
  }

  /**
   * The full dependency-closure stage over one compacted change batch —
   * the dataflow of OsmChangeHandler::run up to the geometry rebuild
   * (reference: src/osm/OsmChangeHandler.cpp:60-178):
   * returns (dirtyWays, dirtyRels) = objects needing geometry-only updates.
   */
  def dependencyClosure(compacted: DataFrame, nodeGeoms: DataFrame,
                        wayMembers: DataFrame, relMembers: DataFrame): (DataFrame, DataFrame) = {
    val nodes = compacted.filter(col("obj_type") === "node")
    val modified = nodes.filter(col("action") === "modify")
    val diffed = locationDiff(modified, nodeGeoms)
    val moved = diffed.filter(col("status") === "moved").select(col("id"))
    val deletedNodes = nodes.filter(col("action") === "delete").select(col("id"))
    val dirtyNodes = moved.unionByName(deletedNodes).distinct()

    val changeWayIds = compacted.filter(col("obj_type") === "way").select(col("id"))
    val changeRelIds = compacted.filter(col("obj_type") === "relation").select(col("id"))

    val dirtyWays = waysToUpdateGeometry(dirtyNodes, wayMembers, changeWayIds)
    // ways whose own change record dirties geometry also propagate to rels
    val updatedWays = dirtyWays
      .unionByName(changeWayIds.withColumnRenamed("id", "way_id"))
      .distinct()
    val dirtyRels = relationsToUpdateGeometry(dirtyNodes, updatedWays, relMembers, changeRelIds)
    (dirtyWays, dirtyRels)
  }
}
