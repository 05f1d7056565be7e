package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Delta application with MERGE semantics (upsert + delete), the Spark
 * re-expression of the reference's batched SPARQL DELETE/INSERT sink
 * (reference: src/sparql/SparqlWrapper.cpp:88-146,
 * src/osm/OsmChangeHandler.cpp:388-430, delete-target expansion
 * src/sparql/QueryWriter.cpp:69-239).
 *
 * This Spark build has no Iceberg jars on the classpath, so `MERGE INTO` is
 * realized as the equivalent set algebra over keyed snapshots —
 * anti-join(delete ∪ upsert keys) ∪ upserts — behind one API
 * (SURVEY.md §7 "Iceberg availability" fallback). The semantics kept from
 * the reference:
 *  - deletes are idempotent (DELETE WHERE; absent key is a no-op),
 *  - a modify for an unseen key inserts (WHEN NOT MATCHED THEN INSERT,
 *    mirroring the modify->create reclassification,
 *    reference: src/osm/NodeHandler.cpp:70-76),
 *  - geometry-only updates touch only geometry columns (R5 projection,
 *    reference: src/osm/OsmChangeHandler.cpp:849-894).
 */
/**
 * P7 osm2rdf option gate: which derived geometry columns exist in the store
 * — and therefore participate in geometry-only MERGEs — as a function of
 * the osm2rdf options the dump was built with (reference:
 * `hasTripleForOption` src/osm/Osm2ttl.cpp:114-121; consumed to gate the
 * centroid/OBB/envelope/convex-hull/member delete queries at
 * src/osm/OsmChangeHandler.cpp:446-450, 479-553, 576-638). An option
 * ABSENT from the map means the column is assumed present (the reference's
 * conservative default when the endpoint recorded no options).
 */
final case class GeomOptions(centroid: Boolean = true, envelope: Boolean = true,
                             convexHull: Boolean = true, obb: Boolean = true,
                             memberTriples: Boolean = true) {
  /** The geometry-column subset a MERGE touches: base geometry (wkt,
   * length) always; derived columns per flag. Intersect with what the
   * snapshot actually has. */
  def geomCols(available: Seq[String]): Seq[String] = {
    val wanted = Seq("wkt", "length") ++
      (if (centroid) Seq("centroid") else Nil) ++
      (if (envelope) Seq("envelope") else Nil) ++
      (if (convexHull) Seq("convex_hull") else Nil) ++
      (if (obb) Seq("obb") else Nil)
    wanted.filter(available.contains)
  }
}

object GeomOptions {
  // osm2rdf long option names (reference: the supportedOsm2rdfOptions list,
  // src/osm/Osm2ttl.cpp:123-160)
  val AddCentroid = "add-centroid"
  val AddEnvelope = "add-envelope"
  val AddConvexHull = "add-convex-hull"
  val AddObb = "add-obb"
  val NoMemberTriples = "no-member-triples"

  /** reference hasTripleForOption: true when the option is absent OR its
   * value equals the activating condition (src/osm/Osm2ttl.cpp:114-121). */
  def hasTripleForOption(opts: Map[String, String], option: String,
                         condition: String = "true"): Boolean =
    !opts.contains(option) || opts(option) == condition

  /** Build the gate from an osm2rdf-style options map (the reference
   * fetches this map from the endpoint's meta triples, F11). */
  def fromOsm2rdfOptions(opts: Map[String, String]): GeomOptions = GeomOptions(
    centroid = hasTripleForOption(opts, AddCentroid),
    envelope = hasTripleForOption(opts, AddEnvelope),
    convexHull = hasTripleForOption(opts, AddConvexHull),
    obb = hasTripleForOption(opts, AddObb),
    memberTriples = hasTripleForOption(opts, NoMemberTriples, "false"))
}

object DeltaApply {

  /**
   * Pure MERGE: apply a compacted change batch to a keyed snapshot.
   *
   * @param snapshot  current state, one row per `keyCol`
   * @param compacted one change row per key (run ChangeBatch.dedupLatestVersion
   *                  first), with an `action` column and the snapshot's value
   *                  columns for create/modify rows
   * @return next snapshot state
   */
  def applyChangeBatch(snapshot: DataFrame, compacted: DataFrame,
                       keyCol: String = "id"): DataFrame = {
    val touched = compacted.select(col(keyCol)).distinct()
    val survivors = snapshot.join(touched, Seq(keyCol), "left_anti")
    val upserts = compacted
      .filter(col("action") =!= "delete")
      .select(snapshot.columns.map(col): _*)
    survivors.unionByName(upserts)
  }

  /**
   * Geometry-only update path (R5): refresh only the geometry columns of the
   * rows in `geomUpdates`, leaving fact columns untouched — the reference's
   * "update geometry predicates but not facts" split
   * (reference: src/osm/OsmChangeHandler.cpp:849-861).
   *
   * @param snapshot    wide table (key + fact cols + geometry cols)
   * @param geomUpdates (key, <geometry cols>) recomputed rows
   * @param geomCols    the geometry column subset being replaced
   */
  def applyGeometryOnly(snapshot: DataFrame, geomUpdates: DataFrame,
                        keyCol: String, geomCols: Seq[String]): DataFrame = {
    val renamed = geomCols.foldLeft(geomUpdates) { (df, c) =>
      df.withColumnRenamed(c, s"__new_$c")
    }
    val joined = snapshot.join(renamed.hint("broadcast"), Seq(keyCol), "left_outer")
    val updated = geomCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(s"__new_$c"), col(c)))
    }
    updated.select(snapshot.columns.map(col): _*)
  }

  /** [[applyGeometryOnly]] with the column subset selected by the P7 option
   * gate instead of hand-listed columns — the Spark form of "only run the
   * centroid/OBB/envelope/hull delete+insert queries the dump actually
   * has" (reference: src/osm/OsmChangeHandler.cpp:446-450, 529-551). */
  def applyGeometryOptioned(snapshot: DataFrame, geomUpdates: DataFrame,
                            keyCol: String, options: GeomOptions): DataFrame = {
    val cols = options.geomCols(
      snapshot.columns.toSeq.intersect(geomUpdates.columns.toSeq))
    applyGeometryOnly(snapshot, geomUpdates.select((keyCol +: cols).map(col): _*),
      keyCol, cols)
  }

  /**
   * The Iceberg `MERGE INTO` statement that [[applyChangeBatch]]'s set
   * algebra stands in for — emitted as SQL text so the jar-drop migration is
   * one call site: with Iceberg on the classpath, register the compacted
   * batch as a temp view and run this statement against the geometry table
   * instead of rewriting the snapshot (SURVEY.md §7 "Iceberg availability"
   * risk; VERDICT.md r02 missing #4). Clause order encodes the same
   * semantics applyChangeBatch implements and MergeSqlSpec cross-checks:
   * matched deletes win, matched non-deletes update every value column,
   * unmatched non-deletes insert (the modify->create reclassification,
   * reference: src/osm/NodeHandler.cpp:70-76); unmatched deletes fall
   * through — idempotent DELETE.
   */
  def mergeIntoSql(targetTable: String, sourceView: String, keyCol: String,
                   valueCols: Seq[String]): String = {
    val sets = valueCols.map(c => s"t.$c = s.$c").mkString(", ")
    val ins = (keyCol +: valueCols).mkString(", ")
    val insVals = (keyCol +: valueCols).map(c => s"s.$c").mkString(", ")
    s"""MERGE INTO $targetTable t
       |USING $sourceView s
       |ON t.$keyCol = s.$keyCol
       |WHEN MATCHED AND s.action = 'delete' THEN DELETE
       |WHEN MATCHED THEN UPDATE SET $sets
       |WHEN NOT MATCHED AND s.action <> 'delete' THEN INSERT ($ins) VALUES ($insVals)""".stripMargin
  }

  /** Expected-counts cross-check, mirroring the reference's QLever
   * insert/delete accounting (reference: src/osm/StatisticsHandler.cpp:134-152,
   * OsmChangeHandler.cpp:414-418). Returns (deletedRows, upsertedRows). */
  def mergeMetrics(before: DataFrame, compacted: DataFrame,
                   keyCol: String = "id"): (Long, Long) = {
    val touched = compacted.select(col(keyCol)).distinct()
    val deleted = before.join(touched, Seq(keyCol), "left_semi").count()
    val upserted = compacted.filter(col("action") =!= "delete").count()
    (deleted, upserted)
  }
}
