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
