package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deterministic derivation of the engine's input tables (FIXTURES.md §1-§4)
 * from the driver-provided parquet testdata — no external data, no RNG.
 *
 * Every derivation is a **dialect-common SQL string** (ANSI subset that Spark
 * SQL and DuckDB evaluate identically: integer `%`/`*`/`+`, double division,
 * CASE, window functions). The engine registers them as temp views; the
 * DuckDB oracle inlines the *same strings* as WITH clauses — so Spark and the
 * oracle provably compute over identical inputs, the way the reference's
 * golden tests feed identical fixture files to both sides
 * (reference: tests/data OsmChange fixtures consumed by both gtest and osm2rdf).
 *
 * Coordinates are integer-hash arithmetic divided by 10^4 — exactly
 * representable decisions in IEEE double on both engines. ~30% of points land
 * in one hot ~0.1-degree box (London-ish) to exercise salted-skew handling
 * (FIXTURES.md §4 "skew fixture").
 */
object DerivedTables {

  val baseTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Spatial point set (PIP/kNN/tile probe side), from lineitem.
   * pid is unique: orderkey*10+linenumber (linenumber <= 7). */
  val pointsSql: String = """
    SELECT
      l_orderkey * 10 + l_linenumber AS pid,
      CASE WHEN l_orderkey % 10 < 3
           THEN -0.0500000 + (CAST((l_orderkey * 7919 + l_partkey * 104729 + l_linenumber * 131) % 1000 AS DOUBLE)) / 10000.0
           ELSE (CAST((l_orderkey * 7919 + l_partkey * 104729 + l_linenumber * 131) % 3600000 AS DOUBLE)) / 10000.0 - 180.0
      END AS lon,
      CASE WHEN l_orderkey % 10 < 3
           THEN 51.5000000 + (CAST((l_orderkey * 104729 + l_suppkey * 7919 + l_linenumber * 173) % 1000 AS DOUBLE)) / 10000.0
           ELSE (CAST((l_orderkey * 104729 + l_suppkey * 7919 + l_linenumber * 173) % 1700000 AS DOUBLE)) / 10000.0 - 85.0
      END AS lat
    FROM lineitem"""

  /** Rectangle polygon set (PIP build side), from part: center + half-extent
   * arithmetic. Engine renders WKT; the oracle uses the numeric bounds. */
  val rectsSql: String = """
    SELECT
      p_partkey AS poly_id,
      (CAST((p_partkey * 7919) % 3200000 AS DOUBLE)) / 10000.0 - 160.0 AS cx,
      (CAST((p_partkey * 104729) % 1500000 AS DOUBLE)) / 10000.0 - 75.0 AS cy,
      0.2 + CAST(p_partkey % 37 AS DOUBLE) / 10.0 AS hw,
      0.2 + CAST(p_partkey % 23 AS DOUBLE) / 10.0 AS hh
    FROM part"""

  /** kNN query points: every 20th part key, placed near the global
   * distribution (including some probes inside the hot box). */
  val queryPointsSql: String = """
    SELECT
      p_partkey AS qid,
      CASE WHEN p_partkey % 7 = 0
           THEN -0.0400000 + (CAST((p_partkey * 131) % 800 AS DOUBLE)) / 10000.0
           ELSE (CAST((p_partkey * 6271) % 3600000 AS DOUBLE)) / 10000.0 - 180.0
      END AS qlon,
      CASE WHEN p_partkey % 7 = 0
           THEN 51.5100000 + (CAST((p_partkey * 173) % 800 AS DOUBLE)) / 10000.0
           ELSE (CAST((p_partkey * 8191) % 1700000 AS DOUBLE)) / 10000.0 - 85.0
      END AS qlat
    FROM part WHERE p_partkey % 20 = 0"""

  /**
   * OsmChange-shaped change batches from events (FIXTURES.md §2; action
   * derivation mirrors the reference's classifier: deleted -> delete,
   * version == 1 -> create, else modify —
   * reference: src/osm/OsmObjectHelper.cpp:281-286).
   *
   * `rel_type` carries the tags["type"] value for relation records (NULL
   * for nodes/ways and untyped relations) so the P2 area-relation predicate
   * — modified relations tagged multipolygon/boundary enter the
   * modified-areas set — is evaluable downstream of the change scan
   * (reference: src/osm/RelationHandler.cpp:41-49).
   */
  val changesSql: String = """
    SELECT
      event_id % 20 AS seq,
      event_id AS eid,
      CASE WHEN event_id % 5 < 3 THEN 'node'
           WHEN event_id % 5 = 3 THEN 'way'
           ELSE 'relation' END AS obj_type,
      event_id % 500 AS id,
      1 + CAST((event_id * 13) % 7 AS INT) AS version,
      CASE WHEN event_type = 'error' AND event_id % 4 = 0 THEN 1 ELSE 0 END AS deleted,
      CASE WHEN event_type = 'error' AND event_id % 4 = 0 THEN 'delete'
           WHEN 1 + CAST((event_id * 13) % 7 AS INT) = 1 THEN 'create'
           ELSE 'modify' END AS action,
      ts,
      CASE WHEN event_id % 3 = 0
           THEN (CAST(((event_id % 500) * 7919) % 3600000 AS DOUBLE)) / 10000.0 - 180.0
           ELSE (CAST((event_id * 7919) % 3600000 AS DOUBLE)) / 10000.0 - 180.0
      END AS lon,
      CASE WHEN event_id % 3 = 0
           THEN (CAST(((event_id % 500) * 104729) % 1700000 AS DOUBLE)) / 10000.0 - 85.0
           ELSE (CAST((event_id * 104729) % 1700000 AS DOUBLE)) / 10000.0 - 85.0
      END AS lat,
      CASE WHEN event_id % 5 = 4 THEN
        CASE WHEN event_id % 7 = 0 THEN 'multipolygon'
             WHEN event_id % 7 = 1 THEN 'boundary'
             WHEN event_id % 7 = 2 THEN 'route'
        END
      END AS rel_type
    FROM events"""

  /** Snapshot node geometry table (the store the reference keeps on the
   * SPARQL endpoint, FIXTURES.md §3). id % 17 = 3 ids are deliberately
   * absent to drive the modify->create reclassification branch
   * (reference: src/osm/NodeHandler.cpp:70-76). */
  val nodeGeomsSql: String = """
    SELECT id,
      (CAST((id * 7919) % 3600000 AS DOUBLE)) / 10000.0 - 180.0 AS lon,
      (CAST((id * 104729) % 1700000 AS DOUBLE)) / 10000.0 - 85.0 AS lat
    FROM (SELECT DISTINCT l_partkey % 500 AS id FROM lineitem) ids
    WHERE id % 17 <> 3"""

  /** Snapshot way->node membership (ordered by pos; FIXTURES.md §3). */
  val wayMembersSql: String = """
    SELECT l_orderkey AS way_id,
           l_partkey % 500 AS node_id,
           l_linenumber AS pos
    FROM lineitem"""

  /** Snapshot relation membership with heterogeneous member types + roles
   * (blank-node triples in the reference, tests/data/relation.ttl). */
  val relMembersSql: String = """
    SELECT
      o_orderkey % 700 AS rel_id,
      CASE WHEN o_orderkey % 4 < 2 THEN o_custkey % 500
           WHEN o_orderkey % 4 = 2 THEN (o_orderkey * 3) % 15000
           ELSE (o_orderkey * 5) % 700 END AS member_id,
      CASE WHEN o_orderkey % 4 < 2 THEN 'node'
           WHEN o_orderkey % 4 = 2 THEN 'way'
           ELSE 'relation' END AS member_type,
      CASE WHEN o_orderkey % 3 = 0 THEN 'outer'
           WHEN o_orderkey % 3 = 1 THEN 'inner'
           ELSE '' END AS role,
      CAST(ROW_NUMBER() OVER (PARTITION BY o_orderkey % 700 ORDER BY o_orderkey) AS INT) AS pos
    FROM orders"""

  /**
   * Flat span rows of the interleaved text+media docs table (input_hint).
   * The engine nests these into docs(doc_id, spans ARRAY<STRUCT>) ordered by
   * offset; the invariant checker and the oracle both work off this flat
   * form. Span kinds mirror FIXTURES.md §1: meta, wkt, tag, media, tag.
   */
  val docSpansSql: String = """
    SELECT 'doc/' || CAST(doc_id AS STRING) AS doc_id, 0 AS span_pos, 'meta' AS kind,
           'doc/' || CAST(doc_id AS STRING) || '/v1' AS text, '' AS media_ref
    FROM documents
    UNION ALL
    SELECT 'doc/' || CAST(doc_id AS STRING), 1, 'wkt',
           'POINT_E4(' || CAST((doc_id * 7919) % 3600000 - 1800000 AS STRING)
                       || ' ' || CAST((doc_id * 104729) % 1700000 - 850000 AS STRING) || ')',
           ''
    FROM documents
    UNION ALL
    SELECT 'doc/' || CAST(doc_id AS STRING), 2, 'tag', 'lang=' || lang, '' FROM documents
    UNION ALL
    SELECT 'doc/' || CAST(doc_id AS STRING), 3, 'media', 'frame0',
           'tile/' || CAST(doc_id % 64 AS STRING)
    FROM documents
    UNION ALL
    SELECT 'doc/' || CAST(doc_id AS STRING), 4, 'tag', 'source=' || source, '' FROM documents"""

  /** Raster tile inventory (zoom-6 flat ids) for the raster<->vector join. */
  val rasterTilesSql: String = """
    SELECT DISTINCT (p_partkey * 31) % 4096 AS tile_id FROM part"""

  val derived: Seq[(String, String)] = Seq(
    "points" -> pointsSql,
    "rects" -> rectsSql,
    "query_points" -> queryPointsSql,
    "changes" -> changesSql,
    "node_geoms" -> nodeGeomsSql,
    "way_members" -> wayMembersSql,
    "rel_members" -> relMembersSql,
    "doc_spans" -> docSpansSql,
    "raster_tiles" -> rasterTilesSql,
  )

  /** Register base parquet tables + derived views for `sfDir`. */
  def register(spark: SparkSession, sfDir: String): Unit = {
    baseTables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    derived.foreach { case (name, sql) =>
      spark.sql(sql).createOrReplaceTempView(name)
    }
  }

  def view(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    register(spark, sfDir)
    spark.table(name)
  }

  /** Inline a derivation as a WITH clause for oracle SQL composition. */
  def withClause(names: String*): String =
    "WITH " + names.map { n =>
      val sql = derived.toMap.apply(n)
      s"$n AS ($sql)"
    }.mkString(",\n")
}
