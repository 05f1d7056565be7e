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

  /** Streaming-dedup source with INJECTED exact duplicates: the raw
   * documents table has no duplicate texts at any sf, so a dedup gate over
   * it is trivially satisfiable. Clones of every 7th/5th doc get ids
   * shifted by o1/2*o1 where o1 is the smallest value > max(doc_id) with
   * o1 ≡ 1 (mod 3) — data-derived, so collision-free at ANY sf (a fixed
   * +10^6 offset collides with real ids once the table exceeds 10^6 docs,
   * and the two fixed families collide with each other at the same scale:
   * d+10^6 == d'+2*10^6 has solutions once ids span 10^6). o1 > max(id)
   * keeps clones disjoint from originals; 2*o1 - o1 = o1 > max(id) keeps
   * the two clone families disjoint from each other. The offsets stay
   * ≡ 1 and 2 (mod 3), so a clone lands in a DIFFERENT micro-batch than
   * its original under the multibatch split doc_id % 3 — the cross-batch
   * first-seen keeper genuinely diverges from plain min(doc_id). */
  val streamDocsSql: String = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
    UNION ALL
    SELECT CAST(doc_id + mo.o1 AS BIGINT), text
    FROM documents, (SELECT CAST(MAX(doc_id) + 1
                       + ((1 - (MAX(doc_id) + 1) % 3) + 3) % 3 AS BIGINT) AS o1
                     FROM documents) mo
    WHERE doc_id % 7 = 0
    UNION ALL
    SELECT CAST(doc_id + 2 * mo.o1 AS BIGINT), text
    FROM documents, (SELECT CAST(MAX(doc_id) + 1
                       + ((1 - (MAX(doc_id) + 1) % 3) + 3) % 3 AS BIGINT) AS o1
                     FROM documents) mo
    WHERE doc_id % 5 = 0"""

  // --- multipolygon ring-stitching fixture (F12 residue, VERDICT.md #4):
  // 25 relations (from nation) whose OUTER rings are split across PARTIAL
  // way segments — square rings of 8 boundary nodes split into 3 ways, the
  // middle way stored REVERSED for odd relations — plus an `inner`-role
  // hole ring (also split, reversed for rel % 3 = 0), a second disjoint
  // closed outer ring for rel % 5 = 0 (multi-ring + chain restart), and a
  // non-way member that stitching must ignore. This is the shape real OSM
  // multipolygons have (reference golden tests/data/relation.ttl: lakes
  // with islands, boundaries split across many ways).

  /** node k -> offset from the relation's center. Family 1 (k 0-15): outer
   * square half-width 1, inner square 0.4, second square at +3 half-width
   * 0.5. Family 2 (k 16-23): the scrambled-order square's 8 boundary nodes.
   * Family 3 (k 24-31): a U-shaped (concave) outer whose bbox CONTAINS the
   * hole but whose interior does NOT; (k 32-35): a small square outer
   * inside the U's notch; (k 36-39): the hole ring inside that square —
   * the overlapping-bbox case where bbox hole-nesting provably mis-assigns
   * and exact ray-cast point-in-ring is required (VERDICT.md r03 #4). */
  private val mpKoff = """(VALUES
      (0, -1.0, -1.0), (1, 0.0, -1.0), (2, 1.0, -1.0), (3, 1.0, 0.0),
      (4, 1.0, 1.0), (5, 0.0, 1.0), (6, -1.0, 1.0), (7, -1.0, 0.0),
      (8, -0.4, -0.4), (9, 0.4, -0.4), (10, 0.4, 0.4), (11, -0.4, 0.4),
      (12, 2.5, -0.5), (13, 3.5, -0.5), (14, 3.5, 0.5), (15, 2.5, 0.5),
      (16, -1.0, -1.0), (17, 0.0, -1.0), (18, 1.0, -1.0), (19, 1.0, 0.0),
      (20, 1.0, 1.0), (21, 0.0, 1.0), (22, -1.0, 1.0), (23, -1.0, 0.0),
      (24, 0.0, 0.0), (25, 3.0, 0.0), (26, 3.0, 3.0), (27, 2.0, 3.0),
      (28, 2.0, 1.0), (29, 1.0, 1.0), (30, 1.0, 3.0), (31, 0.0, 3.0),
      (32, 1.2, 1.5), (33, 1.8, 1.5), (34, 1.8, 2.5), (35, 1.2, 2.5),
      (36, 1.4, 1.9), (37, 1.6, 1.9), (38, 1.6, 2.1), (39, 1.4, 2.1)
    ) AS t(k, dx, dy)"""

  /** way segment definitions: (way seq in rel, role, pos in way, node k,
   * applicability condition on the relation key). */
  private val mpSegdef = """(VALUES
      (1, 'outer', 1, 0, 'all'), (1, 'outer', 2, 1, 'all'), (1, 'outer', 3, 2, 'all'), (1, 'outer', 4, 3, 'all'),
      (2, 'outer', 1, 3, 'even'), (2, 'outer', 2, 4, 'even'), (2, 'outer', 3, 5, 'even'),
      (2, 'outer', 1, 5, 'odd'), (2, 'outer', 2, 4, 'odd'), (2, 'outer', 3, 3, 'odd'),
      (3, 'outer', 1, 5, 'all'), (3, 'outer', 2, 6, 'all'), (3, 'outer', 3, 7, 'all'), (3, 'outer', 4, 0, 'all'),
      (4, 'inner', 1, 8, 'all'), (4, 'inner', 2, 9, 'all'), (4, 'inner', 3, 10, 'all'),
      (5, 'inner', 1, 10, 'notmod3'), (5, 'inner', 2, 11, 'notmod3'), (5, 'inner', 3, 8, 'notmod3'),
      (5, 'inner', 1, 8, 'mod3'), (5, 'inner', 2, 11, 'mod3'), (5, 'inner', 3, 10, 'mod3'),
      (6, 'outer', 1, 12, 'mod5'), (6, 'outer', 2, 13, 'mod5'), (6, 'outer', 3, 14, 'mod5'), (6, 'outer', 4, 15, 'mod5'), (6, 'outer', 5, 12, 'mod5')
    ) AS t(wseq, role, ptpos, k, cond)"""

  private val mpCond = """cond = 'all'
       OR (cond = 'even' AND n_nationkey % 2 = 0)
       OR (cond = 'odd' AND n_nationkey % 2 = 1)
       OR (cond = 'mod3' AND n_nationkey % 3 = 0)
       OR (cond = 'notmod3' AND n_nationkey % 3 <> 0)
       OR (cond = 'mod5' AND n_nationkey % 5 = 0)"""

  // --- family 2 (rel_id 100+n): ORDER-SCRAMBLED rings (VERDICT.md r03 #2).
  // One square ring of 8 nodes (k 16-23) split into 4 ways A,B,C,D in ring
  // order, but listed in the relation as A,C,B,D — consecutive members share
  // NO endpoint, so pos-order stitching provably shatters the ring while
  // global endpoint matching assembles it. The middle segment B is stored
  // REVERSED for odd relations (orientation + scramble together).
  private val mp2Segdef = """(VALUES
      (1, 1, 16, 'all'), (1, 2, 17, 'all'), (1, 3, 18, 'all'),
      (2, 1, 18, 'even'), (2, 2, 19, 'even'), (2, 3, 20, 'even'),
      (2, 1, 20, 'odd'), (2, 2, 19, 'odd'), (2, 3, 18, 'odd'),
      (3, 1, 20, 'all'), (3, 2, 21, 'all'), (3, 3, 22, 'all'),
      (4, 1, 22, 'all'), (4, 2, 23, 'all'), (4, 3, 16, 'all')
    ) AS t(wseq, ptpos, k, cond)"""

  // --- family 3 (rel_id 200+n): EXACT hole nesting (VERDICT.md r03 #4).
  // Outer 1 = closed U-shape way (k 24-31), outer 2 = closed square way
  // inside the U's notch (k 32-35), inner hole (k 36-39) inside outer 2.
  // The hole's first vertex lies inside BOTH outers' bboxes but only inside
  // outer 2 by ray-cast — bbox assignment would nest it under outer 1.
  private val mp3Segdef = """(VALUES
      (1, 'outer', 1, 24), (1, 'outer', 2, 25), (1, 'outer', 3, 26),
      (1, 'outer', 4, 27), (1, 'outer', 5, 28), (1, 'outer', 6, 29),
      (1, 'outer', 7, 30), (1, 'outer', 8, 31), (1, 'outer', 9, 24),
      (2, 'outer', 1, 32), (2, 'outer', 2, 33), (2, 'outer', 3, 34),
      (2, 'outer', 4, 35), (2, 'outer', 5, 32),
      (3, 'inner', 1, 36), (3, 'inner', 2, 37), (3, 'inner', 3, 38),
      (3, 'inner', 4, 39), (3, 'inner', 5, 36)
    ) AS t(wseq, role, ptpos, k)"""

  val mpNodeGeomsSql: String = s"""
    SELECT n_nationkey * 100 + k AS id,
           CAST(n_nationkey * 3 AS DOUBLE) - 30.0 + CAST(dx AS DOUBLE) AS lon,
           CAST(n_nationkey * 2 AS DOUBLE) - 20.0 + CAST(dy AS DOUBLE) AS lat
    FROM nation CROSS JOIN $mpKoff"""

  val mpWayMembersSql: String = s"""
    SELECT n_nationkey * 10 + wseq AS way_id,
           n_nationkey * 100 + k AS node_id,
           ptpos AS pos
    FROM nation CROSS JOIN $mpSegdef
    WHERE $mpCond
    UNION ALL
    SELECT 10000 + n_nationkey * 10 + wseq, n_nationkey * 100 + k, ptpos
    FROM nation CROSS JOIN $mp2Segdef
    WHERE $mpCond
    UNION ALL
    SELECT 20000 + n_nationkey * 10 + wseq, n_nationkey * 100 + k, ptpos
    FROM nation CROSS JOIN $mp3Segdef"""

  val mpRelMembersSql: String = s"""
    SELECT DISTINCT n_nationkey AS rel_id, n_nationkey * 10 + wseq AS member_id,
           'way' AS member_type, role, wseq AS pos
    FROM nation CROSS JOIN $mpSegdef
    WHERE $mpCond
    UNION ALL
    SELECT n_nationkey, n_nationkey * 100, 'node', '', 7 FROM nation
    UNION ALL
    SELECT DISTINCT 100 + n_nationkey, 10000 + n_nationkey * 10 + wseq, 'way', 'outer',
           CASE wseq WHEN 1 THEN 1 WHEN 3 THEN 2 WHEN 2 THEN 3 ELSE 4 END
    FROM nation CROSS JOIN $mp2Segdef
    WHERE $mpCond
    UNION ALL
    SELECT DISTINCT 200 + n_nationkey, 20000 + n_nationkey * 10 + wseq, 'way', role, wseq
    FROM nation CROSS JOIN $mp3Segdef"""

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
    "stream_docs" -> streamDocsSql,
    "mp_node_geoms" -> mpNodeGeomsSql,
    "mp_way_members" -> mpWayMembersSql,
    "mp_rel_members" -> mpRelMembersSql,
  )

  /** Register base parquet tables + derived views for `sfDir`.
   *
   * Memoized per (session, dir): registration = 10 parquet footer/schema
   * reads + 12 SQL parses, ~1-1.5 s of pure driver-side catalog work that a
   * deployed warehouse pays at table-creation time, not per query. The memo
   * makes repeated calls free within a session while staying correct when a
   * session switches sf dirs (the dir is part of the key). The derived-view
   * COMPUTE is untouched — every query's scan still executes the view SQL.
   *
   * Contract narrowing vs the un-memoized version (review finding): within
   * one session the underlying parquet is assumed immutable for a given dir
   * (true for the driver testdata — regenerated data arrives in a new
   * process); a dropped view — any of the 22 — IS detected (tableExists
   * sweep, ~ms each) and triggers a full re-registration. */
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  def register(spark: SparkSession, sfDir: String): Unit = {
    if (sfDir == registered.get(spark) &&
      (baseTables.iterator ++ derived.iterator.map(_._1))
        .forall(spark.catalog.tableExists)) return
    baseTables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    derived.foreach { case (name, sql) =>
      spark.sql(sql).createOrReplaceTempView(name)
    }
    registered.put(spark, sfDir)
    ()
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
