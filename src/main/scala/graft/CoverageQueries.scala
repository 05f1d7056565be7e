package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.gen.DerivedTables
import graft.ops.{GeometryBuild, GlobalSort}

/**
 * SURVEY.md §2 coverage batch 2: GROUP_CONCAT member-list semantics (A2/A3),
 * parser/encoder scalar functions (F1/F4/F6), the scale-aware global sort
 * (O2), derived geometry columns (F12) and relation-geometry completeness —
 * each with a DuckDB oracle built from the same shared derivations.
 */
object CoverageQueries {

  private def prep(spark: SparkSession, dir: String): SparkSession = {
    GraftFunctions.register(spark)
    DerivedTables.register(spark, dir)
    spark
  }

  /** The deterministic 20-record .osc batch behind `s1_osmchange_xml` —
   * single source of truth for both the synthesized XML and the VALUES
   * oracle (same discipline as DerivedTables' shared derivation strings). */
  private final case class S1Rec(i: Int, env: String, objType: String,
                                 id: Long, version: Int) {
    /** reference classifier: deleted -> delete, v1 -> create, else modify
     * (reference: src/osm/OsmObjectHelper.cpp:281-286) */
    def action2: String =
      if (env == "delete") "delete" else if (version == 1) "create" else "modify"
  }
  private val s1Recs: Seq[S1Rec] = (0 until 20).map { i =>
    val env = Seq("create", "modify", "delete")(i % 3)
    if (i % 4 == 3) S1Rec(i, env, "way", 200 + i, 1 + i % 5)
    else S1Rec(i, env, "node", 100 + i, 1 + i % 5)
  }

  private def W(names: String*): String = DerivedTables.withClause(names: _*)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1: OsmChange XML scan via the native Spark XML source. Synthesizes a
    // deterministic .osc batch (no external data), reads + flattens it, and
    // feeds the P1 classifier. DuckDB has no XML reader, but the batch is
    // deterministic, so the oracle is a VALUES literal generated from the
    // SAME record list (s1Recs) — closing the r01 no_oracle row.
    // OsmChangeXmlSpec still asserts the full golden content (tags/nd/ts).
    "s1_osmchange_xml" -> ((s, dir) => {
      prep(s, dir)
      // fixed deterministic scratch dir, overwritten in place: a fresh
      // createTempDirectory per invocation leaked one dir per attempt/round
      // on the shared driver VM (review finding)
      val tmp = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_osc_cov")
      java.nio.file.Files.createDirectories(tmp)
      val osc = s1Recs.map { r =>
        val i = r.i
        val body =
          if (r.objType == "way")
            s"""<way id="${r.id}" version="${r.version}" timestamp="2024-02-0${1 + i % 9}T00:00:0${i % 10}Z"><nd ref="${i}"/><nd ref="${i + 1}"/></way>"""
          else
            s"""<node id="${r.id}" version="${r.version}" timestamp="2024-02-0${1 + i % 9}T00:00:0${i % 10}Z" lon="${i}.5" lat="${i % 80}.25"><tag k="n" v="v$i"/></node>"""
        s"<${r.env}>$body</${r.env}>"
      }.mkString(
        """<?xml version="1.0"?><osmChange version="0.6">""", "", "</osmChange>")
      // atomic publish: a concurrent JVM (Verify alongside a Bench suite)
      // must never read a half-written batch.osc (ADVICE.md) — write to a
      // same-dir temp file and ATOMIC_MOVE over the target
      val tmpFile = java.nio.file.Files.createTempFile(tmp, "batch", ".osc.tmp")
      java.nio.file.Files.writeString(tmpFile, osc)
      java.nio.file.Files.move(tmpFile, tmp.resolve("batch.osc"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.ops.ChangeBatch.classify(
        graft.sources.OsmChangeXml.read(s, tmp.toString + "/*.osc")
          .withColumn("deleted", when(col("action") === "delete", 1).otherwise(0)))
        .select(col("obj_type"), col("id"), col("version").cast("long").as("version"),
          col("action2"))
    }),

    // A2: way member GROUP_CONCAT (ids + positions, ';'-joined, pos order)
    "a2_member_concat" -> ((s, dir) => {
      prep(s, dir)
      s.table("way_members")
        .groupBy(col("way_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("node_id")))).as("m"))
        .select(col("way_id"),
          array_join(transform(col("m"), p => p.getField("node_id")), ";").as("member_ids"),
          array_join(transform(col("m"), p => p.getField("pos")), ";").as("member_pos"))
    }),

    // A3: relation member GROUP_CONCAT (3 parallel lists, pos order)
    "a3_rel_member_concat" -> ((s, dir) => {
      prep(s, dir)
      s.table("rel_members")
        .groupBy(col("rel_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("member_id"),
          col("member_type"), col("role")))).as("m"))
        .select(col("rel_id"),
          array_join(transform(col("m"), p => p.getField("member_id")), ";").as("member_ids"),
          array_join(transform(col("m"), p => p.getField("member_type")), ";").as("member_types"),
          array_join(transform(col("m"), p => p.getField("role")), ";").as("member_roles"))
    }),

    // F1/F2: id + type parse from IRI with trailing junk tolerance
    "f1_parse_id_uri" -> ((s, dir) => {
      prep(s, dir)
      s.table("node_geoms")
        .select(concat(lit("<https://www.openstreetmap.org/node/"), col("id"), lit(">")).as("uri"))
        .select(col("uri"),
          regexp_extract(col("uri"), "(\\d+)[\">]*$", 1).cast("long").as("parsed_id"),
          when(col("uri").contains("/node/"), "node")
            .when(col("uri").contains("/way/"), "way")
            .otherwise("relation").as("parsed_type"))
    }),

    // F4: GROUP_CONCAT parse round-trip — split ';' lists, zip, int-parse,
    // re-sort by pos; must reproduce way_members exactly
    "f4_member_list_roundtrip" -> ((s, dir) => {
      prep(s, dir)
      val concatenated = s.table("way_members")
        .groupBy(col("way_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("node_id")))).as("m"))
        .select(col("way_id"),
          // scramble the serialization order (by node_id) to prove the
          // parser re-sorts by pos, like the reference does
          array_join(transform(sort_array(transform(col("m"),
            p => struct(p.getField("node_id").as("node_id"), p.getField("pos").as("pos")))),
            p => concat_ws(":", p.getField("pos"), p.getField("node_id"))), ";").as("packed"))
      concatenated
        .select(col("way_id"), explode(
          sort_array(transform(split(col("packed"), ";"), kv =>
            struct(split(kv, ":").getItem(0).cast("int").as("pos"),
              split(kv, ":").getItem(1).cast("long").as("node_id"))))).as("m"))
        .select(col("way_id"), col("m.node_id").as("node_id"), col("m.pos").as("pos"))
    }),

    // F6: XML entity encode + decode round-trip + isEncoded predicate
    // (reference: src/util/XmlHelper.cpp:109-179; decode's escaping
    // backslash before quotes reproduced verbatim)
    "f6_xml_encode" -> ((s, dir) => {
      prep(s, dir)
      val raw = concat(lit("a&b<"), col("source"), lit(">\"c'd\t"))
      val enc = graft.functions.XmlText.xmlEncode(raw)
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), enc.as("encoded"),
          graft.functions.XmlText.xmlDecode(enc).as("decoded"),
          graft.functions.XmlText.isXmlEncoded(enc).as("enc_is_encoded"),
          graft.functions.XmlText.isXmlEncoded(raw).as("raw_is_encoded"))
    }),

    // O2: global id_version sort with scale-aware range-partitioned ranking
    "o2_global_sort" -> ((s, dir) => {
      prep(s, dir)
      GlobalSort.withGlobalRank(
        s.table("changes").select("obj_type", "id", "version", "eid"),
        partitions = 8, col("obj_type"), col("id"), col("version"), col("eid"))
        .select(col("rn"), col("obj_type"), col("id"), col("version").cast("long").as("version"))
    }),

    // F12: derived geometry columns over built way linestrings
    "way_derived" -> ((s, dir) => {
      prep(s, dir)
      GeometryBuild.buildWayGeoms(s.table("way_members"), s.table("node_geoms"))
        .select(col("way_id"), col("length"), col("envelope"), col("centroid"))
    }),

    // F12: convex hull of each way's point set (st_convex_hull / Andrew
    // monotone chain) — previously GeoSpec-golden only (VERDICT.md r03 #5);
    // the oracle re-implements the identical chain as a recursive CTE
    "way_hull" -> ((s, dir) => {
      prep(s, dir)
      GeometryBuild.buildWayGeoms(s.table("way_members"), s.table("node_geoms"))
        .select(col("way_id"), col("convex_hull"))
    }),

    // F12: minimum-area oriented bounding box (st_obb / rotating projection
    // over the hull) — the LAST golden-only geometry derivation, now under
    // the DuckDB gate via the hull-ring recursive CTE + per-edge projection
    "way_obb" -> ((s, dir) => {
      prep(s, dir)
      GeometryBuild.buildWayGeoms(s.table("way_members"), s.table("node_geoms"))
        .select(col("way_id"), col("obb"))
    }),

    // F12 area path: closed ways -> POLYGON + shoelace area
    "way_polygons" -> ((s, dir) => {
      prep(s, dir)
      GeometryBuild.buildWayPolygons(s.table("way_members"), s.table("node_geoms"))
        .select(col("way_id"), col("wkt"), col("area"),
          col("n_points").cast("long").as("n_points"))
    }),

    // F12 multipolygon assembly: outer-way rings -> MULTIPOLYGON + area sum
    "rel_polygons" -> ((s, dir) => {
      prep(s, dir)
      GeometryBuild.buildRelPolygons(s.table("rel_members"),
        s.table("way_members"), s.table("node_geoms"))
        .select(col("rel_id"), col("n_rings"), col("area"), col("wkt"))
    }),

    // F12 FULL multipolygon assembly: rings stitched from PARTIAL way
    // segments by GLOBAL endpoint matching (member-order-scrambled rings
    // included — fixture family 2), inner-role holes subtracted from area
    // and nested in the WKT by exact ray-cast point-in-ring (overlapping-
    // bbox two-outer fixture family 3), plus the stitch_clean degradation
    // flag (VERDICT.md r03 #2/#4; fixtures derived in DerivedTables)
    "rel_polygons_stitched" -> ((s, dir) => {
      prep(s, dir)
      GeometryBuild.buildRelPolygonsStitched(s.table("mp_rel_members"),
        s.table("mp_way_members"), s.table("mp_node_geoms"))
        .select(col("rel_id"), col("n_outer"), col("n_inner"),
          col("area"), col("wkt"), col("stitch_clean"))
    }),

    // P7: geometry-only MERGE through the osm2rdf option gate — a dump
    // "built without --add-centroid" must refresh wkt/length/envelope for
    // dirty ways while leaving centroid untouched
    // (reference: src/osm/Osm2ttl.cpp:114-121, OsmChangeHandler.cpp:446-450)
    "p7_geom_only_update" -> ((s, dir) => {
      prep(s, dir)
      import graft.ops.{DeltaApply, GeomOptions}
      val snapshot = GeometryBuild.buildWayGeoms(s.table("way_members"), s.table("node_geoms"))
        .select("way_id", "wkt", "length", "envelope", "centroid")
      val shifted = s.table("node_geoms").withColumn("lon", col("lon") + 0.01)
      val dirtyWays = s.table("way_members").filter(col("node_id") % 10 === 0)
        .select("way_id").distinct()
      val dirtyMembers = s.table("way_members").join(dirtyWays, Seq("way_id"), "left_semi")
      val updates = GeometryBuild.buildWayGeoms(dirtyMembers, shifted)
        .select("way_id", "wkt", "length", "envelope", "centroid")
      val opts = GeomOptions.fromOsm2rdfOptions(Map(GeomOptions.AddCentroid -> "false"))
      DeltaApply.applyGeometryOptioned(snapshot, updates, "way_id", opts)
        .select(col("way_id"), col("wkt"), col("length"), col("envelope"), col("centroid"))
    }),

    // relation assembly completeness flag (osm2rdf:hasCompleteGeometry)
    "rel_complete" -> ((s, dir) => {
      prep(s, dir)
      val wayGeoms = GeometryBuild.buildWayGeoms(s.table("way_members"),
        s.table("node_geoms"), withDerived = false)
      GeometryBuild.buildRelGeoms(s.table("rel_members"), s.table("node_geoms"), wayGeoms)
        .select(col("rel_id"), col("has_complete_geometry"),
          col("n_members").cast("long").as("n_members"))
    }),
  )

  /** DuckDB-side sequential-fold helpers for the way_derived oracle: the
   * parsed-from-%.7f coordinate lists, ordered by (pos, node_id). */
  private val wayPtsCte = """
    wpts AS (
      SELECT w.way_id,
             list(CAST(printf('%.7f', g.lon) AS DOUBLE) ORDER BY w.pos, w.node_id) AS xs,
             list(CAST(printf('%.7f', g.lat) AS DOUBLE) ORDER BY w.pos, w.node_id) AS ys
      FROM way_members w JOIN node_geoms g ON w.node_id = g.id
      GROUP BY w.way_id)"""

  /** wpts + the WKT point texts and node-id list (polygon/ring oracles). */
  private val wayRingCte = """
    wring AS (
      SELECT w.way_id,
             list(CAST(printf('%.7f', g.lon) AS DOUBLE) ORDER BY w.pos, w.node_id) AS xs,
             list(CAST(printf('%.7f', g.lat) AS DOUBLE) ORDER BY w.pos, w.node_id) AS ys,
             list(printf('%.7f %.7f', g.lon, g.lat) ORDER BY w.pos, w.node_id) AS ptxt,
             list(w.node_id ORDER BY w.pos, w.node_id) AS nids
      FROM way_members w JOIN node_geoms g ON w.node_id = g.id
      GROUP BY w.way_id)"""

  /** sequential-fold shoelace |area| over 1-based coordinate lists x/y. */
  private def shoelaceSql(x: String, y: String): String =
    s"""abs(list_reduce(list_prepend(0.0::DOUBLE,
      [$x[i] * $y[i+1] - $x[i+1] * $y[i] for i in range(1, len($x))]),
      (a, b) -> a + b)) / 2.0"""

  /** derived-geometry SQL over xs/ys lists (engine st_* parity: sequential
   * folds; envelope corner walk per reference way.ttl; centroid = vertex
   * mean). */
  private val lenFromXsYs = """list_reduce(list_prepend(0.0::DOUBLE,
      [sqrt((xs[i+1] - xs[i]) * (xs[i+1] - xs[i]) + (ys[i+1] - ys[i]) * (ys[i+1] - ys[i]))
       for i in range(1, len(xs))]), (a, b) -> a + b)"""
  private val envFromXsYs = """'POLYGON((' ||
          printf('%.7f %.7f', list_min(xs), list_min(ys)) || ',' ||
          printf('%.7f %.7f', list_min(xs), list_max(ys)) || ',' ||
          printf('%.7f %.7f', list_max(xs), list_max(ys)) || ',' ||
          printf('%.7f %.7f', list_max(xs), list_min(ys)) || ',' ||
          printf('%.7f %.7f', list_min(xs), list_min(ys)) || '))'"""
  private val cenFromXsYs = """'POINT(' || printf('%.7f %.7f',
          list_reduce(list_prepend(0.0::DOUBLE, xs), (a, b) -> a + b) / len(xs),
          list_reduce(list_prepend(0.0::DOUBLE, ys), (a, b) -> a + b) / len(ys)) || ')'"""

  /** DuckDB side of the GLOBAL-matching stitch — the SAME sequential
   * contract as GeometryBuild.buildRelPolygonsStitched, expressed as a
   * RECURSIVE CTE advancing one assembler step per level: each step either
   * consumes one segment (seed / lowest-indexed endpoint match with the
   * engine's orientation precedence) or closes the open chain, so recursion
   * depth is <= 2*|segs| and every level makes progress.
   *
   * Why a recursive CTE and not list_reduce (the r03 shape): the step needs
   * a "lowest matching index" search, and a comprehension NESTED inside the
   * list_reduce lambda mis-binds outer references in DuckDB 1.0 — observed
   * returning ANOTHER ROW's accumulator (cross-row ring contamination).
   * In the CTE every lambda is single-level over plain columns (the
   * long-proven wayPtsCte pattern). */
  private val stitchedOracle: String = {
    val pt = "STRUCT(n BIGINT, x DOUBLE, y DOUBLE)"
    def close(c: String) =
      s"CASE WHEN ($c)[1].n = ($c)[-1].n THEN ($c) ELSE list_append(($c), ($c)[1]) END"
    // lowest-indexed unconsumed segment sharing any endpoint with the chain
    // (computed once per step in projection u below — single-level lambda)
    val m = """(rem[i][1].n = chain[-1].n OR rem[i][-1].n = chain[-1].n
       OR rem[i][-1].n = chain[1].n OR rem[i][1].n = chain[1].n)"""
    val matches = s"[i for i in range(1, len(rem) + 1) if $m]"
    val seg = "rem[mt[1]]"
    // per-segment orientation precedence — identical to the engine's
    // extendChain: append / append-reversed / prepend / prepend-reversed
    val extend = s"""CASE
       WHEN ($seg)[1].n = chain[-1].n THEN list_concat(chain, ($seg)[2:])
       WHEN ($seg)[-1].n = chain[-1].n THEN list_concat(chain, list_reverse($seg)[2:])
       WHEN ($seg)[-1].n = chain[1].n THEN list_concat($seg, chain[2:])
       ELSE list_concat(list_reverse($seg), chain[2:]) END"""
    val assembleCte = s"""
      st AS (
        SELECT rel_id, role, segs AS rem, []::$pt[][] AS rings,
               []::$pt[] AS chain, 0 AS forced
        FROM rsegs
        UNION ALL
        SELECT rel_id, role, rem2 AS rem,
               CASE WHEN len(chain2) >= 4 AND (chain2)[1].n = (chain2)[-1].n
                    THEN list_append(rings2, chain2) ELSE rings2 END AS rings,
               CASE WHEN len(chain2) >= 4 AND (chain2)[1].n = (chain2)[-1].n
                    THEN []::$pt[] ELSE chain2 END AS chain,
               forced2 AS forced
        FROM (
          SELECT rel_id, role,
                 CASE WHEN len(chain) = 0 THEN rem[2:]
                      WHEN len(mt) = 0 THEN rem
                      ELSE list_concat(rem[1:mt[1]-1], rem[mt[1]+1:]) END AS rem2,
                 CASE WHEN len(chain) = 0 THEN rings
                      WHEN len(mt) = 0 THEN list_append(rings, ${close("chain")})
                      ELSE rings END AS rings2,
                 CASE WHEN len(chain) = 0 THEN rem[1]
                      WHEN len(mt) = 0 THEN []::$pt[]
                      ELSE $extend END AS chain2,
                 CASE WHEN len(chain) > 0 AND len(mt) = 0
                      THEN forced + (CASE WHEN chain[1].n = chain[-1].n THEN 0 ELSE 1 END)
                      ELSE forced END AS forced2
          FROM (
            SELECT st.*, $matches AS mt FROM st
            WHERE NOT (len(chain) = 0 AND len(rem) = 0)
          ) u
        ) t
      ),
      stitched AS (
        SELECT rel_id, role, rings, forced FROM st
        WHERE len(chain) = 0 AND len(rem) = 0)"""
    // Everything downstream of the fold is FLAT SQL over unnested (rel,
    // ring-index, ring) rows: DuckDB 1.0 mis-binds OUTER column references
    // inside doubly-nested list comprehensions (a `[... for j ...]` whose
    // condition is itself a comprehension reading `outers[j]` returned
    // ANOTHER ROW's outers — observed cross-row ring contamination), while
    // single-level lambdas over plain columns are the long-proven pattern
    // (wayPtsCte oracles). Per-ring shoelace/WKT are single-level; ring sums
    // rebuild the engine's sequential fold via list(a ORDER BY j).
    def shoelace(r: String) = s"""abs(list_reduce(list_prepend(0.0::DOUBLE,
        [($r)[i].x * ($r)[i+1].y - ($r)[i+1].x * ($r)[i].y for i in range(1, len($r))]),
        (a, b) -> a + b)) / 2.0"""
    def ringTxt(r: String) =
      s"array_to_string([printf('%.7f %.7f', p.x, p.y) for p in ($r)], ',')"
    // exact ray-cast point-in-ring, arithmetic + guard order identical to
    // the engine's insideRing (crossing parity over closed-ring edges);
    // px/py are scalar columns, o is a plain ring column — one lambda level
    def inside(o: String, px: String, py: String) =
      s"""(len([i for i in range(1, len($o)) if
         (($o)[i].y > $py) <> (($o)[i+1].y > $py)
         AND $px < (($o)[i+1].x - ($o)[i].x) * ($py - ($o)[i].y) / (($o)[i+1].y - ($o)[i].y) + ($o)[i].x
        ]) % 2 = 1)"""
    s"""${W("mp_rel_members", "mp_way_members", "mp_node_geoms")
        .replaceFirst("^WITH ", "WITH RECURSIVE ")},
      wseg AS (
        SELECT w.way_id,
               list(struct_pack(n := w.node_id, x := g.lon, y := g.lat) ORDER BY w.pos, w.node_id) AS seg
        FROM mp_way_members w JOIN mp_node_geoms g ON w.node_id = g.id
        GROUP BY w.way_id),
      rsegs AS (
        SELECT r.rel_id, r.role, list(s.seg ORDER BY r.pos, r.member_id) AS segs
        FROM mp_rel_members r JOIN wseg s ON r.member_id = s.way_id
        WHERE r.member_type = 'way' AND r.role IN ('outer', 'inner')
        GROUP BY r.rel_id, r.role),
      $assembleCte,
      frc AS (SELECT rel_id, CAST(sum(forced) AS INT) AS forced FROM stitched GROUP BY rel_id),
      oexp AS (
        SELECT rel_id, unnest(rings) AS oring,
               unnest(range(1, len(rings) + 1)) AS j
        FROM stitched WHERE role = 'outer'),
      iexp AS (
        SELECT rel_id, unnest(rings) AS iring,
               unnest(range(1, len(rings) + 1)) AS ii
        FROM stitched WHERE role = 'inner'),
      oring AS (SELECT rel_id, j, oring, ${shoelace("oring")} AS a,
                       ${ringTxt("oring")} AS txt
                FROM oexp),
      irng AS (SELECT rel_id, ii, ${shoelace("iring")} AS a,
                      ${ringTxt("iring")} AS txt,
                      iring[1].x AS px, iring[1].y AS py
               FROM iexp),
      asg AS (
        SELECT i.rel_id, i.ii, i.txt, i.a,
               coalesce(min(CASE WHEN ${inside("o.oring", "i.px", "i.py")}
                            THEN o.j END), 1) AS asg
        FROM irng i LEFT JOIN oring o ON i.rel_id = o.rel_id
        GROUP BY i.rel_id, i.ii, i.txt, i.a),
      polys AS (
        SELECT o.rel_id, o.j,
               '((' || o.txt || ')' ||
                 coalesce(string_agg(',(' || a.txt || ')', '' ORDER BY a.ii), '')
                 || ')' AS ptxt
        FROM oring o LEFT JOIN asg a ON a.rel_id = o.rel_id AND a.asg = o.j
        GROUP BY o.rel_id, o.j, o.txt),
      oagg AS (
        SELECT p.rel_id,
               CAST(count(*) AS BIGINT) AS n_outer,
               'MULTIPOLYGON(' || string_agg(p.ptxt, ',' ORDER BY p.j) || ')' AS wkt,
               list_reduce(list_prepend(0.0::DOUBLE, list(o.a ORDER BY p.j)),
                           (x, y) -> x + y) AS oa
        FROM polys p JOIN oring o ON o.rel_id = p.rel_id AND o.j = p.j
        GROUP BY p.rel_id),
      iagg AS (
        SELECT rel_id, CAST(count(*) AS BIGINT) AS n_inner,
               list_reduce(list_prepend(0.0::DOUBLE, list(a ORDER BY ii)),
                           (x, y) -> x + y) AS ia
        FROM irng GROUP BY rel_id)
      SELECT o.rel_id, o.n_outer, coalesce(i.n_inner, 0) AS n_inner,
             o.oa - coalesce(i.ia, 0.0) AS area, o.wkt,
             (f.forced = 0) AS stitch_clean
      FROM oagg o
      LEFT JOIN iagg i ON i.rel_id = o.rel_id
      JOIN frc f ON f.rel_id = o.rel_id"""
  }

  /** Hull-ring CTE chain (through `ring`): Geo.convexHull's Andrew monotone
   * chain re-implemented as a recursive CTE (the proven stitch-oracle
   * pattern: one push or pop per recursion level, every lambda
   * single-level) — shared prelude of the `way_hull` and `way_obb`
   * oracles. Points are the %.7f-parsed way coordinates, globally
   * deduplicated and sorted by (x, y) exactly like the engine's sortBy +
   * consecutive-dedup; cross products use the identical formula and <= 0
   * strictness, so collinear points drop identically and the final ring
   * (closed, CCW, starting at the lexicographic minimum) is
   * bit-identical. */
  private val hullRingCtes: String = {
    val pt = "STRUCT(x DOUBLE, y DOUBLE)"
    // cross(o = hull[-2], a = hull[-1], b = pts[nxt]) — Geo.convexHull's
    // (a.x-o.x)*(b.y-o.y) - (a.y-o.y)*(b.x-o.x)
    val cross = """(hull[-1].x - hull[-2].x) * (pts[nxt].y - hull[-2].y)
                 - (hull[-1].y - hull[-2].y) * (pts[nxt].x - hull[-2].x)"""
    val pop = s"(len(hull) >= 2 AND ($cross) <= 0.0)"
    s"""${W("way_members", "node_geoms").replaceFirst("^WITH ", "WITH RECURSIVE ")},
      wp AS (
        SELECT DISTINCT w.way_id,
               CAST(printf('%.7f', g.lon) AS DOUBLE) AS x,
               CAST(printf('%.7f', g.lat) AS DOUBLE) AS y
        FROM way_members w JOIN node_geoms g ON w.node_id = g.id),
      hpts AS (
        SELECT way_id, list(struct_pack(x := x, y := y) ORDER BY x, y) AS pts
        FROM wp GROUP BY way_id),
      hstep AS (
        SELECT way_id, side, pts, []::$pt[] AS hull, 1 AS nxt
        FROM (SELECT way_id, 'lo' AS side, pts FROM hpts
              UNION ALL
              SELECT way_id, 'hi', list_reverse(pts) FROM hpts) seeds
        UNION ALL
        SELECT way_id, side, pts,
               CASE WHEN $pop THEN hull[1:len(hull)-1]
                    ELSE list_append(hull, pts[nxt]) END,
               CASE WHEN $pop THEN nxt ELSE nxt + 1 END
        FROM hstep WHERE nxt <= len(pts)),
      hdone AS (SELECT way_id, side, hull FROM hstep WHERE nxt > len(pts)),
      ring AS (
        SELECT p.way_id,
               CASE WHEN len(p.pts) = 1 THEN [p.pts[1], p.pts[1]]
                    ELSE list_concat(lo.hull[1:len(lo.hull)-1], hi.hull) END AS ring
        FROM hpts p
        JOIN (SELECT way_id, hull FROM hdone WHERE side = 'lo') lo USING (way_id)
        JOIN (SELECT way_id, hull FROM hdone WHERE side = 'hi') hi USING (way_id))"""
  }

  private val hullOracle: String = s"""$hullRingCtes
      SELECT way_id,
             'POLYGON((' || array_to_string(
               [printf('%.7f %.7f', q.x, q.y) for q in ring], ',') || '))' AS convex_hull
      FROM ring"""

  /** DuckDB side of st_obb — Geo.obb's rotating-projection minimum-area
   * rectangle over the recursive-CTE hull ring. Per hull edge e (skipping
   * zero-length edges, exactly like the engine's `len > 0` guard): unit
   * direction (c, s) = (dx, dy)/sqrt(dx²+dy²), rotated extremes over the
   * ring vertices (the closing duplicate cannot move a min/max), area
   * (x1-x0)*(y1-y0); the winner is min area with FIRST-edge tie-break
   * (ORDER BY a, e = the engine's strict `a < bestArea` in ascending-e
   * iteration), corners un-rotated with the identical (c·rx - s·ry,
   * s·rx + c·ry) arithmetic. Degenerate single-point hulls (no nonzero
   * edge) fall back to the 5×-repeated point, matching Geo.obb's m <= 1
   * early return. */
  private val obbOracle: String = {
    def unrot(rx: String, ry: String) =
      s"printf('%.7f %.7f', c * $rx - s * $ry, s * $rx + c * $ry)"
    s"""$hullRingCtes,
      oedge AS (
        SELECT way_id, ring, unnest(generate_series(1, len(ring) - 1)) AS e
        FROM ring),
      odir AS (
        SELECT way_id, ring, e,
               (ring[e+1].x - ring[e].x) /
                 sqrt((ring[e+1].x - ring[e].x) * (ring[e+1].x - ring[e].x)
                    + (ring[e+1].y - ring[e].y) * (ring[e+1].y - ring[e].y)) AS c,
               (ring[e+1].y - ring[e].y) /
                 sqrt((ring[e+1].x - ring[e].x) * (ring[e+1].x - ring[e].x)
                    + (ring[e+1].y - ring[e].y) * (ring[e+1].y - ring[e].y)) AS s
        FROM oedge
        WHERE sqrt((ring[e+1].x - ring[e].x) * (ring[e+1].x - ring[e].x)
                 + (ring[e+1].y - ring[e].y) * (ring[e+1].y - ring[e].y)) > 0),
      oext AS (
        SELECT way_id, e, c, s,
               list_min([c * q.x + s * q.y for q in ring]) AS x0,
               list_max([c * q.x + s * q.y for q in ring]) AS x1,
               list_min([-s * q.x + c * q.y for q in ring]) AS y0,
               list_max([-s * q.x + c * q.y for q in ring]) AS y1
        FROM odir),
      obest AS (
        SELECT way_id, c, s, x0, y0, x1, y1,
               ROW_NUMBER() OVER (PARTITION BY way_id
                 ORDER BY (x1 - x0) * (y1 - y0) ASC, e ASC) AS rn
        FROM oext),
      obbw AS (
        SELECT way_id,
               'POLYGON((' || ${unrot("x0", "y0")} || ',' ||
                 ${unrot("x1", "y0")} || ',' || ${unrot("x1", "y1")} || ',' ||
                 ${unrot("x0", "y1")} || ',' || ${unrot("x0", "y0")} || '))' AS obb
        FROM obest WHERE rn = 1)
      SELECT r.way_id,
             coalesce(o.obb, 'POLYGON((' ||
               repeat(printf('%.7f %.7f', r.ring[1].x, r.ring[1].y) || ',', 4) ||
               printf('%.7f %.7f', r.ring[1].x, r.ring[1].y) || '))') AS obb
      FROM ring r LEFT JOIN obbw o USING (way_id)"""
  }

  def oracleSql: Map[String, String] = Map(
    "rel_polygons_stitched" -> stitchedOracle,
    "way_hull" -> hullOracle,
    "way_obb" -> obbOracle,

    "s1_osmchange_xml" -> {
      val rows = s1Recs.map(r =>
        s"('${r.objType}', CAST(${r.id} AS BIGINT), CAST(${r.version} AS BIGINT), '${r.action2}')")
        .mkString(",\n        ")
      s"""SELECT obj_type, id, version, action2 FROM (VALUES
        $rows) AS t(obj_type, id, version, action2)"""
    },

    "a2_member_concat" -> s"""${W("way_members")}
      SELECT way_id,
             string_agg(node_id, ';' ORDER BY pos, node_id) AS member_ids,
             string_agg(pos, ';' ORDER BY pos, node_id) AS member_pos
      FROM way_members GROUP BY way_id""",

    "a3_rel_member_concat" -> s"""${W("rel_members")}
      SELECT rel_id,
             string_agg(member_id, ';' ORDER BY pos, member_id) AS member_ids,
             string_agg(member_type, ';' ORDER BY pos, member_id) AS member_types,
             string_agg(role, ';' ORDER BY pos, member_id) AS member_roles
      FROM rel_members GROUP BY rel_id""",

    "f1_parse_id_uri" -> s"""${W("node_geoms")}
      SELECT '<https://www.openstreetmap.org/node/' || id || '>' AS uri,
             CAST(regexp_extract('<https://www.openstreetmap.org/node/' || id || '>', '([0-9]+)[">]*$$', 1) AS BIGINT) AS parsed_id,
             'node' AS parsed_type
      FROM node_geoms""",

    "f4_member_list_roundtrip" -> s"""${W("way_members")}
      SELECT way_id, node_id, pos FROM way_members""",

    "f6_xml_encode" -> {
      import graft.functions.XmlText
      val raw = """'a&b<' || source || '>"c''d' || chr(9)"""
      s"""
      SELECT doc_id,
             ${XmlText.sqlEncode(s"($raw)")} AS encoded,
             ${XmlText.sqlDecode(XmlText.sqlEncode(s"($raw)"))} AS decoded,
             ${XmlText.sqlIsEncoded(XmlText.sqlEncode(s"($raw)"))} AS enc_is_encoded,
             ${XmlText.sqlIsEncoded(s"($raw)")} AS raw_is_encoded
      FROM documents"""
    },

    "o2_global_sort" -> s"""${W("changes")}
      SELECT ROW_NUMBER() OVER (ORDER BY obj_type, id, version, eid) AS rn,
             obj_type, id, CAST(version AS BIGINT) AS version
      FROM changes""",

    "way_derived" -> s"""${W("way_members", "node_geoms")}, $wayPtsCte
      SELECT way_id,
        list_reduce(list_prepend(0.0::DOUBLE,
          [sqrt((xs[i+1] - xs[i]) * (xs[i+1] - xs[i]) + (ys[i+1] - ys[i]) * (ys[i+1] - ys[i]))
           for i in range(1, len(xs))]), (a, b) -> a + b) AS length,
        'POLYGON((' ||
          printf('%.7f %.7f', list_min(xs), list_min(ys)) || ',' ||
          printf('%.7f %.7f', list_min(xs), list_max(ys)) || ',' ||
          printf('%.7f %.7f', list_max(xs), list_max(ys)) || ',' ||
          printf('%.7f %.7f', list_max(xs), list_min(ys)) || ',' ||
          printf('%.7f %.7f', list_min(xs), list_min(ys)) || '))' AS envelope,
        'POINT(' || printf('%.7f %.7f',
          list_reduce(list_prepend(0.0::DOUBLE, xs), (a, b) -> a + b) / len(xs),
          list_reduce(list_prepend(0.0::DOUBLE, ys), (a, b) -> a + b) / len(ys)) || ')' AS centroid
      FROM wpts""",

    "p7_geom_only_update" -> s"""${W("way_members", "node_geoms")},
      base AS (
        SELECT w.way_id, w.pos, w.node_id, g.lon, g.lat
        FROM way_members w JOIN node_geoms g ON w.node_id = g.id),
      worig AS (
        SELECT way_id,
               'LINESTRING(' || string_agg(printf('%.7f %.7f', lon, lat), ',' ORDER BY pos, node_id) || ')' AS wkt,
               list(CAST(printf('%.7f', lon) AS DOUBLE) ORDER BY pos, node_id) AS xs,
               list(CAST(printf('%.7f', lat) AS DOUBLE) ORDER BY pos, node_id) AS ys
        FROM base GROUP BY way_id),
      dirtyw AS (SELECT DISTINCT way_id FROM way_members WHERE node_id % 10 = 0),
      wshift AS (
        SELECT way_id,
               'LINESTRING(' || string_agg(printf('%.7f %.7f', lon + 0.01, lat), ',' ORDER BY pos, node_id) || ')' AS wkt,
               list(CAST(printf('%.7f', lon + 0.01) AS DOUBLE) ORDER BY pos, node_id) AS xs,
               list(CAST(printf('%.7f', lat) AS DOUBLE) ORDER BY pos, node_id) AS ys
        FROM base WHERE way_id IN (SELECT way_id FROM dirtyw) GROUP BY way_id),
      od AS (SELECT way_id, wkt, $lenFromXsYs AS length, $envFromXsYs AS envelope,
                    $cenFromXsYs AS centroid FROM worig),
      sd AS (SELECT way_id, wkt, $lenFromXsYs AS length, $envFromXsYs AS envelope FROM wshift)
      SELECT o.way_id,
             coalesce(s.wkt, o.wkt) AS wkt,
             coalesce(s.length, o.length) AS length,
             coalesce(s.envelope, o.envelope) AS envelope,
             o.centroid AS centroid
      FROM od o LEFT JOIN sd s USING (way_id)""",

    "way_polygons" -> s"""${W("way_members", "node_geoms")}, $wayRingCte
      SELECT way_id,
             'POLYGON((' || array_to_string(ptxt, ',') || '))' AS wkt,
             ${shoelaceSql("xs", "ys")} AS area,
             CAST(len(ptxt) AS BIGINT) AS n_points
      FROM wring
      WHERE len(ptxt) >= 4 AND nids[1] = nids[-1]""",

    "rel_polygons" -> s"""${W("rel_members", "way_members", "node_geoms")}, $wayRingCte,
      closed AS (
        SELECT way_id,
               CASE WHEN nids[1] = nids[-1] THEN ptxt ELSE list_append(ptxt, ptxt[1]) END AS rtxt,
               CASE WHEN nids[1] = nids[-1] THEN xs ELSE list_append(xs, xs[1]) END AS cxs,
               CASE WHEN nids[1] = nids[-1] THEN ys ELSE list_append(ys, ys[1]) END AS cys
        FROM wring),
      ringa AS (
        SELECT way_id, array_to_string(rtxt, ',') AS ring_txt,
               ${shoelaceSql("cxs", "cys")} AS ring_area
        FROM closed),
      rel AS (
        SELECT r.rel_id,
               list(a.ring_area ORDER BY r.pos, r.member_id) AS areas,
               list('((' || a.ring_txt || '))' ORDER BY r.pos, r.member_id) AS rts
        FROM rel_members r JOIN ringa a ON r.member_id = a.way_id
        WHERE r.member_type = 'way' AND r.role = 'outer'
        GROUP BY r.rel_id)
      SELECT rel_id, CAST(len(rts) AS BIGINT) AS n_rings,
             list_reduce(list_prepend(0.0::DOUBLE, areas), (a, b) -> a + b) AS area,
             'MULTIPOLYGON(' || array_to_string(rts, ',') || ')' AS wkt
      FROM rel""",

    "rel_complete" -> s"""${W("rel_members", "way_members", "node_geoms")},
      resolvable_ways AS (
        SELECT DISTINCT w.way_id FROM way_members w
        JOIN node_geoms g ON w.node_id = g.id),
      resolved AS (
        SELECT r.rel_id,
               CASE WHEN r.member_type = 'node' AND g.id IS NOT NULL THEN 1
                    WHEN r.member_type = 'way' AND rw.way_id IS NOT NULL THEN 1
                    ELSE 0 END AS ok
        FROM rel_members r
        LEFT JOIN node_geoms g ON r.member_type = 'node' AND r.member_id = g.id
        LEFT JOIN resolvable_ways rw ON r.member_type = 'way' AND r.member_id = rw.way_id)
      SELECT rel_id,
             CAST(count(*) AS BIGINT) = CAST(sum(ok) AS BIGINT) AS has_complete_geometry,
             CAST(count(*) AS BIGINT) AS n_members
      FROM resolved GROUP BY rel_id""",
  )
}
