package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
   * F12 multipolygon assembly with GLOBAL ring stitching and inner-ring
   * holes — the full shape of osm2rdf's area handling (reference: vendored
   * geometry invoked at src/osm/Osm2ttl.cpp:91-112; golden
   * tests/data/relation.ttl): real OSM multipolygons split each ring across
   * many PARTIAL ways (lakes with islands, boundaries split at admin
   * borders), in either direction AND in arbitrary member order.
   *
   * Stitching contract (one deterministic sequential fold, reproduced
   * bit-for-bit by the DuckDB oracle). Per (relation, role), way segments
   * are ordered by (pos, member_id); the assembler then matches by GLOBAL
   * endpoint adjacency, not member adjacency (VERDICT.md r03 #2 — the old
   * pos-order fold silently shattered rings whose segments are scrambled in
   * member order; osm2rdf matches globally):
   *  - an empty chain seeds from the FIRST unconsumed segment;
   *  - otherwise the LOWEST-indexed unconsumed segment sharing any endpoint
   *    with the chain extends it (per-segment orientation precedence:
   *    seg.first=chain.last append, seg.last=chain.last append-reversed,
   *    seg.last=chain.first prepend, seg.first=chain.first prepend-reversed);
   *  - when NO unconsumed segment touches the chain, the chain force-closes
   *    (repeating its first point unless already closed) — counted in the
   *    `stitch_clean` flag so downstream can quarantine degraded geometry;
   *  - a chain that reaches >= 4 points with first == last closes as a ring.
   *  Each fold step consumes one segment or closes one chain, so 2*|segs|
   *  steps always complete the assembly (chains <= segments consumed).
   *  - area = sum of outer-ring shoelace areas MINUS sum of inner-ring hole
   *    areas, computed over the raw coordinates in ring order;
   *  - WKT nests each hole inside the first outer ring (in assembly order)
   *    that CONTAINS the hole's first vertex by exact ray-cast
   *    point-in-ring (VERDICT.md r03 #4 — bbox containment mis-nested holes
   *    under overlapping-bbox outers), falling back to the first outer ring.
   *
   * Plan shape: two equi-joins + two per-relation aggregations; the
   * assembly itself is ONE native expression per (relation, role) row
   * (st_stitch_rings — hash endpoint index + deque chain, O(S log S +
   * points) per relation, StStitchRings scaladoc) and the remaining
   * geometry arithmetic (shoelace, ray-cast nesting, WKT) stays
   * higher-order expressions over relation-sized arrays — bounded
   * per-relation work, no extra shuffle. The r04 shape ran the same
   * contract as a 2S-step `aggregate` fold that filter-scanned the
   * unconsumed array per step — O(S²) element_at scans plus O(S·points)
   * chain copies, a task-staller at osm2rdf's 10k-segment coastline
   * relations (VERDICT.md r04 missing #3); the expression is the
   * same-contract constant-factor replacement (GeometryStitchSpec asserts
   * a 1k-segment scrambled ring stitches in bounded time, plus the
   * permutation/reversal property suite and the DuckDB oracle replay).
   */
  def buildRelPolygonsStitched(relMembers: DataFrame, wayMembers: DataFrame,
                               nodeGeoms: DataFrame): DataFrame = {
    val ptType = "array<struct<n:bigint,x:double,y:double>>"
    def emptyRings = array().cast(s"array<$ptType>")

    val segs = wayMembers
      .join(nodeGeoms.withColumnRenamed("id", "node_id"), Seq("node_id"))
      .groupBy(col("way_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("node_id"),
        col("lon"), col("lat")))).as("pts"))
      .select(col("way_id"),
        transform(col("pts"), p => struct(
          p.getField("node_id").cast("long").as("n"),
          p.getField("lon").as("x"), p.getField("lat").as("y"))).as("seg"))
    val rsegs = relMembers
      .filter(col("member_type") === "way" && col("role").isin("outer", "inner"))
      .join(segs, col("member_id") === col("way_id"))
      .groupBy(col("rel_id"), col("role"))
      .agg(sort_array(collect_list(struct(col("pos"), col("member_id"), col("seg")))).as("m"))
      .select(col("rel_id"), col("role"),
        transform(col("m"), _.getField("seg")).as("segs"))

    val folded = rsegs.select(col("rel_id"), col("role"),
        st_stitch_rings(col("segs")).as("st"))
      .select(col("rel_id"), col("role"),
        col("st").getField("rings").as("rings"),
        col("st").getField("forced").as("forced"))
    val byRole = folded.filter(col("role") === "outer")
      .select(col("rel_id"), col("rings").as("outers"), col("forced").as("forced_o"))
      .join(folded.filter(col("role") === "inner")
        .select(col("rel_id").as("irel"), col("rings").as("inners"),
          col("forced").as("forced_i")),
        col("rel_id") === col("irel"), "full_outer")
      .select(coalesce(col("rel_id"), col("irel")).as("rel_id"),
        coalesce(col("outers"), emptyRings).as("outers"),
        coalesce(col("inners"), emptyRings).as("inners"),
        (coalesce(col("forced_o"), lit(0)) +
          coalesce(col("forced_i"), lit(0))).as("forced"))

    def ringTxt(r: Column) = array_join(transform(r, p =>
      format_string("%.7f %.7f", p.getField("x"), p.getField("y"))), ",")
    // shoelace over RAW ring coordinates (both engines fold the identical
    // doubles sequentially; degenerate < 2-point rings are 0 on both).
    // Association matters for the last ulp: per-edge cross FIRST, then add —
    // a + (xi*yj - xj*yi) — matching the oracle's per-edge comprehension and
    // Geo.Polygon.area; the unparenthesized (a + xi*yj) - xj*yi diverged on
    // non-representable fixture coordinates
    def shoelace(r: Column) = when(size(r) < 2, lit(0.0)).otherwise(
      abs(aggregate(sequence(lit(1), size(r) - 1), lit(0.0), (a, i) =>
        a + (element_at(r, i).getField("x") * element_at(r, i + 1).getField("y")
          - element_at(r, i + 1).getField("x") * element_at(r, i).getField("y")))) / 2.0)
    // exact ray-cast point-in-ring over the closed ring `o` — crossing
    // parity with the IDENTICAL arithmetic (and guard order) as the DuckDB
    // oracle: (xj-xi)*(py-yi)/(yj-yi)+xi only evaluates when the edge
    // genuinely straddles py, so the divisor is never zero
    def insideRing(o: Column, px: Column, py: Column): Column =
      when(size(o) <= 1, lit(false)).otherwise(
        size(filter(sequence(lit(1), size(o) - 1), i => {
          val xi = element_at(o, i).getField("x")
          val yi = element_at(o, i).getField("y")
          val xj = element_at(o, i + 1).getField("x")
          val yj = element_at(o, i + 1).getField("y")
          ((yi > py) =!= (yj > py)) &&
            (px < (xj - xi) * (py - yi) / (yj - yi) + xi)
        })) % 2 === 1)
    // ascending 1..size(outers) that is EMPTY when outers is (sequence()
    // would descend on an empty upper bound)
    val jseq = filter(sequence(lit(1), greatest(size(col("outers")), lit(1))),
      j => j <= size(col("outers")))
    val im = transform(col("inners"), r => {
      val ix = element_at(r, 1).getField("x")
      val iy = element_at(r, 1).getField("y")
      val matches = filter(jseq,
        j => insideRing(element_at(col("outers"), j), ix, iy))
      struct(ringTxt(r).as("txt"),
        when(size(matches) === 0, lit(1))
          .otherwise(element_at(matches, 1)).as("asg"))
    })
    byRole
      .withColumn("im", im)
      // a relation with NO outer ring is not a buildable multipolygon
      // (broken data, or every outer failed to resolve): emit nothing
      // rather than a negative-area 'MULTIPOLYGON()' whose holes silently
      // vanish (review finding) — osm2rdf likewise emits no geometry for
      // unbuildable areas
      .filter(size(col("outers")) >= 1)
      .select(col("rel_id"),
        size(col("outers")).cast("long").as("n_outer"),
        size(col("inners")).cast("long").as("n_inner"),
        (aggregate(col("outers"), lit(0.0), (a, r) => a + shoelace(r))
          - aggregate(col("inners"), lit(0.0), (a, r) => a + shoelace(r))).as("area"),
        concat(lit("MULTIPOLYGON("), array_join(transform(jseq, j => {
          val o = element_at(col("outers"), j)
          val holes = filter(col("im"), m => m.getField("asg") === j)
          concat(lit("("), array_join(concat(
            array(concat(lit("("), ringTxt(o), lit(")"))),
            transform(holes, m => concat(lit("("), m.getField("txt"), lit(")")))),
            ","), lit(")"))
        }), ","), lit(")")).as("wkt"),
        // degraded-geometry quarantine flag (VERDICT.md r03 wrong #2): false
        // when ANY chain force-closed — the MULTIPOLYGON then looks green
        // but carries partial rings and a wrong area
        (col("forced") === 0).as("stitch_clean"))
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
