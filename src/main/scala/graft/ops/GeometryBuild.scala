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
   * F12 multipolygon assembly with RING STITCHING and inner-ring holes —
   * the full shape of osm2rdf's area handling (reference: vendored geometry
   * invoked at src/osm/Osm2ttl.cpp:91-112; golden tests/data/relation.ttl):
   * real OSM multipolygons split each ring across many PARTIAL ways (lakes
   * with islands, boundaries split at admin borders), in either direction.
   *
   * Stitching contract (one deterministic sequential fold, reproduced
   * bit-for-bit by the DuckDB oracle):
   *  - per (relation, role), way segments are taken in (pos, member_id)
   *    order; each segment appends to the open chain when its FIRST node
   *    matches the chain's last node, appends REVERSED when its LAST node
   *    matches, and otherwise force-closes the chain (repeating its first
   *    point unless already closed) and starts a new one;
   *  - a chain that reaches >= 4 points with first == last closes as a ring;
   *    the fold's final open chain force-closes.
   *    (osm2rdf stitches by global endpoint matching; pos-order stitching
   *    with reversal covers the same rings whenever each ring's segments are
   *    contiguous in member order — the overwhelmingly common encoding — and
   *    degrades to force-closed partial rings, never an error, otherwise.)
   *  - area = sum of outer-ring shoelace areas MINUS sum of inner-ring hole
   *    areas, computed over the raw coordinates in ring order;
   *  - WKT nests each hole inside the first outer ring (in assembly order)
   *    whose bounding box contains the hole's first vertex (falling back to
   *    the first outer ring) — exact point-in-ring assignment is the noted
   *    refinement; bbox assignment is already exact for the common
   *    one-outer-ring relation.
   *
   * Plan shape: two equi-joins + two per-relation aggregations; the fold and
   * all geometry arithmetic are per-row higher-order expressions over
   * relation-sized arrays — bounded per-relation work, no extra shuffle.
   */
  def buildRelPolygonsStitched(relMembers: DataFrame, wayMembers: DataFrame,
                               nodeGeoms: DataFrame): DataFrame = {
    val ptType = "array<struct<n:bigint,x:double,y:double>>"
    def emptyChain = array().cast(ptType)
    def emptyRings = array().cast(s"array<$ptType>")
    def firstN(c: Column) = element_at(c, 1).getField("n")
    def lastN(c: Column) = element_at(c, -1).getField("n")
    def closeRing(c: Column) = when(firstN(c) === lastN(c), c)
      .otherwise(concat(c, slice(c, 1, 1)))
    def state(r: Column, c: Column) = struct(r.as("rings"), c.as("chain"))
    def tail(s: Column) = slice(s, lit(2), size(s) - 1)

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
      aggregate(col("segs"), state(emptyRings, emptyChain),
        (acc, seg) => {
          val chain = acc.getField("chain")
          val rings = acc.getField("rings")
          val joined = when(size(chain) === 0, state(rings, seg))
            .when(firstN(seg) === lastN(chain),
              state(rings, concat(chain, tail(seg))))
            .when(lastN(seg) === lastN(chain),
              state(rings, concat(chain, tail(reverse(seg)))))
            // HEAD-of-chain matches (prepend): without these, a ring whose
            // earlier segments are stored reversed shatters into
            // force-closed fragments (review finding) — e.g. chain [B,A]
            // then segment [C,B] extends at the head, not the tail
            .when(lastN(seg) === firstN(chain),
              state(rings, concat(seg, tail(chain))))
            .when(firstN(seg) === firstN(chain),
              state(rings, concat(reverse(seg), tail(chain))))
            .otherwise(state(concat(rings, array(closeRing(chain))), seg))
          val c2 = joined.getField("chain")
          when(size(c2) >= 4 && firstN(c2) === lastN(c2),
            state(concat(joined.getField("rings"), array(c2)), emptyChain))
            .otherwise(joined)
        },
        f => when(size(f.getField("chain")) === 0, f.getField("rings"))
          .otherwise(concat(f.getField("rings"),
            array(closeRing(f.getField("chain")))))).as("rings"))
    val byRole = folded.filter(col("role") === "outer")
      .select(col("rel_id"), col("rings").as("outers"))
      .join(folded.filter(col("role") === "inner")
        .select(col("rel_id").as("irel"), col("rings").as("inners")),
        col("rel_id") === col("irel"), "full_outer")
      .select(coalesce(col("rel_id"), col("irel")).as("rel_id"),
        coalesce(col("outers"), emptyRings).as("outers"),
        coalesce(col("inners"), emptyRings).as("inners"))

    def ringTxt(r: Column) = array_join(transform(r, p =>
      format_string("%.7f %.7f", p.getField("x"), p.getField("y"))), ",")
    // shoelace over RAW ring coordinates (both engines fold the identical
    // doubles sequentially; degenerate < 2-point rings are 0 on both)
    def shoelace(r: Column) = when(size(r) < 2, lit(0.0)).otherwise(
      abs(aggregate(sequence(lit(1), size(r) - 1), lit(0.0), (a, i) =>
        a + element_at(r, i).getField("x") * element_at(r, i + 1).getField("y")
          - element_at(r, i + 1).getField("x") * element_at(r, i).getField("y"))) / 2.0)
    // ascending 1..size(outers) that is EMPTY when outers is (sequence()
    // would descend on an empty upper bound)
    val jseq = filter(sequence(lit(1), greatest(size(col("outers")), lit(1))),
      j => j <= size(col("outers")))
    val im = transform(col("inners"), r => {
      val ix = element_at(r, 1).getField("x")
      val iy = element_at(r, 1).getField("y")
      val matches = filter(jseq, j => {
        val o = element_at(col("outers"), j)
        ix >= array_min(transform(o, _.getField("x"))) &&
          ix <= array_max(transform(o, _.getField("x"))) &&
          iy >= array_min(transform(o, _.getField("y"))) &&
          iy <= array_max(transform(o, _.getField("y")))
      })
      struct(ringTxt(r).as("txt"), coalesce(element_at(matches, 1), lit(1)).as("asg"))
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
        }), ","), lit(")")).as("wkt"))
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
