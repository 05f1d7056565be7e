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

  private def W(names: String*): String = DerivedTables.withClause(names: _*)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1: OsmChange XML scan via the native Spark XML source. Synthesizes a
    // deterministic .osc batch (no external data), reads + flattens it, and
    // feeds the P1 classifier. No SQL oracle (DuckDB has no XML reader);
    // the driver records the rows-only check, OsmChangeXmlSpec asserts the
    // golden content.
    "s1_osmchange_xml" -> ((s, dir) => {
      prep(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("osc_cov")
      val osc = (0 until 20).map { i =>
        val env = Seq("create", "modify", "delete")(i % 3)
        val body =
          if (i % 4 == 3)
            s"""<way id="${200 + i}" version="${1 + i % 5}" timestamp="2024-02-0${1 + i % 9}T00:00:0${i % 10}Z"><nd ref="${i}"/><nd ref="${i + 1}"/></way>"""
          else
            s"""<node id="${100 + i}" version="${1 + i % 5}" timestamp="2024-02-0${1 + i % 9}T00:00:0${i % 10}Z" lon="${i}.5" lat="${i % 80}.25"><tag k="n" v="v$i"/></node>"""
        s"<$env>$body</$env>"
      }.mkString(
        """<?xml version="1.0"?><osmChange version="0.6">""", "", "</osmChange>")
      java.nio.file.Files.writeString(tmp.resolve("batch.osc"), osc)
      graft.ops.ChangeBatch.classify(
        graft.sources.OsmChangeXml.read(s, tmp.toString + "/*.osc")
          .withColumn("deleted", when(col("action") === "delete", 1).otherwise(0)))
        .select(col("obj_type"), col("id"), col("version"), col("action2"))
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

    // F6: XML entity encoding chain
    "f6_xml_encode" -> ((s, dir) => {
      prep(s, dir)
      val raw = concat(lit("a&b<"), col("source"), lit(">\"c'd"))
      val enc = Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
        "\"" -> "&quot;", "'" -> "&apos;")
        .foldLeft(raw) { case (c, (from, to)) => regexp_replace(c, java.util.regex.Pattern.quote(from), to) }
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), enc.as("encoded"))
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

  def oracleSql: Map[String, String] = Map(
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

    "f6_xml_encode" -> """
      SELECT doc_id,
             replace(replace(replace(replace(replace(
               'a&b<' || source || '>"c''d',
               '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'), '''', '&apos;') AS encoded
      FROM documents""",

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
          printf('%.7f %.7f', list_max(xs), list_min(ys)) || ',' ||
          printf('%.7f %.7f', list_max(xs), list_max(ys)) || ',' ||
          printf('%.7f %.7f', list_min(xs), list_max(ys)) || ',' ||
          printf('%.7f %.7f', list_min(xs), list_min(ys)) || '))' AS envelope,
        'POINT(' || printf('%.7f %.7f',
          list_reduce(list_prepend(0.0::DOUBLE, xs), (a, b) -> a + b) / len(xs),
          list_reduce(list_prepend(0.0::DOUBLE, ys), (a, b) -> a + b) / len(ys)) || ')' AS centroid
      FROM wpts""",

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
