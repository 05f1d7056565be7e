package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * OsmChange (.osc) XML source (S1 in SURVEY.md §2.1).
 *
 * The reference streams change files through osmium with three passes and
 * entity-bit pushdown (reference: src/osm/OsmChangeHandler.cpp:67-92,
 * 114-118); here one declarative read of Spark's native XML source yields
 * all three entity kinds, and Catalyst's column pruning plays the role of
 * the entity-bit mask. The enclosing envelope element (<create>/<modify>/
 * <delete>) carries the action, matching the reference's classifier
 * semantics where a delete envelope sets the deleted flag and version 1
 * distinguishes create from modify (src/osm/OsmObjectHelper.cpp:281-286).
 *
 * Output schema (one row per changed object):
 *   (action, obj_type, id, version, ts, lon, lat,
 *    tags: map<string,string>,
 *    nd_refs: array<long>,                      -- ways: ordered member nodes
 *    members: array<struct<m_type, m_ref, m_role>>) -- relations, in order
 *
 * Member order is positional in the XML and preserved by the array columns
 * (the per-row span-sequence/member-order invariant, reference:
 * src/osm/OsmObjectHelper.cpp:193-203).
 */
object OsmChangeXml {

  private val tagType = ArrayType(StructType(Seq(
    StructField("_k", StringType), StructField("_v", StringType))))
  private val nodeType = ArrayType(StructType(Seq(
    StructField("_id", LongType), StructField("_version", IntegerType),
    StructField("_timestamp", StringType),
    StructField("_lon", DoubleType), StructField("_lat", DoubleType),
    StructField("tag", tagType))))
  private val wayType = ArrayType(StructType(Seq(
    StructField("_id", LongType), StructField("_version", IntegerType),
    StructField("_timestamp", StringType),
    StructField("nd", ArrayType(StructType(Seq(StructField("_ref", LongType))))),
    StructField("tag", tagType))))
  private val relType = ArrayType(StructType(Seq(
    StructField("_id", LongType), StructField("_version", IntegerType),
    StructField("_timestamp", StringType),
    StructField("member", ArrayType(StructType(Seq(
      StructField("_type", StringType), StructField("_ref", LongType),
      StructField("_role", StringType))))),
    StructField("tag", tagType))))
  private val envelopeType = ArrayType(StructType(Seq(
    StructField("node", nodeType), StructField("way", wayType),
    StructField("relation", relType))))

  /** Explicit schema: schema inference would need an extra pass over what
   * is, at planet scale, a large minute-diff backlog. */
  val schema: StructType = StructType(Seq(
    StructField("create", envelopeType),
    StructField("modify", envelopeType),
    StructField("delete", envelopeType)))

  /** Read .osc files into the flat change-record DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame =
    flatten(spark.read.format("xml")
      .option("rowTag", "osmChange")
      .schema(schema)
      .load(path))

  def flatten(raw: DataFrame): DataFrame = {
    val out = Seq("action", "obj_type", "id", "version", "ts",
      "lon", "lat", "tags", "nd_refs", "members")

    def tagsMap(c: org.apache.spark.sql.Column) =
      map_from_entries(transform(coalesce(c, array()),
        t => struct(t.getField("_k"), t.getField("_v"))))

    def entities(action: String): Seq[DataFrame] = {
      val env = raw.select(explode(coalesce(col(action), array())).as("e"))
      val nodes = env
        .select(explode(coalesce(col("e.node"), array())).as("n"))
        .select(lit(action).as("action"), lit("node").as("obj_type"),
          col("n._id").as("id"), col("n._version").as("version"),
          to_timestamp(col("n._timestamp")).as("ts"),
          col("n._lon").as("lon"), col("n._lat").as("lat"),
          tagsMap(col("n.tag")).as("tags"),
          lit(null).cast("array<bigint>").as("nd_refs"),
          lit(null).cast(
            "array<struct<m_type:string,m_ref:bigint,m_role:string>>").as("members"))
      val ways = env
        .select(explode(coalesce(col("e.way"), array())).as("w"))
        .select(lit(action).as("action"), lit("way").as("obj_type"),
          col("w._id").as("id"), col("w._version").as("version"),
          to_timestamp(col("w._timestamp")).as("ts"),
          lit(null).cast("double").as("lon"), lit(null).cast("double").as("lat"),
          tagsMap(col("w.tag")).as("tags"),
          transform(coalesce(col("w.nd"), array()), n => n.getField("_ref")).as("nd_refs"),
          lit(null).cast(
            "array<struct<m_type:string,m_ref:bigint,m_role:string>>").as("members"))
      val rels = env
        .select(explode(coalesce(col("e.relation"), array())).as("r"))
        .select(lit(action).as("action"), lit("relation").as("obj_type"),
          col("r._id").as("id"), col("r._version").as("version"),
          to_timestamp(col("r._timestamp")).as("ts"),
          lit(null).cast("double").as("lon"), lit(null).cast("double").as("lat"),
          tagsMap(col("r.tag")).as("tags"),
          lit(null).cast("array<bigint>").as("nd_refs"),
          transform(coalesce(col("r.member"), array()), m => struct(
            m.getField("_type").as("m_type"), m.getField("_ref").as("m_ref"),
            m.getField("_role").as("m_role"))).as("members"))
      Seq(nodes, ways, rels).map(_.select(out.head, out.tail: _*))
    }

    Seq("create", "modify", "delete").flatMap(entities).reduce(_.unionByName(_))
  }
}
