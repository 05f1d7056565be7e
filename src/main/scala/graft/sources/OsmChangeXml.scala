package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * OsmChange (.osc) XML source (S1 in SURVEY.md §2.1).
 *
 * The reference streams change files through osmium with three passes and
 * entity-bit pushdown (reference: src/osm/OsmChangeHandler.cpp:67-92,
 * 114-118); here three declarative reads of Spark's native XML source —
 * one per envelope kind — yield all entity kinds, and Catalyst's column
 * pruning plays the role of the entity-bit mask. The enclosing envelope
 * element (<create>/<modify>/<delete>) carries the action, matching the
 * reference's classifier semantics where a delete envelope sets the
 * deleted flag and version 1 distinguishes create from modify
 * (src/osm/OsmObjectHelper.cpp:281-286).
 *
 * rowTag is set at the ENVELOPE level, not the <osmChange> root: a root
 * rowTag would parse an entire minute-diff backlog file as ONE record (an
 * executor-memory ceiling with zero intra-file parallelism), whereas
 * envelope records bound row size to one envelope and let the XML input
 * format split large uncompressed files at envelope boundaries.
 *
 * Output schema (one row per changed object):
 *   (action, obj_type, id, version, ts, lon, lat,
 *    tags: map<string,string>,
 *    nd_refs: array<long>,                      -- ways: ordered member nodes
 *    members: array<struct<m_type, m_ref, m_role>>, -- relations, in order
 *    ordinal: bigint)  -- document position within this action stream
 *
 * `ordinal` is monotonically increasing in file/document order *within one
 * action kind* (XML rows arrive in file order per split; splits are ordered
 * by file+offset, so monotonically_increasing_id preserves that order). It
 * is the last-resort dedup tiebreaker for same-(id, version) edits in one
 * file — those necessarily share an action kind, so the per-action ordinal
 * reproduces the reference's sequential document-order resolution
 * (include/osm/OsmFileHelper.h:42-55). Cross-action interleaving of
 * envelopes is not reconstructed; the (version, deleted, ts) comparator
 * already resolves cross-action ties (deleted wins).
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

  /** One row = one <create>/<modify>/<delete> envelope. Explicit schema:
   * schema inference would need an extra pass over what is, at planet
   * scale, a large minute-diff backlog. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("node", nodeType), StructField("way", wayType),
    StructField("relation", relType)))

  /** Read .osc files into the flat change-record DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame =
    Seq("create", "modify", "delete").map { action =>
      val env = spark.read.format("xml")
        .option("rowTag", action)
        .schema(envelopeSchema)
        .load(path)
        // document position within this action stream (see scaladoc)
        .withColumn("ordinal", monotonically_increasing_id())
      flattenEnvelopes(env, action)
    }.reduce(_.unionByName(_))

  /** Flatten one action kind's envelope rows into flat change records. */
  def flattenEnvelopes(env: DataFrame, action: String): DataFrame = {
    val out = Seq("action", "obj_type", "id", "version", "ts",
      "lon", "lat", "tags", "nd_refs", "members", "ordinal")

    def tagsMap(c: Column) =
      map_from_entries(transform(coalesce(c, array()),
        t => struct(t.getField("_k"), t.getField("_v"))))

    val nodes = env
      .select(col("ordinal"), explode(coalesce(col("node"), array())).as("n"))
      .select(lit(action).as("action"), lit("node").as("obj_type"),
        col("n._id").as("id"), col("n._version").as("version"),
        to_timestamp(col("n._timestamp")).as("ts"),
        col("n._lon").as("lon"), col("n._lat").as("lat"),
        tagsMap(col("n.tag")).as("tags"),
        lit(null).cast("array<bigint>").as("nd_refs"),
        lit(null).cast(
          "array<struct<m_type:string,m_ref:bigint,m_role:string>>").as("members"),
        col("ordinal"))
    val ways = env
      .select(col("ordinal"), explode(coalesce(col("way"), array())).as("w"))
      .select(lit(action).as("action"), lit("way").as("obj_type"),
        col("w._id").as("id"), col("w._version").as("version"),
        to_timestamp(col("w._timestamp")).as("ts"),
        lit(null).cast("double").as("lon"), lit(null).cast("double").as("lat"),
        tagsMap(col("w.tag")).as("tags"),
        transform(coalesce(col("w.nd"), array()), n => n.getField("_ref")).as("nd_refs"),
        lit(null).cast(
          "array<struct<m_type:string,m_ref:bigint,m_role:string>>").as("members"),
        col("ordinal"))
    val rels = env
      .select(col("ordinal"), explode(coalesce(col("relation"), array())).as("r"))
      .select(lit(action).as("action"), lit("relation").as("obj_type"),
        col("r._id").as("id"), col("r._version").as("version"),
        to_timestamp(col("r._timestamp")).as("ts"),
        lit(null).cast("double").as("lon"), lit(null).cast("double").as("lat"),
        tagsMap(col("r.tag")).as("tags"),
        lit(null).cast("array<bigint>").as("nd_refs"),
        transform(coalesce(col("r.member"), array()), m => struct(
          m.getField("_type").as("m_type"), m.getField("_ref").as("m_ref"),
          m.getField("_role").as("m_role"))).as("members"),
        col("ordinal"))
    Seq(nodes, ways, rels).map(_.select(out.head, out.tail: _*))
      .reduce(_.unionByName(_))
  }
}
