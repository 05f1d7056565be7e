package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.ops.SpatialJoins

/**
 * The input_hint per-row invariant: span-sequence equality on
 * (kind, text, media_ref, order) must survive every transform — the Spark
 * re-statement of the reference's member-order invariant
 * (reference: src/osm/OsmObjectHelper.cpp:193-203, RelationMember.cpp:96-105).
 */
case class Span(kind: String, text: String, media_ref: String, offset: Int)
case class Doc(doc_id: String, spans: Seq[Span], lon: Double, lat: Double)

class SpanInvariantSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  val genSpan: Gen[(String, String, String)] = for {
    kind <- Gen.oneOf("meta", "tag", "wkt", "member", "media")
    text <- Gen.alphaNumStr.map(_.take(12))
    ref <- Gen.oneOf("", "tile/1", "tile/2/3")
  } yield (kind, text, ref)

  val genDoc: Gen[Doc] = for {
    id <- Gen.choose(1, 100000)
    n <- Gen.choose(1, 6)
    raw <- Gen.listOfN(n, genSpan)
    lon <- Gen.choose(-179.0, 179.0)
    lat <- Gen.choose(-84.0, 84.0)
  } yield Doc(s"doc/$id",
    raw.zipWithIndex.map { case ((k, t, r), i) => Span(k, t, r, i) }, lon, lat)

  /** order-sensitive span digest, computed engine-side */
  private def digest(df: DataFrame): Map[String, String] =
    df.select(col("doc_id"),
        md5(array_join(transform(col("spans"), sp =>
          concat_ws("|", sp.getField("kind"), sp.getField("text"),
            sp.getField("media_ref"), sp.getField("offset"))), ";")).as("d"))
      .as[(String, String)].collect().toMap

  test("spans survive repartition + range-shuffle + derived-column transforms + join") {
    GraftFunctions.register(spark)
    // property test over seeded ScalaCheck generations (offline cache has no
    // scalatest-scalacheck bridge, so the loop is explicit)
    Seq(42L, 1234L, 987654L).foreach { seed =>
      val docsList: List[Doc] = Gen.listOfN(24, genDoc)
        .pureApply(Gen.Parameters.default, Seed(seed))
        .distinctBy(_.doc_id)
      locally {
        val docs = docsList.toDF()
        val before = digest(docs)

        // a representative pipeline: derive tile/cell columns, range-shuffle
        // on the derived key, tile-join against an inventory, drop the key
        val withCell = docs
          .withColumn("tile_id", GraftFunctions.tile_id(col("lon"), col("lat"), lit(6)))
          .withColumn("cell", GraftFunctions.cell_encode(col("lon"), col("lat"), lit(10)))
          .repartitionByRange(4, col("cell"))
        val tiles = withCell.select("tile_id").distinct()
        val joined = SpatialJoins.tileAssign(
          withCell.drop("tile_id"), z = 6, partitions = 3)
          .join(broadcast(tiles), Seq("tile_id"), "left_semi")

        val after = digest(joined.select("doc_id", "spans"))
        assert(after === before)
      }
    }
  }

  test("groupBy-rebuild restores span order from explicit offset, not arrival order") {
    val doc = Doc("doc/1", Seq(Span("meta", "a", "", 0), Span("wkt", "b", "", 1),
      Span("tag", "c", "", 2)), 1.0, 2.0)
    val flat = Seq(doc).toDF()
      .select(col("doc_id"), posexplode(col("spans")))
      .select(col("doc_id"), col("col.kind"), col("col.text"),
        col("col.media_ref"), col("col.offset"))
      .repartition(5) // scramble physical order
    val rebuilt = flat.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("offset"), col("kind"),
        col("text"), col("media_ref")))).as("sp"))
      .select(col("doc_id"),
        transform(col("sp"), s => struct(s.getField("kind").as("kind"),
          s.getField("text").as("text"), s.getField("media_ref").as("media_ref"),
          s.getField("offset").as("offset"))).as("spans"))
    val got = digest(rebuilt)
    val want = digest(Seq(doc).toDF().select("doc_id", "spans"))
    assert(got === want)
  }
}
