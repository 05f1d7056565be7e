package graft.scratch

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.SpatialJoins
import graft.functions.GraftFunctions

/** Scratch profiler for geo_cluster phases (not a test; run via tools/run.sh). */
object ProfGeoCluster {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    graft.gen.DerivedTables.register(spark, dir)
    val eps = 0.3
    (1 to 2).foreach { round =>
      System.err.println(s"=== round $round ===")
      val input = spark.table("points").filter(expr("(pid div 10) % 10 >= 3"))
      val pts = t("pts ckpt")(input.select("pid", "lon", "lat").localCheckpoint())
      val q = pts.select(col("pid").as("qid"), col("lon").as("qlon"), col("lat").as("qlat"))
      val sym = t("sym ckpt")(
        SpatialJoins.distJoin(q, pts, eps, broadcastQueries = false)
          .filter(col("qid") =!= col("pid"))
          .select(col("qid").as("src"), col("pid").as("dst"))
          .localCheckpoint())
      val n = t("sym count")(sym.count())
      val coll = t("collect")(sym.select(col("src"), col("dst")).collect().map(r => (r.getLong(0), r.getLong(1))))
      val labels = t("union-find")({
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val nn = parent(c); parent(c) = r; c = nn }
          r
        }
        coll.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keys.toSeq.sorted.map(id => (id, find(id)))
      })
      import spark.implicits._
      val compDf = t("toDF")(labels.toDF("id", "comp").select(col("id").as("pid"), col("comp")))
      val out = t("final join + count")(
        pts.select("pid").distinct().join(compDf, Seq("pid"), "left_outer")
          .select(col("pid"), coalesce(col("comp"), col("pid")).as("cluster_id"))
          .count())
      System.err.println(s"[prof] sym=$n out=$out")
      val e2e = t("epsCluster e2e")(SpatialJoins.epsCluster(input, eps).count())
      System.err.println(s"[prof] e2e=$e2e")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
