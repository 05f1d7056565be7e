package graft

import org.apache.spark.sql.SparkSession

import graft.gen.SyntheticScale

/** Dev tool: wall time of the exact kNN join at a given parallelism
 * (KNN_CPUS), mirroring Bench.scalingJob's input shape. Run with
 * GRAFT_KNN_DEBUG=1 to get SpatialJoins.knnJoin's internal phase prints. */
object KnnProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("KNN_CPUS", "8").toInt
    val nPoints = sys.env.getOrElse("KNN_POINTS", "10000000").toLong
    val nQueries = sys.env.getOrElse("KNN_QUERIES", "2000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[knnprof cpus=$cpus] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // warmup pass at 50k for codegen/JIT
    Bench.scalingJob(spark, 50000)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    val pts = SyntheticScale.points(spark, nPoints)
    val queries = SyntheticScale.queryPoints(spark, nQueries)
    t("full knnJoin")(graft.ops.SpatialJoins.knnJoin(queries, pts, 5).count())
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    t("full knnJoin #2")(graft.ops.SpatialJoins.knnJoin(queries, pts, 5).count())
    spark.stop()
  }
}
