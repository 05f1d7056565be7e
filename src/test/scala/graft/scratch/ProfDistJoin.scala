package graft.scratch

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

object ProfDistJoin {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    graft.gen.DerivedTables.register(spark, dir)
    val eps = 0.3
    val uniform = spark.table("points").filter(expr("(pid div 10) % 10 >= 3")).localCheckpoint()
    System.err.println(s"[prof] uniform rows = ${uniform.count()}")
    def cellOf(c: org.apache.spark.sql.Column) = floor(c / lit(eps)).cast("long")
    val t0 = uniform.select("pid", "lon", "lat")
      .withColumn("__cx", cellOf(col("lon"))).withColumn("__cy", cellOf(col("lat")))
    val q0 = uniform.select(col("pid").as("qid"), col("lon").as("qlon"), col("lat").as("qlat"))
      .withColumn("__cx", explode(sequence(cellOf(col("qlon")) - 1, cellOf(col("qlon")) + 1)))
      .withColumn("__cy", explode(sequence(cellOf(col("qlat")) - 1, cellOf(col("qlat")) + 1)))
    System.err.println(s"[prof] exploded q rows = ${t("q explode count")(q0.count())}")
    val cand = q0.join(t0, Seq("__cx", "__cy"))
    System.err.println(s"[prof] candidates = ${t("candidate join count")(cand.count())}")
    val ref = cand.withColumn("dist", GraftFunctions.planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
      .filter(col("dist") < lit(eps))
    System.err.println(s"[prof] refined = ${t("refined count")(ref.count())}")
    ref.queryExecution.executedPlan.toString.split("\n").take(30).foreach(l => System.err.println("[plan] " + l))
    spark.stop()
  }
}
