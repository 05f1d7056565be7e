package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.SyntheticScale
import graft.ops.SpatialJoins

/**
 * Benchmark main. Two parts, one JSON line out:
 *
 *  1. sf-dir suite: every headline query timed once against
 *     `SPARK_GRAFT_SF_DIR` at `SPARK_GRAFT_CPUS` (default 32) — the driver's
 *     per-round feedback loop. `value` stays "total seconds" for
 *     comparability; per-query seconds, output rows and join-output rows/sec
 *     ride along.
 *
 *  2. scaling study (skip with SPARK_GRAFT_SCALING=0): the SAME synthetic
 *     job (PIP + kNN + tile suite over SyntheticScale input, default 2M
 *     points) at local[lo] and local[hi] — the sandbox evidence for the
 *     north rule's N -> 4N executor criterion. Reports throughput at both
 *     and efficiency = (T_hi/T_lo) / (hi/lo).
 */
object Bench {

  /** headline = the BASELINE.json metric suite; secondary = coverage. */
  val headline = Seq("pip_join", "knn_join", "tile_assign", "tile_join", "tile_histogram")
  val secondary = Seq("cell_index", "o1_dedup_latest", "j3_dirty_ways", "way_geoms",
    "merge_upsert", "dedup_minhash_lsh", "simhash_sig", "doc_fingerprint",
    "ann_lsh_topk", "ann_topk", "text_quality", "media_decode", "span_fingerprint")

  private def withSession[T](cpus: Int)(f: SparkSession => T): T = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // 32 saturated threads + big single-JVM heaps -> lenient liveness
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try f(spark) finally spark.stop()
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** The scaling job: identical plan + input at any parallelism. Returns
   * total join-output rows (the throughput numerator). */
  def scalingJob(spark: SparkSession, nPoints: Long): Long = {
    graft.functions.GraftFunctions.register(spark)
    val pts = SyntheticScale.points(spark, nPoints)
    val polys = SyntheticScale.rectPolys(spark, 1000)
    val queries = SyntheticScale.queryPoints(spark, 20000)
    val pip = SpatialJoins.pipJoin(pts, polys).count()
    val knn = SpatialJoins.knnJoin(queries, pts, k = 5).count()
    val hist = SpatialJoins.tileHistogram(pts, z = 6)
      .agg(sum("cnt")).collect()(0).getLong(0)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    pip + knn + hist
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0"
    val scalePoints = sys.env.getOrElse("SPARK_GRAFT_SCALE_POINTS", "2000000").toLong
    val (cpusLo, cpusHi) = (math.max(1, cpus / 4), cpus)

    // ---- part 1: sf-dir suite
    val names = (headline ++ secondary).filter(SparkEntry.queries.contains)
    val results = withSession(cpus) { spark =>
      // JIT/codegen warmup so the first timed query isn't charged for
      // cold compilation (same discipline as the scaling study)
      try scalingJob(spark, 50000)
      catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
      names.map { name =>
        val (rows, sec) =
          try time(SparkEntry.queries(name)(spark, sfDir).count())
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); (-1L, -1.0) }
        System.err.println(f"[bench] $name%-22s ${sec}%8.2f s  $rows%10d rows")
        // drop operator-internal localCheckpoints between queries
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        name -> (sec, rows)
      }
    }
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val headRows = results.filter(r => headline.contains(r._1)).map(_._2._2).filter(_ >= 0).sum
    val headSec = results.filter(r => headline.contains(r._1)).map(_._2._1).filter(_ >= 0).sum
    val headThroughput = if (headSec > 0) headRows / headSec else 0.0

    // ---- part 2: scaling study (same job, same input, lo vs hi parallelism)
    val scaling = if (!doScaling) "" else {
      // per-session warmup (codegen + JIT) so lo, which runs first, isn't
      // penalized for cold compilation relative to hi
      def measured(cpus: Int): (Long, Double) = withSession(cpus) { s =>
        scalingJob(s, 50000); time(scalingJob(s, scalePoints))
      }
      val (rowsLo, secLo) = measured(cpusLo)
      val (rowsHi, secHi) = measured(cpusHi)
      val thrLo = rowsLo / secLo
      val thrHi = rowsHi / secHi
      val eff = (thrHi / thrLo) / (cpusHi.toDouble / cpusLo)
      f""","scaling":{"points":$scalePoints,"cpus_lo":$cpusLo,"cpus_hi":$cpusHi,"sec_lo":$secLo%.3f,"sec_hi":$secHi%.3f,"rows_per_sec_lo":$thrLo%.1f,"rows_per_sec_hi":$thrHi%.1f,"efficiency":$eff%.3f}"""
    }

    val qs = results.map { case (k, (sec, _)) => s""""$k":$sec""" }.mkString("{", ",", "}")
    val rs = results.map { case (k, (_, rows)) => s""""$k":$rows""" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rs,""" +
        s""""join_output_rows_per_sec":$headThroughput,"cpus":$cpus,"sf":"$sfDir"$scaling}""")
  }
}
