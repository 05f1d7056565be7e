package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler (dev tool): times individual pipeline stages. */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.text.{Dedup, TextFunctions}

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("docs.count")(docs.count())
    t("tokens")(docs.select(TextFunctions.tokens(col("text"))).count())
    t("shingles")(docs.select(TextFunctions.shingles(TextFunctions.tokens(col("text")))).count())
    t("sigs")(Dedup.minhashSignatures(docs).count())
    val sigs = t("sigs.cache")(Dedup.minhashSignatures(docs).localCheckpoint())
    t("bands+selfjoin") {
      import graft.text.TextParams._
      val bandRows = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(Bands - 1)), b =>
          array_join(slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)), ","))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
      bandRows.as("a").join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id")).count()
    }
    // verify stage isolated: checkpointed candidates -> shingle joins -> intersect
    import graft.text.TextParams._
    val bandRows2 = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)), b =>
        array_join(slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)), ","))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val cands = t("cands.checkpoint") {
      bandRows2.as("a").join(bandRows2.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct().localCheckpoint()
    }
    System.err.println(s"[prof] n_cands=${cands.count()}")
    val docSh = docs.select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), graft.text.TextFunctions.shingles(col("toks")).as("sh"))
      .withColumn("n", size(col("sh")))
    t("verify joins") {
      cands
        .join(docSh.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("n").as("na")), "doc_a")
        .join(docSh.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("n").as("nb")), "doc_b")
        .withColumn("i", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("jaccard", col("i") / (col("na") + col("nb") - col("i")))
        .filter(col("jaccard") >= JaccardThreshold).count()
    }
    t("full minhashLshPairs")(Dedup.minhashLshPairs(docs).count())
    spark.stop()
  }
}
