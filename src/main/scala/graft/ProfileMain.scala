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

    val mode = sys.env.getOrElse("PROFILE_MODE", "text")
    if (mode == "geo") { profileGeo(spark, sfDir); spark.stop(); return }
    if (mode == "scale") { profileScale(spark); spark.stop(); return }
    if (mode == "ngram") {
      // times the REGISTERED pipeline's own stage builders (Dedup.ppjoin*),
      // not a copy that could drift from the query (review finding)
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      val threshold = graft.text.TextParams.JaccardThreshold
      val docSh = t("docShingles.checkpoint")(Dedup.docShingleHashes(docs0))
      val prefixes = Dedup.ppjoinPrefixes(docSh, threshold)
      t("prefixes.count")(prefixes.count())
      val prefCp = t("prefixes.checkpoint")(prefixes.localCheckpoint())
      val candidates = Dedup.ppjoinCandidates(prefCp, threshold)
      System.err.println(s"[prof] prefix rows=${prefCp.count()} " +
        s"candidates=${candidates.count()}")
      val candCp = t("candidates.checkpoint")(candidates.localCheckpoint())
      val out = Dedup.ppjoinVerify(candCp, docSh, threshold)
      t("verify.count")(out.count())
      t("verify.count2")(out.count())
      t("full.query")(Dedup.ngramJaccardPairs(docs0).count())
      t("full.query2")(Dedup.ngramJaccardPairs(docs0).count())
      spark.stop(); return
    }
    if (mode == "lsh_explain") {
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.text.Dedup.minhashLshPairs(docs0).explain("formatted")
      spark.stop(); return
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
    val lshDf = t("minhashLshPairs construct")(Dedup.minhashLshPairs(docs))
    t("minhashLshPairs count")(lshDf.count())
    t("full minhashLshPairs")(Dedup.minhashLshPairs(docs).count())
    spark.stop()
  }

  def profileScale(spark: SparkSession): Unit = {
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    import graft.gen.SyntheticScale
    import graft.ops.SpatialJoins
    graft.functions.GraftFunctions.register(spark)
    val n = sys.env.getOrElse("PROFILE_N", "50000").toLong
    val pts = SyntheticScale.points(spark, n).localCheckpoint()
    val polys = SyntheticScale.rectPolys(spark, 1000).localCheckpoint()
    val queries = SyntheticScale.queryPoints(spark, 20000).localCheckpoint()
    val keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def sweep(): Unit = spark.sparkContext.getPersistentRDDs.foreach {
      case (id, rdd) => if (!keepIds.contains(id)) rdd.unpersist(false)
    }
    t("pip")(SpatialJoins.pipJoin(pts, polys).count())
    // knn stages
    val levels = Seq(20, 18, 16, 14, 12, 10, 8, 6); val ringK = 2; val k = 5; val pf = 32
    val res = shiftrightunsigned(col("cell"), 56).cast("int")
    import org.apache.spark.sql.expressions.Window
    val ptsD = t("stack dedup")(pts
      .withColumn("__sr", row_number().over(
        Window.partitionBy(col("lon"), col("lat")).orderBy(col("pid"))))
      .filter(col("__sr") <= k).drop("__sr").localCheckpoint())
    System.err.println(s"[prof]   n_dedup=${ptsD.count()}")
    val fineCounts = ptsD.groupBy(
        graft.functions.GraftFunctions.cell_encode(col("lon"), col("lat"), lit(levels.max)).as("cell"))
      .agg(count(lit(1)).as("cnt"))
    val levelCounts = fineCounts
      .select(explode(array(levels.map(l =>
        graft.functions.GraftFunctions.cell_parent(col("cell"), lit(l))): _*)).as("cell"), col("cnt"))
      .groupBy("cell").agg(sum("cnt").as("cnt"))
    val rings = queries.select(col("qid"), explode(flatten(array(levels.map(l =>
      graft.functions.GraftFunctions.cell_kring(
        graft.functions.GraftFunctions.cell_encode(col("qlon"), col("qlat"), lit(l)), lit(ringK))): _*)))
      .as("cell"))
    val ringPop = rings.join(levelCounts, "cell")
      .groupBy(col("qid"), res.as("res")).agg(sum("cnt").as("pop"))
    val assigned = t("assigned")(ringPop.groupBy("qid")
      .agg(max(when(col("pop") >= pf.toLong * k, col("res"))).as("lvl"))
      .select(col("qid"), coalesce(col("lvl"), lit(levels.min)).as("lvl")).localCheckpoint())
    assigned.groupBy("lvl").count().collect().sortBy(_.getInt(0)).foreach(r =>
      System.err.println(s"[prof]   lvl=${r.getInt(0)} queries=${r.getLong(1)}"))
    // candidate join + window + proof + brute, step by step
    val probes = queries.join(assigned, Seq("qid"), "left_outer")
      .withColumn("lvl", coalesce(col("lvl"), lit(levels.min)))
      .withColumn("cell", explode(graft.functions.GraftFunctions.cell_kring(
        graft.functions.GraftFunctions.cell_encode(col("qlon"), col("qlat"), col("lvl")), lit(ringK))))
    val usedLevels = assigned.select("lvl").distinct().collect().map(_.getInt(0)).sorted
    val targetCells = ptsD.withColumn("cell", explode(array(
      usedLevels.map(l => graft.functions.GraftFunctions.cell_encode(col("lon"), col("lat"), lit(l))): _*)))
    val nCand = t("candidates")(probes.join(targetCells, "cell").count())
    System.err.println(s"[prof]   n_candidates=$nCand")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("pid"))
    val ranked = t("ranked.ckpt")(probes.join(targetCells, "cell")
      .withColumn("dist", graft.functions.GraftFunctions.planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k).localCheckpoint())
    val radius = usedLevels.foldLeft(lit(0.0)) { (acc, l) =>
      when(col("lvl") === l, (ringK - 1) *
        math.min(graft.geo.CellIndex.cellLonWidth(l), graft.geo.CellIndex.cellLatHeight(l))).otherwise(acc) }
    val proof = ranked.groupBy("qid")
      .agg(count(lit(1)).as("n"), max("dist").as("kth"), first("lvl").as("lvl"))
      .withColumn("complete", col("n") === k && col("kth") < radius)
    val nUnproven = t("proof")(queries.join(
      proof.filter(col("complete")).select("qid"), Seq("qid"), "left_anti").count())
    System.err.println(s"[prof]   unproven=$nUnproven")
    proof.groupBy("lvl", "complete").agg(count(lit(1)).as("q"),
        min("n").as("min_n"), avg("n").as("avg_n"), avg("kth").as("avg_kth"))
      .orderBy("lvl", "complete").collect()
      .foreach(r => System.err.println(s"[prof]   proof $r"))
    // queries with NO candidates at all (absent from proof)
    val noCand = queries.join(proof.select("qid"), Seq("qid"), "left_anti").count()
    System.err.println(s"[prof]   queries_with_zero_candidates=$noCand")
    sweep()
    val knn = t("knn full")(SpatialJoins.knnJoin(queries, pts, k = 5).count())
    System.err.println(s"[prof] knn rows=$knn")
    sweep()
    val knn2 = t("knn full #2")(SpatialJoins.knnJoin(queries, pts, k = 5).count())
    System.err.println(s"[prof] knn rows2=$knn2")
  }

  def profileGeo(spark: SparkSession, sfDir: String): Unit = {
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    /** Drop operator-internal localCheckpoints left by a finished query. */
    def sweep(keep: Set[Int]): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep.contains(id)) rdd.unpersist(blocking = false)
      }
    import graft.ops.SpatialJoins
    import graft.gen.DerivedTables
    DerivedTables.register(spark, sfDir)
    val points = spark.table("points").localCheckpoint()
    val queries = spark.table("query_points").localCheckpoint()
    val polys = spark.table("rects").selectExpr("poly_id",
      """concat('POLYGON((',
         cx - hw, ' ', cy - hh, ',', cx + hw, ' ', cy - hh, ',',
         cx + hw, ' ', cy + hh, ',', cx - hw, ' ', cy + hh, ',',
         cx - hw, ' ', cy - hh, '))') AS wkt""").localCheckpoint()
    System.err.println(s"[prof] n_points=${points.count()} n_queries=${queries.count()} n_polys=${polys.count()}")
    val keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet

    t("pip_join full")(SpatialJoins.pipJoin(points, polys).count())
    sweep(keepIds)
    // candidate count before refine
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    val covers = polys.withColumn("cell",
      explode(cell_cover_wkt(col("wkt"), lit(64), lit(12))))
    t("covers")(covers.count())
    val resolutions = covers.select(shiftrightunsigned(col("cell"), 56).cast("int").as("r"))
      .distinct().collect().map(_.getInt(0)).sorted
    System.err.println(s"[prof] cover resolutions=${resolutions.mkString(",")}")
    val probes = points.withColumn("cell",
      explode(array(resolutions.map(r => cell_encode(col("lon"), col("lat"), lit(r))): _*)))
    t("pip candidates")(probes.join(broadcast(covers), "cell").count())

    t("knn full default")(SpatialJoins.knnJoin(queries, points, k = 5).count())
    sweep(keepIds)
    t("knn full default #2")(SpatialJoins.knnJoin(queries, points, k = 5).count())
    sweep(keepIds)
    // stage-by-stage replica of the adaptive plan
    locally {
      val levels = Seq(20, 18, 16, 14, 12, 10, 8, 6); val ringK = 2; val k = 5; val pf = 32
      val res = shiftrightunsigned(col("cell"), 56).cast("int")
      val fineCounts = t("knn fineCounts")(points
        .groupBy(cell_encode(col("lon"), col("lat"), lit(levels.max)).as("cell"))
        .agg(count(lit(1)).as("cnt")).localCheckpoint())
      val levelCounts = fineCounts
        .select(explode(array(levels.map(l => cell_parent(col("cell"), lit(l))): _*)).as("cell"), col("cnt"))
        .groupBy("cell").agg(sum("cnt").as("cnt"))
      val rings = queries.select(col("qid"), explode(flatten(array(levels.map(l =>
        cell_kring(cell_encode(col("qlon"), col("qlat"), lit(l)), lit(ringK))): _*))).as("cell"))
      val ringPop = rings.join(levelCounts, "cell")
        .groupBy(col("qid"), res.as("res")).agg(sum("cnt").as("pop"))
      val assigned = t("knn assigned")(ringPop.groupBy("qid")
        .agg(max(when(col("pop") >= pf.toLong * k, col("res"))).as("lvl"))
        .select(col("qid"), coalesce(col("lvl"), lit(levels.min)).as("lvl")).localCheckpoint())
      assigned.groupBy("lvl").count().collect().sortBy(_.getInt(0)).foreach(r =>
        System.err.println(s"[prof]   lvl=${r.getInt(0)} queries=${r.getLong(1)}"))
      val probes = queries.join(assigned, Seq("qid"), "left_outer")
        .withColumn("lvl", coalesce(col("lvl"), lit(levels.min)))
        .withColumn("cell", explode(cell_kring(cell_encode(col("qlon"), col("qlat"), col("lvl")), lit(ringK))))
      val usedLevels = assigned.select("lvl").distinct().collect().map(_.getInt(0)).sorted
      val targetCells = points.withColumn("cell", explode(array(
        usedLevels.map(l => cell_encode(col("lon"), col("lat"), lit(l))): _*)))
      t("knn candidates count")(probes.join(targetCells, "cell").count())
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("pid"))
      val ranked = t("knn ranked.checkpoint")(probes.join(targetCells, "cell")
        .withColumn("dist", planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= k).localCheckpoint())
      val radius = usedLevels.foldLeft(lit(0.0)) { (acc, l) =>
        when(col("lvl") === l, (ringK - 1) *
          math.min(graft.geo.CellIndex.cellLonWidth(l), graft.geo.CellIndex.cellLatHeight(l))).otherwise(acc) }
      val proof = ranked.groupBy("qid")
        .agg(count(lit(1)).as("n"), max("dist").as("kth"), first("lvl").as("lvl"))
        .withColumn("complete", col("n") === k && col("kth") < radius)
      val nUnproven = t("knn proof")(proof.filter(!col("complete")).count())
      System.err.println(s"[prof]   unproven=$nUnproven")
    }
    sweep(keepIds)
    t("knn (16,7)")(SpatialJoins.knnJoin(queries, points, k = 5, Seq(16, 7)).count())
    sweep(keepIds)
    t("knn (16,7) #2")(SpatialJoins.knnJoin(queries, points, k = 5, Seq(16, 7)).count())
  }
}
