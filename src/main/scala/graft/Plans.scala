package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/**
 * Physical-plan dump: writes `explain("formatted")` for every headline (and
 * optionally every registered) query to a markdown file so plan regressions
 * — a lost broadcast, a new BroadcastNestedLoopJoin/cartesian, a pushdown
 * that stopped reaching the scan — are diffable across rounds instead of
 * inferred from timings (VERDICT r01 item 10).
 *
 * Usage: `sbt "runMain graft.Plans [outPath]"`, env:
 *   SPARK_GRAFT_SF_DIR   input dir (default sf0.001 — plans are data-size
 *                        independent modulo AQE, which replans at runtime)
 *   SPARK_GRAFT_PLANS    "headline" (default) | "all"
 */
object Plans {

  import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.inputPlan)
    case _ => p +: p.children.flatMap(nodes)
  }

  /** True when every leaf of the subtree is a literal VALUES table — a
   * cross join against one is bounded fixture/constant synthesis (e.g. the
   * multipolygon segment definitions crossed with `nation`), not a
   * data×data product. */
  private def literalOnly(p: SparkPlan): Boolean = {
    val ls = nodes(p).filter(n =>
      n.children.isEmpty && !n.isInstanceOf[AdaptiveSparkPlanExec])
    ls.nonEmpty && ls.forall(_.isInstanceOf[LocalTableScanExec])
  }

  /** Plan smells worth flagging inline in the dump: nested-loop / cartesian
   * products where BOTH sides are data-sized (a literal-VALUES side means
   * the product is bounded by the literal's row count). */
  private def smellsOf(plan: SparkPlan): Seq[String] = nodes(plan).collect {
    case j: BroadcastNestedLoopJoinExec
      if !Seq(j.left, j.right).exists(literalOnly) => "BroadcastNestedLoopJoin"
    case c: CartesianProductExec
      if !Seq(c.left, c.right).exists(literalOnly) => "CartesianProduct"
  }.distinct

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("PLANS.md")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val which = sys.env.getOrElse("SPARK_GRAFT_PLANS", "headline")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names =
      if (which == "all") SparkEntry.queries.keys.toSeq.sorted
      else Bench.headline ++ Bench.secondary.take(8)

    val sb = new StringBuilder
    sb.append(s"# Physical plans (`explain formatted`), input=$sfDir\n\n")
    sb.append("Regenerate: `sbt \"runMain graft.Plans PLANS.md\"`. Smells ")
    sb.append("flagged inline: BroadcastNestedLoopJoin, CartesianProduct — ")
    sb.append("except against literal VALUES tables (bounded fixture synthesis).\n")
    names.foreach { name =>
      val keepIds = spark.sparkContext.getPersistentRDDs.keySet
      val (plan, flagged) =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          (df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode),
            smellsOf(df.queryExecution.executedPlan))
        } catch { case e: Throwable => (s"ERROR: ${e.getMessage}", Seq.empty[String]) }
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keepIds(id) }.values.foreach(_.unpersist(false))
      val flag = if (flagged.isEmpty) "" else s"  ⚠ ${flagged.mkString(", ")}"
      sb.append(s"\n## $name$flag\n\n```\n$plan```\n")
      System.err.println(s"[plans] $name${if (flagged.nonEmpty) s" SMELL: $flagged" else ""}")
    }
    Files.writeString(Paths.get(outPath), sb.toString)
    System.err.println(s"[plans] wrote $outPath (${names.size} queries)")
    spark.stop()
  }
}
