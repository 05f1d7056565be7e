package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Two different sf dirs driven through the SparkEntry surface in ONE JVM
 * must not share a kNN index (VERDICT.md r02 #7: the old dir.hashCode key
 * could collide and silently reuse the wrong index; the cache now keys on
 * the sanitized full path). Isolation is proven observationally: the
 * indexed query at each dir equals the direct (index-free) kNN join over
 * that dir's own tables — which cannot hold for both dirs if either probe
 * read the other's index, because the dirs' point sets differ.
 */
class SparkEntryIndexIsolationSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("knn_join_indexed isolates per sf dir within one JVM") {
    val results = dirs.map { dir =>
      val indexed = SparkEntry.queries("knn_join_indexed")(spark, dir)
        .select("qid", "pid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val direct = SparkEntry.queries("knn_join")(spark, dir)
        .select("qid", "pid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(indexed === direct, s"indexed != direct at $dir")
      assert(indexed.nonEmpty, s"empty kNN result at $dir")
      indexed
    }
    // the two dirs genuinely disagree (different corpus sizes), so the
    // equality assertions above could not both pass on a shared index
    assert(results(0) !== results(1))
  }
}
