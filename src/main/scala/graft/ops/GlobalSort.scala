package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-aware global ranking (O2: the reference's id_version merge-sort,
 * reference: src/osm/OsmChangeHandler.cpp:372-385, OsmFileHelper.h:56-98).
 *
 * A naive `row_number().over(Window.orderBy(...))` collapses the whole
 * dataset into ONE task — fine for a fixture, fatal at 10^12 rows. This
 * operator ranks with a range-partitioned shuffle instead:
 *
 *   1. deterministic range bucketing: sample the composite sort key with a
 *      hash-mod filter (stable across jobs, unlike `repartitionByRange`'s
 *      reservoir sampling), pick P-1 boundary keys, and assign each row a
 *      bucket id as a PURE FUNCTION of its key (`sum(key >= boundary_i)`),
 *   2. per-bucket local row_number (parallel; the window shuffle hashes on
 *      the bucket id),
 *   3. + per-bucket offsets from a tiny count aggregation (P rows to the
 *      driver, P = #buckets, not #rows).
 *
 * Because the bucket id is a function of the row — not of which task
 * happened to process it — the count job and the rank job always agree,
 * and reruns are bit-identical. `repartitionByRange` + `spark_partition_id`
 * does NOT have this property: each action re-samples boundaries, so the
 * offsets from the first job can be wrong for the second (observed as
 * duplicate/holed ranks at sf0.01).
 *
 * The sort key must be a total order (include a unique tiebreaker column),
 * otherwise ranks of tied keys are nondeterministic.
 */
object GlobalSort {

  def withGlobalRank(df: DataFrame, partitions: Int, sortCols: Column*): DataFrame = {
    val key = struct(sortCols: _*)
    val n = df.count()
    if (n == 0) return df.withColumn("rn", lit(0L))

    // Deterministic sample of ~200 keys per target bucket: keep rows whose
    // key-hash falls in a fixed residue class. xxhash64 is seed-fixed, so
    // the same input always yields the same sample (unlike df.sample).
    val rate = math.max(1L, n / math.max(1L, partitions * 200L))
    val sampleSorted = df
      .select(key.as("__k"))
      .filter(pmod(xxhash64(col("__k")), lit(rate)) === 0)
      .orderBy(col("__k"))
      .collect()

    // P-1 boundary keys, evenly spaced through the sorted sample.
    val boundaries: Seq[Row] =
      if (sampleSorted.length < partitions) Seq.empty
      else (1 until partitions).map(i => sampleSorted((i.toLong * sampleSorted.length / partitions).toInt).getStruct(0))

    def rowToStructLit(r: Row): Column =
      struct(r.toSeq.map(v => lit(v)): _*)

    // bucket = number of boundaries <= key  (codegen'd comparison chain)
    val bucketExpr = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(key >= rowToStructLit(b), 1).otherwise(0)
    }
    val bucketed = df.withColumn("__bucket", bucketExpr)

    // per-bucket sizes -> cumulative offsets (P-row driver-side fold);
    // deterministic because __bucket is a pure function of the row.
    val counts = bucketed.groupBy("__bucket").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).init)
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (acc, (b, off)) =>
      when(col("__bucket") === b, off).otherwise(acc)
    }
    val local = Window.partitionBy(col("__bucket")).orderBy(sortCols: _*)
    bucketed
      .withColumn("rn", row_number().over(local).cast("long") + offsetExpr)
      .drop("__bucket")
  }
}
