package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField}

/** Scale-safe deterministic surrogate-key assignment.
  *
  * The reference's `id SERIAL` / `ROW_NUMBER() OVER (ORDER BY …)`
  * (ref dags/ELT.py:104, :195) is a *global* ordering — a naive Spark
  * `Window.orderBy` funnels the whole table through one partition,
  * which stalls/OOMs at 100 TB. This helper produces the identical
  * rank with a two-pass distributed plan:
  *
  *   1. range-repartition + in-partition sort on the order columns —
  *      partitions now hold disjoint, ordered key ranges;
  *   2. `zipWithIndex`: a count job over partition sizes (the "offset
  *      map"), then each partition numbers its rows from its offset.
  *      No single-partition exchange anywhere.
  *
  * Note the costs inherent to the two-pass design: the count job runs
  * EAGERLY when the DataFrame is constructed (ZippedWithIndexRDD
  * computes offsets in its constructor), and the sorted input is
  * recomputed for the second pass (persisting it would be wrong at
  * 100 TB). Two passes over the data is the price of a deterministic
  * dense rank without a global window.
  *
  * The assigned value equals the global rank of the order columns, so
  * it is independent of partition boundaries (determinism does not
  * depend on the range sampler) as long as the ordering key is unique.
  */
object Surrogate {

  /** Append `name` = 1-based global rank of `orderCols` (must form a
    * unique key for a deterministic assignment).
    */
  def rankedId(df: DataFrame, orderCols: Seq[String], name: String): DataFrame = {
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add(StructField(name, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }
}
