package graft

import org.apache.spark.sql.functions._

import graft.plans.Surrogate

/** The two-pass surrogate must equal the global rank AND carry no
  * single-partition window in its physical plan.
  */
class SurrogateSpec extends SparkSpec {

  test("rankedId equals global rank of the order column") {
    val s = spark
    import s.implicits._
    val shuffled = scala.util.Random.shuffle((1L to 5000L).toList)
    val df = shuffled.toDF("k").withColumn("payload", col("k") * 2)
    val got = Surrogate.rankedId(df, Seq("k"), "sid")
      .orderBy("k").select("k", "sid").as[(Long, Long)].collect()
    got.zipWithIndex.foreach { case ((k, sid), i) =>
      assert(k === i + 1L)
      assert(sid === i + 1L, s"rank mismatch at k=$k")
    }
  }

  /** The scale invariant, stated precisely: no window and no
    * single-partition exchange may touch the RAW DATA. The offset map
    * is allowed its tiny global window — it runs over the aggregated
    * per-partition counts (one row per shuffle partition, bounded by
    * config, not by data), so every such stage must have an Aggregate
    * strictly below it.
    */
  test("rankedId: windows/single-partition stages only ever see aggregated counts") {
    val s = spark
    import s.implicits._
    val df = (1L to 1000L).toDF("k")
    val out = Surrogate.rankedId(df, Seq("k"), "sid")
    val plan = out.queryExecution.sparkPlan
    val offenders: Seq[org.apache.spark.sql.execution.SparkPlan] = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 => e
    }
    assert(offenders.nonEmpty, "the offset map is expected to use a bounded global window")
    offenders.foreach { o =>
      assert(o.exists {
        case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
        case _ => false
      }, s"window/single-partition stage over raw data (no aggregate below it):\n$o")
    }
  }
}
