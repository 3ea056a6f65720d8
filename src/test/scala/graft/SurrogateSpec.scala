package graft

import org.apache.spark.sql.functions._

import graft.plans.Surrogate

/** The surrogate must equal the global rank, and its plan must keep
  * the raw data away from windows / single-partition stages.
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

  test("rankedId equals global rank for a multi-column string key (dim pattern)") {
    val s = spark
    import s.implicits._
    val rows = for (a <- 'a' to 'j'; b <- 1 to 40) yield (s"k$a", f"v$b%03d")
    val df = scala.util.Random.shuffle(rows.toList).toDF("c1", "c2")
    val got = Surrogate.rankedId(df, Seq("c1", "c2"), "sid")
      .orderBy("c1", "c2").select("c1", "c2", "sid").as[(String, String, Long)].collect()
    val expected = rows.sorted
    got.zipWithIndex.foreach { case ((c1, c2, sid), i) =>
      assert((c1, c2) === expected(i))
      assert(sid === i + 1L, s"rank mismatch at ($c1,$c2)")
    }
  }

  /** The scale invariant: the global numbering must introduce NO
    * window and NO single-partition exchange over the data — the only
    * exchange is the range repartition, which lives in the eager
    * zipWithIndex pre-pass (one shuffle stage serving both the count
    * and numbering jobs — see the Surrogate scaladoc for why the
    * two-branch DataFrame formulation was rejected as unsound).
    */
  test("rankedId plan: no window, no single-partition exchange anywhere") {
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
    assert(offenders.isEmpty, s"unexpected window/single-partition stage:\n${offenders.mkString("\n")}")
  }
}
