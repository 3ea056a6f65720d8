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

  test("rankedId plan has no window / single-partition exchange") {
    val s = spark
    import s.implicits._
    val df = (1L to 1000L).toDF("k")
    val out = Surrogate.rankedId(df, Seq("k"), "sid")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"two-pass surrogate must not use a window:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"two-pass surrogate must not funnel through one partition:\n$plan")
  }
}
