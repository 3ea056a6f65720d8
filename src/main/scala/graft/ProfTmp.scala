package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness — NOT part of the engine; deleted before commit. */
object ProfTmp {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime
      body
      println(f"TIME $tag ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import graft.operators._
    import graft.plans.Materialize.MaterializeOps
    import graft.sources.Ingest
    // warmup
    t("warmup") { noop(Dedup.queries("q_entity_match")(spark, dir)) }
    for (p <- 1 to 2) {
      val c = Ingest.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
      var grp: org.apache.spark.sql.DataFrame = null
      var mem: org.apache.spark.sql.DataFrame = null
      t(s"p$p entityGroups (2 ckpts)") { val gm = Dedup.entityGroups(c); grp = gm._1; mem = gm._2 }
      var vg: org.apache.spark.sql.DataFrame = null
      t(s"p$p vg build+ckpt") { vg = Dedup.entityVerifiedGroupPairs(spark, grp).materialized }
      t(s"p$p rest of best_match") { noop(Dedup.queries("q_entity_best_match")(spark, dir)) }
      t(s"p$p q_entity_match full") { noop(Dedup.queries("q_entity_match")(spark, dir)) }
    }
    spark.stop()
  }
}
