package graft.plans

import org.apache.spark.sql.DataFrame

/** Materialize a shared intermediate ONCE so downstream consumers stop
  * re-deriving its subtree (Spark re-executes a shared DataFrame's plan
  * per consumer — the round-8 scan audit caught a 7x re-scan from
  * exactly this).
  *
  * Two modes, chosen per session by config:
  *
  *   - default: eager `localCheckpoint` — blocks live on executor
  *     local storage. Fastest, but blocks die with their executor, so
  *     on a preemptible / 1000-executor cluster a lost node forces a
  *     full job retry (lineage is truncated — there is nothing to
  *     recompute from).
  *   - `spark.graft.checkpoint.reliable=true`: eager reliable
  *     `checkpoint` to the checkpoint directory
  *     (`spark.graft.checkpoint.dir` if set, else the context's
  *     already-configured dir). Survives executor loss; costs a write
  *     to shared storage. This is the production setting the
  *     [[graft.operators.Analytics]] graph build documents.
  *
  * Both are EAGER: the materialization runs at call time, so callers
  * can rely on one-pass semantics regardless of mode.
  */
object Materialize {

  val ReliableKey = "spark.graft.checkpoint.reliable"
  val DirKey = "spark.graft.checkpoint.dir"

  def apply(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val reliable = s.conf.getOption(ReliableKey).exists(_.trim.equalsIgnoreCase("true"))
    if (reliable) {
      s.conf.getOption(DirKey).foreach(s.sparkContext.setCheckpointDir)
      require(s.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true needs a checkpoint dir: set $DirKey or SparkContext.setCheckpointDir")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }

  /** `df.materialized` postfix syntax for call sites. */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = Materialize(df)
  }
}
