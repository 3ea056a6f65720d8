package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession builder for the graft engine.
  *
  * One place to set the configs every entrypoint (Verify, Bench, tests,
  * streaming) needs:
  *   - AQE on (runtime partition coalescing + skew-join splitting) so plans
  *     tuned at sf0.01 survive 100x scale-ups without re-tuning.
  *   - shuffle partitions sized to the local core count, not the 200 default
  *     (on a real cluster this would be ~2-3x total executor cores).
  *   - broadcast threshold raised to 64 MB: every dimension table in the
  *     star schema (region/nation/supplier/part/customer at test SF) should
  *     broadcast so fact-side joins stay map-only.
  *   - parquet filter pushdown + UTC session time zone (oracle parity).
  *   - `nanosAsLong`: kept for older driver-generated events.parquet
  *     snapshots that stored TIMESTAMP(NANOS) (unreadable natively in
  *     Spark 4; read as raw int64 nanos instead). Current snapshots use
  *     TIMESTAMP(MICROS) NTZ — both encodings are normalized in
  *     [[graft.sources.Ingest.events]].
  */
object GraftSession {

  def tune(b: SparkSession.Builder, shufflePartitions: Int = 32): SparkSession.Builder = b
    .withExtensions(new graft.functions.GraftExtensions)
    .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")

  /** Local session for tests / ad-hoc runs. */
  def local(cores: Int = 4): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cores]").appName("graft"), cores)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
