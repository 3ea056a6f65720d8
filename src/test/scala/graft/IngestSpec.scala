package graft

import java.nio.file.Files
import org.apache.spark.sql.types._

import graft.sources.Ingest

/** csvPipe must reproduce the reference staging COPY semantics:
  * pipe delimiter, header row, empty string → NULL, 12-hour AM/PM
  * timestamps (ref dags/ELT.py:92-98).
  */
class IngestSpec extends SparkSpec {

  test("csvPipe: pipe delim, header, empty-string NULL, 12h AM/PM timestamps") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("staging.csv")
    Files.writeString(f,
      """id|name|reported|resolved
        |1||2020/01/02 03:04:05 PM|true
        |2|Bob|2020/01/02 12:00:01 AM|
        |3|C||false
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("reported", TimestampType),
      StructField("resolved", BooleanType)))
    val got = Ingest.csvPipe(spark, f.toString, schema)
      .selectExpr("id", "name", "unix_millis(reported) AS rep_ms", "resolved")
      .orderBy("id").collect()

    assert(got.length === 3)
    assert(got(0).isNullAt(1), "empty string must read as NULL")
    assert(got(0).getLong(2) === 1577977445000L) // 2020-01-02T15:04:05Z
    assert(got(0).getBoolean(3) === true)
    assert(got(1).getString(1) === "Bob")
    assert(got(1).getLong(2) === 1577923201000L) // 2020-01-02T00:00:01Z (12 AM)
    assert(got(1).isNullAt(3))
    assert(got(2).isNullAt(2), "empty timestamp must read as NULL")
  }

  test("events: TIMESTAMP(NANOS) normalization to epoch millis") {
    val e = Ingest.events(spark, sf0001)
    val r = e.selectExpr("count(*) AS n",
      "sum(CASE WHEN unix_millis(ts) = ts_ms THEN 0 ELSE 1 END) AS bad").collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.getLong(1) === 0, "ts and ts_ms must agree at millis precision")
  }
}
