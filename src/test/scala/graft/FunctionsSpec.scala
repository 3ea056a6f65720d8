package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, RollingFingerprint}

/** The native codegen fingerprint must agree with the SQL-lambda
  * formulation (the oracle's semantics) and be callable from SQL via
  * the SparkSessionExtensions registration.
  */
class FunctionsSpec extends SparkSpec {

  private val lambda =
    s"aggregate(split(s, ''), 0L, (acc, ch) -> (acc * ${RollingFingerprint.P}L + ascii(ch)) % ${RollingFingerprint.M}L)"

  test("codegen expression == SQL-lambda fold (ASCII + CJK + empty)") {
    val s = spark
    import s.implicits._
    val df = Seq("hello world", "", "中文文本 mixed", "a" * 500, "!@# $%^")
      .toDF("s")
      .select(GraftFunctions.fingerprint(col("s")).as("native"), expr(lambda).as("oracle"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_fingerprint is registered as a SQL function") {
    val got = spark.sql("SELECT graft_fingerprint('abc') AS fp").collect()(0).getLong(0)
    assert(got === RollingFingerprint.hash("abc"))
    assert(got === ((((('a'.toInt * 1000003L + 'b') % RollingFingerprint.M) * 1000003L + 'c') % RollingFingerprint.M)))
  }

  test("null input → null output") {
    val s = spark
    import s.implicits._
    val r = Seq(Option.empty[String]).toDF("s")
      .select(GraftFunctions.fingerprint(col("s"))).collect()(0)
    assert(r.isNullAt(0))
  }
}
