package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Ingest

/** Data-audit operators (SURVEY.md §2 rows 70-72): column profiling,
  * order-invariant content checksums, and robust (median/MAD) outlier
  * detection — the validation battery that brackets every production
  * reload of the reference's pipeline (ref dags/ELT.py:39-106 drops and
  * rebuilds the staging table each run with no check that the reload
  * matches the source; these operators are that missing check, sized
  * for 100 TB).
  *
  * Determinism: checksums are integer XOR/exact-decimal sums of md5
  * prefixes (no FP anywhere); profiles stringify through DECIMAL/DATE
  * casts so both engines format identically; MAD works on
  * integer-valued quantities where every interpolated percentile is
  * binary-exact (SURVEY §4).
  */
object Audit {

  /** Per-column data-quality profile of `orders` (the Deequ-style
    * completeness/cardinality/range audit): row count, null count,
    * distinct count, min and max per column, one output row per column.
    *
    * Shape at scale: ONE aggregate over the scan. The six
    * COUNT(DISTINCT col)s plan as Catalyst's Expand (×6 row
    * multiplication) feeding a two-phase aggregate — the shuffle
    * carries one row per distinct (column, value), never raw rows, so
    * a 100 TB profile moves |Σ per-column domains|, not 6× the corpus.
    * The unpivot to per-column rows is a 1-row `stack` at the end.
    * Min/max stringify through DECIMAL(12,2)/DATE casts — both engines
    * print those types identically (raw DOUBLE/TIMESTAMP formatting
    * diverges cross-engine).
    */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    val ord = Ingest.table(s, dir, "orders")
    def mnmx(c: Column): Seq[Column] =
      Seq(min(c).cast("string"), max(c).cast("string"))
    val aggs: Seq[Column] =
      profiledCols.flatMap { case (name, canon) =>
        val c = canon(col(name))
        Seq(count(c).as(s"nn_$name"), countDistinct(c).as(s"nd_$name")) ++
          mnmx(c).zip(Seq(s"mn_$name", s"mx_$name")).map { case (e, a) => e.as(a) }
      }
    val stackArgs = profiledCols.map { case (name, _) =>
      s"'$name', nn_$name, nd_$name, mn_$name, mx_$name"
    }.mkString(", ")
    ord.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(col("n_rows"),
        expr(s"stack(${profiledCols.size}, $stackArgs) " +
          "AS (col_name, n_nonnull, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  // Canonicalizing cast per column: DECIMAL for money (identical
  // cross-engine string form), DATE for the timestamp-typed order date.
  private val profiledCols: Seq[(String, Column => Column)] = Seq(
    "o_orderkey"      -> identity[Column] _,
    "o_custkey"       -> identity[Column] _,
    "o_orderstatus"   -> identity[Column] _,
    "o_totalprice"    -> ((c: Column) => money(c)),
    "o_orderdate"     -> ((c: Column) => c.cast("date")),
    "o_orderpriority" -> identity[Column] _)

  val qProfileSql: String = {
    def row(name: String, canon: String => String): String = {
      val c = canon(name)
      s"""SELECT '$name' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_null, COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_val, CAST(MAX($c) AS VARCHAR) AS max_val
         |FROM orders""".stripMargin
    }
    val id = (s: String) => s
    Seq(
      row("o_orderkey", id), row("o_custkey", id), row("o_orderstatus", id),
      row("o_totalprice", c => s"CAST($c AS DECIMAL(12,2))"),
      row("o_orderdate", c => s"CAST($c AS DATE)"),
      row("o_orderpriority", id)
    ).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Order-invariant content checksum of `orders`, one row per order
    * year — the migration-validation primitive: run it on both sides of
    * a reload/engine-swap/compaction and compare (the check the
    * reference's drop-and-recopy reload never does). Each row canonical-
    * izes to a '|'-joined string (NULL sentinel kept distinct from the
    * text "NULL"), md5-hashes, and takes the first 15 hex digits as a
    * 60-bit integer; per group we emit COUNT, BIT_XOR (order- and
    * partitioning-invariant, can never overflow) and the exact
    * DECIMAL(38,0) SUM (catches the multiset changes XOR misses — a row
    * duplicated twice XORs to zero) rounded once to DOUBLE at the end
    * (both engines sum exactly — HUGEINT / DECIMAL — then perform the
    * identical single IEEE rounding).
    *
    * Shape at scale: map-only hash + ONE partial-aggregated shuffle
    * carrying (year, count, xor, sum) triples — a 100 TB checksum moves
    * a few bytes per partition per year.
    */
  def qChecksum(s: SparkSession, dir: String): DataFrame =
    Ingest.table(s, dir, "orders")
      .select(year(col("o_orderdate")).cast("int").as("y"), rowHash60.as("h"))
      .groupBy(col("y"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_hash"),
        sum(col("h").cast("decimal(38,0)")).cast("double").as("sum_hash"))

  /** 60-bit integer from the md5 of the canonical row string. */
  private def rowHash60: Column =
    conv(substring(md5(canonicalRow), 1, 15), 16, 10).cast("long")

  private def canonicalRow: Column = concat_ws("|",
    coalesce(col("o_orderkey").cast("string"), lit("\\N")),
    coalesce(col("o_custkey").cast("string"), lit("\\N")),
    coalesce(col("o_orderstatus"), lit("\\N")),
    coalesce(money(col("o_totalprice")).cast("string"), lit("\\N")),
    coalesce(col("o_orderdate").cast("date").cast("string"), lit("\\N")),
    coalesce(col("o_orderpriority"), lit("\\N")))

  val qChecksumSql: String =
    """WITH h AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS y,
      |    CAST('0x' || substr(md5(
      |      COALESCE(CAST(o_orderkey AS VARCHAR), '\N') || '|' ||
      |      COALESCE(CAST(o_custkey AS VARCHAR), '\N') || '|' ||
      |      COALESCE(o_orderstatus, '\N') || '|' ||
      |      COALESCE(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), '\N') || '|' ||
      |      COALESCE(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), '\N') || '|' ||
      |      COALESCE(o_orderpriority, '\N')), 1, 15) AS BIGINT) AS h
      |  FROM orders)
      |SELECT y, COUNT(*) AS n_rows, bit_xor(h) AS xor_hash,
      |  CAST(SUM(h) AS DOUBLE) AS sum_hash
      |FROM h GROUP BY y ORDER BY y""".stripMargin

  /** Robust outlier battery per return flag: exact interpolated median,
    * MAD (median absolute deviation), and the count of |x − med| >
    * 3·MAD outliers over `l_quantity` — the heavy-tail-safe screen
    * (mean/stddev fences break under the very outliers they hunt).
    *
    * Shape at scale: lineitem shuffles ONCE, into the (flag, quantity)
    * → count histogram; medians, deviations, MAD and the outlier count
    * are all computed on that bounded histogram (groups × ≤50 distinct
    * values), so the three "passes" a naive med→MAD→count chain rescans
    * are here window/join ops over a few hundred rows. Exactness: the
    * interpolated weighted median reproduces SQL quantile_cont
    * bit-for-bit because quantities are integer-valued — the only
    * non-integer arithmetic is a ·0.5 midpoint, exact in binary.
    */
  def qMadOutlier(s: SparkSession, dir: String): DataFrame = {
    val hist = Ingest.table(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"), col("l_quantity").as("v"))
      .agg(count(lit(1)).as("c"))
    val med = weightedMedian(hist).withColumnRenamed("med", "median_qty")
    val devHist = hist.join(broadcast(med), "flag")
      .groupBy(col("flag"), abs(col("v") - col("median_qty")).as("v"))
      .agg(sum("c").as("c"))
    val mad = weightedMedian(devHist).withColumnRenamed("med", "mad")
    val outliers = devHist.join(broadcast(mad), "flag")
      .groupBy(col("flag"))
      .agg(sum(when(col("v") > col("mad") * 3, col("c")).otherwise(lit(0L)))
        .as("n_outliers"))
    hist.groupBy("flag").agg(sum("c").as("n_rows"))
      .join(med, "flag").join(mad, "flag").join(outliers, "flag")
      .select(col("flag").as("l_returnflag"), col("n_rows"),
        col("median_qty"), col("mad"), col("n_outliers"))
  }

  /** Exact interpolated (SQL quantile_cont, type-7) median from a
    * (flag, v, c) value→count histogram. Position p = (n−1)/2 splits
    * into lower index l = (n−1) DIV 2 and fraction g ∈ {0, 0.5}; the
    * values at expanded indices l and l+1 are the minimal v whose
    * running count exceeds each index. All window/agg work happens on
    * the histogram, partitioned by flag.
    */
  private def weightedMedian(hist: DataFrame): DataFrame = {
    val w = Window.partitionBy("flag").orderBy("v")
    val cum = hist
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy("flag")))
      .withColumn("l", expr("(n - 1) DIV 2"))
      .withColumn("half", ((col("n") - 1) % 2 === 1))
    val vl = cum.filter(col("cum") >= col("l") + 1)
      .groupBy("flag").agg(min("v").as("vl"))
    val vh = cum.filter(col("cum") >= col("l") + 2)
      .groupBy("flag").agg(min("v").as("vh"))
    cum.select("flag", "half").distinct()
      .join(vl, "flag").join(vh, Seq("flag"), "left")
      .select(col("flag"),
        when(col("half"), (col("vl") + coalesce(col("vh"), col("vl"))) / 2d)
          .otherwise(col("vl").cast("double")).as("med"))
  }

  val qMadOutlierSql: String =
    """WITH med AS (
      |  SELECT l_returnflag AS flag, COUNT(*) AS n_rows,
      |         quantile_cont(l_quantity, 0.5) AS median_qty
      |  FROM lineitem GROUP BY l_returnflag),
      |dev AS (
      |  SELECT li.l_returnflag AS flag, abs(li.l_quantity - m.median_qty) AS d
      |  FROM lineitem li JOIN med m ON li.l_returnflag = m.flag),
      |mad AS (
      |  SELECT flag, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY flag)
      |SELECT m.flag AS l_returnflag, m.n_rows, m.median_qty, mad.mad,
      |  CAST(COALESCE(SUM(CASE WHEN dev.d > mad.mad * 3 THEN 1 END), 0) AS BIGINT) AS n_outliers
      |FROM med m JOIN mad ON m.flag = mad.flag
      |           JOIN dev ON dev.flag = m.flag
      |GROUP BY m.flag, m.n_rows, m.median_qty, mad.mad
      |ORDER BY l_returnflag""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile"     -> qProfile _,
    "q_checksum"    -> qChecksum _,
    "q_mad_outlier" -> qMadOutlier _)

  def oracle: Map[String, String] = Map(
    "q_profile"     -> qProfileSql,
    "q_checksum"    -> qChecksumSql,
    "q_mad_outlier" -> qMadOutlierSql)
}
