package graft

import graft.operators.Audit

/** Data-audit battery: invariants the DuckDB hash compare already
  * enforces are not repeated here — these pin the SEMANTICS (profile
  * self-consistency, constraint-gate firing behavior, MAD robustness
  * properties) on sf0.001.
  */
class AuditSpec extends SparkSpec {

  test("q_profile: per-column rows agree on n_rows; key column is a dense unique key") {
    val rows = Audit.qProfile(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(rows.length === 6, "one profile row per profiled column")
    val nRows = rows.map(_._2).distinct
    assert(nRows.length === 1, s"all branches must count the same table: $nRows")
    rows.foreach { case (name, n, nNull, nDistinct, mn, mx) =>
      assert(nNull >= 0 && nDistinct <= n, s"$name: 0 ≤ nulls, distinct ≤ rows")
      assert(mn != null && mx != null, s"$name: min/max must stringify")
    }
    val Some(ok) = rows.find(_._1 == "o_orderkey")
    assert(ok._3 === 0L && ok._4 === ok._2,
      "o_orderkey: no nulls, distinct == rows (surrogate key contract)")
  }

  test("q_constraint_check: structural constraints clean, date-range gate fires") {
    val rows = Audit.qConstraintCheck(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1) === Seq("custkey_fk", "orderdate_in_range",
      "orderkey_not_null", "orderkey_unique", "status_domain", "totalprice_positive"))
    assert(rows.map(_._3).distinct.length === 1, "n_rows constant across constraints")
    val v = rows.map(r => r._1 -> r._2).toMap
    Seq("custkey_fk", "orderkey_not_null", "orderkey_unique",
      "status_domain", "totalprice_positive").foreach { c =>
      assert(v(c) === 0L, s"$c must be clean on generated data")
    }
    // Generated dates run 1995-2001; the 1992-1998 policy window must
    // actually FIRE — a gate that never fires proves nothing.
    assert(v("orderdate_in_range") > 0L, "date-range constraint must detect the 1999+ tail")
    assert(v("orderdate_in_range") < rows.head._3, "…but not flag every row")
  }

  test("q_mad_outlier: median/MAD within domain, outlier fence behaves") {
    val rows = Audit.qMadOutlier(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, med, mad, out) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(med >= 1.0 && med <= 50.0, "l_quantity domain is [1,50]")
      assert(mad >= 0.0 && mad <= 50.0)
      assert(out >= 0L && out <= n)
      // 3-MAD fence on a bounded near-uniform domain: an outlier count
      // over half the group would mean the fence collapsed.
      assert(out < n / 2, s"fence sanity: $out of $n flagged")
    }
  }
}
