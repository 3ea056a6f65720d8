package graft

import graft.operators.Ann

/** ANN correctness: brute force is the exact baseline; the LSH variant
  * is graded on recall against it.
  */
class AnnSpec extends SparkSpec {

  private def topSets(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
    rows.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("brute force returns exactly k ranked neighbors per query") {
    val rows = Ann.qAnnBruteforce(spark, sf0001).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === 10, "sf0.001 has 10 query vectors (vec_id % 50 == 0)")
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 5, s"query $q must have 5 neighbors")
      assert(rs.map(_.getInt(2)).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      val cosines = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b },
        "cosine must be non-increasing in rank")
      assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("LSH ANN recall@5 vs brute force is useful (> 0.3) and reported") {
    val brute = topSets(Ann.qAnnBruteforce(spark, sf0001).collect())
    val lsh = topSets(Ann.qAnnLsh(spark, sf0001).collect())
    val recalls = brute.map { case (q, bs) =>
      lsh.getOrElse(q, Set.empty).intersect(bs).size.toDouble / bs.size
    }
    val recall = recalls.sum / recalls.size
    info(f"LSH recall@5 over ${brute.size} queries: $recall%.3f")
    assert(recall > 0.3, f"multi-probe 8-bit LSH should recall > 0.3, got $recall%.3f")
  }
}
