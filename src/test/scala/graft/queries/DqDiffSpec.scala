package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property locks on q52 (symmetric-delete fuzzy match), q53 (DQ
  * expectation ledger), q54 (snapshot diff). The DuckDB twins grade the
  * values; these pin what the twins can't:
  *   - q52's blocking has RECALL 1 at distance ≤ 1: every brute-force
  *     levenshtein-≤1 pair is found (the symmetric-delete guarantee,
  *     executed against an exhaustive Scala baseline).
  *   - q54's census equals an independent Scala rederivation of the
  *     synthetic snapshot's insert/update/delete counts.
  *   - q53's integrity checks pass on the driver-generated fixture —
  *     the fixture's own PK/FK contract, asserted through the ledger.
  */
class DqDiffSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("q52: every brute-force distance-1 pair is matched (blocking recall 1)") {
    val names = graft.tables.Tables.customer(spark, sf)
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def lev1(a: String, b: String): Boolean = {
      // same length throughout the fixture: distance 1 ⇔ exactly one
      // differing position (plus the general levenshtein check in-query)
      a.length == b.length && a.zip(b).count { case (x, y) => x != y } == 1
    }
    val brute = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && lev1(na, nb)
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty, "fixture must contain distance-1 name pairs")
    val out = Relational2.fuzzyBlockedMatch(spark, sf).collect()
    val nMatches = out.head.getLong(4)
    assert(nMatches == brute.size,
      s"blocking must find ALL ${brute.size} distance-1 pairs, found $nMatches")
    // the top-20 slice is the first 20 of the brute set in (a, b) order
    val top = out.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top == brute.toSeq.sorted.take(20))
    assert(out.forall(_.getInt(2) <= 1))
  }

  test("q52: recall 1 at distance ≤ 1 including insert/delete pairs (planted unequal lengths)") {
    import spark.implicits._
    // names of MIXED lengths: substitution pairs, insert/delete pairs
    // (abcde vs abde — only the distance-0 signature blocks these),
    // and far-apart names that must not match
    val names = Seq(
      1L -> "abcde", 2L -> "abcdf", 3L -> "abde", 4L -> "abcdef",
      5L -> "xbcde", 6L -> "zzzzz", 7L -> "ab", 8L -> "abc", 9L -> "qrs")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib)).toSet
    assert(brute.contains((1L, 3L)) && brute.contains((1L, 4L)),
      "fixture must contain insert/delete (unequal-length) pairs")
    val out = Relational2.fuzzyBlockedMatchOn(names.toDF("id", "nm")).collect()
    assert(out.head.getLong(4) == brute.size.toLong,
      s"blocking must find ALL ${brute.size} distance-≤1 pairs, found ${out.head.getLong(4)}")
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == brute)
  }

  test("q54: census equals the Scala rederivation of the synthetic snapshot") {
    val keys = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    // rederive: deletes = keys ≡0 (mod 101) that the ±insert doesn't
    // resurrect (key 0 inserts back as -0 = 0 with identical values →
    // classified unchanged, in both engines); inserts = -k for k ≡0
    // (mod 103) not colliding with a surviving key; updates = repriced
    // keys that were not deleted
    val deleted = keys.filter(k => k % 101 == 0 && !(k % 103 == 0 && -k == k))
    val inserted = keys.filter(k => k % 103 == 0 && -k != k).map(-_)
    val updated = keys.filter(k => k % 97 == 0 && k % 101 != 0)
    val census = Relational2.snapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census.getOrElse("delete", 0L) == deleted.size.toLong, census)
    assert(census.getOrElse("insert", 0L) == inserted.size.toLong, census)
    assert(census.getOrElse("update", 0L) == updated.size.toLong, census)
    assert(census.values.sum == (keys.size + inserted.size).toLong,
      "every (old ∪ new) key classifies exactly once")
  }

  test("q53: the ledger reports the fixture's true contract — and its true violations") {
    val ledger = Relational2.dqExpectations(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(3))).toMap
    assert(ledger.size == 6)
    // what the driver's generator DOES guarantee: FK closure, no nulls,
    // quantities in range, non-empty tables
    assert(ledger("02_fk_orphans") == ((0L, 1)), ledger)
    assert(ledger("03_null_returnflag") == ((0L, 1)), ledger)
    assert(ledger("04_qty_in_range") == ((0L, 1)), ledger)
    assert(ledger("06_min_rows")._2 == 1)
    // what it does NOT: (l_orderkey, l_linenumber) is not unique in the
    // synthetic lineitem, and ship dates may precede order dates — the
    // ledger's whole point is SURFACING these instead of assuming the
    // TPC-H invariants hold (a failing expectation is a report, not an
    // error). The exact counts are fixture facts; a change means the
    // driver regenerated data (or a check regressed).
    assert(ledger("01_pk_unique")._1 > 0 && ledger("01_pk_unique")._2 == 0, ledger)
    assert(ledger("05_ship_after_order")._1 > 0 && ledger("05_ship_after_order")._2 == 0, ledger)
  }
}
