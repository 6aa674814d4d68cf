package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Property locks on e26's CUPED math (the oracle grades the fixture
  * values; these pin the statistics on planted cohorts):
  *   - post ≡ pre ⇒ θ = 1, ρ² = 1, and the adjustment collapses each
  *     variant's mean to the OVERALL mean (all between-user variance
  *     was predictable from the covariate).
  *   - a constant pre-period carries no information ⇒ the adjusted
  *     mean equals the raw mean (guarding the var(pre)=0 division is
  *     the caller's concern; here pre varies but is independent).
  */
class CupedSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session

  test("post ≡ pre: θ=1, ρ²=1, adjusted means collapse to the overall mean") {
    import spark.implicits._
    // variant 0 users happen to be heavier — raw means differ; the
    // covariate explains it all
    val per = Seq(
      (0L, 1000L, 1000L, 0L), (2L, 3000L, 3000L, 0L),
      (1L, 1500L, 1500L, 1L), (3L, 2500L, 2500L, 1L))
      .toDF("user_id", "pre", "post", "variant")
    val out = EventOps.cupedOn(per).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val overall = (1000 + 3000 + 1500 + 2500) / 4.0 / 100.0
    assert(out(0L)._3 == 1.0 && out(0L)._4 == 1.0, s"theta/rho2: ${out(0L)}")
    assert(math.abs(out(0L)._2 - overall) < 1e-9, s"v0 adj ${out(0L)._2} != $overall")
    assert(math.abs(out(1L)._2 - overall) < 1e-9, s"v1 adj ${out(1L)._2} != $overall")
    // raw means genuinely differed before adjustment
    assert(out(0L)._1 == 20.0 && out(1L)._1 == 20.0)
  }

  test("independent covariate: near-zero theta leaves variant means essentially raw") {
    import spark.implicits._
    // pre alternates independently of post: cov = 0 exactly by symmetry
    val per = Seq(
      (0L, 100L, 1000L, 0L), (2L, 200L, 2000L, 0L),
      (4L, 100L, 2000L, 0L), (6L, 200L, 1000L, 0L),
      (1L, 100L, 1400L, 1L), (3L, 200L, 1800L, 1L),
      (5L, 100L, 1800L, 1L), (7L, 200L, 1400L, 1L))
      .toDF("user_id", "pre", "post", "variant")
    val out = EventOps.cupedOn(per).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out(0L)._3 == 0.0, s"theta must be exactly 0 by symmetry: ${out(0L)}")
    assert(out(0L)._1 == out(0L)._2 && out(1L)._1 == out(1L)._2,
      "zero theta must leave raw means untouched")
  }
}
