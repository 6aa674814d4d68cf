package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic lock on v11's Lloyd step as an ITERATION, not a one-shot:
  * run three rounds on the fixture embeddings and assert (a) every
  * vector is assigned every round (member counts sum to |corpus|), and
  * (b) the spherical k-means objective — mean cosine of each vector to
  * its assigned centroid — never decreases round over round (Lloyd
  * monotonicity; the property that makes "repeat to convergence" safe
  * to run unsupervised at scale). */
class KmeansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  private val d = "/root/testdata/sf0.001"

  private def base: DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    spark.read.parquet(s"$d/embeddings.parquet")
      .withColumn("v", expr("transform(embedding, x -> cast(x AS double))"))
      .withColumn("nrm", sqrt(expr("dot_d(v, v)")))
      .select(col("vec_id"), col("v"), col("nrm"))
  }

  /** Rebuild a (cid, cv, cn) codebook from a round's (cell,pos,centroid)
    * output — collect_list order is nondeterministic, so sort by pos
    * inside the struct before extracting. */
  private def toCodebook(round: DataFrame): DataFrame =
    round.groupBy(col("cell").as("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, centroid))), s -> s.centroid)")
        .as("cv"))
      .withColumn("cn", sqrt(expr("dot_d(cv, cv)")))

  /** Mean cosine of each vector to its nearest centroid of `cents`. */
  private def objective(e: DataFrame, cents: DataFrame): Double =
    e.crossJoin(broadcast(cents))
      .withColumn("ccos", expr("dot_d(v, cv)") / (col("nrm") * col("cn")))
      .groupBy("vec_id").agg(max(col("ccos")).as("best"))
      .agg(avg(col("best"))).collect()(0).getDouble(0)

  test("three Lloyd rounds: full assignment each round, objective monotone") {
    val e = base.localCheckpoint()
    val n = e.count()
    var cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      .localCheckpoint()
    var prevObj = objective(e, cents)
    (1 to 3).foreach { r =>
      val round = VectorOps.lloydRound(e, cents).localCheckpoint()
      val assigned = round.groupBy("cell").agg(max(col("n_members")))
        .agg(sum(col("max(n_members)"))).collect()(0).getLong(0)
      assert(assigned == n, s"round $r: every vector must be assigned ($assigned != $n)")
      cents = toCodebook(round).localCheckpoint()
      val obj = objective(e, cents)
      // 1e-6 quantization + cosine rounding can wiggle the last digits
      assert(obj >= prevObj - 1e-4,
        s"round $r: objective decreased $prevObj -> $obj (Lloyd monotonicity broken)")
      prevObj = obj
    }
  }
}
