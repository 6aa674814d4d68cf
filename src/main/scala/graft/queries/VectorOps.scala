package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Similarity search over the `embeddings` fixture (`array<float>`, d=64).
  *
  * Numeric portability: every dot product / norm is an IN-ORDER
  * sequential fold over the array in DOUBLE (Spark `aggregate` over a
  * `zip_with`; DuckDB `list_dot_product` over `::DOUBLE[]`), so both
  * engines execute the identical sequence of IEEE adds. Cosines are
  * additionally rounded to 6 decimals before ranking, with the vector id
  * as tiebreaker, so orderings are deterministic.
  *
  * Scale design: brute-force top-k is the correctness baseline —
  * queries are a broadcast side (k rows) against a partitioned scan of
  * the corpus, a map-only plan followed by a per-query top-k
  * (TakeOrdered-style, no global sort). The LSH-bucketed variant
  * (random-hyperplane signs) is the 100 TB path: candidates meet only
  * inside a bucket, shuffling |corpus| × one small key instead of
  * |queries| × |corpus| pairs.
  */
object VectorOps {

  /** embeddings with double-cast vector and its sequential-fold norm. */
  private def vecs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .withColumn("v", expr("transform(embedding, x -> cast(x AS double))"))
      .withColumn("nrm", sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))

  private def dot(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")

  /** Brute-force cosine top-10 for query vectors vec_id < 10. */
  def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val base = vecs(s, d)
    val q = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    base.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("cos", round(dot("qv", "v") / (col("qn") * col("nrm")), 6))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rk") <= 10)
      .select(col("q_id"), col("rk"), col("vec_id").as("hit_id"), col("cos"))
      .orderBy("q_id", "rk")
  }

  /** All near-duplicate pairs with cosine ≥ 0.45 (fixture max ≈ 0.51). */
  def cosineNearDupPairs(s: SparkSession, d: String): DataFrame = {
    val a = vecs(s, d).select(col("vec_id").as("a_id"), col("v").as("av"), col("nrm").as("an"))
    val b = vecs(s, d).select(col("vec_id").as("b_id"), col("v").as("bv"), col("nrm").as("bn"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", round(dot("av", "bv") / (col("an") * col("bn")), 6))
      .filter(col("cos") >= 0.45)
      .select("a_id", "b_id", "cos")
      .orderBy("a_id", "b_id")
  }

  /** Per-label quantized centroids.
    * Floats are quantized to 1e-6 grid BIGINTs before summation so the
    * aggregation is exact integer math — deterministic under any
    * combine order (and under a 1000-way combine tree at 100 TB). */
  def labelCentroids(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("qx", floor(col("x").cast("double") * 1e6).cast("long"))
      .groupBy("label", "pos")
      .agg(sum(col("qx")).as("sq"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (col("sq").cast("double") / col("n") / 1e6).as("centroid"))
      .orderBy("label", "pos")

  /** Per-vector L2 norm (sequential fold), rounded. */
  def vectorNorms(s: SparkSession, d: String): DataFrame =
    vecs(s, d)
      .select(col("vec_id"), col("label"), round(col("nrm"), 6).as("l2_norm"))
      .orderBy("vec_id")

  // --- DuckDB oracle twins -------------------------------------------------

  private val CosDuck =
    "list_dot_product(%s, %s) / (sqrt(list_dot_product(%s, %s)) * sqrt(list_dot_product(%s, %s)))"

  val defs: Map[String, QueryDef] = Map(
    "v01_cosine_topk" -> QueryDef(cosineTopK _,
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT q.vec_id AS q_id, b.vec_id AS hit_id,
        |        round(list_dot_product(q.v, b.v) /
        |              (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
        |      FROM e q JOIN e b ON q.vec_id < 10 AND b.vec_id != q.vec_id),
        |r AS (SELECT q_id, hit_id, cos,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, hit_id ASC) AS rk
        |      FROM p)
        |SELECT q_id, rk, hit_id, cos FROM r WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin),

    "v02_cosine_near_dup_pairs" -> QueryDef(cosineNearDupPairs _,
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_dot_product(a.v, b.v) /
        |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) /
        |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.45
        |ORDER BY a_id, b_id""".stripMargin),

    "v03_label_centroids" -> QueryDef(labelCentroids _,
      """WITH x AS (SELECT label,
        |    CAST(unnest(generate_series(1, len(embedding))) AS INT) - 1 AS pos,
        |    embedding[CAST(unnest(generate_series(1, len(embedding))) AS INT)] AS x
        |  FROM embeddings)
        |SELECT label, pos,
        |  CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1e6 AS centroid
        |FROM x GROUP BY label, pos ORDER BY label, pos""".stripMargin),

    "v04_vector_norms" -> QueryDef(vectorNorms _,
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT vec_id, label, round(sqrt(list_dot_product(v, v)), 6) AS l2_norm
        |FROM e ORDER BY vec_id""".stripMargin)
  )
}
