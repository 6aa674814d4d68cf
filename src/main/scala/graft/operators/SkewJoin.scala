package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * When one join key dominates (a hot customer, a null-heavy FK), the
  * hash partition owning it becomes the straggler. Salting spreads the
  * hot key across `numSalts` partitions: the fact side gets a
  * deterministic salt from its row identity, the dim side is exploded
  * `numSalts`× so every (key, salt) pair finds its match. Results are
  * exactly those of the plain join — verified by SkewJoinSpec.
  *
  * AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles
  * sort-merge cases at runtime; explicit salting remains the tool for
  * deterministic layouts, pre-AQE engines, and aggregate-after-join
  * pipelines where the salt can ride into the aggregation key.
  *
  * The salt is derived from stable fact columns (xxhash64), never
  * rand() — re-runs and retried tasks place rows identically, the same
  * discipline as the generator (SCALE.md).
  */
object SkewJoin {

  /** Inner-join `fact` with `dim` on `key`, salted `numSalts` ways.
    *
    * @param saltSource stable fact-side columns that identify the row
    *                   (used to derive the deterministic salt)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Seq[String], numSalts: Int = 8): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(saltSource.map(col): _*), lit(numSalts.toLong)).cast("int"))
    val exploded = dim.withColumn("_salt",
      explode(array((0 until numSalts).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew diagnosis: per-key row share of the top keys — the signal to
    * decide between salting and AQE alone. */
  def keySkew(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n").cast("double") / lit(total.toDouble))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }
}
