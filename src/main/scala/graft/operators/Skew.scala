package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual salting pattern for the
  * cases AQE's runtime skew-join split can't reach (e.g. aggregations
  * over a power-law key, or static plans without AQE).
  *
  * At 100 TB a handful of keys (a bot user_id, an empty-string lang)
  * can hold >10% of all rows; one reducer then runs for hours while
  * the rest idle. Salting fans each hot key across `salts` reducers
  * and recombines.
  */
object Skew {

  /** Two-phase salted aggregation: count+sum grouped by `key`,
    * computed as (key, salt)-partial aggregates then re-aggregated.
    * The salt derives from a hash of the whole row (any spread value
    * works — it only has to distribute rows of one key).
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    df
      .withColumn("__salt", pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))

  /** Salted equi-join of a skewed fact against a dimension: the fact
    * side gets a per-row salt, the dim side is exploded ×`salts`, and
    * the join key becomes (key, salt) — hot keys spread over `salts`
    * tasks. Semantically identical to `fact.join(dim, key)` (inner).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
