package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins: salt the skewed (fact) side into
  * `salts` sub-keys and replicate the build side across all salts, turning
  * one hot partition into `salts` balanced ones.
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting is
  * the tool when a single key dwarfs everything (the classic power-law user
  * in a 100 TB events table) or when the join is sort-merge with a
  * non-splittable downstream requirement. Results are identical to the
  * plain equi-join.
  */
object Skew {

  def saltedJoin(
      facts: DataFrame, build: DataFrame,
      factKey: String, buildKey: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Replicating the build side is only sound for join types that never
    // emit unmatched build rows — a right/full outer would duplicate them
    // `salts` times.
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")
      .contains(joinType.toLowerCase.replaceAll("_", "")),
      s"saltedJoin does not support join type '$joinType' (build side is replicated)")
    // Deterministic spread: hash the whole fact row's key + a uniform
    // spreader; any stable per-row value works since the salt only balances.
    val salted = facts.withColumn("_salt",
      pmod(hash(col(factKey), spark_partition_id(), monotonically_increasing_id()), lit(salts)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // Qualify keys through the DataFrame references: with col(...) the join
    // condition is ambiguous whenever factKey and buildKey share a name —
    // the most common real usage.
    salted
      .join(replicated,
        salted("_salt") === replicated("_salt") &&
          salted(factKey) === replicated(buildKey),
        joinType)
      .drop(salted("_salt"))
      .drop(replicated("_salt"))
  }
}
