package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime, but it cannot help when one key dominates a hash
  * aggregation or when the skewed side must stay on one reducer for
  * other reasons. Salting spreads ONE logical key over `salts` physical
  * partitions: the big side gets a deterministic salt, the small side
  * is replicated across every salt value.
  *
  * Cost model: replicates the right side `salts` times — use for
  * moderate right sides (or broadcast instead); pick `salts` ~ the
  * ratio of the hottest key's row count to the average partition size.
  */
object SkewJoin {

  /** Equi-join `left.join(right, keys)` with the left side salted.
    * The salt is derived from a hash of all left columns (deterministic
    * for a given row, uniform enough to split a hot key). */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner",
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salts)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Salted groupBy-count for a skewed key: two-phase aggregation
    * (partial per (key, salt), then final per key). Spark's own
    * map-side partial aggregation usually covers this; the explicit
    * form helps when the grouping expression is high-cardinality per
    * partition and partial agg stops paying off. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(salts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("n"))
}
