package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over the testdata tables plus
  * (when SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Oracle parity rules (the driver sorts columns by name and hash-compares
  * values):
  *   - every computed column is aliased to the same name on both sides;
  *   - aggregates over doubles go through DECIMAL casts (order-independent
  *     exact sums) or explicit rounding, never raw float accumulation;
  *   - window ranks always carry a unique tiebreaker in the ORDER BY;
  *   - timestamps are formatted to strings before output.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object QueryDef {
  /** Parquet path for a testdata table under the given sf dir. */
  def tbl(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(tbl(dir, name))

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long and rebuild a (micro) timestamp.
    * Integer division — a double division would lose precision above
    * 2^53 ns. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
