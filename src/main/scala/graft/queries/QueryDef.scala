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

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others, so
    * adapt to what the file actually contains:
    *   - NANOS: Spark's vectorized reader rejects it; read nanos as long and
    *     rebuild a (micro) timestamp. Integer division — a double division
    *     would lose precision above 2^53 ns.
    *   - MICROS without UTC adjustment arrives as TIMESTAMP_NTZ; cast to
    *     TIMESTAMP. The session timezone is pinned to UTC everywhere
    *     (Verify/Bench/specs), so the wall-clock value is unchanged and
    *     downstream time arithmetic keeps one timestamp type. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
}
