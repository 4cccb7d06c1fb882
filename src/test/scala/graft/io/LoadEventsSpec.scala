package graft.io

import graft.SparkSpec
import graft.queries.QueryDef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
  * generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) (= Spark
  * TIMESTAMP_NTZ) in others; a generator swap mid-round once broke every
  * events query at load. Pin loadEvents' type dispatch so both
  * generations keep producing the same TimestampType column with the
  * same wall-clock instants.
  */
class LoadEventsSpec extends SparkSpec {

  test("current testdata loads as TimestampType under the UTC session") {
    val ev = QueryDef.loadEvents(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.filter(col("ts").isNull).count() == 0)
  }

  test("nanos-as-long generation rebuilds the same instants") {
    // The NANOS physical type reaches the plan as LongType under
    // spark.sql.legacy.parquet.nanosAsLong; writing a long ts column
    // exercises the identical LongType branch.
    val dir = java.nio.file.Files.createTempDirectory("graft-ev-nanos").toString
    val cur = QueryDef.loadEvents(spark, sf)
    cur.withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rebuilt = QueryDef.loadEvents(spark, dir)
    assert(rebuilt.schema("ts").dataType == TimestampType)
    assert(rebuilt.select("event_id", "ts").except(
      cur.select("event_id", "ts")).isEmpty, "instants must round trip")
  }

  test("NTZ generation casts to the identical wall-clock instants") {
    // Session tz is pinned to UTC, so NTZ -> TIMESTAMP must be a
    // formatted no-op: compare against reading the raw NTZ column.
    val raw = spark.read.parquet(s"$sf/events.parquet")
    if (raw.schema("ts").dataType == TimestampNTZType) {
      val viaLoad = QueryDef.loadEvents(spark, sf)
        .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"))
      val direct = raw
        .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"))
      assert(viaLoad.except(direct).isEmpty && direct.except(viaLoad).isEmpty,
        "NTZ cast must preserve the wall-clock value under the UTC session")
    }
  }
}
