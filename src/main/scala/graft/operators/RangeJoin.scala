package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi key.
  *
  * `points.ts IN [intervals.start, intervals.start + length)` has no
  * equality predicate, so Spark's planner can only execute it as a
  * broadcast-nested-loop join — O(|points| x |intervals|) comparisons,
  * the classic 100 TB cliff. The standard scale rewrite (used by every
  * production range-join implementation, and what Databricks' range
  * join hints do under the hood) is BINNING: bucket the time axis into
  * fixed bins, explode each interval to the bins it overlaps, tag each
  * point with its single bin, equi-join on the bin, then apply the
  * exact predicate. The shuffle is a plain hash exchange on the bin
  * key, the per-bin join is local, and each (point, interval) pair
  * meets in exactly one bin (the point's), so no dedup pass is needed.
  *
  * Bin width tuning: `binSec` close to the interval length keeps the
  * interval explosion factor at <= 2 rows per interval while bounding
  * the candidate fan-in per bin; much smaller bins multiply interval
  * rows, much larger bins multiply false candidates.
  */
object RangeJoin {

  /** Joins each row of `points` to every row of `intervals` whose
    * half-open window `[startTs, startTs + lengthSec)` contains the
    * point's `pointTs`. Output carries all columns of both inputs
    * (caller disambiguates names). Inner semantics — points matching
    * no interval are dropped (wrap with a left join on the caller's
    * side for outer semantics).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      startTs: String,
      lengthSec: Long,
      binSec: Long,
  ): DataFrame = {
    require(lengthSec > 0 && binSec > 0, "lengthSec and binSec must be > 0")
    val p = points
      .withColumn("__pe", unix_timestamp(col(pointTs)))
      .withColumn("__bin", floor(col("__pe") / binSec))
    val iv = intervals
      .withColumn("__s", unix_timestamp(col(startTs)))
      // bins covered by [s, s+len): floor(s/B) .. floor((s+len-1)/B)
      .withColumn("__bin", explode(sequence(
        floor(col("__s") / binSec),
        floor((col("__s") + lit(lengthSec - 1)) / binSec))))
    p.join(iv, Seq("__bin"))
      .filter(col("__pe") >= col("__s") &&
        col("__pe") < col("__s") + lit(lengthSec))
      .drop("__bin", "__pe", "__s")
  }
}
