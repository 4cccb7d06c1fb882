package graft.tools

import org.apache.spark.sql.DataFrame

/** Shared measurement loop for the scale-rehearsal tools: one warm
  * pass (codegen compile + shuffle-file warmth), then best of 3 timed
  * passes — the same steady-state methodology as Bench.scala, where a
  * single cold run carries 3x codegen/box-load variance. */
object Timing {
  /** Wall seconds of one block — for one-shot costs (builds, commits)
    * where a warm/best-of loop would re-run side effects. */
  def secs(block: => Unit): Double = {
    val s = System.nanoTime(); block
    (System.nanoTime() - s) / 1e9
  }

  def best3(f: () => DataFrame): Double = {
    f().count() // warm
    (1 to 3).map { _ =>
      val s = System.nanoTime(); f().count()
      (System.nanoTime() - s) / 1e9
    }.min
  }
}
