package graft.pipeline

/** Pipeline configuration (reference:
  * src/advisory_pipeline/config/config.py:1-60), as immutable case
  * classes. `outputPartitions` generalizes the reference's hard-coded
  * `partitions=1`; 0 lets AQE decide (the scale default). */
final case class PipelineConfig(
    runId: String,
    stagingPath: String,
    prodPath: String,
    cachePath: String,
    cacheTtlHours: Double = 0.05,
    incrementalEnabled: Boolean = true,
    outputPartitions: Int = 1,
    batchSize: Int = 1000,
    // SURVEY §2 M7: the reference configures a checkpoint dir it never
    // uses (ap/dependencies.py:44-45). Kept as an optional knob: when
    // set, [[Pipelines.configure]] applies it so RDD/eager checkpoints
    // (and any future streaming use) have a location.
    checkpointDir: Option[String] = None,
)

object PipelineConfig {
  def fromDefaults(runId: String, basePath: String): PipelineConfig =
    PipelineConfig(
      runId = runId,
      stagingPath = s"$basePath/output/staging",
      prodPath = s"$basePath/output/prod",
      cachePath = s"$basePath/output/enrichment_cache",
    )
}
