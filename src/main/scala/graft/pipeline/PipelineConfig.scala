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
