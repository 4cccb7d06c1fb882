package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-metric accumulator shared by the audit tools (ShuffleAudit,
  * BucketedMergeAtScale): input bytes, shuffle bytes, disk spill.
  * Reset between measured units; drain the listener bus (ListenerDrain)
  * before reading. */
private[tools] class StageTotals extends SparkListener {
  @volatile var inputBytes = 0L
  @volatile var shuffleWrite = 0L
  @volatile var shuffleRead = 0L
  @volatile var spillDisk = 0L
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) synchronized {
      inputBytes += m.inputMetrics.bytesRead
      shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      shuffleRead += m.shuffleReadMetrics.totalBytesRead
      spillDisk += m.diskBytesSpilled
    }
  }
  def reset(): Unit = synchronized {
    inputBytes = 0L; shuffleWrite = 0L; shuffleRead = 0L; spillDisk = 0L
  }
}
