package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("corpus build: end-to-end materialization, partition-pruned reads") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val evalSet = docs.filter($"doc_id" < 10)
    val out = java.nio.file.Files
      .createTempDirectory("corpus-out").toString

    CorpusPipelineApp.build(docs.filter($"doc_id" >= 10), evalSet,
        capPerSource = 15, packBudget = 512, shards = 8)
      .write.mode("overwrite").partitionBy("split").parquet(out)

    val back = spark.read.parquet(out)
    assert(back.count() > 0)
    // split is a partition column -> train read prunes to one dir
    val trainScan = back.filter($"split" === "train")
    assert(trainScan.count() > 0)
    val splits = back.select($"split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))

    // contaminated docs are gone: nothing shares a shingle with eval
    val contaminated = graft.operators.Dedup.contaminatedDocs(
        docs.filter($"doc_id" >= 10), evalSet, "text", "doc_id")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val keptIds = back.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.intersect(contaminated).isEmpty)

    // layout columns present and consistent
    val bad = back.filter($"chunk_start" > $"chunk_end" ||
      $"chunk_offset" >= 512 || $"chunk_offset" < 0)
    assert(bad.isEmpty)

    // deterministic: a second build lands the identical kept-set
    val again = CorpusPipelineApp.build(docs.filter($"doc_id" >= 10),
        evalSet, capPerSource = 15, packBudget = 512, shards = 8)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(again == keptIds)
  }
}
