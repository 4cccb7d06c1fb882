package graft.streaming

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Model-based property test for the snapshot-committed upsert: for
  * ANY sequence of non-empty batches and ANY bucket count, folding the
  * batches through `upsertBatchSnapshot` must equal an in-memory
  * latest-state fold, and `changesBetween` over EVERY version pair
  * must equal the model diff of the corresponding states. Random keys
  * collide, versions tie and regress, and batches re-state rows — the
  * corner space deterministic tests sample only pointwise.
  *
  * Generator constraint: batches are deduped on (key, version) because
  * an exact in-batch tie resolves by an internal whole-row hash the
  * model deliberately does not reproduce (it only needs to be
  * deterministic, not predictable). Case count kept small — every case
  * runs real write+read Spark jobs. */
object SnapshotUpsertPropsSpec extends Properties("SnapshotUpsert") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.SparkSpec.session

  type Row3 = (Long, String, Long)

  private val rowGen: Gen[Row3] = Gen.zip(Gen.chooseNum(0L, 5L),
    Gen.oneOf("a", "b", "c", "d", "e"), Gen.chooseNum(0L, 3L))
  private val batchGen = Gen.nonEmptyListOf(rowGen)
    .map(_.distinctBy(r => (r._1, r._3)))
  private val seqGen = Gen.zip(
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, batchGen)),
    Gen.oneOf(1, 3, 8))

  /** states(i) = key -> row after batch i (states(0) = empty). The
    * merge rule: per key the highest version wins, the incoming row
    * beats the existing one on an exact version tie. */
  private def foldModel(batches: List[List[Row3]]): Vector[Map[Long, Row3]] =
    batches.scanLeft(Map.empty[Long, Row3]) { (state, batch) =>
      val best = batch.groupBy(_._1).map { case (k, rows) =>
        k -> rows.maxBy(_._3)
      }
      state ++ best.map { case (k, r) =>
        k -> (state.get(k) match {
          case Some(old) if old._3 > r._3 => old
          case _ => r
        })
      }
    }.toVector

  property("any batch sequence folds to the model state; every version " +
      "pair diffs to the model diff") =
    forAll(seqGen) { case (batches, nBuckets) =>
      import spark.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snap-prop").toString
      batches.foreach { b =>
        SnapshotUpsert.upsertBatchSnapshot(b.toDF("id", "status", "v"),
          dir, Seq("id"), "v", nBuckets, keepVersions = 16)
      }
      val states = foldModel(batches)
      val snap = SnapshotUpsert.readSnapshot(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val latestOk = snap == states.last.values.toSet
      if (!latestOk)
        println(s"latest: got=$snap want=${states.last.values.toSet}")
      val n = batches.length
      val pairsOk = (for { i <- 1 to n; j <- (i + 1) to n } yield {
        val feed = SnapshotUpsert.changesBetween(spark, dir, i.toLong,
            j.toLong, Seq("id")).collect()
          .map(r => ((r.getLong(0), r.getString(1), r.getLong(2)),
            r.getString(3))).toSet
        val (si, sj) = (states(i), states(j))
        val want = sj.collect {
          case (k, row) if !si.get(k).contains(row) =>
            (row, if (si.contains(k)) "update" else "insert")
        }.toSet
        val ok = feed == want
        if (!ok) println(s"pair ($i,$j): feed=$feed want=$want")
        ok
      }).forall(identity)
      latestOk && pairsOk
    }

  // ---- merges interleaved with in-place bucket SPLITS (round 11) ----

  /** An op sequence: each op is a merge batch or a split of the i-th
    * (mod populated) bucket. Splits must never change content, every
    * version-pair diff must still equal the model diff (the class-wise
    * cross-split feed), and a keyed point read over the final mixed
    * layout must equal the model filter. */
  private val opGen: Gen[Either[List[Row3], Int]] = Gen.frequency(
    2 -> batchGen.map(Left(_)), 1 -> Gen.chooseNum(0, 7).map(Right(_)))
  private val splitSeqGen = Gen.zip(
    Gen.zip(batchGen,
      Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, opGen))),
    Gen.oneOf(2, 4))

  property("merges interleaved with splits fold to the model; feeds span " +
      "splits; keyed reads route the mixed layout") =
    forAll(splitSeqGen) { case ((first, ops), nBuckets) =>
      import spark.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snap-prop-split").toString
      // fold, tracking the model state per committed version
      var states = Vector(Map.empty[Long, Row3])
      def merge(b: List[Row3]): Unit = {
        SnapshotUpsert.upsertBatchSnapshot(b.toDF("id", "status", "v"),
          dir, Seq("id"), "v", nBuckets, keepVersions = 32)
        states :+= foldModel(List(b)).last.foldLeft(states.last) {
          case (st, (k, r)) => st.get(k) match {
            case Some(old) if old._3 > r._3 => st
            case _ => st + (k -> r)
          }
        }
      }
      merge(first)
      ops.foreach {
        case Left(b) => merge(b)
        case Right(i) =>
          // split the i-th populated bucket of the CURRENT manifest
          val ids = populatedBuckets(spark, dir)
          SnapshotUpsert.splitBucket(spark, dir, ids(i % ids.size),
            keepVersions = 32)
          states :+= states.last // a split never changes content
      }
      val snap = SnapshotUpsert.readSnapshot(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val latestOk = snap == states.last.values.toSet
      if (!latestOk)
        println(s"latest: got=$snap want=${states.last.values.toSet}")
      val n = states.size - 1
      val pairsOk = (for { i <- 1 to n; j <- (i + 1) to n } yield {
        val feed = SnapshotUpsert.changesBetween(spark, dir, i.toLong,
            j.toLong, Seq("id")).collect()
          .map(r => ((r.getLong(0), r.getString(1), r.getLong(2)),
            r.getString(3))).toSet
        val (si, sj) = (states(i), states(j))
        val want = sj.collect {
          case (k, row) if !si.get(k).contains(row) =>
            (row, if (si.contains(k)) "update" else "insert")
        }.toSet
        val ok = feed == want
        if (!ok) println(s"pair ($i,$j): feed=$feed want=$want")
        ok
      }).forall(identity)
      // keyed point read over the final (possibly deep-split) layout
      val probeIds = Seq(0L, 2L, 4L, 999L)
      val got = SnapshotUpsert.readKeys(spark, dir,
          probeIds.toDF("id"), Seq("id")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val wantKeys = states.last.collect {
        case (k, row) if probeIds.contains(k) => row
      }.toSet
      val keysOk = got == wantKeys
      if (!keysOk) println(s"readKeys: got=$got want=$wantKeys")
      latestOk && pairsOk && keysOk
    }

  // ---- the same model extended with tombstone deletes (round 10) ----

  type Row4 = (Long, String, Long, Boolean)

  private val rowGen4: Gen[Row4] = Gen.zip(Gen.chooseNum(0L, 5L),
    Gen.oneOf("a", "b", "c", "d", "e"), Gen.chooseNum(0L, 3L),
    Gen.frequency(3 -> false, 1 -> true))
  private val batchGen4 = Gen.nonEmptyListOf(rowGen4)
    .map(_.distinctBy(r => (r._1, r._3)))
  private val seqGen4 = Gen.zip(
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, batchGen4)),
    Gen.oneOf(1, 3, 8))

  /** Merge rule with deletes: per key the highest version wins (the
    * incoming row on an exact tie); a winning tombstone REMOVES the
    * key, and a tombstone outranked by the existing row is a no-op. */
  private def foldModelDel(batches: List[List[Row4]])
      : Vector[Map[Long, Row3]] =
    batches.scanLeft(Map.empty[Long, Row3]) { (state, batch) =>
      val best = batch.groupBy(_._1).map { case (k, rows) =>
        k -> rows.maxBy(_._3)
      }
      best.foldLeft(state) { case (st, (k, r)) =>
        st.get(k) match {
          case Some(old) if old._3 > r._3 => st
          case _ => if (r._4) st - k else st + (k -> ((r._1, r._2, r._3)))
        }
      }
    }.toVector

  property("with tombstones: any batch sequence folds to the model state; " +
      "every version pair diffs to the model diff incl. deletes") =
    forAll(seqGen4) { case (batches, nBuckets) =>
      import spark.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snap-prop-del").toString
      batches.foreach { b =>
        SnapshotUpsert.upsertBatchSnapshot(
          b.toDF("id", "status", "v", "del"), dir, Seq("id"), "v", nBuckets,
          keepVersions = 16, tombstoneCol = Some("del"))
      }
      val states = foldModelDel(batches)
      val snap = SnapshotUpsert.readSnapshot(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val latestOk = snap == states.last.values.toSet
      if (!latestOk)
        println(s"latest: got=$snap want=${states.last.values.toSet}")
      val n = batches.length
      val pairsOk = (for { i <- 1 to n; j <- (i + 1) to n } yield {
        val feed = SnapshotUpsert.changesBetween(spark, dir, i.toLong,
            j.toLong, Seq("id"), emitDeletes = true).collect()
          .map(r => ((r.getLong(0), r.getString(1), r.getLong(2)),
            r.getString(3))).toSet
        val (si, sj) = (states(i), states(j))
        val want = sj.collect {
          case (k, row) if !si.get(k).contains(row) =>
            (row, if (si.contains(k)) "update" else "insert")
        }.toSet ++ si.collect {
          case (k, row) if !sj.contains(k) => (row, "delete")
        }.toSet
        val ok = feed == want
        if (!ok) println(s"pair ($i,$j): feed=$feed want=$want")
        ok
      }).forall(identity)
      latestOk && pairsOk
    }

  /** Populated bucket ids of the current manifest, sorted. */
  private def populatedBuckets(spark: org.apache.spark.sql.SparkSession,
      dir: String): Vector[Int] = {
    val lines = scala.io.Source.fromFile(
      new java.io.File(s"$dir/_manifests").listFiles()
        .filter(_.getName.endsWith(".txt")).sortBy(_.getName).last,
      "UTF-8").getLines().toVector
    lines.filterNot(l => l.startsWith("#") ||
        l.startsWith("S\t") ||
        l.startsWith("L\t") || l.startsWith("V\t"))
      .map(_.split('\t')(0).toInt).distinct.sorted
  }
}
