package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Property tests over randomized inputs for the round-3 operators:
  * the binned range join must equal the brute-force theta join for ANY
  * interval layout (including negative epochs, which exercise the
  * floor-division bin math), packing must tile gaplessly for any token
  * distribution, and threshold sampling must be monotone in the rate
  * (smaller samples nest inside larger ones). Case counts are kept
  * small — every case runs real Spark jobs. */
object CorpusPropsSpec extends Properties("Corpus") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private val epochGen = Gen.chooseNum(-3000L, 3000L)

  property("binned range join == brute force, any bin/len/epoch sign") =
    forAll(Gen.listOfN(40, epochGen), Gen.listOfN(12, epochGen),
      Gen.chooseNum(1L, 900L), Gen.chooseNum(1L, 1200L)) {
      (ps, ss, len, bin) =>
      val pts = ps.zipWithIndex.map { case (e, i) => (i.toLong, e) }
        .toDF("pid", "pe").withColumn("pts", timestamp_seconds($"pe"))
      val ivs = ss.zipWithIndex.map { case (e, i) => (i.toLong, e) }
        .toDF("iid", "se").withColumn("its", timestamp_seconds($"se"))
      val got = RangeJoin.pointInInterval(pts, ivs, "pts", "its", len, bin)
        .select($"pid", $"iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exp = (for {
        (pe, pi) <- ps.zipWithIndex
        (se, si) <- ss.zipWithIndex
        if pe >= se && pe < se + len
      } yield (pi.toLong, si.toLong)).toSet
      Prop(got == exp) :| s"got=$got exp=$exp"
    }

  property("packChunks tiles gaplessly with bounded offsets") =
    forAll(Gen.listOfN(30, Gen.chooseNum(0L, 40L)),
      Gen.chooseNum(1, 50), Gen.chooseNum(1, 4)) { (toks, budget, shards) =>
      val df = toks.zipWithIndex
        .map { case (t, i) => (i.toLong, i.toLong % shards, t) }
        .toDF("id", "sh", "toks")
      val out = Corpus.packChunks(df, "sh", "id", "toks", budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      out.groupBy(_._2).forall { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        var cum = 0L
        val perDoc = sorted.forall { case (_, _, n, start, end, off) =>
          val ok = n >= 1L && off == cum % budget && off < budget &&
            start == cum / budget && start <= end &&
            end == (cum + n - 1) / budget
          cum += n
          ok
        }
        val covered = sorted.flatMap(r => r._4 to r._5).toSet
        perDoc && covered == (0L to sorted.last._5).toSet
      }
    }

  property("stratified samples nest as the rate grows") =
    forAll(Gen.chooseNum(0, 100), Gen.chooseNum(0, 100)) { (a, b) =>
      val (lo, hi) = (math.min(a, b) / 100.0, math.max(a, b) / 100.0)
      val docs = spark.read.parquet(s"${graft.SparkSpec.sfDir}/documents.parquet")
        .filter($"doc_id" < 200)
      def ids(r: Double) = Corpus.stratifiedSample(
        docs, "lang", "doc_id", Map.empty, defaultRate = r)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      ids(lo).subsetOf(ids(hi))
    }
}
