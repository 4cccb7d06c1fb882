package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    // near-dup of 0 (one word changed)
    (1L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    // exact dup of 0 modulo case/whitespace
    (2L, "The quick  brown fox jumps over the lazy dog near the river bank today"),
    (3L, "completely different content about spark query engines and columnar formats"),
    (4L, "another unrelated text mentioning joins aggregations and window functions here"),
  ).toDF("doc_id", "text")

  test("exact dedup groups case/whitespace variants") {
    val groups = Dedup.exactDedupGroups(docs, "text", "doc_id").collect()
    assert(groups.length == 4)
    val dupGroup = groups.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupGroup.getAs[Long]("canonical_id") == 0L)
  }

  test("minhash LSH surfaces the planted near-dup pair above threshold") {
    val found = Dedup.minHashDedup(docs, "text", "doc_id", threshold = 0.5, k = 8, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((0L, 1L)), "near-dup pair 0-1 must be found")
    assert(found.contains((0L, 2L)), "exact-dup pair 0-2 must be found")
    assert(!found.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minHashCoeffs: stable 8-prefix, valid field range, k>8 never truncates") {
    val c64 = Dedup.minHashCoeffs(64)
    assert(c64.take(8) == Dedup.MinHashCoeffs,
      "generalizing the family must not change historical signatures")
    assert(c64.size == 64 && c64.distinct.size == 64)
    c64.foreach { case (a, b) =>
      assert(a >= 1L && a < Dedup.MinHashPrime, s"a=$a out of [1, prime)")
      assert(b >= 0L && b < Dedup.MinHashPrime, s"b=$b out of [0, prime)")
    }
    // the pre-generalization bug: k=16 silently produced an 8-column
    // signature; now every requested permutation materializes
    val sig16 = Dedup.minHashSignature(docs, "text", "doc_id", k = 16)
    assert(sig16.columns.count(_.matches("m\\d+")) == 16)
    // production-scale config end to end: k=64, 16 bands of 4 rows
    // still surfaces the planted exact-dup pair
    val found = Dedup.minHashDedup(docs, "text", "doc_id", threshold = 0.5,
        k = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((0L, 2L)), "exact-dup pair 0-2 must be found")
    assert(!found.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccard is 1.0 for exact dups, high for near-dups, 0 for unrelated") {
    val pairs = Seq((0L, 2L), (0L, 1L), (0L, 3L)).toDF("id1", "id2")
    val j = Dedup.jaccardForPairs(pairs, docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 2L)) == 1.0)
    assert(j((0L, 1L)) > 0.5 && j((0L, 1L)) < 1.0)
    assert(j((0L, 3L)) == 0.0)
  }

  test("simhash: near-dups land within small hamming distance") {
    val sig = Dedup.simHash(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(0L), sig(2L)) == 0) // identical shingle sets
    assert(hamming(sig(0L), sig(1L)) <= 6)
    assert(hamming(sig(0L), sig(3L)) > hamming(sig(0L), sig(1L)))
  }

  test("dupClusters labels connected components with the min id") {
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L), (6L, 5L)).toDF("id1", "id2")
    val nodes = (0L to 7L).toDF("doc_id")
    val expected = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 5L, 7L -> 7L)
    val eager = Dedup.dupClusters(pairs, nodes, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(eager == expected)
    // declarative fixed-round variant agrees once rounds >= diameter
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val lazyForm = Dedup.dupClusters(pairs, nodes, "doc_id", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lazyForm == expected)
    // ...and, having no driver action of its own to unpersist after, it
    // must not register a cache that would leak for the session lifetime
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "declarative dupClusters must not leak persisted edges")
  }

  test("leakage-safe split: every cluster member shares one split, " +
      "singletons match the per-doc cluster-hash split") {
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("id1", "id2")
    val nodes = (0L to 6L).toDF("doc_id")
    val got = Dedup.dupClusters(pairs, nodes, "doc_id")
      .select($"doc_id", $"cluster",
        TextAnalysis.assignSplit($"cluster").as("split"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    // the whole point: connected docs can never straddle splits
    assert(got(0L) == got(1L) && got(1L) == got(2L))
    assert(got(3L) == got(4L))
    // split depends only on the cluster label, so a member's split
    // equals the split of its cluster-id doc
    (0L to 6L).foreach { id =>
      assert(got(id)._2 == got(got(id)._1)._2)
    }
  }

  test("dupClustersStar matches min-label labels in far fewer rounds on a deep chain") {
    // a 32-node chain: the worst case for min-label propagation, whose
    // round count equals the diameter; large-star/small-star collapses
    // it in O(log n) driver-coordinated rounds
    val chain = (0L until 31L).map(i => (i, i + 1)).toDF("id1", "id2")
    val nodes = (0L to 31L).toDF("doc_id")
    val (starLabels, starRounds) =
      Dedup.dupClustersStarCounted(chain, nodes, "doc_id")
    val star = starLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == (0L to 31L).map(_ -> 0L).toMap,
      s"one component labeled by its min: $star")
    val (propLabels, propRounds) =
      Dedup.dupClustersCounted(chain, nodes, "doc_id")
    assert(propLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == star)
    assert(propRounds >= 31, s"min-label on a 32-chain needs >= diameter rounds, got $propRounds")
    assert(starRounds <= 10, s"star rounds must be logarithmic, got $starRounds")
    assert(starRounds < propRounds / 2,
      s"star ($starRounds) must beat propagation ($propRounds) decisively")
  }

  test("dupClustersStar handles forests, isolated nodes, and dup pair directions") {
    val pairs = Seq((1L, 0L), (0L, 1L), (1L, 2L), (3L, 4L), (6L, 5L), (5L, 5L))
      .toDF("id1", "id2")
    val nodes = (0L to 7L).toDF("doc_id")
    val got = Dedup.dupClustersStar(pairs, nodes, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("canonicalPerCluster keeps the best-scoring member, ties to smallest id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster")
    val scored = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (9L, 0.1))
      .toDF("doc_id", "q")
    val got = Dedup.canonicalPerCluster(labels, scored, "doc_id", "q")
      .select("doc_id", "canonical_id", "is_canonical").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // 2 and 3 tie at 0.9 -> smallest id 2 is canonical for cluster 1
    assert(got(1L) == ((2L, 0)))
    assert(got(2L) == ((2L, 1)))
    assert(got(3L) == ((2L, 0)))
    // a singleton cluster is its own canonical
    assert(got(9L) == ((9L, 1)))
  }

  test("nearDupsCross: incoming near-dups of existing docs found, direction kept") {
    import spark.implicits._
    val existing = docs // ids 0-4
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"), // = doc 0
      (11L, "the quick brown fox leaps over the lazy dog near the river bank today"), // near doc 0
      (12L, "totally novel content with no counterpart in the existing corpus at all"),
    ).toDF("doc_id", "text")
    val found = Dedup.nearDupsCross(incoming, existing, "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // id1 is always the incoming side, id2 the existing side
    assert(found.keySet.subsetOf(Set(10L, 11L)), found.toString)
    assert(found.contains(10L), "exact copy must be found")
    assert(found.contains(11L), "near-dup must be found")
    assert(!found.contains(12L), "novel doc must not match")
    assert(found.values.forall(id2 => id2 >= 0L && id2 <= 4L))
  }

  test("contaminatedDocs flags only docs sharing shingles with the eval set") {
    val evalSet = docs.filter($"doc_id" === 0L)
    val flagged = Dedup.contaminatedDocs(
        docs.filter($"doc_id" > 0L), evalSet, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 (near-dup) and 2 (exact dup) share shingles with doc 0;
    // docs 3 and 4 share none
    assert(flagged.keySet == Set(1L, 2L))
    assert(flagged(2L) > flagged(1L), "exact dup shares more shingles")
  }

  test("assignSplit is deterministic and roughly proportioned") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val a = real.select($"doc_id", TextAnalysis.assignSplit($"doc_id").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = real.repartition(7)
      .select($"doc_id", TextAnalysis.assignSplit($"doc_id").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "split must not depend on partitioning")
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    assert(a.values.toSet == Set("train", "val", "test"))
  }

  test("tfIdf: rare terms outscore ubiquitous ones; ubiquitous idf is 0") {
    val t = TextAnalysis.tfIdf(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    // "the" appears in every one of the 3 dup-ish docs AND only those ->
    // idf = ln(5/3) > 0; "columnar" appears once -> high idf
    assert(t((3L, "columnar")) > t((0L, "the")))
    // a term present in ALL docs would have idf 0; none here, so check
    // the ordering instead: per-doc, the rarest term scores highest
    val doc3 = t.filter(_._1._1 == 3L)
    assert(doc3.values.max > 0.0)
  }

  test("simHashPairs: multi-band recall is EXACT for hamming <= maxDist") {
    // pigeonhole: 16 bits in 4 bands, maxDist 3 -> every qualifying pair
    // keeps at least one band intact, so the banded join loses nothing
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val sig = Dedup.simHash(real, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bruteForce = (for {
      a <- sig.keys; b <- sig.keys if a < b
      if java.lang.Long.bitCount(sig(a) ^ sig(b)) <= 3
    } yield (a, b)).toSet
    val banded = Dedup.simHashPairs(real, "text", "doc_id",
        maxDist = 3, bits = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == bruteForce,
      s"banded=${banded.size} brute=${bruteForce.size}")
    assert(bruteForce.nonEmpty, "fixture must contain near-dup docs")
  }

  test("LSH top-k achieves reasonable recall against brute force") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = e.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4 bits -> ~16 buckets over 500 vectors; recall is partial but the
    // hits must be a subset of a wider exact neighborhood.
    val lsh = Similarity.lshTopK(e, queries, "vec_id", "embedding", k = 5, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall > 0.1, s"recall $recall suspiciously low")
    // every LSH hit is self-consistent: same bucket by construction
    val buckets = Similarity.lshBuckets(e, "vec_id", "embedding", bits = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    lsh.foreach { case (q, n) => assert(buckets(q) == buckets(n)) }
    // multi-probe strictly widens the candidate set -> recall never drops
    val multi = Similarity.lshTopK(e, queries, "vec_id", "embedding",
      k = 5, bits = 4, probes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallMulti = brute.intersect(multi).size.toDouble / brute.size
    assert(recallMulti >= recall, s"multi-probe recall $recallMulti < single $recall")
  }

  test("IVF top-k: recall beats LSH at same probe budget, subset of exact") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = e.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (assigned, centroids) = Similarity.ivfIndex(e, "vec_id", "embedding", nCells = 8)
    val ivf = Similarity.ivfTopK(assigned, centroids, queries, "vec_id", "embedding",
      k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall > 0.3, s"IVF recall $recall too low for 4/8 probed cells")
    // deterministic: same seed -> same index -> same answers
    val (assigned2, centroids2) = Similarity.ivfIndex(e, "vec_id", "embedding", nCells = 8)
    val ivf2 = Similarity.ivfTopK(assigned2, centroids2, queries, "vec_id", "embedding",
      k = 5, nProbe = 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf2 == ivf)
  }

  test("multimodal decode: schema, batch shape, deterministic stub") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text").repartition(2)
    val decoded = Multimodal.decode(spark, media, batchSize = 2)
    assert(decoded.schema == Multimodal.decodedSchema)
    val rows = decoded.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Float]]("feature").length == 8)
      assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("width") < 80)
      assert(r.getAs[Long]("byte_len") > 0)
    }
    // determinism: same input -> same features
    val again = Multimodal.decode(spark, media, batchSize = 3).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("feature")).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getAs[scala.collection.Seq[Float]]("feature")))
  }

  test("containment flags an embedded copy that Jaccard scores low") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val big = (1 to 20).map(i => s"filler$i word$i").mkString(" ") +
      " " + small + " " + (21 to 40).map(i => s"tail$i pad$i").mkString(" ")
    val df = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val c = Dedup.containmentForPairs(pairs, df, "text", "doc_id").head()
    val j = Dedup.jaccardForPairs(pairs, df, "text", "doc_id").head()
    assert(c.getAs[Double]("contain_1_in_2") == 1.0, c.toString)
    assert(c.getAs[Double]("contain_2_in_1") < 0.2)
    assert(j.getAs[Double]("jaccard") < 0.2,
      "symmetric Jaccard misses the embedded copy by construction")
  }

  test("multimodal resize dims: aspect preserved, no upscale, 1px floor") {
    import spark.implicits._
    val dims = Seq((1L, 100, 50), (2L, 50, 100), (3L, 30, 20), (4L, 2000, 2))
      .toDF("id", "w", "h")
      .select(col("id"), Multimodal.resizeDims(col("w"), col("h"), 64).as("r"))
      .select(col("id"), col("r.out_w"), col("r.out_h"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(dims.toSeq == Seq(
      (1L, 64L, 32L), // long edge scaled to target, aspect kept
      (2L, 32L, 64L),
      (3L, 30L, 20L), // already under target: untouched
      (4L, 64L, 1L), // extreme aspect clamps at 1px, never 0
    ))
  }

  test("decoded media features flow into the ANN operators") {
    val feats = Multimodal.decode(spark,
        Multimodal.asMediaTable(docs, "doc_id", "text"))
      .select(col("doc_id").as("vec_id"), col("feature").as("embedding"))
    val topk = Similarity.bruteForceTopK(feats, feats.limit(2), "vec_id",
      "embedding", k = 2).collect()
    assert(topk.length == 4) // 2 queries x k=2
    topk.foreach(r => assert(r.getAs[Double]("cos") >= -1.0001 &&
      r.getAs[Double]("cos") <= 1.0001))
  }

  test("embedding dedup finds planted near-identical vectors") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = Array.tabulate(16)(i => math.sin(i.toDouble).toFloat)
    val nearDup = base.clone(); nearDup(0) = base(0) + 1e-4f
    val other = Array.tabulate(16)(i => math.cos(i * 2.0).toFloat)
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, base.toSeq)); rows.add(Row(2L, nearDup.toSeq))
    rows.add(Row(3L, other.toSeq))
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))
    val pairs = Dedup.embeddingDedup(df, "vec_id", "embedding",
      threshold = 0.999, bits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("substringDupProfile: verbatim cross-doc spans flagged, within-doc repeats not") {
    import spark.implicits._
    val licence = "licensed under the apache license version two point zero see notice file"
    val df = Seq(
      (1L, s"doc one unique words here $licence trailing content distinct alpha"),
      (2L, s"totally different beginning $licence and a different ending beta"),
      (3L, "no shared spans in this document at all just singular content gamma"),
      // within-doc repetition only: must NOT count (cross-doc signal)
      (4L, "echo echo echo echo echo echo echo echo echo echo echo echo delta"),
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupProfile(df, "text", "doc_id", k = 30, stride = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1)._2 > 0 && got(2)._2 > 0,
      s"shared licence span must register on both docs: $got")
    assert(got(3)._2 == 0, "doc without shared spans must score 0")
    assert(got(4)._2 == 0, "within-doc repetition is not cross-doc duplication")
    assert(got(1)._3 > 0.2 && got(1)._3 < 1.0, s"ratio sane: ${got(1)._3}")
  }

  test("winnowed substringDupProfile detects shared spans at ANY alignment; " +
      "positional striding provably misses the misaligned ones") {
    import spark.implicits._
    def randStr(n: Int, seed: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val stride = 7
    // one pair per offset delta r in 0..6: both docs embed the SAME
    // 300-char span, after unique prefixes whose lengths differ by r —
    // so the copies sit at byte offsets congruent to r apart (mod 7)
    val docs = (0 until stride).flatMap { r =>
      val span = randStr(300, 1000 + r)
      Seq((100L + 2 * r, randStr(50, 100 + r) + span),
        (101L + 2 * r, randStr(50 + r, 200 + r) + span))
    }
    val df = docs.toDF("doc_id", "text")

    val winnowed = Dedup.substringDupProfile(df, "text", "doc_id",
        k = 30, stride = stride, winnowed = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until stride).foreach { r =>
      assert(winnowed(100L + 2 * r) > 0 && winnowed(101L + 2 * r) > 0,
        s"offset delta $r: winnowed selection must flag the shared span; got $winnowed")
    }

    // negative control — the bug the winnowing fixes: with positional
    // stride-7 sampling, in-span sample offsets are fixed by the span's
    // absolute position, so every pair with delta not a multiple of 7
    // shares ZERO sampled windows
    val strided = Dedup.substringDupProfile(df, "text", "doc_id",
        k = 30, stride = stride, winnowed = false)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (1 until stride).foreach { r =>
      assert(strided(100L + 2 * r) == 0,
        s"offset delta $r: positional striding should miss (documents the bug)")
    }
    assert(strided(100L) > 0, "aligned copies are the one case striding catches")
  }

  test("substringDupPairs: misaligned copies pair up; ubiquitous windows are df-cut") {
    import spark.implicits._
    def randStr(n: Int, seed: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    // 7 pairs sharing a 300-char span at offset deltas 0..6, PLUS a
    // boilerplate block of 60 docs all sharing one 120-char span
    val boiler = randStr(120, 9999)
    val docs = (0 until 7).flatMap { r =>
      val span = randStr(300, 1000 + r)
      Seq((100L + 2 * r, randStr(50, 100 + r) + span),
        (101L + 2 * r, randStr(50 + r, 200 + r) + span))
    } ++ (0 until 60).map(i => (500L + i, randStr(80, 3000 + i) + boiler))
    val df = docs.toDF("doc_id", "text")
    val pairs = Dedup.substringDupPairs(df, "text", "doc_id",
        k = 40, stride = 7, minShared = 2, maxDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 7).foreach { r =>
      assert(pairs.contains((100L + 2 * r, 101L + 2 * r)),
        s"offset-delta-$r copy pair must surface: $pairs")
    }
    assert(!pairs.exists { case (a, b) => a >= 500L && b >= 500L },
      "60-doc boilerplate windows exceed maxDf=50 and must be df-cut")
    // raising maxDf above the block size lets the boilerplate pairs in
    val loose = Dedup.substringDupPairs(df, "text", "doc_id",
        k = 40, stride = 7, minShared = 2, maxDf = 100)
      .filter(col("id1") >= 500L && col("id2") >= 500L).count()
    assert(loose == 60L * 59 / 2, s"all boilerplate pairs expected, got $loose")
  }

  test("substringContaminated flags quoted eval fragments at any offset") {
    import spark.implicits._
    def randStr(n: Int, seed: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val fragment = randStr(150, 77)
    val eval = Seq((1L, randStr(60, 10) + fragment + randStr(60, 11)))
      .toDF("doc_id", "text")
    // train docs quote the fragment after prefixes of every residue
    // class mod 7; one clean doc shares nothing
    val train = (0 until 7).map { r =>
      (100L + r, randStr(40 + r, 200 + r) + fragment + randStr(30, 300 + r))
    } :+ ((200L, randStr(400, 999))) // clean
    val got = Dedup.substringContaminated(
        train.toDF("doc_id", "text"), eval, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 7).foreach { r =>
      assert(got.getOrElse(100L + r, 0L) > 0,
        s"offset residue $r: quoted fragment must be flagged; got $got")
    }
    assert(!got.contains(200L), "clean doc must not be flagged")
  }

  test("winnowed substringDupProfile keeps docs with zero selected windows") {
    import spark.implicits._
    // ~40 one-window docs (len < k): each doc's single window hash
    // passes the h % 7 == 0 selector only ~1/7 of the time, so some
    // docs MUST land at n_windows = 0 — they still have to appear,
    // with a null dup_ratio
    val df = (1 to 40).map(i => (i.toLong, s"tiny doc number $i"))
      .toDF("doc_id", "text")
    val rows = Dedup.substringDupProfile(df, "text", "doc_id",
      k = 30, stride = 7, winnowed = true).collect()
    assert(rows.length == 40, s"all docs must appear, got ${rows.length}")
    val zero = rows.filter(_.getLong(1) == 0L)
    assert(zero.nonEmpty, "expected some zero-window docs in this fixture")
    zero.foreach(r => assert(r.isNullAt(3),
      s"zero-window doc ${r.getLong(0)} must have null dup_ratio"))
  }

  test("BPE: golden counts under a fixed two-merge table") {
    import spark.implicits._
    val merges = Seq(("t", "h"), ("th", "e"))
    // "the" -> t h e -> th e -> the (1); "cat" stays 3 chars; "!" is 1
    val cases = Seq(
      (1L, "the the", 2L),
      (2L, "the cat!", 5L),
      (3L, "thethe", 2L),     // one word, both merges apply twice
      (4L, "th e", 2L),       // merge cannot cross the word boundary
      (5L, "a1b", 3L),        // letter/digit category split
      (6L, "", 0L),
      (7L, "   ", 0L),
    )
    val got = cases.map(c => (c._1, c._2)).toDF("id", "text")
      .select($"id", TextAnalysis.bpeTokenCount($"text", merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (id, text, want) =>
      assert(got(id) == want, s"'$text': got ${got(id)}, want $want")
    }
  }

  test("BPE: Column chain agrees with an independent priority-queue reference") {
    import spark.implicits._
    // classic apply formulation: repeatedly merge the LOWEST-RANK
    // applicable pair, all occurrences left-to-right — independent of
    // the replace()-fold implementation under test
    def refMergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    def refCount(text: String, merges: Seq[(String, String)]): Long = {
      val rank = merges.zipWithIndex.toMap
      TextAnalysis.preTokenize(text).map { w =>
        var syms = w.map(_.toString).toVector
        var go = true
        while (go) {
          val applicable = syms.indices.dropRight(1)
            .map(i => (syms(i), syms(i + 1))).filter(rank.contains)
          if (applicable.isEmpty) go = false
          else {
            val (a, b) = applicable.minBy(rank)
            syms = refMergeOnce(syms, a, b)
          }
        }
        syms.length.toLong
      }.sum
    }
    val texts = TextAnalysis.bpeSeedCorpus ++ Seq(
      "aaaa thththe question??", "a1b2c3 x 42!", "...", "the-th-e",
      "mixed CASE With  double  spaces", "1000 miles; 42 more",
    )
    val merges = TextAnalysis.bpeMerges
    assert(merges.size == 48, s"trainer should produce 48 merges, got ${merges.size}")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", TextAnalysis.bpeTokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refCount(t, merges),
        s"'$t': column ${got(i.toLong)} != reference ${refCount(t, merges)}")
    }
    // merges only ever reduce the token count vs raw characters
    texts.zipWithIndex.foreach { case (t, i) =>
      val raw = TextAnalysis.preTokenize(t).map(_.length).sum
      assert(got(i.toLong) <= raw && (t.trim.isEmpty || got(i.toLong) > 0))
    }

    // bpeTokens is the actual tokenization: size matches the count and
    // concatenation losslessly reconstructs the pre-tokenized text
    val tok = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", TextAnalysis.bpeTokens($"text").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(tok(i.toLong).size.toLong == got(i.toLong),
        s"'$t': token array size != count")
      assert(tok(i.toLong).mkString == TextAnalysis.preTokenize(t).mkString,
        s"'$t': tokens must reconstruct the pre-tokenized text")
    }
  }

  test("stripHtml: blocks vanish wholesale, tags strip, entities decode") {
    val cases = Seq(
      (1L, "<p>hello <b>world</b></p>", "hello world"),
      // script/style CONTENT must disappear, including literal '<'
      (2L, "a<script>if (1 < 2) x();</script>b", "a b"),
      (3L, "a<style>p { x: 1 }</style>b", "a b"),
      (4L, "keep <!-- not this -->that", "keep that"),
      // entity decode order: &amp;lt; decodes to &lt;, NOT to <
      (5L, "x &amp;lt; y &lt; z &#39;q&#39;", "x &lt; y < z 'q'"),
      (6L, "  lots   of\t\nspace  ", "lots of space"),
      (7L, "<a href=\"u?a=1&amp;b=2\">link</a>", "link"),
    )
    import spark.implicits._
    val got = cases.map(c => (c._1, c._2)).toDF("id", "html")
      .select($"id", TextAnalysis.stripHtml($"html").as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) == want, s"case $id: got '${got(id)}', want '$want'")
    }
  }

  test("removeBoilerplate: cross-doc segments drop at any offset, " +
      "order and unique content survive, short repeats exempt") {
    val banner = "we value your privacy accept all cookies to continue"
    val footer = "copyright holders reserve all rights in this material"
    val df = Seq(
      // banner leads doc 1, sits mid-doc in 2, trails doc 3: the
      // content-defined split must catch all three placements
      (1L, s"$banner the alpha unique body one the $footer"),
      (2L, s"beta opens here the $banner the beta closes here"),
      (3L, s"gamma unique content the ok the $footer the $banner"),
      // doc 4 is NOTHING BUT boilerplate -> must survive with ''
      (4L, s"$banner the $footer"),
      // 'ok' repeats across docs but is under minLen -> kept
      (5L, "delta keeps the ok the delta tail"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "text", "doc_id",
        delim = " the ", minDocs = 2, minLen = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("alpha unique body one", 3L, 2L)))
    assert(got(2L) == (("beta opens here the beta closes here", 3L, 1L)))
    assert(got(3L) == (("gamma unique content the ok", 4L, 2L)))
    assert(got(4L) == (("", 2L, 2L)))
    assert(got(5L) == (("delta keeps the ok the delta tail", 3L, 0L)))
  }

  test("langId picks marker-matching language; und when no markers") {
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze das haus"),
      (3L, "xyzzy plugh quux"),
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
  }

  test("bigramSurprise: hand-computed nll on a 3-doc corpus; short docs drop") {
    val df = Seq(
      (1L, "a b a b"), // bigrams (a,b) (b,a) (a,b)
      (2L, "a b c"),   // bigrams (a,b) (b,c)
      (3L, "a"),       // no bigram -> dropped
    ).toDF("doc_id", "text")
    // corpus model: c(a,b)=3 c(b,a)=1 c(b,c)=1; ctx(a)=3 ctx(b)=2; V=3
    def micro(cab: Long, ctx: Long) =
      math.round(-math.log((cab + 1).toDouble / (ctx + 3)) * 1e6)
    def nll(ms: Seq[Long]) =
      BigDecimal(ms.sum.toDouble / ms.size / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = nll(Seq(micro(3, 3), micro(1, 2), micro(3, 3)))
    val exp2 = nll(Seq(micro(3, 3), micro(1, 2)))
    val got = TextAnalysis.bigramSurprise(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((3L, exp1)), s"${got(1L)} vs $exp1")
    assert(got(2L) == ((2L, exp2)), s"${got(2L)} vs $exp2")
  }

  test("bigramSurprise: fluent phrasing scores below scrambled rare transitions") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val scored = TextAnalysis.bigramSurprise(docs, "text", "doc_id")
    // the corpus's own most common phrasing must be cheap relative to
    // the spread: min < mean - and every score is positive and finite
    val stats = scored.agg(min($"nll"), avg($"nll"), max($"nll")).head()
    val (lo, mean, hi) = (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2))
    assert(lo > 0 && hi < 50, s"nll range [$lo, $hi] implausible")
    assert(lo < mean && mean < hi)
  }
}
