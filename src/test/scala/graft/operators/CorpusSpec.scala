package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  // ---- RangeJoin ----

  test("range join: binned result equals brute-force theta join") {
    val ev = graft.queries.QueryDef.loadEvents(spark, sf)
      .withColumn("ts", date_trunc("second", $"ts"))
    val iv = ev.filter($"event_type" === "error")
      .select($"event_id".as("iid"), $"ts".as("its"))
    val pts = ev.filter($"event_type" === "click")
      .select($"event_id".as("pid"), $"ts".as("pts"))
    val brute = pts.join(iv,
        $"pts" >= $"its" && $"pts" < $"its" + expr("INTERVAL 600 SECONDS"))
      .select($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = RangeJoin.pointInInterval(pts, iv, "pts", "its", 600, 600)
      .select($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == brute)
    assert(brute.nonEmpty, "fixture must actually produce matches")
  }

  test("range join: bin width narrower/wider than interval still exact") {
    val ev = graft.queries.QueryDef.loadEvents(spark, sf)
      .withColumn("ts", date_trunc("second", $"ts"))
    val iv = ev.filter($"event_type" === "error").limit(50)
      .select($"event_id".as("iid"), $"ts".as("its"))
    val pts = ev.filter($"event_type" === "view")
      .select($"event_id".as("pid"), $"ts".as("pts"))
    def run(binSec: Long) =
      RangeJoin.pointInInterval(pts, iv, "pts", "its", 900, binSec)
        .select($"pid", $"iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = run(100)
    assert(run(900) == narrow && run(4000) == narrow)
  }

  test("range join: no duplicate pairs from interval bin explosion") {
    val joined = {
      val ev = graft.queries.QueryDef.loadEvents(spark, sf)
        .withColumn("ts", date_trunc("second", $"ts"))
      val iv = ev.filter($"event_type" === "error")
        .select($"event_id".as("iid"), $"ts".as("its"))
      val pts = ev.filter($"event_type" === "click")
        .select($"event_id".as("pid"), $"ts".as("pts"))
      // length 10x bin width -> each interval explodes to ~11 bins;
      // each (point, interval) pair must still appear exactly once
      RangeJoin.pointInInterval(pts, iv, "pts", "its", 3000, 300)
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(joined.length == joined.toSet.size)
  }

  test("BinRangeJoin rule: SQL range join plans as hash join, same result") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      def prep(s: org.apache.spark.sql.SparkSession): Unit = {
        val ev = graft.queries.QueryDef.loadEvents(s, sf)
          .withColumn("pe", unix_timestamp(date_trunc("second", $"ts")))
        ev.filter(col("event_type") === "error")
          .select(col("event_id").as("iid"), col("pe").as("se"))
          .createOrReplaceTempView("v_iv")
        ev.filter(col("event_type") === "click")
          .select(col("event_id").as("pid"), col("pe"))
          .createOrReplaceTempView("v_p")
      }
      val sql = """SELECT pid, iid FROM v_p JOIN v_iv
                  |ON pe >= se AND pe < se + 600L""".stripMargin
      prep(s2)
      val accel = s2.sql(sql)
      val phys = accel.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        s"rule must remove the nested-loop join:\n$phys")
      assert(phys.contains("HashJoin") || phys.contains("SortMergeJoin"),
        s"expected a hash/sort-merge equi join:\n$phys")
      val got = accel.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference result from the base session (rule NOT installed)
      prep(base)
      val plain = base.sql(sql)
      assert(plain.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), "baseline must be the BNLJ shape")
      val exp = plain.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == exp && exp.nonEmpty)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("BinRangeJoin rule: flipped operand order rewrites; BETWEEN does not") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      Seq((1L, 100L), (2L, 699L), (3L, 700L), (4L, 99L))
        .toDF("pid", "pe").createOrReplaceTempView("f_p")
      Seq((7L, 100L)).toDF("iid", "se").createOrReplaceTempView("f_iv")
      // interval side written FIRST, operands reversed (s <= p, s+L > p)
      val flipped = s2.sql(
        """SELECT iid, pid FROM f_iv JOIN f_p
          |ON se <= pe AND se + 600L > pe""".stripMargin)
      assert(flipped.queryExecution.optimizedPlan.toString.contains("__brj_bin"),
        "flipped operand order must still be recognized")
      assert(flipped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        == Set((7L, 1L), (7L, 2L)))
      // BETWEEN has an INCLUSIVE upper bound -> different semantics,
      // must NOT be rewritten by the exclusive-end matcher
      val between = s2.sql(
        """SELECT pid, iid FROM f_p JOIN f_iv
          |ON pe BETWEEN se AND se + 600L""".stripMargin)
      assert(!between.queryExecution.optimizedPlan.toString.contains("__brj_bin"))
      assert(between.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        == Set((1L, 7L), (2L, 7L), (3L, 7L)))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("BinRangeJoin rule: INT (not just LONG) point/start columns work") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      // all-INT operands: the analyzer inserts no casts, so the rule
      // must cast before mixing with its Long bin literals
      Seq((1, 100), (2, 699), (3, 700)).toDF("pid", "pe")
        .createOrReplaceTempView("i_p")
      Seq((7, 100)).toDF("iid", "se").createOrReplaceTempView("i_iv")
      val df = s2.sql(
        """SELECT pid, iid FROM i_p JOIN i_iv
          |ON pe >= se AND pe < se + 600""".stripMargin)
      assert(df.queryExecution.optimizedPlan.toString.contains("__brj_bin"))
      assert(df.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
        == Set((1, 7), (2, 7)))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("BinRangeJoin rule: joins with an equi conjunct are left alone") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      Seq((1L, 10L, 100L)).toDF("pid", "k", "pe").createOrReplaceTempView("t_p")
      Seq((2L, 10L, 90L)).toDF("iid", "k", "se").createOrReplaceTempView("t_iv")
      val df = s2.sql("""SELECT pid, iid FROM t_p JOIN t_iv
                        |ON t_p.k = t_iv.k AND pe >= se AND pe < se + 600L"""
        .stripMargin)
      assert(!df.queryExecution.optimizedPlan.toString.contains("__brj_bin"),
        "equi-keyed join must not be rewritten")
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        == Seq((1L, 2L)))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  // ---- Corpus.stratifiedSample ----

  test("stratified sample: deterministic, per-stratum rates, pure filter") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rates = Map("en" -> 0.5, "de" -> 1.0, "es" -> 0.0)
    val s1 = Corpus.stratifiedSample(docs, "lang", "doc_id", rates)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Corpus.stratifiedSample(
        docs.repartition(7), "lang", "doc_id", rates)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "membership must not depend on partitioning")

    val byLang = Corpus.stratifiedSample(docs, "lang", "doc_id", rates)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == total("de"), "rate 1.0 keeps everything")
    assert(!byLang.contains("es"), "rate 0.0 keeps nothing")
    assert(!byLang.contains("zh"), "unlisted stratum uses defaultRate 0.0")
    val enRate = byLang("en").toDouble / total("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en rate ~0.5, got $enRate")
  }

  test("stratified sample: different salts draw different members") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = Corpus.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.5), salt = "a").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Corpus.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.5), salt = "b").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a != b)
  }

  // ---- Corpus.capPerGroup ----

  test("capPerGroup: at most k per group, deterministic, unbiased by id") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source")
    val capped = Corpus.capPerGroup(docs, "source", "doc_id", k = 10)
    val sizes = capped.groupBy($"source").count().collect()
      .map(_.getLong(1))
    assert(sizes.forall(_ <= 10) && sizes.nonEmpty)
    // deterministic under repartitioning
    val a = capped.select($"doc_id").collect().map(_.getLong(0)).toSet
    val b = Corpus.capPerGroup(docs.repartition(5), "source", "doc_id", 10)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // hash draw, not first-k-by-id: some group must keep a non-prefix set
    val bySource = capped.collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).sorted)
    val firstK = docs.collect().groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(0)).sorted.take(10))
    assert(bySource.exists { case (s, kept) => firstK(s) != kept })
  }

  // ---- Corpus.packChunks ----

  test("packChunks: prefix-sum layout invariants hold per shard") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", ($"doc_id" % 4).as("shard"),
        TextAnalysis.tokenCount($"text").as("n_tokens"))
    val budget = 256
    val packed = Corpus.packChunks(docs, "shard", "doc_id", "n_tokens", budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(packed.nonEmpty)
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (_, _, n, start, end, offset) =>
        assert(offset == cum % budget, "offset = cumulative mod budget")
        assert(start == cum / budget, "start chunk = cumulative div budget")
        assert(end == (cum + n - 1) / budget, "end covers the doc tail")
        assert(start <= end)
        cum += n
      }
      // chunks are gapless: every chunk index up to the last is used
      val lastEnd = sorted.last._5
      val covered = sorted.flatMap(r => r._4 to r._5).toSet
      assert(covered == (0L to lastEnd).toSet, "no empty chunks in layout")
    }
  }

  test("packChunks: zero/absent token counts clamp to 1") {
    val df = Seq((1L, 0L, 0L), (2L, 0L, 5L), (3L, 0L, 0L))
      .toDF("id", "sh", "toks")
    val out = Corpus.packChunks(df, "sh", "id", "toks", 4)
      .orderBy($"id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 5L, 1L)) // n_tokens
    assert(out.map(_.getLong(5)).toSeq == Seq(0L, 1L, 2L)) // offsets 0,1,6%4
  }

  // ---- PII redaction ----

  test("redactPii scrubs emails, IPs, and phones; counts match") {
    val fixtures = Seq(
      (1L, "contact alice.smith+spam@example-corp.co.uk now"),
      (2L, "server at 10.0.255.3 responded"),
      (3L, "call 555-867-5309 or 555.867.5309"),
      (4L, "mixed bob@x.io from 192.168.1.1 dial 123-456-7890"),
      (5L, "clean text, nothing to redact"),
    ).toDF("id", "t")
    val got = fixtures.select($"id",
        TextAnalysis.redactPii($"t").as("r"),
        TextAnalysis.matchCount($"t", TextAnalysis.EmailRe).as("ne"),
        TextAnalysis.matchCount($"t", TextAnalysis.Ipv4Re).as("ni"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(got(1L)._1 == "contact <EMAIL> now" && got(1L)._2 == 1)
    assert(got(2L)._1 == "server at <IP> responded" && got(2L)._3 == 1)
    assert(got(3L)._1 == "call <PHONE> or <PHONE>")
    assert(got(4L)._1 == "mixed <EMAIL> from <IP> dial <PHONE>")
    assert(got(5L)._1 == "clean text, nothing to redact"
      && got(5L)._2 == 0 && got(5L)._3 == 0)
  }

  test("bloom decontamination: superset of exact, bounded inflation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val evalSet = docs.filter($"doc_id" < 10)
    val corpus = docs.filter($"doc_id" >= 10)
    val exact = Dedup.contaminatedDocs(corpus, evalSet, "text", "doc_id")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // fpp is per probe; docs here carry ~50 shingles, so 1e-4 per
    // probe keeps the per-doc false-positive rate ~0.5%
    val flagged = Dedup.bloomDecontaminate(corpus, evalSet, "text", "doc_id",
        fpp = 1e-4)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged), "Bloom must have NO false negatives")
    val nClean = corpus.count() - exact.size
    assert(flagged.size - exact.size <= math.max(5L, nClean / 10),
      s"false positives out of bound: ${flagged.size} vs ${exact.size}")
    assert(exact.nonEmpty, "fixture must contain real contamination")
  }

  test("redactNumbers after redactPii leaves placeholders intact") {
    val df = Seq((1L, "order 42 from bob@x.io at 10.0.0.1")).toDF("id", "t")
    val r = df.select(TextAnalysis.redactNumbers(
      TextAnalysis.redactPii($"t")).as("r")).head().getString(0)
    assert(r == "order <NUM> from <EMAIL> at <IP>")
  }

  test("weightedSample: k per stratum, weight-biased, repartition-stable") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang", ($"doc_id" % 5 + lit(0.5)).as("wt"))
    val s1 = Corpus.weightedSample(docs, "lang", "doc_id", "wt", k = 20)
    val s2 = Corpus.weightedSample(docs.repartition(7), "lang", "doc_id",
      "wt", k = 20)
    val rows1 = s1.select("doc_id").as[Long].collect().toSet
    assert(rows1 == s2.select("doc_id").as[Long].collect().toSet,
      "membership must not depend on partitioning")
    // at most k per stratum
    val perLang = s1.groupBy("lang").count().as[(String, Long)].collect()
    assert(perLang.forall(_._2 <= 20))
    // inclusion ∝ weight: the sampled mean weight must exceed the
    // population mean by a clear margin (population mean = 2.5;
    // weights 0.5..4.5 uniform)
    val sampledMean = s1.agg(avg($"wt")).head().getDouble(0)
    val popMean = docs.agg(avg($"wt")).head().getDouble(0)
    assert(sampledMean > popMean + 0.3,
      s"sampled mean $sampledMean should exceed population mean $popMean")
  }

  test("epochRepeat: reps bracket the weight, expectation matches") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", (($"doc_id" % 37) / 10.0).as("wt"))
    val r = Corpus.epochRepeat(docs, "doc_id", "wt")
    // every doc's n_reps is floor(wt) or ceil(wt)
    val bad = r.select($"doc_id", $"wt", $"n_reps").distinct()
      .filter(!($"n_reps" === floor($"wt") || $"n_reps" === ceil($"wt")))
    assert(bad.isEmpty, bad.collect().mkString(", "))
    // epoch indexes are 1..n_reps per doc (row count == sum of reps)
    val totalRows = r.count()
    val sumReps = r.select($"doc_id", $"n_reps").distinct()
      .agg(sum($"n_reps")).head().getLong(0)
    assert(totalRows == sumReps)
    // corpus-level expectation: total reps ~ total weight (the md5
    // draws are uniform; 500 docs gives a tight but safe 10% band)
    val totalWt = docs.agg(sum($"wt")).head().getDouble(0)
    assert(math.abs(totalRows - totalWt) / totalWt < 0.10,
      s"total reps $totalRows vs total weight $totalWt")
  }

  test("temperatureMix: T=1 keeps natural proportions at the budget") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang")
    val r = Corpus.temperatureMix(docs, "lang", "doc_id",
      temperature = 1.0, budgetFrac = 0.5)
    // T=1: every language's keep rate IS the budget (the re-weighted
    // target equals the natural share), modulo the 1e-9 weight
    // quantization — allow 1 basis point
    val rates = r.select($"lang", $"rate_bp").distinct()
      .as[(String, Long)].collect().toMap
    rates.foreach { case (lang, bp) =>
      assert(math.abs(bp - 5000L) <= 1, s"$lang rate $bp != ~5000")
    }
    // kept fraction lands near the budget (md5 draws are uniform)
    val frac = r.count().toDouble / docs.count()
    assert(math.abs(frac - 0.5) < 0.07, s"kept fraction $frac")
  }

  test("temperatureMix: high T flattens — head capped below budget, tails above") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang")
    val counts = docs.groupBy($"lang").count().as[(String, Long)].collect()
    val head = counts.maxBy(_._2)._1
    val tail = counts.minBy(_._2)._1
    assert(counts.maxBy(_._2)._2 > 2 * counts.minBy(_._2)._2,
      "fixture must be skewed for this test to mean anything")
    val rates = Corpus.temperatureMix(docs, "lang", "doc_id",
        temperature = 4.0, budgetFrac = 0.5)
      .select($"lang", $"rate_bp").distinct().as[(String, Long)].collect().toMap
    assert(rates(head) < 5000, s"head $head rate ${rates(head)} not flattened")
    assert(rates(tail) > 5000, s"tail $tail rate ${rates(tail)} not up-weighted")
  }

  test("temperatureMix: membership is deterministic and repartition-stable") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Corpus.temperatureMix(df, "lang", "doc_id", 2.0, 0.5)
        .select($"doc_id").as[Long].collect().toSet
    val a = ids(docs)
    assert(a == ids(docs.repartition(13, $"doc_id")) && a.nonEmpty)
    intercept[IllegalArgumentException] {
      Corpus.temperatureMix(docs, "lang", "doc_id", 0.0, 0.5)
    }
    intercept[IllegalArgumentException] {
      Corpus.temperatureMix(docs, "lang", "doc_id", 1.0, 1.5)
    }
  }

  // ---- shardAssign / sampleExactN ----

  test("shardAssign: round-robin on the exact descending-size order, balanced totals") {
    val docs = (1L to 103L).map(i => (i, (i * 37 % 500) + 20)).toDF("id", "sz")
    val out = Corpus.shardAssign(docs, "id", "sz", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.length == 103)
    // exact round-robin over (size desc, id asc)
    val expected = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, s, i % 8) }.toSet
    assert(out.toSet == expected)
    // balance: shard token totals within one max-document of each other
    val totals = out.groupBy(_._3).map(_._2.map(_._2).sum)
    val maxDoc = out.map(_._2).max
    assert(totals.max - totals.min <= maxDoc,
      s"imbalance ${totals.max - totals.min} vs max doc $maxDoc")
  }

  test("shardAssign: no single-task global window in the plan") {
    val docs = (1L to 50L).map(i => (i, i % 7)).toDF("id", "sz")
    val plan = Corpus.shardAssign(docs, "id", "sz", nShards = 4)
      .queryExecution.executedPlan.toString
    // GlobalRank's bucket-window shape: every Window partitions by __bkt
    assert(!plan.contains("Window [row_number()") ||
      plan.split("\\n").filter(_.contains("windowspecdefinition"))
        .forall(_.contains("__bkt")),
      s"global-window fallback detected:\n$plan")
  }

  test("sampleExactN: exact count, deterministic, and nested across n") {
    val docs = (1L to 400L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val s100 = Corpus.sampleExactN(docs, "doc_id", 100)
      .collect().map(_.getLong(0)).toSet
    val s100b = Corpus.sampleExactN(docs, "doc_id", 100)
      .collect().map(_.getLong(0)).toSet
    val s30 = Corpus.sampleExactN(docs, "doc_id", 30)
      .collect().map(_.getLong(0)).toSet
    assert(s100.size == 100 && s30.size == 30)
    assert(s100 == s100b, "reruns identical")
    assert(s30.subsetOf(s100), "smaller samples nest inside larger ones")
    // a different salt draws a genuinely different sample
    val alt = Corpus.sampleExactN(docs, "doc_id", 100, salt = "other")
      .collect().map(_.getLong(0)).toSet
    assert(alt != s100)
  }

  test("selectUnderBudget: greedy by score, inclusive running cost, bucket-invariant") {
    val docs = (1L to 200L)
      .map(i => (i, ((i * 31) % 97).toDouble, (i % 40) + 10))
      .toDF("id", "score", "cost")
    val expected = docs.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, s, _) => (-s, id) }
      .scanLeft((0L, 0.0, 0L, 0L)) { case ((_, _, _, run), (id, s, c)) =>
        (id, s, c, run + c) }
      .drop(1).takeWhile(_._4 <= 3000L)
      .map { case (id, _, _, run) => (id, run) }.toSet
    for (buckets <- Seq(1, 7, 32)) {
      val got = Corpus.selectUnderBudget(docs, "id", "score", "cost",
          budget = 3000L, buckets = buckets)
        .collect().map(r => (r.getLong(0),
          r.getLong(r.fieldIndex("running")))).toSet
      assert(got == expected, s"buckets=$buckets")
    }
    assert(expected.nonEmpty && expected.size < 200,
      "budget must bind somewhere in the middle")
  }

  test("withGroupRankAndRunningSum equals the serial global window") {
    val df = (1L to 500L).map(i => (i, (i * 17 % 101).toDouble, i % 13 + 1))
      .toDF("id", "v", "w")
    val serial = df.withColumn("rank", org.apache.spark.sql.functions
        .row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"v".asc, $"id".asc)))
      .withColumn("running", org.apache.spark.sql.functions.sum($"w")
        .over(org.apache.spark.sql.expressions.Window
          .orderBy($"v".asc, $"id".asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .select($"id", $"rank", $"running").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val dist = GlobalRank.withGroupRankAndRunningSum(df, Seq.empty, "v",
        Seq("id"), "w", buckets = 8)
      .select($"id", $"rank", $"running").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dist.map(t => (t._1, t._2.toInt, t._3)) == serial)
  }
}
