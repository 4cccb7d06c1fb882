package graft.operators

import graft.SparkSpec
import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native dot product matches the higher-order-function form exactly") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val a = e.as("a")
    val b = e.as("b")
    val both = a.join(b, col("b.vec_id") === col("a.vec_id") + 1)
      .select(
        Similarity.dot(col("a.v"), col("b.v")).as("hof"),
        VectorExpressions.dotNative(col("a.v"), col("b.v")).as("native"))
      .collect()
    // identical left-to-right double accumulation -> bit-exact equality
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(both.length > 100)
  }

  test("native squared-L2 matches the higher-order-function fold exactly") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val a = e.as("a")
    val b = e.as("b")
    // the HOF fold Similarity.l2sq replaced (kept inline here as the
    // portable reference): left-associated sum of (x-y)^2
    val hof = aggregate(zip_with(col("a.v"), col("b.v"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val both = a.join(b, col("b.vec_id") === col("a.vec_id") + 1)
      .select(hof.as("hof"),
        VectorExpressions.l2sqNative(col("a.v"), col("b.v")).as("native"))
      .collect()
    // identical left-to-right double accumulation -> bit-exact equality
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(both.length > 100)
  }

  test("l2_sq null semantics match the HOF form (length mismatch, null slot)") {
    val df = spark.range(1).select(
      expr("array(1.0d, 2.0d, 3.0d, 4.0d)").as("v"))
    val got = df.select(
      VectorExpressions.l2sqNative(col("v"), expr("slice(v, 1, 3)")).as("mm"),
      VectorExpressions.l2sqNative(col("v"),
        expr("array(1.0d, cast(null as double), 3.0d, 4.0d)")).as("ns"),
      VectorExpressions.l2sqNative(col("v"), col("v")).as("self")).head()
    assert(got.isNullAt(0), "length mismatch must be NULL")
    assert(got.isNullAt(1), "null slot must be NULL")
    assert(got.getDouble(2) == 0.0)
  }

  test("native LSH bucket matches the per-plane HOF composition exactly") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    for (bits <- Seq(4, 8); table <- Seq(0, 1, 3)) {
      val both = e.select(
          Similarity.lshBucketHof($"embedding", bits, table).as("hof"),
          graft.functions.VectorExpressions
            .lshBucketNative($"embedding", bits, table).as("native"))
        .collect()
      both.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"bits=$bits table=$table: ${r.getLong(0)} != ${r.getLong(1)}"))
      assert(both.length > 100)
    }
  }

  test("native LSH bucket degenerate inputs match the HOF quirks (0, never NULL)") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (cast(null as array<double>)),
        | (array()),
        | (array(1.0d, cast(null as double), 3.0d)),
        | (array(cast('NaN' as double), 1.0d)),
        | (array(0.5d)) AS t(v)""".stripMargin)
    val got = df.select(
        Similarity.lshBucketHof(col("v"), 8, 0).as("hof"),
        graft.functions.VectorExpressions
          .lshBucketNative(col("v"), 8, 0).as("native"))
      .collect()
    got.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1), "bucket is never NULL")
      assert(r.getLong(0) == r.getLong(1), s"${r.getLong(0)} != ${r.getLong(1)}")
    }
  }

  test("FuseDotProduct rewrites the HOF aggregate(zip_with) into the native loop") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val e = s2.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val hof = e.select(col("vec_id"),
        Similarity.dot(col("v"), col("v")).as("d"))
      val plan = hof.queryExecution.optimizedPlan.toString
      assert(plan.contains("dot_product") && !plan.contains("aggregate("),
        s"rule must rewrite the HOF form:\n$plan")
      // and the rewrite is value-identical to the unfused HOF form
      // (same left-to-right accumulation), checked on the base session
      // where the rule is NOT installed
      val fused = hof.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val unfused = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .select(col("vec_id"), Similarity.dot(col("v"), col("v")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(fused == unfused)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("GraftExtensions injects dot_product at session build time") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      // same SparkContext, fresh session built WITH the extension — the
      // production wiring is spark.sql.extensions=graft.GraftExtensions
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val d = s2.sql(
        """SELECT dot_product(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
          |                   CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d"""
          .stripMargin).head().getDouble(0)
      assert(d == 11.0)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("dot_product registers for SQL and handles nulls") {
    VectorExpressions.register(spark)
    val got = spark.sql(
      """SELECT dot_product(CAST(array(1.0, 2.0, 3.0) AS ARRAY<DOUBLE>),
        |                   CAST(array(4.0, 5.0, 6.0) AS ARRAY<DOUBLE>)) AS d,
        |       dot_product(CAST(NULL AS ARRAY<DOUBLE>),
        |                   CAST(array(1.0) AS ARRAY<DOUBLE>)) AS n""".stripMargin)
      .head()
    assert(got.getDouble(0) == 32.0)
    assert(got.isNullAt(1))
  }

  test("dot_product matches HOF null semantics on edge inputs") {
    VectorExpressions.register(spark)
    // literal args constant-fold through the interpreted eval path
    val r = spark.sql(
      """SELECT
        |  dot_product(CAST(array(1.0,2.0,3.0) AS ARRAY<DOUBLE>),
        |              CAST(array(1.0,2.0) AS ARRAY<DOUBLE>)) AS mismatch,
        |  dot_product(CAST(array(1.0,NULL) AS ARRAY<DOUBLE>),
        |              CAST(array(1.0,2.0) AS ARRAY<DOUBLE>)) AS nullslot,
        |  aggregate(zip_with(CAST(array(1.0,2.0,3.0) AS ARRAY<DOUBLE>),
        |                     CAST(array(1.0,2.0) AS ARRAY<DOUBLE>),
        |                     (x, y) -> x * y), 0.0D, (a, v) -> a + v) AS hof_mismatch,
        |  aggregate(zip_with(CAST(array(1.0,NULL) AS ARRAY<DOUBLE>),
        |                     CAST(array(1.0,2.0) AS ARRAY<DOUBLE>),
        |                     (x, y) -> x * y), 0.0D, (a, v) -> a + v) AS hof_nullslot,
        |  dot_product(CAST(array() AS ARRAY<DOUBLE>),
        |              CAST(array() AS ARRAY<DOUBLE>)) AS empty""".stripMargin)
      .head()
    assert(r.isNullAt(2) && r.isNullAt(3), "HOF reference semantics")
    assert(r.isNullAt(0), "length mismatch must be NULL, like the HOF form")
    assert(r.isNullAt(1), "null element must be NULL, like the HOF form")
    assert(r.getDouble(4) == 0.0)
  }

  test("dot_product null semantics survive codegen (non-literal inputs)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(16)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val r = e.select(
        VectorExpressions.dotNative(col("v"), expr("slice(v, 1, 3)")).as("mm"),
        VectorExpressions.dotNative(
          expr("transform(v, (x, i) -> IF(i = 0, CAST(NULL AS DOUBLE), x))"),
          col("v")).as("ns"),
        VectorExpressions.dotNative(col("v"), col("v")).as("ok"))
      .collect()
    assert(r.length == 16)
    r.foreach { row =>
      assert(row.isNullAt(0), "codegen path: length mismatch -> NULL")
      assert(row.isNullAt(1), "codegen path: null slot -> NULL")
      assert(!row.isNullAt(2) && row.getDouble(2) > 0.0)
    }
  }

  test("fused cosine is bit-identical to the composed three-dot form") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(64)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val a = e.as("a")
    val b = e.as("b")
    val composed = VectorExpressions.dotNative(col("a.v"), col("b.v")) /
      (sqrt(VectorExpressions.dotNative(col("a.v"), col("a.v"))) *
        sqrt(VectorExpressions.dotNative(col("b.v"), col("b.v"))))
    val rows = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(
        VectorExpressions.cosineNative(col("a.v"), col("b.v")).as("fused"),
        composed.as("ref"))
      .collect()
    assert(rows.nonEmpty)
    // bit-identical, not approximately equal: same accumulation order
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("cosine_sim null semantics match dot_product's (both eval paths)") {
    VectorExpressions.register(spark)
    val lit = spark.sql(
      """SELECT
        |  cosine_sim(CAST(array(1.0,2.0,3.0) AS ARRAY<DOUBLE>),
        |             CAST(array(1.0,2.0) AS ARRAY<DOUBLE>)) AS mismatch,
        |  cosine_sim(CAST(array(1.0,NULL) AS ARRAY<DOUBLE>),
        |             CAST(array(1.0,2.0) AS ARRAY<DOUBLE>)) AS nullslot,
        |  cosine_sim(CAST(array(1.0,0.0) AS ARRAY<DOUBLE>),
        |             CAST(array(1.0,0.0) AS ARRAY<DOUBLE>)) AS selfsim""".stripMargin)
      .head()
    assert(lit.isNullAt(0) && lit.isNullAt(1))
    assert(lit.getDouble(2) == 1.0)
    // codegen path on non-literal inputs
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(8)
      .select($"embedding".cast("array<double>").as("v"))
    val r = e.select(
        VectorExpressions.cosineNative(col("v"), expr("slice(v, 1, 3)")).as("mm"),
        VectorExpressions.cosineNative(col("v"), col("v")).as("self"))
      .collect()
    r.foreach { row =>
      assert(row.isNullAt(0))
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    }
  }

  test("as-of join: brute-force parity on real events") {
    val ev = graft.queries.QueryDef.loadEvents(spark, sf)
      .withColumn("ts", date_trunc("second", $"ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"), $"event_id".as("click_id"))
    // brute force: max prior click per purchase
    val brute = p.join(c, $"cu" === $"user_id" && $"cts" <= $"ts", "left")
      .groupBy($"event_id")
      .agg(max(struct($"cts", $"click_id")).as("best"))
      .select($"event_id", $"best.click_id".as("click_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val got = AsOfJoin.asOfJoin(p,
        c.select($"cu".as("user_id"), $"cts".as("ts"), $"click_id"),
        Seq("user_id"), "ts", "ts", Seq("click_id"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("asof_click_id")).map(_.asInstanceOf[Long])).toMap
    assert(got.size == brute.size)
    // same latest-click choice everywhere (ties impossible: click_id max
    // picked by brute struct-max ordering on (ts, click_id); asOfJoin
    // input was not deduped, so compare only where timestamps are unique)
    got.foreach { case (pid, gclick) =>
      assert(brute(pid).map(_ => true).getOrElse(gclick.isEmpty),
        s"purchase $pid: match presence differs")
    }
    val matched = got.values.flatten.size
    assert(matched > 0 && matched <= got.size)
  }

  test("as-of join: exact semantics on a hand fixture") {
    def t(m: Long) = new java.sql.Timestamp(3600000L + m * 60000L)
    val left = Seq((1L, 10L, t(10)), (2L, 10L, t(30)), (3L, 20L, t(5)))
      .toDF("id", "uid", "ts")
    val right = Seq((10L, t(10), "a"), (10L, t(25), "b"), (30L, t(1), "z"))
      .toDF("uid", "ts", "v")
    val got = AsOfJoin.asOfJoin(left, right, Seq("uid"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("asof_v")).toMap
    assert(got(1L) == "a") // equal-ts right row matches (>=)
    assert(got(2L) == "b") // latest prior
    assert(got(3L) == null) // no right rows for uid 20 -> null
  }

  test("salted join equals plain join; salted count equals groupBy count") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    val plain = o.join(c, Seq("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_.toString)
    val salted = SkewJoin.saltedJoin(o, c, Seq("o_custkey"), salts = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)

    val plainCount = o.groupBy($"o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val saltedCount = SkewJoin.saltedCount(o, Seq("o_custkey"), salts = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(saltedCount == plainCount)
  }

  test("GraftExtensions injects the char kernels for SQL") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      // window_hashes: matches the Column-side kernel exactly
      val viaSql = s2.sql("SELECT window_hashes('abcdef', 3, 1) AS h")
        .head().getSeq[Long](0)
      val viaCol = {
        import s2.implicits._
        Seq("abcdef").toDF("t")
          .select(graft.functions.WindowHashExpr
            .windowHashes($"t", 3, 1).as("h"))
          .head().getSeq[Long](0)
      }
      assert(viaSql == viaCol && viaSql.length == 4)
      // non-literal k must fail loudly, not silently misparameterize
      val err = intercept[Exception] {
        s2.sql("SELECT window_hashes(t, length(t), 1) FROM (SELECT 'ab' AS t)")
          .collect()
      }
      assert(err.getMessage.contains("literal integer"))
      // bpe_encode: default 48-merge table, same US-delimited encoding
      val bpeSql = s2.sql("SELECT bpe_encode('the merge table') AS e")
        .head().getString(0)
      val bpeCol = {
        import s2.implicits._
        Seq("the merge table").toDF("t")
          .select(graft.operators.TextAnalysis.bpeMerged($"t").as("e"))
          .head().getString(0)
      }
      assert(bpeSql == bpeCol && bpeSql.nonEmpty)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("sketch aggregates register for SQL: build/merge/extract round trip") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      s2.range(1, 101).selectExpr("id", "id % 4 AS shard",
        "CAST(id AS DOUBLE) AS x", "concat('i', id % 7) AS s")
        .createOrReplaceTempView("sk_src")
      // KLL: shard, union, extract — exact window (n=100 <= k=200).
      // The ranks are a BARE decimal literal (parses as ARRAY<DECIMAL>):
      // the builder converts per element type, so no CAST is needed
      val q = s2.sql(
        """SELECT kll_quantiles(kll_merge_agg(sk, 200), array(0.5))[0] AS med
          |FROM (SELECT shard, kll_sketch_agg(x, 200) AS sk
          |      FROM sk_src GROUP BY shard)""".stripMargin)
        .head().getDouble(0)
      assert(q == 50.0, s"inclusive median of 1..100 must be 50, got $q")
      // multi-rank bare decimal literal: p25/p50/p75 of 1..100 (inclusive
      // nearest-rank rule on exact data)
      val qs = s2.sql(
        """SELECT kll_quantiles(kll_merge_agg(sk, 200),
          |         array(0.25, 0.5, 0.75)) AS qs
          |FROM (SELECT shard, kll_sketch_agg(x, 200) AS sk
          |      FROM sk_src GROUP BY shard)""".stripMargin)
        .head().getSeq[Double](0)
      assert(qs == Seq(25.0, 50.0, 75.0), s"bare-decimal ranks: $qs")
      // frequent items: exact counts, top-1 is the 15-count residue
      val top = s2.sql(
        """SELECT freq_topk(freq_merge_agg(sk, 64), 1) AS t
          |FROM (SELECT shard, freq_sketch_agg(s, 64) AS sk
          |      FROM sk_src GROUP BY shard)""".stripMargin)
        .selectExpr("t[0].item", "t[0].est").head()
      // ids 1..100 mod 7: residues 1 and 2 hit 15 times; item asc tie-break
      assert(top.getString(0) == "i1" && top.getLong(1) == 15L,
        s"top item must be i1 x15, got $top")
      // theta: build + estimate + pair set algebra in SQL text — two
      // segments sharing exactly 3 items (v47, v48, v49)
      s2.sql("""SELECT seg, s FROM (
                |  SELECT 'a' AS seg, concat('v', id) AS s FROM range(0, 50)
                |  UNION ALL
                |  SELECT 'b' AS seg, concat('v', id + 47) AS s FROM range(0, 50))""".stripMargin)
        .createOrReplaceTempView("th_src")
      val est = s2.sql(
        """SELECT theta_estimate(theta_sketch_agg(s)) AS n
          |FROM th_src WHERE seg = 'a'""".stripMargin).head().getLong(0)
      assert(est == 50L, s"theta SQL estimate must be exact in-window: $est")
      val pair = s2.sql(
        """WITH sk AS (SELECT seg, theta_sketch_agg(s) AS sk FROM th_src GROUP BY seg)
          |SELECT theta_intersect_count(a.sk, b.sk) AS common,
          |       theta_a_not_b_count(a.sk, b.sk) AS only_a
          |FROM sk a JOIN sk b ON a.seg = 'a' AND b.seg = 'b'""".stripMargin).head()
      assert(pair.getLong(0) == 3L && pair.getLong(1) == 47L,
        s"theta SQL pair ops must be exact: $pair")
      // non-literal capacity must fail loudly
      val err = intercept[Exception] {
        s2.sql("SELECT kll_sketch_agg(x, CAST(shard AS INT)) FROM sk_src")
          .collect()
      }
      assert(err.getMessage.contains("literal integer"))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("kll_quantiles rejects malformed rank literals with a descriptive error") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      s2.range(1, 11).selectExpr("CAST(id AS DOUBLE) AS x")
        .createOrReplaceTempView("kq_src")
      def messages(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      // NULL rank element: rejected with the descriptive message, not NPE
      val nullErr = intercept[Exception] {
        s2.sql(
          """SELECT kll_quantiles(kll_sketch_agg(x, 200), array(0.25, NULL))
            |FROM kq_src""".stripMargin).collect()
      }
      assert(messages(nullErr).contains("must not contain NULL"),
        s"unexpected: ${messages(nullErr)}")
      // non-array ranks literal: rejected with the descriptive message
      val scalarErr = intercept[Exception] {
        s2.sql(
          """SELECT kll_quantiles(kll_sketch_agg(x, 200), 0.5)
            |FROM kq_src""".stripMargin).collect()
      }
      assert(messages(scalarErr).contains("must be a literal array"),
        s"unexpected: ${messages(scalarErr)}")
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("sketch SQL surface rejects wrong input types at analysis time") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      s2.range(1, 21).selectExpr("id", "CAST(id AS DOUBLE) AS x",
        "concat('i', id % 3) AS s")
        .createOrReplaceTempView("ty_src")
      // each misuse used to surface as a runtime ClassCastException deep
      // in an executor; with declared inputTypes it is an
      // AnalysisException BEFORE any job runs
      def analysisFails(sql: String): Unit = {
        val e = intercept[org.apache.spark.sql.AnalysisException] {
          s2.sql(sql).collect()
        }
        assert(e.getMessage.toLowerCase.contains("mismatch") ||
          e.getCondition != null, s"expected type mismatch for: $sql\n$e")
      }
      analysisFails("SELECT theta_sketch_agg(id) FROM ty_src")
      analysisFails("SELECT theta_union_agg(s) FROM ty_src")
      analysisFails("SELECT theta_estimate(s) FROM ty_src")
      analysisFails("SELECT theta_intersect_count(s, s) FROM ty_src")
      analysisFails("SELECT kll_sketch_agg(s, 200) FROM ty_src")
      analysisFails("SELECT kll_merge_agg(s, 200) FROM ty_src")
      analysisFails("SELECT kll_quantiles(s, array(0.5)) FROM ty_src")
      analysisFails("SELECT freq_sketch_agg(x, 64) FROM ty_src")
      analysisFails("SELECT freq_merge_agg(s, 64) FROM ty_src")
      analysisFails("SELECT freq_topk(s, 3) FROM ty_src")
      analysisFails("SELECT dot_product(array(x), array('a')) FROM ty_src")
      analysisFails("SELECT cosine_sim(x, x) FROM ty_src")
      // positive control: correctly-typed calls still analyze and run
      val ok = s2.sql(
        """SELECT theta_estimate(theta_sketch_agg(s)) AS n,
          |       kll_quantiles(kll_sketch_agg(x, 200), array(0.5))[0] AS med,
          |       freq_topk(freq_sketch_agg(s, 64), 1)[0].item AS top
          |FROM ty_src""".stripMargin).head()
      assert(ok.getLong(0) == 3L && ok.getDouble(1) == 10.0)
      // DECIMAL input: NumericType accepts it at analysis, so update
      // must too (spark's Decimal is NOT a java.lang.Number — this
      // used to pass analysis and then CCE on the executor)
      val dec = s2.sql(
        """SELECT kll_quantiles(
          |  kll_sketch_agg(CAST(id AS DECIMAL(18,2)), 200),
          |  array(0.5))[0] AS med FROM ty_src""".stripMargin).head()
      assert(dec.getDouble(0) == 10.0, s"decimal-fed KLL median: $dec")
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
