package graft.io

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.nio.file.Files

class AvroIOSpec extends SparkSpec {

  private lazy val tmp: String = Files.createTempDirectory("avroio").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = false),
    StructField("blob", BinaryType, nullable = true),
  ))

  private def fixture = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, "alpha", 0.5, true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, false, null),
      Row(3L, "gamma", -2.25, true, Array[Byte]()),
    ), 2), schema)

  test("avro round trip preserves values, nulls, and binary") {
    val dir = s"$tmp/roundtrip"
    AvroIO.writeAvro(fixture, dir)
    val back = AvroIO.readAvro(spark, dir, schema)
    assert(back.schema == schema)
    val norm = (df: org.apache.spark.sql.DataFrame) => df.collect().map { r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getBoolean(3),
        Option(r.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq))
    }.toSet
    assert(norm(back) == norm(fixture))
  }

  test("write fans out per partition and overwrite replaces prior content") {
    val dir = s"$tmp/parts"
    AvroIO.writeAvro(fixture, dir) // 2 partitions -> 2 container files
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".avro"))
    assert(files.length == 2, files.map(_.getName).mkString(","))
    AvroIO.writeAvro(fixture.limit(1), dir) // overwrite, not append
    assert(AvroIO.readAvro(spark, dir, schema).count() == 1)
  }

  test("schema JSON uses null-unions only for nullable fields; nested types rejected") {
    val json = AvroIO.avroSchemaJson(schema)
    assert(json.contains(""""name": "id", "type": "long""""))
    assert(json.contains(""""name": "name", "type": ["null", "string"]"""))
    intercept[IllegalArgumentException] {
      AvroIO.avroSchemaJson(StructType(Seq(
        StructField("arr", ArrayType(LongType)))))
    }
  }

  test("randomized round trips: unicode, extremes, null patterns (seeded)") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("plain ascii", "ünïcödé ✓ 記録", "", " \t\n", "a" * 500)
    (0 until 3).foreach { trial =>
      val rows = (0 until 50).map { i =>
        Row(
          rnd.nextLong(),
          if (rnd.nextInt(4) == 0) null else alphabets(rnd.nextInt(alphabets.size)) + i,
          rnd.nextInt(5) match {
            case 0 => null
            case 1 => Double.MaxValue
            case 2 => Double.MinPositiveValue
            case _ => rnd.nextDouble()
          },
          rnd.nextBoolean(),
          if (rnd.nextInt(3) == 0) null
          else Array.fill(rnd.nextInt(16))(rnd.nextInt().toByte),
        )
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), schema)
      val dir = s"$tmp/prop$trial"
      AvroIO.writeAvro(df, dir)
      val back = AvroIO.readAvro(spark, dir, schema).collect()
      val norm = (rs: Seq[Row]) => rs.map { r =>
        (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getBoolean(3),
          Option(r.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq))
      }.sortBy(_.toString)
      assert(norm(back.toSeq) == norm(rows), s"trial $trial mismatch")
    }
  }

  test("reader resolves fields by name (projection + reorder)") {
    val dir = s"$tmp/byname"
    AvroIO.writeAvro(fixture, dir)
    val projected = AvroIO.readAvro(spark, dir, StructType(Seq(
      StructField("score", DoubleType), StructField("id", LongType))))
    val got = projected.collect().map(r => (Option(r.get(0)), r.getLong(1))).toSet
    assert(got == Set((Some(0.5), 1L), (None, 2L), (Some(-2.25), 3L)))
  }
}
