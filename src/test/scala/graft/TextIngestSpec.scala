package graft

import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.TextIngest

class TextIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_ingest")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("every line lands in exactly one of good/bad; raw text preserved") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2, "text": "second doc"}""",
      """{oops this is not json at all""",
      """{"doc_id": "not-a-number", "text": "type clash"}""",
      """{"doc_id": 5, "text": "fine again"}"""))
    val ing = TextIngest.jsonl(spark, path, schema)
    val good = ing.good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good === Set((1L, "hello world"), (2L, "second doc"),
      (5L, "fine again")))
    val bad = ing.bad.collect().map(_.getString(0))
    assert(bad.length === 2)
    // quarantine carries the raw line for forensics, not a parse wreck
    assert(bad.exists(_.contains("oops this is not json")))
    assert(bad.exists(_.contains("not-a-number")))
    // schema contract: good has exactly the declared columns
    assert(ing.good.columns.toSeq === Seq("doc_id", "text"))
    assert(ing.bad.columns.toSeq === Seq("raw_line", "source_file"))
  }

  test("csv ingest routes type clashes and ragged rows to quarantine, keeps the rest") {
    val dir = java.nio.file.Files.createTempDirectory("csv_ingest")
    java.nio.file.Files.write(dir.resolve("part-0.csv"), Seq(
      "1,hello world",
      "2,second doc",
      "not-a-number,type clash",
      "5,fine again").mkString("\n").getBytes("UTF-8"))
    val ing = TextIngest.csv(spark, dir.toString, schema)
    val good = ing.good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good === Set((1L, "hello world"), (2L, "second doc"),
      (5L, "fine again")))
    val bad = ing.bad.collect().map(_.getString(0))
    assert(bad.length === 1 && bad.head.contains("not-a-number"))
    assert(ing.good.columns.toSeq === Seq("doc_id", "text"))
    ing.unpersist()
  }

  test("requireQuality trips the breaker past the threshold, passes below") {
    val mostlyBad = TextIngest.jsonl(spark,
      writeLines(Seq("""{"doc_id": 1, "text": "ok"}""", "junk1", "junk2")),
      schema)
    intercept[IllegalArgumentException] {
      TextIngest.requireQuality(mostlyBad, maxBadFraction = 0.5)
    }
    val mostlyGood = TextIngest.jsonl(spark,
      writeLines(Seq("""{"doc_id": 1, "text": "ok"}""",
        """{"doc_id": 2, "text": "ok too"}""", "junk")),
      schema)
    val (nGood, nBad) = TextIngest.requireQuality(mostlyGood, 0.5)
    assert(nGood === 2L && nBad === 1L)
  }

  test("null fields within valid JSON are data, not corruption") {
    val ing = TextIngest.jsonl(spark,
      writeLines(Seq("""{"doc_id": 7}""", """{"text": "no id"}""")), schema)
    assert(ing.good.count() === 2) // missing fields parse as nulls
    assert(ing.bad.count() === 0)
    val rows = ing.good.select($"doc_id", $"text").collect()
    assert(rows.exists(r => r.isNullAt(1)) && rows.exists(r => r.isNullAt(0)))
  }
}
