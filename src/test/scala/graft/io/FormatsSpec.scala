package graft.io

import graft.SparkSpec
import java.nio.file.Files

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-io").resolve(name).toString

  private lazy val df = Seq(
    (1L, "alice", 30.5), (2L, "bob", 25.0), (3L, "carol", 41.25)
  ).toDF("id", "name", "score")

  private def roundTrip(fmt: String, path: String): Unit = {
    Formats.write(df, path, fmt)
    val back = Formats.read(spark, path, fmt)
    back.columns.sorted shouldBe df.columns.sorted
    back.orderBy("id").collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[Double]("score"))) shouldBe
      Array((1L, "alice", 30.5), (2L, "bob", 25.0), (3L, "carol", 41.25))
  }

  test("parquet round-trip") { roundTrip("parquet", tmp("t.parquet")) }
  test("csv round-trip with header + inferSchema") { roundTrip("csv", tmp("t.csv")) }
  test("tsv round-trip") { roundTrip("tsv", tmp("t.tsv")) }
  test("jsonl round-trip") { roundTrip("jsonl", tmp("t.jsonl")) }

  test("json array: driver export + multiLine distributed read") {
    val p = tmp("t.json")
    Formats.Json.write(df, p)
    Files.readString(java.nio.file.Paths.get(p)).trim should startWith("[")
    val back = Formats.read(spark, p, "json")
    back.count() shouldBe 3
    back.orderBy("id").select("name").as[String].collect() shouldBe
      Array("alice", "bob", "carol")
  }

  test("json array export refuses oversized frames") {
    an[IllegalArgumentException] should be thrownBy
      Formats.Json.write(df, tmp("big.json"), maxRows = 2)
  }

  test("format inference from extension; unknown formats raise") {
    Formats.fromPath("/x/y/data.parquet") shouldBe Formats.Parquet
    Formats.fromPath("a.tsv") shouldBe Formats.Tsv
    an[IllegalArgumentException] should be thrownBy Formats.fromPath("a.xlsx")
    an[IllegalArgumentException] should be thrownBy Formats.byName("yaml")
  }

  test("glob ingest stamps each row with its source file") {
    val dir = Files.createTempDirectory("graft-glob")
    df.filter($"id" <= 2).coalesce(1).write.option("header", "true")
      .csv(dir.resolve("part1.csv").toString)
    df.filter($"id" === 3).coalesce(1).write.option("header", "true")
      .csv(dir.resolve("part2.csv").toString)
    val all = Formats.readGlob(spark, dir.toString + "/part*.csv", "csv", "src_file")
    all.count() shouldBe 3
    val sources = all.select("src_file").distinct().as[String].collect()
    sources.length shouldBe 2
    sources.foreach(_ should include("part"))
  }
}
