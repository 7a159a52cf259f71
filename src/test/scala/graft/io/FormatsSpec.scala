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
  test("orc round-trip") { roundTrip("orc", tmp("t.orc")) }
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
    Formats.fromPath("a.yml") shouldBe Formats.Yaml
    Formats.fromPath("a.xlsx") shouldBe Formats.Xlsx
    Formats.byName("toml") shouldBe Formats.Toml
    an[IllegalArgumentException] should be thrownBy Formats.byName("hdf5")
  }

  test("yaml: single list document with nested structs, arrays, nulls") {
    val nested = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "plain", org.apache.spark.sql.Row("oslo", 3),
          Seq("a b", "true"), null),
        org.apache.spark.sql.Row(2L, "needs: quoting", null, Seq.empty[String], 2.5))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, name STRING, addr STRUCT<city: STRING, n: INT>, " +
        "tags ARRAY<STRING>, score DOUBLE"))
    val p = tmp("t.yaml")
    Formats.write(nested.orderBy("id"), p, "yaml")
    val body = Files.readString(java.nio.file.Paths.get(p))
    body shouldBe
      """- id: 1
        |  name: plain
        |  addr:
        |    city: oslo
        |    n: 3
        |  tags:
        |    - a b
        |    - 'true'
        |  score: null
        |- id: 2
        |  name: 'needs: quoting'
        |  addr: null
        |  tags: []
        |  score: 2.5
        |""".stripMargin
  }

  test("yaml renders maps and deeply nested collections structurally, never via toString") {
    val df = spark.sql(
      """SELECT map('a', 1, 'b', 2) AS m,
        |       array(map('k', 7)) AS am,
        |       array(array(named_struct('x', 1))) AS aas""".stripMargin)
    val doc = YamlRender.renderRow(df.collect().head)
    doc should include("m:")
    doc should include("a: 1")
    // array of maps: block mapping under the list dash
    doc should include("- k: 7")
    // array of arrays of structs: nested dashes, struct fields inline
    doc should include("- x: 1")
    doc should not include "Map("
    doc should not include "GenericRow"
  }

  test("yamll: distributed per-row documents with --- separators") {
    val p = tmp("t.yamll")
    Formats.write(df, p, "yamll")
    val w = Files.walk(java.nio.file.Paths.get(p))
    val text =
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.filter(_.getFileName.toString.startsWith("part-"))
          .map(f => Files.readString(f)).mkString
      } finally w.close()
    text.split("(?m)^---$").count(_.trim.nonEmpty) shouldBe 3
    text should include("name: alice")
    text should include("score: 30.5")
  }

  test("yaml round-trip: write then read back typed") { roundTrip("yaml", tmp("rt.yaml")) }
  test("yamll round-trip: distributed docs read back typed") { roundTrip("yamll", tmp("rt.yamll")) }
  test("xlsx round-trip: zip+StAX workbook read back typed") { roundTrip("xlsx", tmp("rt.xlsx")) }

  test("yaml read: nested structs, arrays, quoting, nulls round-trip") {
    val nested = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "plain", org.apache.spark.sql.Row("oslo", 3L),
          Seq("a b", "true"), null),
        org.apache.spark.sql.Row(2L, "needs: quoting", null, Seq.empty[String], 2.5))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, name STRING, addr STRUCT<city: STRING, n: BIGINT>, " +
        "tags ARRAY<STRING>, score DOUBLE"))
    val p = tmp("nested.yaml")
    Formats.write(nested.orderBy("id"), p, "yaml")
    val back = Formats.read(spark, p, "yaml").orderBy("id")
    back.count() shouldBe 2
    val r1 = back.collect()(0)
    r1.getAs[Long]("id") shouldBe 1L
    r1.getAs[org.apache.spark.sql.Row]("addr").getAs[String]("city") shouldBe "oslo"
    r1.getAs[scala.collection.Seq[String]]("tags") shouldBe Seq("a b", "true")
    val r2 = back.collect()(1)
    r2.getAs[String]("name") shouldBe "needs: quoting"
    r2.getAs[Double]("score") shouldBe 2.5
  }

  test("yaml parser: PyYAML-style hand-written fixture with comments and flow") {
    val doc =
      """# top comment
        |---
        |id: 7          # trailing comment
        |title: "hello \"world\""
        |ratio: 0.25
        |ok: true
        |missing: ~
        |tags: [x, y]
        |meta: {k: 1, s: 'it''s'}
        |children:
        |  - name: a
        |    depth: 1
        |  - name: b
        |    depth: 2
        |""".stripMargin
    val json = YamlParse.docsToJson(doc)
    json.length shouldBe 1
    json.head shouldBe
      """{"id":7,"title":"hello \"world\"","ratio":0.25,"ok":true,"missing":null,""" +
      """"tags":["x","y"],"meta":{"k":1,"s":"it's"},""" +
      """"children":[{"name":"a","depth":1},{"name":"b","depth":2}]}"""
  }

  test("yaml parser: multi-doc split, empty docs skipped, scalar docs") {
    YamlParse.docsToJson("---\na: 1\n---\n# only a comment\n---\nb: 2\n") shouldBe
      Seq("""{"a":1}""", """{"b":2}""")
    YamlParse.docToJson("plain text\n") shouldBe Some("\"plain text\"")
    YamlParse.docToJson("- 1\n- 2\n") shouldBe Some("[1,2]")
  }

  test("yaml parser: PyYAML default indentless block sequences") {
    // yaml.safe_dump puts sequence dashes at the KEY's column
    YamlParse.docToJson("tags:\n- a\n- b\nn: 1\n") shouldBe
      Some("""{"tags":["a","b"],"n":1}""")
    // nested: indentless under an indented key, then a sibling
    YamlParse.docToJson("outer:\n  inner:\n  - 1\n  - 2\n  other: x\n") shouldBe
      Some("""{"outer":{"inner":[1,2],"other":"x"}}""")
    // indented sequences still work
    YamlParse.docToJson("tags:\n  - a\n  - b\n") shouldBe Some("""{"tags":["a","b"]}""")
  }

  test("yaml round-trip keeps NaN/Infinity columns double-typed") {
    val p = tmp("nan.yaml")
    val withNan = Seq((1L, 1.5), (2L, Double.NaN), (3L, Double.PositiveInfinity))
      .toDF("id", "v")
    Formats.write(withNan, p, "yaml")
    val body = Files.readString(java.nio.file.Paths.get(p))
    body should include("v: .nan")
    body should include("v: .inf")
    val back = Formats.read(spark, p, "yaml").orderBy("id")
    back.schema("v").dataType shouldBe org.apache.spark.sql.types.DoubleType
    val vs = back.select("v").as[Double].collect()
    vs(0) shouldBe 1.5
    vs(1).isNaN shouldBe true
    vs(2).isPosInfinity shouldBe true
  }

  test("xlsx round-trip preserves CRLF and control-adjacent strings") {
    val p = tmp("crlf.xlsx")
    val d = Seq((1L, "a\r\nb"), (2L, "tab\there")).toDF("id", "s")
    Formats.write(d, p, "xlsx")
    val back = Formats.read(spark, p, "xlsx").orderBy("id").select("s").as[String].collect()
    back(0) shouldBe "a\r\nb"
    back(1) shouldBe "tab\there"
  }

  test("yaml parser: PyYAML width-folding of long and multi-line scalars") {
    // safe_dump({'s': 'a\nb'}): single-quoted spanning a blank line
    YamlParse.docToJson("s: 'a\n\n  b'\n") shouldBe Some("""{"s":"a\nb"}""")
    // width=80 wrap of a long plain scalar, then a sibling key
    YamlParse.docToJson("s: aaa bbb\n  ccc ddd\nt: 1\n") shouldBe
      Some("""{"s":"aaa bbb ccc ddd","t":1}""")
    // wrapped single-quoted without blank: break folds to one space
    YamlParse.docToJson("s: 'long text\n  more'\n") shouldBe
      Some("""{"s":"long text more"}""")
    // wrapped list items fold past the dash column
    YamlParse.docToJson("- aaa\n  bbb\n- c\n") shouldBe Some("""["aaa bbb","c"]""")
    // double-quoted explicit break join (trailing backslash, no space)
    YamlParse.docToJson("s: \"ab\\\n  cd\"\n") shouldBe Some("""{"s":"abcd"}""")
    // two blank lines -> two newlines
    YamlParse.docToJson("s: 'a\n\n\n  b'\n") shouldBe Some("""{"s":"a\n\nb"}""")
  }

  test("yaml parser: block scalars match PyYAML (literal/folded, chomping)") {
    // ground truth from yaml.safe_load on the same inputs
    YamlParse.docToJson("s: |\n  line1\n  line2\nt: 1\n") shouldBe
      Some("""{"s":"line1\nline2\n","t":1}""")
    YamlParse.docToJson("s: |-\n  a\n  b\n") shouldBe Some("""{"s":"a\nb"}""")
    YamlParse.docToJson("s: |+\n  a\n\n\nt: 1\n") shouldBe
      Some("""{"s":"a\n\n\n","t":1}""")
    YamlParse.docToJson("s: >\n  a\n  b\n\n  c\n") shouldBe
      Some("""{"s":"a b\nc\n"}""")
    YamlParse.docToJson("s: |\n  def f():\n    pass\n") shouldBe
      Some("""{"s":"def f():\n  pass\n"}""")
    YamlParse.docToJson("s: |\n  # not a comment\nt: 2\n") shouldBe
      Some("""{"s":"# not a comment\n","t":2}""")
    YamlParse.docToJson("s: >-\n  x\n  y\n") shouldBe Some("""{"s":"x y"}""")
  }

  test("yaml parser: document markers only at column 0; scalars may contain '---'") {
    // safe_dump({'s': 'a\n---\nb'}) folds the marker-looking line into
    // a multi-line quoted scalar — NOT a document split
    YamlParse.docsToJson("s: 'a\n\n  ---\n\n  b'\n") shouldBe Seq("""{"s":"a\n---\nb"}""")
    // block scalar containing a '---' content line
    YamlParse.docsToJson("s: |\n  ---\n  a\n") shouldBe Seq("""{"s":"---\na\n"}""")
    // a column-0 marker still splits
    YamlParse.docsToJson("a: 1\n---\nb: 2\n").length shouldBe 2
  }

  test("yaml parser: review regressions — nested-list blanks, folded comments, escapes") {
    // blank/comment lines between nested inline-list items
    YamlParse.docToJson("- - a\n\n  - b\n") shouldBe Some("""[["a","b"]]""")
    YamlParse.docToJson("- - a\n  # note\n  - b\n") shouldBe Some("""[["a","b"]]""")
    // trailing comment on a folded continuation line is not content
    YamlParse.docToJson("s: aaa\n  bbb # note\n") shouldBe Some("""{"s":"aaa bbb"}""")
    // plain folding across a blank line -> newline (PyYAML semantics)
    YamlParse.docToJson("k: aaa\n\n  bbb\n") shouldBe Some("""{"k":"aaa\nbbb"}""")
    // truncated \u escape raises IAE, never StringIndexOutOfBounds
    an[IllegalArgumentException] should be thrownBy
      YamlParse.docsToJson("s: \"a\\u12\n")
    // flow collections as LIST ITEMS must not key-split on an inner
    // ':' — "- {k: v, m: {a: b}}" is one flow map, not a "{k" key
    YamlParse.docToJson("- {k: v, m: {a: b}}\n- [1, 2]\n") shouldBe
      Some("""[{"k":"v","m":{"a":"b"}},[1,2]]""")
    // ...and as a TOP-LEVEL flow document (safe_dump default_flow_style)
    YamlParse.docToJson("{k: v, m: {a: b}}\n") shouldBe
      Some("""{"k":"v","m":{"a":"b"}}""")
    YamlParse.docToJson("[{k: v}]\n") shouldBe Some("""[{"k":"v"}]""")
  }

  test("yaml parser: reference-repo fixtures parse exactly as PyYAML does") {
    // expected JSON generated by yaml.safe_load on the same files
    val nested = java.nio.file.Paths.get("/root/reference/tests/input/nested-target.yaml")
    assume(java.nio.file.Files.exists(nested))
    val docs = YamlParse.docsToJson(Files.readString(nested))
    docs.length shouldBe 1
    docs.head should startWith(
      """[{"paper":{"abstract":"eric likes cheese, dave likes football"},""" +
      """"triples":[{"subject":"eric","predicate":"likes","object":"cheese"}""")
    docs.head should include(""""triples":[]""")

    val conf = java.nio.file.Paths.get(
      "/root/reference/tests/input/countries/countries.config.yaml")
    assume(java.nio.file.Files.exists(conf))
    YamlParse.docsToJson(Files.readString(conf)).head shouldBe
      """{"databases":{"countries_db":{"handle":"duckdb:///{base_dir}/countries.db",""" +
      """"schema_location":"{base_dir}/countries.linkml.yaml",""" +
      """"collections":{"countries":{"type":"Country"}}}}}"""
  }

  test("yaml parser: malformed input raises instead of silently dropping") {
    an[IllegalArgumentException] should be thrownBy
      YamlParse.docToJson("a: 1\nnot a map entry\n")
    an[IllegalArgumentException] should be thrownBy
      YamlParse.scalar("'unterminated")
  }

  test("xlsx: cell refs, column letters, nulls and types") {
    XlsxIO.ref(0, 1) shouldBe "A1"
    XlsxIO.ref(25, 3) shouldBe "Z3"
    XlsxIO.ref(26, 2) shouldBe "AA2"
    XlsxIO.ref(701, 9) shouldBe "ZZ9"
    XlsxIO.colOf("A1") shouldBe 0
    XlsxIO.colOf("AA12") shouldBe 26
    val p = tmp("typed.xlsx")
    val typed = Seq((1L, "x<&>y", true, 1.5), (2L, null, false, -3.0))
      .toDF("id", "s", "flag", "v")
    Formats.write(typed, p, "xlsx")
    val back = Formats.read(spark, p, "xlsx").orderBy("id")
    back.count() shouldBe 2
    val r = back.collect()(0)
    r.getAs[Long]("id") shouldBe 1L
    r.getAs[String]("s") shouldBe "x<&>y"
    r.getAs[Boolean]("flag") shouldBe true
    r.getAs[Double]("v") shouldBe 1.5
    back.collect()(1).isNullAt(back.columns.indexOf("s")) shouldBe true
  }

  test("toml read: tables, arrays of tables, inline tables, typed values") {
    val doc =
      """# config-style document
        |title = "demo"
        |count = 1_000
        |ratio = 0.5
        |ok = true
        |created = 2024-01-02T03:04:05Z
        |tags = [
        |  "a", # inline comment
        |  "b",
        |]
        |point = { x = 1, y = -2 }
        |
        |[owner.contact]
        |email = 'raw\literal@example.com'
        |
        |[[servers]]
        |host = "alpha"
        |port = 8001
        |
        |[[servers]]
        |host = "beta"
        |port = 8002
        |""".stripMargin
    TomlParse.tomlToJson(doc) shouldBe
      """{"title":"demo","count":1000,"ratio":0.5,"ok":true,""" +
      """"created":"2024-01-02T03:04:05Z","tags":["a","b"],""" +
      """"point":{"x":1,"y":-2},""" +
      """"owner":{"contact":{"email":"raw\\literal@example.com"}},""" +
      """"servers":[{"host":"alpha","port":8001},{"host":"beta","port":8002}]}"""
    val p = tmp("conf.toml")
    Files.writeString(java.nio.file.Paths.get(p), doc)
    val back = Formats.read(spark, p, "toml")
    back.count() shouldBe 1
    val r = back.collect().head
    r.getAs[Long]("count") shouldBe 1000L
    r.getAs[org.apache.spark.sql.Row]("point").getAs[Long]("x") shouldBe 1L
    an[UnsupportedOperationException] should be thrownBy Formats.write(df, tmp("t.toml"), "toml")
  }

  test("toml parser: multiline strings and malformed input") {
    TomlParse.tomlToJson("s = \"\"\"\nline1\nline2\"\"\"\n") shouldBe
      """{"s":"line1\nline2"}"""
    TomlParse.tomlToJson("s = '''raw \\ text'''\n") shouldBe
      """{"s":"raw \\ text"}"""
    an[IllegalArgumentException] should be thrownBy TomlParse.parse("just words\n")
    an[IllegalArgumentException] should be thrownBy TomlParse.parse("a = 1\na = 2\n")
  }

  test("xlsx export refuses oversized frames") {
    an[IllegalArgumentException] should be thrownBy
      XlsxIO.write(df, tmp("big.xlsx"), maxRows = 2)
  }

  test("toml multiline basic strings decode the full escape set, same as single-line") {
    // \f, \b, \U and bad-escape behavior must not differ between the
    // two basic-string forms (they share one decoder)
    TomlParse.tomlToJson("s = \"\"\"a\\fb\\bc\\U0001F600d\\u0041\"\"\"\n") shouldBe
      TomlParse.tomlToJson("s = \"a\\fb\\bc\\U0001F600d\\u0041\"\n")
    an[IllegalArgumentException] should be thrownBy
      TomlParse.parse("s = \"\"\"bad \\q escape\"\"\"\n")
    an[IllegalArgumentException] should be thrownBy
      TomlParse.parse("s = \"bad \\q escape\"\n")
  }

  test("toml duplicate table definitions raise (TOML 1.0)") {
    an[IllegalArgumentException] should be thrownBy
      TomlParse.parse("[a]\nx = 1\n[a]\ny = 2\n")
    // [t] over a table created via dotted keys
    an[IllegalArgumentException] should be thrownBy
      TomlParse.parse("a.b = 1\n[a]\nx = 2\n")
    // [t] over an array of tables
    an[IllegalArgumentException] should be thrownBy
      TomlParse.parse("[[a]]\nx = 1\n[a]\ny = 2\n")
    // legal: the same sub-table path under successive array elements
    TomlParse.tomlToJson(
      "[[fruit]]\n[fruit.physical]\ncolor = \"red\"\n" +
      "[[fruit]]\n[fruit.physical]\ncolor = \"green\"\n") shouldBe
      """{"fruit":[{"physical":{"color":"red"}},{"physical":{"color":"green"}}]}"""
    // legal: super-table header after its sub-table header
    TomlParse.tomlToJson("[a.b]\nx = 1\n[a]\ny = 2\n") shouldBe
      """{"a":{"b":{"x":1},"y":2}}"""
  }

  test("xlsx sparse rows: r-less cells resync to the previous explicit ref") {
    // row 2 holds an explicit B2 then an r-less cell — the r-less cell
    // is column C (next after B), not a blind second-position B
    val sheet =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="str"><v>a</v></c><c r="B1" t="str"><v>b</v></c><c r="C1" t="str"><v>c</v></c></row>
        |<row r="2"><c r="B2"><v>2</v></c><c><v>3</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val p = tmp("sparse.xlsx")
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(p))
    zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write(sheet.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    XlsxIO.readJsonLines(p) shouldBe Seq("""{"b":2,"c":3}""")
  }

  test("tsv rendering quotes embedded separators like csv") {
    val tricky = Seq((1L, "has\ttab", "has\nnewline"), (2L, "plain", "x"))
      .toDF("id", "a", "b")
    val tsv = Render.render(tricky, "tsv", 10)
    tsv.head shouldBe "id\ta\tb"
    tsv(1) shouldBe "1\t\"has\ttab\"\t\"has\nnewline\""
    tsv(2) shouldBe "2\tplain\tx"
    val csv = Render.render(tricky, "csv", 10)
    csv(1) shouldBe "1,has\ttab,\"has\nnewline\"" // tab needs no csv quote
  }

  test("yaml integers past Long range stay numeric, matching PyYAML") {
    YamlParse.docToJson("big: 18446744073709551616\nsmall: 3").get shouldBe
      """{"big":18446744073709551616,"small":3}"""
    val p = tmp("big.yaml")
    Files.writeString(java.nio.file.Paths.get(p), "big: 18446744073709551616\n")
    val back = Formats.read(spark, p, "yaml")
    // Spark JSON inference types >Long digits as decimal — numeric, not string
    back.schema("big").dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] shouldBe true
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

  test("gzip-compressed jsonl/csv read transparently (reference compression support)") {
    val dir = Files.createTempDirectory("graft-gz")
    def gz(name: String, content: String): String = {
      val p = dir.resolve(name)
      val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(p))
      out.write(content.getBytes("UTF-8")); out.close()
      p.toString
    }
    val jl = gz("rows.jsonl.gz", "{\"id\": 1, \"v\": \"a\"}\n{\"id\": 2, \"v\": \"b\"}\n")
    Formats.Jsonl.read(spark, jl).count() shouldBe 2
    val cs = gz("rows.csv.gz", "id,v\n1,a\n2,b\n3,c\n")
    val got = Formats.Csv.read(spark, cs)
    got.count() shouldBe 3
    got.columns.toSeq shouldBe Seq("id", "v")
  }
}
