package graft.io

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Format registry for import/export — the engine analog of the
  * reference's Format enum + load/render helpers (reference:
  * src/linkml_store/utils/format_utils.py:24-210; collection.py:
  * 1167-1186 import_/export). Supported: parquet, csv, tsv, json
  * (array document), jsonl (one object per line), yaml (one list
  * document) / yamll (one `---`-separated document per row, written
  * distributed), xlsx, and READ-side toml (one object per file, like
  * the reference's read-only tomllib). The zero-egress container
  * carries no YAML/xlsx/toml library, so these ride hand-rolled
  * pure-JDK codecs: [[YamlRender]] (writer) / [[YamlParse]] /
  * [[TomlParse]] (parsers → JSON → distributed `spark.read.json`
  * inference) and [[XlsxIO]] (zip + StAX over the OOXML parts).
  *
  * All readers/writers are Spark sources: reads parallelize per file
  * split, writes shard per partition. `json` (array) READS distributed
  * (multiLine); its WRITE is driver-side by necessity (a single JSON
  * array is inherently sequential) and guarded by a row cap — use
  * `jsonl` for large exports. Same contract for `yaml` (single
  * document) vs `yamll` (distributed).
  */
object Formats {

  sealed abstract class Format(val name: String, val extensions: Seq[String]) {
    def read(spark: SparkSession, path: String): DataFrame
    def write(df: DataFrame, path: String): Unit
  }

  case object Parquet extends Format("parquet", Seq("parquet")) {
    def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
    def write(df: DataFrame, path: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(path)
  }

  // ORC: the other columnar format Spark carries natively — warehouse
  // interop (Hive/Trino ORC tables) costs one registry entry
  case object Orc extends Format("orc", Seq("orc")) {
    def read(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)
    def write(df: DataFrame, path: String): Unit =
      df.write.mode(SaveMode.Overwrite).orc(path)
  }

  private def csvReader(spark: SparkSession, sep: String): DataFrameReader =
    spark.read.option("header", "true").option("inferSchema", "true").option("sep", sep)

  /** Spark's csv WRITER trims leading/trailing whitespace by default
    * (ignore*WhiteSpace default true on write, false on read) — padded
    * values are data, so both formats disable the trim.
    */
  private def csvWriter(df: DataFrame, sep: String) =
    df.write.mode(SaveMode.Overwrite).option("header", "true").option("sep", sep)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")

  case object Csv extends Format("csv", Seq("csv")) {
    def read(spark: SparkSession, path: String): DataFrame = csvReader(spark, ",").csv(path)
    def write(df: DataFrame, path: String): Unit = csvWriter(df, ",").csv(path)
  }

  case object Tsv extends Format("tsv", Seq("tsv", "tab")) {
    def read(spark: SparkSession, path: String): DataFrame = csvReader(spark, "\t").csv(path)
    def write(df: DataFrame, path: String): Unit = csvWriter(df, "\t").csv(path)
  }

  case object Jsonl extends Format("jsonl", Seq("jsonl", "ndjson")) {
    def read(spark: SparkSession, path: String): DataFrame = spark.read.json(path)
    def write(df: DataFrame, path: String): Unit =
      df.write.mode(SaveMode.Overwrite).json(path)
  }

  case object Json extends Format("json", Seq("json")) {
    def read(spark: SparkSession, path: String): DataFrame =
      spark.read.option("multiLine", "true").json(path)
    /** Driver-side single-array export; refuses unboundedly large frames. */
    def write(df: DataFrame, path: String): Unit = write(df, path, maxRows = 1000000)
    def write(df: DataFrame, path: String, maxRows: Long): Unit = {
      val rows = df.limit((maxRows + 1).toInt).toJSON.collect()
      require(rows.length <= maxRows,
        s"json (array) export exceeds $maxRows rows; use jsonl for large exports")
      val body = rows.mkString("[\n", ",\n", "\n]")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), body)
    }
  }

  case object Yaml extends Format("yaml", Seq("yaml", "yml")) {
    /** Whole-file documents (the single-document export shape is one
      * list; multi-doc files work too). Parsing runs per file in
      * executors; a top-level list document explodes one row per
      * element (Spark's JSON source semantics for top-level arrays).
      */
    def read(spark: SparkSession, path: String): DataFrame = {
      import spark.implicits._
      val docs = spark.read.option("wholetext", "true").textFile(path)
        .flatMap(t => YamlParse.docsToJson(t))
      spark.read.json(docs)
    }
    /** Driver-side single-document export; refuses unboundedly large frames. */
    def write(df: DataFrame, path: String): Unit = write(df, path, maxRows = 1000000)
    def write(df: DataFrame, path: String, maxRows: Long): Unit = {
      val rows = df.limit((maxRows + 1).toInt).collect()
      require(rows.length <= maxRows,
        s"yaml (single document) export exceeds $maxRows rows; use yamll for large exports")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        YamlRender.renderDoc(rows.toSeq))
    }
  }

  case object Yamll extends Format("yamll", Seq("yamll")) {
    /** Distributed read: documents split on the `\n---` separator via
      * the text source's multi-char lineSep — one task per file split,
      * never whole-file (a multi-line string scalar can't contain a
      * raw newline in the rendered subset, so the separator is
      * unambiguous). Each document parses in-executor to JSON;
      * `spark.read.json` infers the schema.
      */
    def read(spark: SparkSession, path: String): DataFrame = {
      import spark.implicits._
      val docs = spark.read.option("lineSep", "\n---").textFile(path)
        .flatMap { rec =>
          val body = rec.stripPrefix("---")
          YamlParse.docsToJson(body)
        }
      spark.read.json(docs)
    }
    /** Distributed: each row renders to its own `---`-prefixed YAML
      * document, sharded per partition like any Spark text write.
      */
    def write(df: DataFrame, path: String): Unit =
      df.map(r => "---\n" + YamlRender.renderRow(r))(
          org.apache.spark.sql.Encoders.STRING)
        .write.mode(SaveMode.Overwrite).text(path)
  }

  case object Xlsx extends Format("xlsx", Seq("xlsx")) {
    def read(spark: SparkSession, path: String): DataFrame = XlsxIO.read(spark, path)
    /** Driver-side single-workbook export, capped at Excel's own
      * sheet limit (same contract as the json-array/yaml exports).
      */
    def write(df: DataFrame, path: String): Unit = XlsxIO.write(df, path)
  }

  case object Toml extends Format("toml", Seq("toml")) {
    /** One object per .toml file (reference: tomllib.load → a single
      * dict), parsed in-executor, schema via JSON inference.
      */
    def read(spark: SparkSession, path: String): DataFrame = {
      import spark.implicits._
      val docs = spark.read.option("wholetext", "true").textFile(path)
        .map(t => TomlParse.tomlToJson(t))
      spark.read.json(docs)
    }
    def write(df: DataFrame, path: String): Unit =
      throw new UnsupportedOperationException(
        "toml WRITE is out of scope (the reference's tomllib is read-only)")
  }

  val all: Seq[Format] = Seq(Parquet, Orc, Csv, Tsv, Jsonl, Json, Yaml, Yamll, Xlsx, Toml)

  def byName(name: String): Format =
    all.find(_.name == name.toLowerCase).getOrElse(
      throw new IllegalArgumentException(
        s"unknown format '$name' (supported: ${all.map(_.name).mkString(", ")})"))

  /** Infer from the file extension (reference guess_format). */
  def fromPath(path: String): Format = {
    val ext = path.reverse.takeWhile(_ != '.').reverse.toLowerCase
    all.find(_.extensions.contains(ext)).getOrElse(
      throw new IllegalArgumentException(s"cannot infer format from '$path'"))
  }

  def read(spark: SparkSession, path: String, format: String = null): DataFrame =
    (if (format == null) fromPath(path) else byName(format)).read(spark, path)

  def write(df: DataFrame, path: String, format: String = null): Unit =
    (if (format == null) fromPath(path) else byName(format)).write(df, path)

  /** Multi-file / glob ingest with file provenance (reference: CLI
    * insert accepts globs and records source_field) — Spark readers
    * accept globs natively; `input_file_name()` stamps each row with
    * its origin, evaluated at scan time (no extra pass).
    */
  def readGlob(
      spark: SparkSession,
      pattern: String,
      format: String,
      sourceField: String = "source_file"): DataFrame =
    byName(format).read(spark, pattern)
      .withColumn(sourceField, input_file_name())
}
