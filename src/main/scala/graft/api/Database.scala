package graft.api

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** A database = a directory of named parquet-backed collections — the
  * engine analog of the reference Database (reference:
  * src/linkml_store/api/database.py: create_collection /
  * get_collection / list_collection_names / drop). Each collection is a
  * [[ParquetCollection]] (versioned snapshots, atomic swap).
  */
class Database(val spark: SparkSession, val root: String, val name: String) {
  Files.createDirectories(Paths.get(root))

  private def dirOf(coll: String) = Paths.get(root, coll)

  def createCollection(collName: String, rows: DataFrame): ParquetCollection = {
    val c = new ParquetCollection(spark, dirOf(collName).toString, collName)
    c.replace(rows)
    c
  }

  def collection(collName: String): ParquetCollection = {
    require(Files.exists(dirOf(collName)), s"no collection '$collName' in database $name")
    new ParquetCollection(spark, dirOf(collName).toString, collName)
  }

  def listCollectionNames: Seq[String] =
    if (!Files.exists(Paths.get(root))) Nil
    else {
      val s = Files.list(Paths.get(root))
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p) && Files.exists(p.resolve("_CURRENT")))
        .map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }

  def dropCollection(collName: String): Unit = {
    val d = dirOf(collName)
    if (Files.exists(d)) {
      val s = Files.walk(d)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
  }

  /** Attach an EXTERNAL read-only table (e.g. driver test parquet) as a
    * queryable Collection without copying it.
    */
  def attachParquet(collName: String, path: String): Collection =
    new Collection(collName, spark.read.parquet(path))

  /** Store a map of named object sets in one call (reference:
    * database.py:197-240 store — a dict keyed by collection name
    * inserts into each collection, creating missing ones).
    */
  def store(objects: Map[String, DataFrame]): Unit = {
    val existing = listCollectionNames.toSet
    objects.foreach { case (collName, rows) =>
      if (existing(collName)) collection(collName).insert(rows)
      else createCollection(collName, rows)
    }
  }

  /** Save rows as a Spark BUCKETED table (bucketBy + sortBy on the
    * join key) registered in the session catalog, stored under the
    * database root. Two tables bucketed on the same key with the same
    * bucket count join WITHOUT any exchange — the co-location lever
    * for repeated fact-fact joins: at 100 TB, pre-bucketing both fact
    * tables turns every subsequent join on that key into a zip of
    * already-sorted buckets (no shuffle, no sort). Collections remain
    * the mutable CRUD surface; bucketed tables are the read-optimized
    * layout for join-heavy analytics.
    *
    * The catalog entry is NAMESPACED by this database's name (the
    * session catalog is global — a bare name would let two databases
    * silently overwrite each other's tables); returns the qualified
    * name to query via `spark.table(...)` / [[bucketedTable]].
    * [[Client.dropDatabase]] drops the catalog entries along with the
    * files.
    */
  def saveBucketedTable(tableName: String, rows: DataFrame, key: String,
      nBuckets: Int): String = {
    val qualified = catalogName(tableName)
    rows.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet")
      .option("path", Paths.get(root, "_tables", tableName).toString)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(qualified)
    qualified
  }

  /** The session-catalog name of a bucketed table of this database. */
  def catalogName(tableName: String): String = s"${name}__$tableName"

  /** A bucketed table previously saved by [[saveBucketedTable]]. */
  def bucketedTable(tableName: String): DataFrame =
    spark.table(catalogName(tableName))

  /** Drop every catalog entry this database registered. */
  private[api] def dropCatalogTables(): Unit =
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith(s"${name}__"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `${t.name}`"))

  /** Run ANSI SQL over the database's collections (reference:
    * database.py:445-486 supports_sql / execute_sql — the DuckDB
    * backend's escape hatch). Spark IS a SQL engine: every collection
    * registers as a temp view named after itself, then the statement
    * plans through Catalyst like any DataFrame — pushdown, pruning and
    * AQE all apply.
    */
  def executeSql(sql: String): DataFrame = {
    listCollectionNames.foreach { c =>
      collection(c).df.createOrReplaceTempView(c)
    }
    spark.sql(sql)
  }

  /** Induce a class definition per collection (reference:
    * database.py:610-639 induce_schema_view) — one single-scan
    * induction per collection, returned as an exportable map.
    */
  def induceSchemaView(): Map[String, graft.ops.SchemaInduce.ClassDefinition] =
    listCollectionNames.map { c =>
      c -> graft.ops.SchemaInduce.induceClassDefinition(collection(c).df, c)
    }.toMap

  /** The induced schema view as one JSON document (class name → class
    * definition), round-trippable via [[graft.ops.SchemaInduce.ClassDefinition.fromJson]]
    * per entry.
    */
  def induceSchemaViewJson(): String =
    induceSchemaView().toSeq.sortBy(_._1)
      .map { case (c, cd) => s""""$c":${cd.toJson}""" }
      .mkString("{", ",", "}")

  /** Export every collection to `location/<name>.<ext>` (reference:
    * database.py:823-856 export_database; formats from the registry,
    * so parquet/csv/tsv/jsonl write distributed).
    */
  def exportDatabase(location: String, format: String = "parquet"): Unit = {
    Files.createDirectories(Paths.get(location))
    listCollectionNames.foreach { c =>
      graft.io.Formats.write(collection(c).df,
        Paths.get(location, s"$c.$format").toString, format)
    }
  }

  /** Import every `<name>.<ext>` file under `location` as a collection
    * (reference: database.py:772-821 import_database — the inverse of
    * [[exportDatabase]]).
    */
  def importDatabase(location: String, format: String = "parquet"): Unit = {
    val dir = Paths.get(location)
    require(Files.exists(dir), s"no such directory: $location")
    val s = Files.list(dir)
    val entries =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(s".$format")).toSeq.sorted
      finally s.close()
    entries.foreach { f =>
      val collName = f.stripSuffix(s".$format")
      createCollection(collName,
        graft.io.Formats.read(spark, Paths.get(location, f).toString, format))
    }
  }
}

/** Client: the root handle (reference: src/linkml_store/api/client.py
  * attach_database / get_database). Databases are directories; the
  * handle map is driver-side only — all data stays distributed.
  */
class Client(val spark: SparkSession) {
  private val dbs = scala.collection.mutable.LinkedHashMap[String, Database]()

  def attachDatabase(dbName: String, root: String): Database = {
    val db = new Database(spark, root, dbName)
    dbs(dbName) = db
    db
  }

  def database(dbName: String): Database =
    dbs.getOrElse(dbName, throw new NoSuchElementException(s"no database '$dbName' attached"))

  def databaseNames: Seq[String] = dbs.keys.toSeq

  /** Detach the handle and remove the database's collections on disk
    * (reference: client.py:330 drop_database).
    */
  def dropDatabase(dbName: String, missingOk: Boolean = false): Unit =
    dbs.remove(dbName) match {
      case Some(db) =>
        db.listCollectionNames.foreach(db.dropCollection)
        db.dropCatalogTables()
      case None if missingOk => ()
      case None => throw new NoSuchElementException(s"no database '$dbName' attached")
    }

  /** Drop every attached database (reference: client.py:391). */
  def dropAllDatabases(): Unit =
    dbs.keys.toSeq.foreach(dropDatabase(_))
}
