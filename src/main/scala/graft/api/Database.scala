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
      case Some(db) => db.listCollectionNames.foreach(db.dropCollection)
      case None if missingOk => ()
      case None => throw new NoSuchElementException(s"no database '$dbName' attached")
    }

  /** Drop every attached database (reference: client.py:391). */
  def dropAllDatabases(): Unit =
    dbs.keys.toSeq.foreach(dropDatabase(_))
}
