package graft.api

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import scala.jdk.CollectionConverters._

/** Declared lineage of a derived collection (reference:
  * src/linkml_store/api/collection.py:727-778 _materialize_derivations
  * — derived_from carries source collection, `where` and slot
  * `mappings`). `where` is a SQL predicate over the source; `mappings`
  * are (targetColumn, sourceExpression) pairs evaluated by Catalyst,
  * so a mapping can rename (`"name"`), compute (`"price * qty"`), or
  * restructure (`"named_struct(...)"`). Order is preserved in the
  * materialized schema.
  */
final case class Derivation(
    source: String,
    where: Option[String],
    mappings: Seq[(String, String)])

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
    val dir = dirOf(collName)
    require(Files.exists(dir), s"no collection '$collName' in database $name")
    require(!Files.exists(dir.resolve("_BUCKETED")),
      s"'$collName' is a bucketed collection — open it with bucketedCollection")
    // a declared-but-unmaterialized collection populates at attach
    // time (reference load_from_source / _materialize_derivations run
    // lazily on first touch)
    if (!Files.exists(dir.resolve("_CURRENT"))) {
      if (Files.exists(dir.resolve("_SOURCE"))) loadFromSource(collName)
      else if (Files.exists(dir.resolve("_DERIVED"))) rematerializeDerived(collName)
    }
    new ParquetCollection(spark, dir.toString, collName)
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

  /** Create the LARGE-TABLE tier of [[createCollection]]: a pk-bucketed
    * store whose mutations rewrite only touched buckets (see
    * [[BucketedParquetCollection]] — at 1000 buckets an upsert of a few
    * keys rewrites ~0.1% of a 100 TB table, where ParquetCollection
    * rewrites everything). The (pk, nBuckets) layout persists in a
    * `_BUCKETED` meta file so [[bucketedCollection]] can reopen it.
    */
  def createBucketedCollection(collName: String, rows: DataFrame, pk: String,
      nBuckets: Int = 16): BucketedParquetCollection = {
    val dir = dirOf(collName)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("_BUCKETED"), s"$pk,$nBuckets")
    val c = new BucketedParquetCollection(spark, dir.toString, collName, pk, nBuckets)
    c.replace(rows)
    c
  }

  /** Reopen a bucketed collection created by [[createBucketedCollection]]
    * (layout read back from its `_BUCKETED` meta file).
    */
  def bucketedCollection(collName: String): BucketedParquetCollection = {
    val dir = dirOf(collName)
    val meta = dir.resolve("_BUCKETED")
    require(Files.exists(meta), s"no bucketed collection '$collName' in database $name")
    val Array(pk, n) = Files.readString(meta).trim.split(",")
    new BucketedParquetCollection(spark, dir.toString, collName, pk, n.toInt)
  }

  // ------------------------------------------------------ derived collections

  /** One-line `k<TAB>v` spec files beside the snapshots: humans can
    * read them, and values (SQL expressions, globs) may contain '='.
    * Tabs/newlines are legal in SQL where-clauses and column names, so
    * both sides are backslash-escaped — the record separators stay
    * unambiguous.
    */
  private def escSpec(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t")
      .replace("\n", "\\n").replace("\r", "\\r")

  private def unescSpec(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb += '\t'
          case 'n' => sb += '\n'
          case 'r' => sb += '\r'
          case '\\' => sb += '\\'
          case other => sb += '\\' += other
        }
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def writeSpec(file: Path, entries: Seq[(String, String)]): Unit =
    Files.writeString(file,
      entries.map { case (k, v) => s"${escSpec(k)}\t${escSpec(v)}" }.mkString("", "\n", "\n"))

  private def readSpec(file: Path): Seq[(String, String)] =
    Files.readString(file).split('\n').toSeq.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      require(i > 0, s"malformed spec line in $file: '$line'")
      unescSpec(line.substring(0, i)) -> unescSpec(line.substring(i + 1))
    }

  /** Declare AND materialize a collection derived from another
    * (reference collection.py:727-778): rows of `d.source` matching
    * `d.where`, transformed by `d.mappings` — one declarative
    * filter+project plan, so pushdown/pruning reach the source scan.
    * The derivation spec persists beside the snapshots;
    * [[rematerializeDerived]] refreshes after source changes.
    */
  def createDerivedCollection(collName: String, d: Derivation): ParquetCollection = {
    require(d.mappings.nonEmpty, s"no mappings for derived collection '$collName'")
    val dir = dirOf(collName)
    Files.createDirectories(dir)
    writeSpec(dir.resolve("_DERIVED"),
      ("source" -> d.source) +:
        d.where.map("where" -> _).toSeq ++:
        d.mappings.map { case (t, e) => s"map.$t" -> e })
    rematerializeDerived(collName)
    new ParquetCollection(spark, dir.toString, collName)
  }

  /** The persisted derivation of a derived collection, if any. */
  def derivationOf(collName: String): Option[Derivation] = {
    val f = dirOf(collName).resolve("_DERIVED")
    if (!Files.exists(f)) None
    else {
      val entries = readSpec(f)
      Some(Derivation(
        source = entries.collectFirst { case ("source", v) => v }
          .getOrElse(throw new IllegalStateException(s"derivation of '$collName' names no source")),
        where = entries.collectFirst { case ("where", v) => v },
        mappings = entries.collect { case (k, v) if k.startsWith("map.") =>
          k.stripPrefix("map.") -> v }))
    }
  }

  /** Re-run a derived collection's transform over the CURRENT source
    * snapshot and swap it in as the next version.
    */
  /** Derivations currently materializing on this thread — guards the
    * collection() → rematerializeDerived() → collection(source)
    * recursion against self- or mutually-cyclic derivations created
    * via the direct API (fromConfig validates cycles up front; the API
    * must not StackOverflow on the same input).
    */
  private val materializing = new scala.collection.mutable.LinkedHashSet[String]()

  def rematerializeDerived(collName: String): Unit = {
    val d = derivationOf(collName).getOrElse(
      throw new IllegalArgumentException(s"'$collName' is not a derived collection"))
    if (materializing.contains(collName))
      throw new IllegalArgumentException(
        s"cyclic derivation: ${(materializing.toSeq :+ collName).mkString(" -> ")}")
    materializing += collName
    try {
      val src = collection(d.source).df
      val filtered = d.where.map(w => src.filter(expr(w))).getOrElse(src)
      val out = filtered.select(d.mappings.map { case (t, e) => expr(e).as(t) }: _*)
      new ParquetCollection(spark, dirOf(collName).toString, collName).replace(out)
    } finally materializing -= collName
  }

  /** Refresh every derived collection (dependency-free derivations:
    * sources are ordinary collections; re-run in name order).
    */
  def materializeDerivations(): Unit =
    listCollectionNames.filter(c => Files.exists(dirOf(c).resolve("_DERIVED")))
      .foreach(rematerializeDerived)

  // ----------------------------------------------------------- local sources

  /** Declare a collection populated from a local path/glob via the
    * Formats registry (reference collection.py:689 load_from_source —
    * network sources stay out of scope). Loads immediately unless the
    * collection already holds data.
    */
  def declareSource(collName: String, path: String, format: String = null): ParquetCollection = {
    val dir = dirOf(collName)
    Files.createDirectories(dir)
    writeSpec(dir.resolve("_SOURCE"),
      Seq("path" -> path) ++ Option(format).map("format" -> _))
    loadFromSource(collName)
    new ParquetCollection(spark, dir.toString, collName)
  }

  /** (Re)load a source-declared collection. With `loadIfExists=false`
    * (the reference default) an already-populated collection is left
    * untouched; `true` re-reads the source and REPLACES the snapshot.
    */
  def loadFromSource(collName: String, loadIfExists: Boolean = false): Unit = {
    val dir = dirOf(collName)
    val f = dir.resolve("_SOURCE")
    require(Files.exists(f), s"'$collName' declares no source")
    if (Files.exists(dir.resolve("_CURRENT")) && !loadIfExists) return
    val entries = readSpec(f)
    val path = entries.collectFirst { case ("path", v) => v }
      .getOrElse(throw new IllegalStateException(s"source of '$collName' names no path"))
    val format = entries.collectFirst { case ("format", v) => v }.orNull
    new ParquetCollection(spark, dir.toString, collName)
      .replace(graft.io.Formats.read(spark, path, format))
  }

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
  private var defaultDbName: Option[String] = None

  def attachDatabase(dbName: String, root: String): Database = {
    val db = new Database(spark, root, dbName)
    dbs(dbName) = db
    db
  }

  def database(dbName: String): Database =
    dbs.getOrElse(dbName, throw new NoSuchElementException(s"no database '$dbName' attached"))

  /** The config-declared default database (reference get_database(None)
    * — client.py:261 resolves a missing name to the configured
    * default). Requires a `default_database` in the loaded config and
    * that database attached.
    */
  def database(): Database = {
    val name = defaultDbName.getOrElse(
      throw new NoSuchElementException("no default_database declared in the loaded config"))
    database(name)
  }

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

  /** Attach databases and collections from a YAML config file
    * (reference: client.py:117 from_config + api/config.py
    * ClientConfig/DatabaseConfig/CollectionConfig). Supported keys —
    * the local-engine subset of the reference model:
    *
    * {{{
    * base_dir: /data               # resolves relative handles/paths
    * default_database: db1
    * databases:
    *   db1:
    *     handle: warehouse/db1     # directory root; file:// ok
    *     collections:
    *       docs:
    *         source: {local_path: in/docs.jsonl, format: jsonl}
    *         derived_from:
    *           - {collection: docs, where: "quality > 0.5",
    *              mappings: {id: doc_id, text: "upper(text)"}}
    *         indexers:
    *           ix: {index_attributes: [title, text], id_attribute: id}
    * }}}
    *
    * With `autoAttach=false` (the reference default) the config is
    * validated and database handles resolved but nothing attaches.
    * Network sources (url) are out of scope and rejected. All
    * loads/materializations run through the same Formats/derivation/
    * indexer paths the explicit API uses.
    */
  def fromConfig(path: String, autoAttach: Boolean = false): Client = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val cfg = graft.io.YamlParse.docToValue(text) match {
      case Some(m: scala.collection.Map[_, _]) =>
        m.map { case (k, v) => String.valueOf(k) -> v }
      case other => throw new IllegalArgumentException(
        s"config '$path' must be a YAML mapping, got ${other.map(_.getClass.getSimpleName)}")
    }
    def str(v: Any): String = String.valueOf(v)
    // the parser yields mutable LinkedHashMaps / buffers; view them
    // uniformly without caring which concrete collection arrived
    def asMap(v: Any): scala.collection.Map[String, Any] = v match {
      case m: scala.collection.Map[_, _] => m.map { case (k, mv) => String.valueOf(k) -> mv }
      case other => throw new IllegalArgumentException(s"expected a mapping, got $other")
    }
    def asSeq(v: Any): scala.collection.Seq[Any] = v match {
      case xs: scala.collection.Seq[_] => xs
      case other => throw new IllegalArgumentException(s"expected a list, got $other")
    }
    val baseDir = cfg.get("base_dir").map(str)
      .getOrElse(Option(java.nio.file.Paths.get(path).getParent).map(_.toString).getOrElse("."))
    def resolve(p: String): String = {
      val clean = p.stripPrefix("file://").stripPrefix("parquet://")
      if (java.nio.file.Paths.get(clean).isAbsolute) clean
      else java.nio.file.Paths.get(baseDir, clean).toString
    }
    // ---- parse pass (IS the validation — runs regardless of autoAttach)
    final case class CollSpec(name: String,
        source: Option[(String, Option[String])],
        derivations: Seq[Derivation],
        indexers: Seq[(String, Seq[String])])
    final case class DbSpec(name: String, root: String, colls: Seq[CollSpec])
    val specs: Seq[DbSpec] =
      cfg.get("databases").map(asMap).getOrElse(Map.empty[String, Any]).toSeq.map {
        case (dbName, dbCfgAny) =>
          val dbCfg = asMap(dbCfgAny)
          val handle = dbCfg.get("handle").map(str).getOrElse(
            throw new IllegalArgumentException(s"database '$dbName' has no handle"))
          val colls = dbCfg.get("collections").map(asMap).getOrElse(Map.empty[String, Any])
            .toSeq.map { case (collName, cAny) =>
              val c = asMap(cAny)
              val source = c.get("source").map { srcAny =>
                val src = asMap(srcAny)
                require(!src.contains("url"),
                  s"collection '$collName': network sources are out of scope")
                val local = src.get("local_path").map(str).getOrElse(
                  throw new IllegalArgumentException(s"collection '$collName' source has no local_path"))
                (resolve(local), src.get("format").map(str))
              }
              val derivations = c.get("derived_from").map(asSeq).getOrElse(Nil).map { dAny =>
                val d = asMap(dAny)
                Derivation(
                  source = d.get("collection").map(str).getOrElse(
                    throw new IllegalArgumentException(s"derivation of '$collName' names no collection")),
                  where = d.get("where").map(str),
                  mappings = d.get("mappings").map(asMap).getOrElse(Map.empty[String, Any])
                    .map { case (t, e) => t -> str(e) }.toSeq)
              }.toSeq
              val indexers = c.get("indexers").map(asMap).getOrElse(Map.empty[String, Any])
                .toSeq.map { case (_, ixCfgAny) =>
                  val ix = asMap(ixCfgAny)
                  val attrs = ix.get("index_attributes").map(asSeq).getOrElse(Nil).map(str)
                  require(attrs.nonEmpty, s"indexer on '$collName' lists no index_attributes")
                  val idAttr = ix.get("id_attribute").map(str).getOrElse(
                    throw new IllegalArgumentException(s"indexer on '$collName' needs id_attribute"))
                  (idAttr, attrs.toSeq)
                }
              CollSpec(collName, source, derivations, indexers)
            }
          DbSpec(dbName, resolve(handle), colls)
      }
    cfg.get("default_database").map(str).foreach { d =>
      require(specs.exists(_.name == d),
        s"default_database '$d' is not declared under databases")
      defaultDbName = Some(d)
    }
    if (!autoAttach) return this
    // ---- attach pass
    specs.foreach { dbSpec =>
      val db = attachDatabase(dbSpec.name, dbSpec.root)
      // sources first: a derivation may name a sibling declared later
      dbSpec.colls.foreach { c =>
        c.source.foreach { case (p, fmt) => db.declareSource(c.name, p, fmt.orNull) }
      }
      // derivations to a fixpoint: a derived collection may derive
      // from ANOTHER derived collection declared in any order
      var pending = dbSpec.colls.flatMap(c => c.derivations.map(c.name -> _))
      var progress = true
      while (pending.nonEmpty && progress) {
        // a source that is ITSELF still pending is not ready even if a
        // stale snapshot from a prior run sits on disk — materializing
        // from it would silently bake the parent's previous definition
        // into the child
        val pendingNames = pending.map(_._1).toSet
        val (ready, rest) = pending.partition { case (_, d) =>
          !pendingNames.contains(d.source) &&
            (Files.exists(Paths.get(db.root, d.source, "_CURRENT")) ||
              Files.exists(Paths.get(db.root, d.source, "_SOURCE")))
        }
        progress = ready.nonEmpty
        ready.foreach { case (collName, d) => db.createDerivedCollection(collName, d) }
        pending = rest
      }
      require(pending.isEmpty,
        s"unresolvable derivations (missing or cyclic sources): ${pending.map(_._1).distinct.mkString(", ")}")
      dbSpec.colls.foreach { c =>
        c.indexers.foreach { case (idAttr, attrs) =>
          db.collection(c.name).attachIndex(idAttr, attrs)
        }
      }
    }
    this
  }
}
