package graft

import graft.api.{Collection, Query, SortKey}
import graft.query.Filter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thin command-line surface over the engine API — the analog of the
  * reference's `linkml-store` CLI (reference: src/linkml_store/cli.py:
  * query/fq/groupby/describe/pivot/search/schema/validate/diff/export).
  * Every command is a direct call into the same operators the library
  * exposes; the CLI adds only argument parsing and output rendering.
  *
  *   graft.Cli <command> --path <data> [options]
  *
  * Commands: query, fq, describe, pivot, search, schema, validate,
  * diff, export, peek.
  * Common options: --path (input; format inferred from extension or
  * --in-format), --output (written via the Formats registry; default
  * prints TSV to stdout, first --limit rows), --where k=v[,k2=v2]
  * (equality; values auto-typed; `k>v k>=v k<v k<=v k!=v` comparisons).
  */
object Cli {

  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build()
    val code = try run(args.toSeq, spark, Console.out.println(_))
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** Testable entry: parses `args`, runs the command, emits rendered
    * lines through `out`. Returns a process exit code.
    */
  def run(args: Seq[String], spark: SparkSession, out: String => Unit): Int = {
    if (args.isEmpty) { out(usage); return 2 }
    val command = args.head
    try {
      // inside the catch net: malformed flag lists get the same
      // friendly `error: ...` + exit 2 as every other argument error
      val opts = parseOpts(args.tail)
      command match {
        case "query" => emit(opts, out, queryCmd(spark, opts))
        case "fq" =>
          val df = load(spark, opts)
          val cols = opts.getOrElse("columns",
            throw new IllegalArgumentException("fq needs --columns")).split(',').toSeq
          emit(opts, out, new Collection("cli", df)
            .facetsBatched(cols, whereOf(opts), limitOf(opts, 100).toInt))
        case "describe" =>
          val df = load(spark, opts)
          val cols = opts.get("columns").map(_.split(',').toSeq)
            .getOrElse(df.schema.fields.toSeq
              .filter(f => f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
              .map(_.name))
          emit(opts, out, graft.ops.Describe.describe(df, cols))
        case "histogram" =>
          val df = load(spark, opts)
          val c = opts.getOrElse("column",
            throw new IllegalArgumentException("histogram needs --column"))
          val nb = opts.getOrElse("buckets", "20").toInt
          // default range from one bounded min/max aggregate
          val (lo, hi) = (opts.get("min"), opts.get("max")) match {
            case (Some(a), Some(b)) => (a.toDouble, b.toDouble)
            case _ =>
              val r = df.agg(org.apache.spark.sql.functions.min(c),
                org.apache.spark.sql.functions.max(c)).head()
              (opts.get("min").map(_.toDouble).getOrElse(r.getAs[Any](0).toString.toDouble),
                opts.get("max").map(_.toDouble).getOrElse(r.getAs[Any](1).toString.toDouble))
          }
          val w = math.max((hi - lo) / nb, Double.MinPositiveValue)
          emit(opts, out, new graft.api.Collection("t", df)
            .histogram(c, lo, w, nb).orderBy("bucket"))
        case "moments" =>
          val df = load(spark, opts)
          def need(k: String) = opts.getOrElse(k,
            throw new IllegalArgumentException(s"moments needs --$k"))
          emit(opts, out, new graft.api.Collection("t", df)
            .groupMoments(need("group"), need("column"),
              opts.getOrElse("scale", "100").toLong))
        case "winsorize" =>
          val df = load(spark, opts)
          def need(k: String) = opts.getOrElse(k,
            throw new IllegalArgumentException(s"winsorize needs --$k"))
          emit(opts, out, new graft.api.Collection("t", df)
            .winsorizedMeans(need("group"), need("column"),
              opts.getOrElse("plo", "0.05").toDouble,
              opts.getOrElse("phi", "0.95").toDouble))
        case "pivot" =>
          val df = load(spark, opts)
          def need(k: String) = opts.getOrElse(k,
            throw new IllegalArgumentException(s"pivot needs --$k"))
          emit(opts, out, df.groupBy(col(need("index")))
            .pivot(need("columns"))
            .agg(sum(col(need("values"))))
            .orderBy(need("index")))
        case "search" if opts.contains("vector") =>
          // vector mode: ANN against a materialized index on a
          // collection (--vector "0.1,0.2,..."); searches the IVF+PQ
          // index when one exists, else the raw-vector IVF index
          val coll = collOf(spark, opts)
          val qv = opts("vector").split(',').toSeq.map(_.trim.toDouble)
          val vc = opts.getOrElse("vector-col", "embedding")
          val k = limitOf(opts, 10).toInt
          val nProbe = opts.get("probes").map(_.toInt).getOrElse(4)
          val res =
            if (java.nio.file.Files.exists(java.nio.file.Paths.get(
                s"${opts("collection")}/_vpqindex_$vc")))
              coll.searchVectorPq(opts.getOrElse("id-col", "id"), vc, qv, k,
                nProbe, rerank = opts.get("rerank").map(_.toInt).getOrElse(4 * k))
            else coll.searchVector(vc, qv, k, nProbe)
          emit(opts, out, res)
        case "search" =>
          val df = load(spark, opts)
          val term = opts.getOrElse("query",
            throw new IllegalArgumentException("search needs --query"))
          val coll = new Collection("cli", df)
          // reference search(where=..., select_cols=...): the pre-filter
          // restricts the scored slice, the projection shapes the output
          val where = whereOf(opts)
          val sel = opts.get("select").map(_.split(',').toSeq).getOrElse(Nil)
          val res = opts.get("attrs") match {
            case Some(_) if opts.get("mode").contains("bm25") =>
              throw new IllegalArgumentException(
                "--mode bm25 ranks one text column; it does not compose with --attrs")
            case Some(attrs) => coll.searchObjects(term, attrs.split(',').toSeq,
              opts.get("template"), limitOf(opts, 10).toInt, where, sel)
            case None if opts.get("mode").contains("bm25") =>
              coll.searchBm25(opts.getOrElse("text-col", "text"), term,
                limitOf(opts, 10).toInt, where, sel)
            case None => coll.search(opts.getOrElse("text-col", "text"), term,
              limitOf(opts, 10).toInt, where, sel)
          }
          emit(opts, out, res)
        case "schema" =>
          val df = load(spark, opts)
          out(graft.ops.SchemaInduce.induceClassDefinition(df,
            opts.getOrElse("class-name", "Induced")).toJson)
        case "validate" =>
          val df = load(spark, opts)
          val pk = opts.getOrElse("id-col", df.columns.head)
          val rules = opts.getOrElse("required", "").split(',').filter(_.nonEmpty)
            .map(c => graft.ops.Validate.Required(c)).toSeq
          if (rules.isEmpty)
            throw new IllegalArgumentException("validate needs --required col[,col]")
          // deterministic rendering for the interactive report (the
          // library op itself stays unordered/map-only)
          emit(opts, out, graft.ops.Validate.validate(df, pk, rules)
            .orderBy("row_id", "field", "code"))
        case "diff" =>
          val df = load(spark, opts)
          val other = graft.io.Formats.read(spark,
            opts.getOrElse("other", throw new IllegalArgumentException("diff needs --other")),
            opts.getOrElse("in-format", null))
          val pk = opts.getOrElse("id-col", df.columns.head)
          emit(opts, out, graft.ops.Diff.diff(df, other, pk))
        case "export" =>
          val df = queryCmd(spark, opts)
          val output = opts.getOrElse("output",
            throw new IllegalArgumentException("export needs --output"))
          graft.io.Formats.write(df, output, opts.getOrElse("format", null))
          out(s"wrote $output")
        case "groupby" =>
          val df = load(spark, opts)
          val by = opts.getOrElse("by",
            throw new IllegalArgumentException("groupby needs --by col[,col]")).split(',').toSeq
          val aggs = opts.getOrElse("agg", "count:*").split(',').toSeq.map { spec =>
            spec.split(':') match {
              case Array("count", "*") => count(lit(1)).as("count")
              // SQL count(col) semantics: non-null values only
              case Array("count", c) => count(col(c)).as(s"count_$c")
              case Array(fn, c) =>
                val target = col(c)
                (fn match {
                  case "sum" => sum(target)
                  case "avg" | "mean" => avg(target)
                  case "min" => min(target)
                  case "max" => max(target)
                  case other =>
                    throw new IllegalArgumentException(s"unknown agg '$other' (sum/avg/min/max/count)")
                }).as(s"${fn}_$c")
              case _ => throw new IllegalArgumentException(s"bad agg spec '$spec' (fn:col)")
            }
          }
          emit(opts, out, df.filter(Filter.bind(whereOf(opts), df.schema).toColumn)
            .groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*).orderBy(by.map(col): _*))
        case "enrichment" =>
          val df = load(spark, opts)
          emit(opts, out, graft.ops.Enrichment.enrich(df,
            opts.getOrElse("sample-col",
              throw new IllegalArgumentException("enrichment needs --sample-col")),
            opts.getOrElse("text-col", "text"),
            opts.get("min-occurrences").map(_.toInt).getOrElse(5)))
        case "apply" =>
          val df = load(spark, opts)
          val patches = graft.io.Formats.read(spark,
            opts.getOrElse("patches",
              throw new IllegalArgumentException("apply needs --patches <file>")),
            opts.getOrElse("patch-format", null))
          val pk = opts.getOrElse("id-col", df.columns.head)
          emit(opts, out, shaped(opts, graft.ops.Diff.applyPatches(df, patches, pk)))
        case "insert" =>
          val rows = load(spark, opts)
          val root = opts.getOrElse("collection",
            throw new IllegalArgumentException("insert needs --collection <dir>"))
          val coll = new graft.api.ParquetCollection(spark, root,
            opts.getOrElse("name", "cli"))
          coll.insert(rows)
          out(s"inserted ${rows.count()} rows into $root (now ${coll.count()})")
        case "infer" =>
          val df = load(spark, opts)
          val spec = opts.getOrElse("rules",
            throw new IllegalArgumentException(
              "infer needs --rules \"where => col=val[,col=val]; ...\""))
          val rules = spec.split(';').toSeq.filter(_.trim.nonEmpty).map { clause =>
            clause.split("=>", 2) match {
              case Array(w, a) if a.trim.nonEmpty =>
                val post = a.trim.split(',').map { kv =>
                  kv.split("=", 2) match {
                    case Array(k, v) if v.startsWith("@") => k.trim -> col(v.substring(1))
                    case Array(k, v) => k.trim -> lit(typed(v.trim))
                    case _ => throw new IllegalArgumentException(s"bad assignment '$kv'")
                  }
                }.toMap
                graft.ops.Rules.Rule(parseWhere(w.trim), post)
              case _ => throw new IllegalArgumentException(
                s"bad rule '$clause' (expected: where => col=val)")
            }
          }
          val inferred = graft.ops.Rules.applyRules(df, rules)
          opts.get("target-col").foreach { t =>
            val p = opts.getOrElse("predict-col",
              throw new IllegalArgumentException("--target-col needs --predict-col"))
            // reference cli.py:880: --evaluation-match-function selects
            // the graded leaf matcher; default stays exact accuracy
            opts.get("match-function") match {
              case Some("score_text_overlap") | Some("text-overlap") =>
                val o = graft.ops.Evaluation.evaluatePredictor(
                  inferred, p, t, Some(graft.ops.Evaluation.textOverlapFn))
                out(f"accuracy: ${o.accuracy}%.4f (graded text-overlap, tp=${o.truePositive}%.2f/${o.total})")
              case Some("struct") =>
                val o = graft.ops.Evaluation.evaluatePredictor(inferred, p, t)
                out(f"accuracy: ${o.accuracy}%.4f (graded struct, tp=${o.truePositive}%.2f/${o.total})")
              case Some(other) =>
                throw new IllegalArgumentException(s"unknown --match-function '$other'")
              case None =>
                out(f"accuracy: ${graft.ops.Rules.accuracy(inferred, t, p)}%.4f")
            }
          }
          emit(opts, out, shaped(opts, inferred))
        case "update" =>
          // reference cli.py `update --set a[0].b.c=v`: nested path
          // assignments on rows matching --where, committed as the
          // next collection snapshot
          val root = opts.getOrElse("collection",
            throw new IllegalArgumentException("update needs --collection <dir>"))
          val sets = opts.getOrElse("set",
            throw new IllegalArgumentException("update needs --set path=value[,path=value]"))
          val coll = new graft.api.ParquetCollection(spark, root,
            opts.getOrElse("name", "cli"))
          val where = whereOf(opts)
          sets.split(',').foreach { kv =>
            kv.split("=", 2) match {
              case Array(p, v) if v.startsWith("@") =>
                coll.updatePath(p.trim, col(v.substring(1)), where)
              case Array(p, v) => coll.updatePath(p.trim, lit(typed(v.trim)), where)
              case _ => throw new IllegalArgumentException(s"bad --set entry '$kv'")
            }
          }
          out(s"updated ${sets.split(',').length} path(s) in $root")
        case "store" =>
          // reference cli.py:283 `store`: insert WITHOUT naming a
          // collection — a dict document (yaml/json) keyed by
          // collection name stores each key's object list into that
          // collection; a tabular file stores under --name (default:
          // file basename). Creates the database root if missing.
          val root = opts.getOrElse("db",
            throw new IllegalArgumentException("store needs --db <dir>"))
          val db = new graft.api.Database(spark, root, "cli")
          val path = opts.getOrElse("path",
            throw new IllegalArgumentException("store needs --path <file>"))
          val fmt = opts.get("in-format")
            .getOrElse(path.substring(path.lastIndexOf('.') + 1).toLowerCase)
          val stored: Seq[(String, Long)] =
            if (Seq("yaml", "yml", "json").contains(fmt)) {
              val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
              val docJson =
                if (fmt == "json") text
                else graft.io.YamlParse.docToJson(text).getOrElse(
                  throw new IllegalArgumentException(s"empty document: $path"))
              if (!docJson.trim.startsWith("{"))
                throw new IllegalArgumentException(
                  s"store needs a top-level map of collection -> objects in $path")
              // one-row frame whose columns are the top-level keys;
              // each array<struct> column is a collection's object list
              import spark.implicits._
              val doc = spark.read.json(Seq(docJson).toDS)
              doc.schema.fields.toSeq.collect {
                case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
                  val rows = doc.select(explode(col(s"`${f.name}`")).as("r")).select("r.*")
                  db.store(Map(f.name -> rows))
                  f.name -> rows.count()
              }
            } else {
              val rows = load(spark, opts)
              val collName = opts.getOrElse("name", {
                val base = path.substring(path.lastIndexOf('/') + 1)
                val dot = base.lastIndexOf('.')
                if (dot > 0) base.substring(0, dot) else base // extension-less path → full basename
              })
              db.store(Map(collName -> rows))
              Seq(collName -> rows.count())
            }
          stored.foreach { case (c, n) => out(s"stored $n objects into '$c'") }
        case "import" =>
          // reference cli.py:333 import: inverse of export — every
          // <name>.<format> under --location becomes a collection
          val db = dbOfCreate(spark, opts)
          val loc = opts.getOrElse("location",
            throw new IllegalArgumentException("import needs --location <dir>"))
          val fmt = opts.getOrElse("format", "parquet")
          db.importDatabase(loc, fmt)
          db.listCollectionNames.foreach(c =>
            out(s"$c: ${db.collection(c).count()} rows"))
        case "index" =>
          // reference cli.py:912: materialize a (trigram) index over a
          // collection — single text column or multi-attribute rendering
          val coll = collOf(spark, opts)
          val idCol = opts.getOrElse("id-col",
            throw new IllegalArgumentException("index needs --id-col"))
          val dim = opts.get("dim").map(_.toInt)
            .getOrElse(graft.index.TrigramIndexer.DefaultDim)
          opts.get("vector-col") match {
            case Some(vc) =>
              val cells = opts.get("cells").map(_.toInt).getOrElse(16)
              opts.get("pq") match {
                case Some(m) =>
                  // memory-bound variant: cells hold m-byte PQ codes of
                  // the residuals, not raw vectors
                  coll.attachVectorIndexPq(idCol, vc, cells, m.toInt,
                    opts.get("ks").map(_.toInt).getOrElse(16))
                  out(s"indexed $vc (ivfpq, $cells cells, m=$m)")
                case None =>
                  // codebook trains via KMeans.fit by default (tighter
                  // cells, better recall at the same nProbe);
                  // --trained false keeps the first-k-by-id quantizer
                  coll.attachVectorIndex(idCol, vc, cells,
                    trained = opts.get("trained").forall(_.toBoolean))
                  coll.listVectorIndexes.foreach { case (k, n) => out(s"indexed $k (ivf, $n cells)") }
              }
            case None =>
              opts.get("attrs") match {
                case Some(attrs) =>
                  coll.attachIndex(idCol, attrs.split(',').toSeq, opts.get("template"), dim)
                case None =>
                  coll.attachIndex(idCol, opts.getOrElse("text-col", "text"), dim)
              }
              coll.listIndexes.foreach { case (k, d) => out(s"indexed $k (dim $d)") }
          }
        case "indexes" =>
          // reference cli.py:986: list a collection's materialized indexes
          val c = collOf(spark, opts)
          val ixs = c.listIndexes
          val vixs = c.listVectorIndexes
          if (ixs.isEmpty && vixs.isEmpty) out("no indexes")
          else {
            ixs.foreach { case (k, d) => out(s"$k: trigram (dim $d)") }
            vixs.foreach { case (k, n) => out(s"$k: ivf ($n cells)") }
          }
        case "find-matches" =>
          // reference cli.py:999: embedding matcher over two tables (or
          // within one when --target is absent); --tier lsh is the
          // banded no-broadcast path
          val src = load(spark, opts)
          val tgt = opts.get("target") match {
            case Some(p) => graft.io.Formats.read(spark, p, opts.getOrElse("in-format", null))
            case None => src // within-collection mode
          }
          val cfg = graft.ann.Matcher.MatchConfig(
            metric = opts.getOrElse("metric", "cosine"),
            topN = opts.get("max-matches").map(_.toInt).getOrElse(5),
            minSimilarity = opts.get("similarity-threshold").map(_.toDouble),
            maxDistance = opts.get("distance-threshold").map(_.toDouble),
            // reference MatchingConfig.exclude_self_matches defaults True in
            // BOTH modes — shared-id rows in cross-collection mode would
            // otherwise self-match at distance 0 and burn a top-N slot;
            // `--include-self true` opts back in
            excludeSelf = opts.get("include-self").forall(v => !v.toBoolean))
          val idCol = opts.getOrElse("id-col",
            throw new IllegalArgumentException("find-matches needs --id-col"))
          val vecCol = opts.getOrElse("vec-col", "embedding")
          val res = opts.getOrElse("tier", "brute") match {
            case "lsh" => graft.ann.Matcher.findMatchesLshTopN(src, tgt, idCol, vecCol, cfg)
            case "brute" => graft.ann.Matcher.findMatchesTopN(src, tgt, idCol, vecCol, cfg)
            case other => throw new IllegalArgumentException(s"unknown --tier '$other' (brute/lsh)")
          }
          // deterministic CLI output (the library path stays sort-free)
          emit(opts, out, res.orderBy("src_id", "match_rank"))
        case "collections" => dbOf(spark, opts).listCollectionNames.foreach(out)
        case "config" =>
          // reference cli.py -C/--config: attach everything a YAML
          // config declares, then report database → collection counts
          val cfgPath = opts.getOrElse("path",
            throw new IllegalArgumentException("config needs --path <config.yaml>"))
          val client = new graft.api.Client(spark).fromConfig(cfgPath, autoAttach = true)
          client.databaseNames.foreach { dbName =>
            val db = client.database(dbName)
            out(s"database $dbName (${db.root})")
            db.listCollectionNames.foreach { c =>
              out(s"  $c\t${db.collection(c).count()}")
            }
          }
        case "drop-collection" =>
          val nm = opts.getOrElse("name",
            throw new IllegalArgumentException("drop-collection needs --name"))
          val db = dbOf(spark, opts)
          require(db.listCollectionNames.contains(nm), s"no collection '$nm' in --db")
          db.dropCollection(nm)
          out(s"dropped $nm")
        case "sql" =>
          // collections register as temp views; any Spark SQL over them
          emit(opts, out, dbOf(spark, opts).executeSql(
            opts.getOrElse("sql", throw new IllegalArgumentException("sql needs --sql"))))
        case "peek" => emit(opts, out, load(spark, opts).limit(limitOf(opts, 10).toInt))
        case other => out(s"unknown command '$other'\n$usage"); return 2
      }
      0
    } catch {
      case e: IllegalArgumentException => out(s"error: ${e.getMessage}"); 2
      case e: UnsupportedOperationException => out(s"error: ${e.getMessage}"); 2
    }
  }

  private def queryCmd(spark: SparkSession, opts: Map[String, String]): DataFrame =
    new Collection("cli", load(spark, opts)).find(
      whereOf(opts),
      selectCols = opts.get("select").map(_.split(',').toSeq).getOrElse(Nil),
      sortBy = opts.get("sort").map(_.split(',').toSeq.map(SortKey.parse)).getOrElse(Nil),
      limit = opts.get("limit").map(_.toLong).getOrElse(-1L),
      offset = opts.get("offset").map(_.toLong).getOrElse(0L))

  /** The CLI only ATTACHES existing databases — a typo'd --db path
    * must surface as an error, not be silently created on disk (the
    * Database constructor scaffolds its root for API users).
    */
  private def dbOf(spark: SparkSession, opts: Map[String, String]): graft.api.Database = {
    val root = opts.getOrElse("db",
      throw new IllegalArgumentException("missing --db <dir>"))
    require(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root)),
      s"no database directory '$root'")
    new graft.api.Database(spark, root, "cli")
  }

  /** Like [[dbOf]] but scaffolds a missing root — for commands whose
    * JOB is populating a new database (store/import).
    */
  private def dbOfCreate(spark: SparkSession, opts: Map[String, String]): graft.api.Database =
    new graft.api.Database(spark,
      opts.getOrElse("db", throw new IllegalArgumentException("missing --db <dir>")), "cli")

  /** The mutable collection a command targets (--collection <dir>). */
  private def collOf(spark: SparkSession, opts: Map[String, String]): graft.api.ParquetCollection =
    new graft.api.ParquetCollection(spark,
      opts.getOrElse("collection",
        throw new IllegalArgumentException("missing --collection <dir>")),
      opts.getOrElse("name", "cli"))

  /** --select/--sort/--limit shape a derived result like `query`. */
  private def shaped(opts: Map[String, String], df: DataFrame): DataFrame =
    new Collection("cli", df).find(
      Filter.True,
      selectCols = opts.get("select").map(_.split(',').toSeq).getOrElse(Nil),
      sortBy = opts.get("sort").map(_.split(',').toSeq.map(SortKey.parse)).getOrElse(Nil),
      limit = opts.get("limit").map(_.toLong).getOrElse(-1L))

  private def load(spark: SparkSession, opts: Map[String, String]): DataFrame =
    graft.io.Formats.read(spark,
      opts.getOrElse("path", throw new IllegalArgumentException("missing --path")),
      opts.getOrElse("in-format", null))

  private def limitOf(opts: Map[String, String], dflt: Long): Long =
    opts.get("limit").map(_.toLong).getOrElse(dflt)

  /** `--flag value` pairs → map (later repeats win, like the reference). */
  private def parseOpts(args: Seq[String]): Map[String, String] =
    args.grouped(2).map {
      case Seq(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      case other => throw new IllegalArgumentException(
        s"expected --flag value pairs, got '${other.mkString(" ")}'")
    }.toMap

  private val Cmp = "^([A-Za-z_][A-Za-z0-9_.]*)(>=|<=|!=|>|<|=)(.*)$".r

  /** Mongo-ish where from `k=v,k2>v2`: equality + comparisons, values
    * auto-typed (long, double, boolean, else string).
    */
  private[graft] def whereOf(opts: Map[String, String]): Filter =
    opts.get("where") match {
      case None => Filter.True
      case Some(spec) => parseWhere(spec)
    }

  private[graft] def parseWhere(spec: String): Filter = {
    val parts: Seq[Filter] = spec.split(',').toSeq.map {
          case Cmp(k, op, raw) =>
            val v = typed(raw)
            op match {
              case "=" => Filter.eq(k, v)
              case "!=" => Filter.ne(k, v)
              case ">" => Filter.gt(k, v)
              case ">=" => Filter.gte(k, v)
              case "<" => Filter.lt(k, v)
              case "<=" => Filter.lte(k, v)
            }
          case other => throw new IllegalArgumentException(s"bad where term '$other'")
        }
    if (parts.size == 1) parts.head else Filter.And(parts)
  }

  private def typed(raw: String): Any =
    if (raw.matches("^-?\\d+$")) raw.toLong
    else if (raw.matches("^-?\\d*\\.\\d+$")) raw.toDouble
    else if (raw == "true" || raw == "false") raw.toBoolean
    else raw

  /** First `limit` rows rendered to stdout (default TSV; any
    * [[graft.io.Render]] type via --output-type, the reference's
    * render_output), or a file via the Formats registry.
    */
  private def emit(opts: Map[String, String], out: String => Unit, df: DataFrame): Unit =
    opts.get("output") match {
      case Some(path) =>
        graft.io.Formats.write(df, path, opts.getOrElse("format", null))
        out(s"wrote $path")
      case None =>
        graft.io.Render.render(df, opts.getOrElse("output-type", "tsv"),
          limitOf(opts, 50).toInt).foreach(out)
    }

  private val usage: String =
    """usage: graft.Cli <command> --path <data> [options]
      |commands: query fq groupby describe pivot enrichment infer search schema
      |          validate diff apply insert update export peek
      |          histogram moments winsorize (distribution profiling:
      |            --group g --column c [--scale n | --plo p --phi p])
      |          index indexes find-matches (collection/matcher)
      |          store import collections drop-collection sql (database-level: --db <dir>)
      |          config (attach a YAML client config: --path config.yaml)
      |options: --where k=v,k2>v2  --select a,b  --sort -col  --limit n  --offset n
      |         --columns a,b  --index/--columns/--values (pivot)  --query term
      |         --by a,b --agg sum:x,avg:y (groupby)  --sample-col s (enrichment)
      |         --attrs a,b --template "{a}: {b}" (search)  --required a,b (validate)
      |         --rules "where => col=val; ..." [--target-col t --predict-col p] (infer)
      |         --other path --id-col pk (diff)  --patches file (apply)
      |         --collection dir (insert/index/indexes)  --output path --format fmt
      |         --db dir --location dir (import)  --name coll (store)
      |         --target path --metric m --max-matches n --tier brute|lsh
      |           --include-self true (find-matches)
      |         --vector-col v --cells n [--trained false | --pq m --ks k] (index)
      |         --vector "0.1,..." [--probes n --rerank r] (search, ANN via index)
      |         --mode bm25 (search: BM25 lexical ranking instead of trigram cosine)
      |         --output-type tsv|csv|json|jsonl|yaml|markdown|table""".stripMargin
}
