package graft

import java.nio.file.Files

/** The CLI is a thin shell over the library — these specs drive the
  * command surface end-to-end (parse → operator → rendered output),
  * reference cli.py analog commands.
  */
class CliSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dataPath = {
    val p = Files.createTempDirectory("graft-cli").resolve("people.parquet").toString
    Seq(
      (1L, "alice", 30.5, "oslo"),
      (2L, "bob", 25.0, "oslo"),
      (3L, "carol", 41.25, "bergen")
    ).toDF("id", "name", "score", "city").write.parquet(p)
    p
  }

  private def runCli(args: String*): (Int, Seq[String]) = {
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val code = Cli.run(args.toSeq, spark, lines += _)
    (code, lines.toSeq)
  }

  test("query: where + select + sort + limit") {
    val (code, out) = runCli("query", "--path", dataPath,
      "--where", "city=oslo,score>25.1", "--select", "id,name", "--sort", "-id")
    code shouldBe 0
    out.head shouldBe "id\tname"
    out.tail shouldBe Seq("1\talice")
  }

  test("fq: facet counts for a column") {
    val (code, out) = runCli("fq", "--path", dataPath, "--columns", "city")
    code shouldBe 0
    // batched facet output: (facet, value, count), count DESC
    out.tail.head.split('\t').toSeq shouldBe Seq("city", "oslo", "2")
  }

  test("describe: numeric columns by default") {
    val (code, out) = runCli("describe", "--path", dataPath)
    code shouldBe 0
    out.head.split('\t').head shouldBe "column"
    out.map(_.split('\t').head) should contain allOf ("id", "score")
  }

  test("histogram: bucketed counts over a numeric column") {
    val (code, out) = runCli("histogram", "--path", dataPath,
      "--column", "score", "--buckets", "4")
    code shouldBe 0
    out.head.split('\t').toSeq shouldBe Seq("bucket", "bucket_lo", "n")
    // every row lands in some bucket
    out.tail.map(_.split('\t')(2).toLong).sum should be > 0L
  }

  test("schema: induced class definition as JSON") {
    val (code, out) = runCli("schema", "--path", dataPath, "--class-name", "Person")
    code shouldBe 0
    val cd = graft.ops.SchemaInduce.ClassDefinition.fromJson(out.head)
    cd.name shouldBe "Person"
    cd.attributes.map(_.name) should contain allOf ("id", "name", "score", "city")
  }

  test("search: multi-attribute rendering") {
    val (code, out) = runCli("search", "--path", dataPath,
      "--query", "alice oslo", "--attrs", "name,city", "--limit", "2")
    code shouldBe 0
    out.head shouldBe "id\tscore"
    out.tail.head should startWith("1\t") // alice/oslo matches best
  }

  test("search: --where pre-filters the scored slice; --select attaches columns") {
    // reference search(where=..., select_cols=...) — collection.py:531-537
    val (code, out) = runCli("search", "--path", dataPath,
      "--query", "carol", "--attrs", "name,city", "--where", "city=bergen",
      "--select", "name", "--limit", "5")
    code shouldBe 0
    out.head shouldBe "id\tname\tscore"
    // only the bergen slice is scored — oslo rows never appear
    out.tail.map(_.split('\t').head) shouldBe Seq("3")
    out.tail.head.split('\t')(1) shouldBe "carol"
    // an excluding pre-filter yields an empty ranked set, not an error
    val (code2, out2) = runCli("search", "--path", dataPath,
      "--query", "carol", "--attrs", "name,city", "--where", "city=tromso")
    code2 shouldBe 0
    out2.tail shouldBe empty
  }

  test("search: --mode bm25 ranks lexically and composes with --where") {
    val docs = Files.createTempDirectory("graft-cli").resolve("docs.parquet").toString
    Seq(
      (1L, "spark spark spark", "oslo"),
      (2L, "spark elsewhere entirely", "oslo"),
      (3L, "spark spark spark", "bergen"),
      (4L, "nothing relevant", "oslo")
    ).toDF("id", "text", "city").write.parquet(docs)
    val (code, out) = runCli("search", "--path", docs, "--mode", "bm25",
      "--query", "spark", "--limit", "3")
    code shouldBe 0
    out.head shouldBe "id\tscore"
    out.tail.map(_.split('\t').head).toSet shouldBe Set("1", "2", "3")
    // highest tf ranks first (ids 1 and 3 tie, id tiebreak)
    out.tail.head.split('\t').head shouldBe "1"
    // where= restricts both the candidates AND the corpus stats slice
    val (code2, out2) = runCli("search", "--path", docs, "--mode", "bm25",
      "--query", "spark", "--where", "city=bergen", "--limit", "3")
    code2 shouldBe 0
    out2.tail.map(_.split('\t').head) shouldBe Seq("3")
    // --mode bm25 with --attrs is an ERROR, not a silent cosine search
    val (code3, out3) = runCli("search", "--path", docs, "--mode", "bm25",
      "--attrs", "text,city", "--query", "spark")
    code3 shouldBe 2
    out3.head should include("does not compose with --attrs")
  }

  test("export: query result through the Formats registry") {
    val outPath = Files.createTempDirectory("graft-cli").resolve("out.jsonl").toString
    val (code, out) = runCli("export", "--path", dataPath,
      "--where", "city=oslo", "--output", outPath)
    code shouldBe 0
    out.head shouldBe s"wrote $outPath"
    spark.read.json(outPath).count() shouldBe 2
  }

  test("validate: required-field violations") {
    val p = Files.createTempDirectory("graft-cli").resolve("n.parquet").toString
    Seq((1L, Some("x")), (2L, None)).toDF("id", "tag").write.parquet(p)
    val (code, out) = runCli("validate", "--path", p, "--required", "tag")
    code shouldBe 0
    out.tail.map(_.split('\t').head) shouldBe Seq("2")
  }

  test("groupby: agg specs over filtered rows") {
    val (code, out) = runCli("groupby", "--path", dataPath,
      "--by", "city", "--agg", "count:*,avg:score,max:id")
    code shouldBe 0
    out.head shouldBe "city\tcount\tavg_score\tmax_id"
    out.tail shouldBe Seq("bergen\t1\t41.25\t3", "oslo\t2\t27.75\t2")
    val (code2, out2) = runCli("groupby", "--path", dataPath,
      "--by", "city", "--where", "score>26.0")
    code2 shouldBe 0
    out2.tail shouldBe Seq("bergen\t1", "oslo\t1")
    runCli("groupby", "--path", dataPath, "--by", "city", "--agg", "median:x")._1 shouldBe 2
    // count:col skips nulls (SQL semantics) and names the column count_col
    val p = java.nio.file.Files.createTempDirectory("graft-cli").resolve("n2.parquet").toString
    Seq(("x", Some(1.0)), ("x", None), ("y", Some(2.0))).toDF("g", "v").write.parquet(p)
    val (c3, out3) = runCli("groupby", "--path", p, "--by", "g", "--agg", "count:v")
    c3 shouldBe 0
    out3.head shouldBe "g\tcount_v"
    out3.tail shouldBe Seq("x\t1", "y\t1")
  }

  test("database commands: collections, sql over views, drop-collection") {
    val dbDir = Files.createTempDirectory("graft-cli-db").toString
    val db = new graft.api.Database(spark, dbDir, "t")
    db.createCollection("people", Seq((1L, "alice"), (2L, "bob")).toDF("id", "name"))
    db.createCollection("pets", Seq((1L, "rex")).toDF("owner_id", "pet"))

    val (c1, out1) = runCli("collections", "--db", dbDir)
    c1 shouldBe 0
    out1 shouldBe Seq("people", "pets")

    val (c2, out2) = runCli("sql", "--db", dbDir,
      "--sql", "SELECT name, pet FROM people JOIN pets ON id = owner_id ORDER BY name")
    c2 shouldBe 0
    out2 shouldBe Seq("name\tpet", "alice\trex")

    val (c3, out3) = runCli("drop-collection", "--db", dbDir, "--name", "pets")
    c3 shouldBe 0
    out3.head shouldBe "dropped pets"
    runCli("collections", "--db", dbDir)._2 shouldBe Seq("people")

    runCli("sql", "--db", dbDir)._1 shouldBe 2
    runCli("collections")._1 shouldBe 2
    // a typo'd --db path errors instead of being silently created
    val bogus = dbDir + "-nope"
    val (c4, out4) = runCli("collections", "--db", bogus)
    c4 shouldBe 2
    out4.head should include("no database directory")
    java.nio.file.Files.exists(java.nio.file.Paths.get(bogus)) shouldBe false
    // dropping a missing collection reports the mistake
    runCli("drop-collection", "--db", dbDir, "--name", "nope")._1 shouldBe 2
  }

  test("unsupported operations exit 2 with a friendly error") {
    val (code, out) = runCli("export", "--path", dataPath,
      "--output", "/tmp/nope.toml", "--format", "toml")
    code shouldBe 2
    out.head should startWith("error: toml WRITE is out of scope")
  }

  test("enrichment: per-sample token enrichment end-to-end") {
    val p = Files.createTempDirectory("graft-cli").resolve("docs.parquet").toString
    Seq(("s1", "apple apple apple banana"), ("s1", "apple apple apple"),
        ("s2", "banana banana cherry banana"), ("s2", "banana banana cherry"))
      .toDF("sample", "text").write.parquet(p)
    val (code, out) = runCli("enrichment", "--path", p,
      "--sample-col", "sample", "--min-occurrences", "2")
    code shouldBe 0
    out.head.split('\t') should contain("category")
    out.length should be > 1
  }

  test("apply: JSON-Patch file against a collection") {
    val dir = Files.createTempDirectory("graft-cli")
    val src = Seq((1L, "alice"), (2L, "bob")).toDF("id", "name")
    val patched = Seq((1L, "alicia"), (2L, "bob")).toDF("id", "name")
    val patchPath = dir.resolve("patches.jsonl").toString
    graft.ops.Diff.diff(src, patched, "id").write.json(patchPath)
    val srcPath = dir.resolve("src.parquet").toString
    src.write.parquet(srcPath)
    val (code, out) = runCli("apply", "--path", srcPath,
      "--patches", patchPath, "--id-col", "id", "--sort", "id")
    code shouldBe 0
    out should contain("1\talicia")
    out should contain("2\tbob")
  }

  test("update: path-based --set on rows matching --where") {
    val dir = Files.createTempDirectory("graft-cli")
    val collDir = dir.resolve("upd").toString
    val coll = new graft.api.ParquetCollection(spark, collDir, "upd")
    coll.replace(Seq((1L, "alice", "oslo"), (2L, "bob", "bergen")).toDF("id", "name", "city"))
    val (code, out) = runCli("update", "--collection", collDir,
      "--where", "city=oslo", "--set", "name=ALICE")
    code shouldBe 0
    out.head should startWith("updated 1 path(s)")
    coll.df.orderBy("id").select("name").as[String].collect() shouldBe
      Array("ALICE", "bob")
    // column-ref assignment via @
    runCli("update", "--collection", collDir, "--set", "name=@city")._1 shouldBe 0
    coll.df.orderBy("id").select("name").as[String].collect() shouldBe
      Array("oslo", "bergen")
    runCli("update", "--collection", collDir)._1 shouldBe 2
  }

  test("insert: append a file into a versioned collection") {
    val dir = Files.createTempDirectory("graft-cli")
    val collDir = dir.resolve("coll").toString
    val (code, _) = runCli("insert", "--path", dataPath, "--collection", collDir)
    code shouldBe 0
    val (code2, out2) = runCli("insert", "--path", dataPath, "--collection", collDir)
    code2 shouldBe 0
    out2.head should endWith("(now 6)")
    new graft.api.ParquetCollection(spark, collDir, "cli").count() shouldBe 6
  }

  test("infer: sequential rules with typed and column-ref assignments") {
    val (code, out) = runCli("infer", "--path", dataPath,
      "--rules", "score>30.0 => tier=high,ref=@name; score<=30.0 => tier=low",
      "--select", "id,tier,ref", "--sort", "id")
    code shouldBe 0
    out.head shouldBe "id\ttier\tref"
    out.tail shouldBe Seq("1\thigh\talice", "2\tlow\tnull", "3\thigh\tcarol")
    // evaluation path: self-accuracy of a copied column is 1
    val (c2, out2) = runCli("infer", "--path", dataPath,
      "--rules", "id>0 => pred=@city",
      "--target-col", "city", "--predict-col", "pred")
    c2 shouldBe 0
    out2.head shouldBe "accuracy: 1.0000"
    // graded matchers (reference --evaluation-match-function)
    val (c3, out3) = runCli("infer", "--path", dataPath,
      "--rules", "id>0 => pred=@city",
      "--target-col", "city", "--predict-col", "pred",
      "--match-function", "text-overlap")
    c3 shouldBe 0
    out3.head should startWith("accuracy: 1.0000 (graded text-overlap")
    runCli("infer", "--path", dataPath, "--rules", "id>0 => pred=@city",
      "--target-col", "city", "--predict-col", "pred",
      "--match-function", "bogus")._1 shouldBe 2
    runCli("infer", "--path", dataPath, "--rules", "nonsense")._1 shouldBe 2
  }

  test("output-type: json, yaml, markdown, table renderings") {
    val (c1, json) = runCli("query", "--path", dataPath, "--where", "id=1",
      "--select", "id,name", "--output-type", "json")
    c1 shouldBe 0
    json.head shouldBe "["
    json.last shouldBe "]"
    json.mkString should include(""""name":"alice"""")

    val (c2, yaml) = runCli("query", "--path", dataPath, "--where", "id=1",
      "--select", "id,name", "--output-type", "yaml")
    c2 shouldBe 0
    yaml shouldBe Seq("---", "id: 1", "name: alice")

    val (c3, md) = runCli("query", "--path", dataPath, "--where", "id=1",
      "--select", "name", "--output-type", "markdown")
    c3 shouldBe 0
    md.head shouldBe "## Object"
    md should contain(" * name: alice")

    val (c4, tbl) = runCli("query", "--path", dataPath, "--sort", "id",
      "--select", "id,city", "--output-type", "table")
    c4 shouldBe 0
    tbl.head should fullyMatch regex "\\+-+\\+-+\\+"
    tbl(1) should include("| id")
    tbl should have size 7 // rule, header, mid-rule, 3 rows, rule
    tbl(3) should include("| 1")

    val (c5, csv) = runCli("query", "--path", dataPath, "--where", "id=1",
      "--output-type", "csv")
    c5 shouldBe 0
    csv.head shouldBe "id,name,score,city"

    runCli("query", "--path", dataPath, "--output-type", "dot")._1 shouldBe 2
  }

  test("store: dict document fans out one collection per top-level key") {
    val dir = Files.createTempDirectory("graft-cli-store")
    val doc = dir.resolve("data.yaml")
    Files.writeString(doc,
      """people:
        |  - id: 1
        |    name: alice
        |  - id: 2
        |    name: bob
        |places:
        |  - city: oslo
        |""".stripMargin)
    val dbDir = dir.resolve("db").toString
    val (code, out) = runCli("store", "--db", dbDir, "--path", doc.toString)
    code shouldBe 0
    out.toSet shouldBe Set("stored 2 objects into 'people'", "stored 1 objects into 'places'")
    val db = new graft.api.Database(spark, dbDir, "t")
    db.listCollectionNames shouldBe Seq("people", "places")
    db.collection("people").count() shouldBe 2
    // a second store into the same db INSERTS (reference db.store)
    runCli("store", "--db", dbDir, "--path", doc.toString)._1 shouldBe 0
    db.collection("people").count() shouldBe 4
  }

  test("store: tabular file lands under --name (or the file basename)") {
    val dir = Files.createTempDirectory("graft-cli-store2")
    val dbDir = dir.resolve("db").toString
    val (code, out) = runCli("store", "--db", dbDir, "--path", dataPath, "--name", "people")
    code shouldBe 0
    out.head shouldBe "stored 3 objects into 'people'"
    new graft.api.Database(spark, dbDir, "t").collection("people").count() shouldBe 3
  }

  test("import: a dump directory round-trips through export") {
    val dir = Files.createTempDirectory("graft-cli-import")
    val srcDb = new graft.api.Database(spark, dir.resolve("src").toString, "src")
    srcDb.createCollection("people",
      Seq((1L, "alice"), (2L, "bob")).toDF("id", "name"))
    val dump = dir.resolve("dump").toString
    srcDb.exportDatabase(dump, "jsonl")
    val dstDir = dir.resolve("dst").toString
    val (code, out) = runCli("import", "--db", dstDir, "--location", dump,
      "--format", "jsonl")
    code shouldBe 0
    out shouldBe Seq("people: 2 rows")
    new graft.api.Database(spark, dstDir, "t").collection("people").count() shouldBe 2
  }

  test("index + indexes: materialize and list a collection's indexes") {
    val dir = Files.createTempDirectory("graft-cli-index")
    val collDir = dir.resolve("docs").toString
    new graft.api.ParquetCollection(spark, collDir, "docs").replace(
      Seq((1L, "spark engine", "a"), (2L, "query plan", "b"))
        .toDF("doc_id", "text", "source"))
    runCli("indexes", "--collection", collDir)._2 shouldBe Seq("no indexes")
    val (c1, out1) = runCli("index", "--collection", collDir, "--id-col", "doc_id")
    c1 shouldBe 0
    out1 shouldBe Seq("indexed text (dim 512)")
    val (c2, out2) = runCli("index", "--collection", collDir, "--id-col", "doc_id",
      "--attrs", "source,text", "--dim", "128")
    c2 shouldBe 0
    out2 should contain("indexed source+text (dim 128)")
    val (c3, out3) = runCli("indexes", "--collection", collDir)
    c3 shouldBe 0
    out3 shouldBe Seq("source+text: trigram (dim 128)", "text: trigram (dim 512)")
  }

  test("index --vector-col materializes an IVF index; indexes lists it") {
    val dir = Files.createTempDirectory("graft-cli-vindex")
    val collDir = dir.resolve("vecs").toString
    new graft.api.ParquetCollection(spark, collDir, "vecs").replace(
      Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f)))
        .toDF("vec_id", "embedding"))
    val (c1, out1) = runCli("index", "--collection", collDir,
      "--id-col", "vec_id", "--vector-col", "embedding", "--cells", "2")
    c1 shouldBe 0
    out1 shouldBe Seq("indexed embedding (ivf, 2 cells)")
    val (c2, out2) = runCli("indexes", "--collection", collDir)
    c2 shouldBe 0
    out2 shouldBe Seq("embedding: ivf (2 cells)")
    // default codebook is KMeans-trained: with k=2 the two near-parallel
    // vectors share a cell, so probing 1 cell around (1,0) returns both
    val coll = new graft.api.ParquetCollection(spark, collDir, "vecs")
    coll.searchVector("embedding", Seq(1.0, 0.0), k = 2, nProbe = 1)
      .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L)
    // --trained false rebuilds on the first-k-by-id quantizer
    runCli("index", "--collection", collDir, "--id-col", "vec_id",
      "--vector-col", "embedding", "--cells", "2", "--trained", "false")._1 shouldBe 0
    // --pq m builds the memory-bound IVF+PQ variant end-to-end
    val (c4, out4) = runCli("index", "--collection", collDir, "--id-col", "vec_id",
      "--vector-col", "embedding", "--cells", "2", "--pq", "2", "--ks", "2")
    c4 shouldBe 0
    out4 shouldBe Seq("indexed embedding (ivfpq, 2 cells, m=2)")
    coll.searchVectorPq("vec_id", "embedding", Seq(1.0, 0.0), k = 3, nProbe = 2,
      rerank = 3).collect().length shouldBe 3
    // CLI vector search drives the PQ index (it exists now) with re-rank
    val (c5, out5) = runCli("search", "--collection", collDir, "--id-col", "vec_id",
      "--vector", "1.0,0.0", "--probes", "2", "--limit", "2", "--output-type", "csv")
    c5 shouldBe 0
    out5.head shouldBe "id,score"
    out5.tail.head should startWith("1,") // exact re-rank puts (1,0) first
  }

  test("find-matches: cross-table and within-collection tiers") {
    val dir = Files.createTempDirectory("graft-cli-fm")
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val p = dir.resolve("vecs.parquet").toString
    vecs.write.parquet(p)
    // within-collection (no --target): self-matches excluded
    val (c1, out1) = runCli("find-matches", "--path", p, "--id-col", "vec_id",
      "--max-matches", "1", "--output-type", "csv")
    c1 shouldBe 0
    out1.head shouldBe "src_id,tgt_id,similarity,distance,match_rank"
    out1 should contain("1,2,0.9939,0.0061,1")
    out1.filterNot(_.startsWith("src")).foreach { l =>
      val Array(s, t, _*) = l.split(','); s should not be t
    }
    // cross-table euclidean with the same table as an explicit target:
    // exclude_self_matches defaults TRUE in cross mode too (reference
    // MatchingConfig) — shared ids never self-match at distance 0
    val (c2, out2) = runCli("find-matches", "--path", p, "--target", p,
      "--id-col", "vec_id", "--metric", "euclidean", "--max-matches", "1",
      "--output-type", "csv")
    c2 shouldBe 0
    out2.filterNot(_.startsWith("src")).foreach { l =>
      val Array(s, t, _*) = l.split(','); s should not be t
    }
    // max-dist normalization still ranges over the FULL matrix (incl.
    // self pairs): maxd = dist(1,3) = 1.4142, so sim(1,2) = 1 - 0.1/1 = 0.9
    out2 should contain("1,2,0.9,0.1414,1")
    // --include-self true restores the self-match rows
    val (c3, out3) = runCli("find-matches", "--path", p, "--target", p,
      "--id-col", "vec_id", "--metric", "euclidean", "--max-matches", "1",
      "--include-self", "true", "--output-type", "csv")
    c3 shouldBe 0
    out3 should contain("1,1,1.0,0.0,1")
    // lsh tier runs the banded path end-to-end
    runCli("find-matches", "--path", p, "--id-col", "vec_id",
      "--tier", "lsh", "--max-matches", "1")._1 shouldBe 0
  }

  test("config command attaches a YAML client config and reports counts") {
    val base = java.nio.file.Files.createTempDirectory("cli-cfg")
    java.nio.file.Files.writeString(base.resolve("rows.jsonl"),
      "{\"id\": 1, \"v\": \"a\"}\n{\"id\": 2, \"v\": \"b\"}\n")
    val cfg = base.resolve("c.yaml")
    java.nio.file.Files.writeString(cfg,
      """databases:
        |  main:
        |    handle: wh
        |    collections:
        |      rows:
        |        source: {local_path: rows.jsonl, format: jsonl}
        |""".stripMargin)
    val (code, lines) = runCli("config", "--path", cfg.toString)
    code shouldBe 0
    lines.head should startWith("database main")
    lines should contain("  rows\t2")
    runCli("config")._1 shouldBe 2
  }

  test("moments and winsorize commands profile a grouped column") {
    val (code, out) = runCli("moments", "--path", dataPath,
      "--group", "city", "--column", "score")
    code shouldBe 0
    out.head shouldBe "city\tn\tmean\tskew\tex_kurtosis"
    out.length shouldBe 3 // header + two cities
    val (code2, out2) = runCli("winsorize", "--path", dataPath,
      "--group", "city", "--column", "score")
    code2 shouldBe 0
    out2.head should startWith("city\tn\tmean_raw")
    out2.length shouldBe 3
  }

  test("bad usage returns exit code 2 with a message") {
    runCli("query")._1 shouldBe 2
    runCli("frobnicate", "--path", dataPath)._1 shouldBe 2
    runCli()._1 shouldBe 2
    // malformed flag lists (odd count / missing --) get the same
    // friendly error instead of an escaping exception
    val (oddCode, oddOut) = runCli("query", "--path")
    oddCode shouldBe 2
    oddOut.head should startWith("error:")
    runCli("query", dataPath)._1 shouldBe 2
  }
}
