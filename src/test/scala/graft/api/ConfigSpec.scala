package graft.api

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Drives [[Client.fromConfig]] end-to-end: a YAML config declaring a
  * database with a source-loaded collection, a derived collection and
  * an indexer attaches and materializes everything through the same
  * paths the explicit API uses (reference: client.py:117 from_config,
  * api/config.py).
  */
class ConfigSpec extends SparkSpec {

  private def writeConfig(): String = {
    val base = Files.createTempDirectory("graft-cfg")
    Files.writeString(base.resolve("docs.jsonl"),
      """{"doc_id": 1, "text": "spark engines", "quality": 0.9}
        |{"doc_id": 2, "text": "low grade", "quality": 0.2}
        |{"doc_id": 3, "text": "catalyst plans", "quality": 0.7}
        |""".stripMargin)
    val cfg = base.resolve("config.yaml")
    Files.writeString(cfg,
      s"""default_database: main
         |databases:
         |  main:
         |    handle: warehouse/main
         |    collections:
         |      clean_docs:
         |        derived_from:
         |          - collection: docs
         |            where: "quality > 0.5"
         |            mappings:
         |              doc_id: doc_id
         |              shout: upper(text)
         |      docs:
         |        source:
         |          local_path: docs.jsonl
         |          format: jsonl
         |        indexers:
         |          ix:
         |            index_attributes: [text]
         |            id_attribute: doc_id
         |""".stripMargin)
    cfg.toString
  }

  test("fromConfig autoAttach wires sources, derivations and indexers") {
    val cfg = writeConfig()
    val client = new Client(spark).fromConfig(cfg, autoAttach = true)
    client.databaseNames shouldBe Seq("main")
    val db = client.database("main")
    db.collection("docs").count() shouldBe 3
    // derived collection materialized even though it precedes its
    // source in the mapping
    val derived = db.collection("clean_docs").df
    derived.columns.sorted shouldBe Array("doc_id", "shout")
    derived.count() shouldBe 2
    derived.filter(org.apache.spark.sql.functions.col("shout") === "SPARK ENGINES")
      .count() shouldBe 1
    // indexer attached and listed
    db.collection("docs").listIndexes.map(_._1) should contain("text")
    // handle resolved relative to the config's directory
    val root = Paths.get(cfg).getParent.resolve("warehouse/main")
    Files.isDirectory(root) shouldBe true
  }

  test("fromConfig without autoAttach validates but attaches nothing") {
    val cfg = writeConfig()
    val client = new Client(spark).fromConfig(cfg)
    client.databaseNames shouldBe empty
  }

  test("fromConfig resolves derived-of-derived chains declared in any order") {
    val base = Files.createTempDirectory("graft-cfg-chain")
    Files.writeString(base.resolve("docs.jsonl"),
      """{"doc_id": 1, "q": 0.9}
        |{"doc_id": 2, "q": 0.2}
        |""".stripMargin)
    val cfg = base.resolve("chain.yaml")
    // clean2 derives from clean1, DECLARED BEFORE clean1 — the attach
    // pass must reach a fixpoint, not fail on map order
    Files.writeString(cfg,
      s"""default_database: main
         |databases:
         |  main:
         |    handle: wh
         |    collections:
         |      clean2:
         |        derived_from:
         |          - {collection: clean1, mappings: {doc_id: doc_id}}
         |      clean1:
         |        derived_from:
         |          - {collection: docs, where: "q > 0.5", mappings: {doc_id: doc_id, q: q}}
         |      docs:
         |        source: {local_path: docs.jsonl, format: jsonl}
         |""".stripMargin)
    val client = new Client(spark).fromConfig(cfg.toString, autoAttach = true)
    // default_database resolves through the no-arg accessor
    val db = client.database()
    db.name shouldBe "main"
    db.collection("clean2").count() shouldBe 1
    // an unresolvable source still raises
    val bad = base.resolve("bad-chain.yaml")
    Files.writeString(bad,
      """databases:
        |  main2:
        |    handle: wh2
        |    collections:
        |      orphan:
        |        derived_from:
        |          - {collection: never_declared, mappings: {a: a}}
        |""".stripMargin)
    an[IllegalArgumentException] should be thrownBy
      new Client(spark).fromConfig(bad.toString, autoAttach = true)
  }

  test("fromConfig rejects network sources and non-mapping configs") {
    val base = Files.createTempDirectory("graft-cfg2")
    val bad = base.resolve("bad.yaml")
    Files.writeString(bad,
      """databases:
        |  main:
        |    handle: wh
        |    collections:
        |      docs:
        |        source: {url: "https://example.org/x.jsonl"}
        |""".stripMargin)
    an[IllegalArgumentException] should be thrownBy
      new Client(spark).fromConfig(bad.toString, autoAttach = true)
    // the parse pass IS the validation: the same rejection fires
    // without autoAttach (the documented validate-only mode)
    an[IllegalArgumentException] should be thrownBy
      new Client(spark).fromConfig(bad.toString)
    val scalarCfg = base.resolve("scalar.yaml")
    Files.writeString(scalarCfg, "just a string\n")
    an[IllegalArgumentException] should be thrownBy
      new Client(spark).fromConfig(scalarCfg.toString)
  }
}
