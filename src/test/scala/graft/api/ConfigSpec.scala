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
    val scalarCfg = base.resolve("scalar.yaml")
    Files.writeString(scalarCfg, "just a string\n")
    an[IllegalArgumentException] should be thrownBy
      new Client(spark).fromConfig(scalarCfg.toString)
  }
}
