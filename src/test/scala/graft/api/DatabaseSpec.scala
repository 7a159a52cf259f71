package graft.api

import graft.SparkSpec
import graft.query.Filter
import java.nio.file.Files

class DatabaseSpec extends SparkSpec {
  import spark.implicits._

  private def freshDb(): Database =
    new Client(spark).attachDatabase("testdb",
      Files.createTempDirectory("graft-db").toString)

  test("create, list, get, drop collections") {
    val db = freshDb()
    db.createCollection("people", Seq((1, "alice"), (2, "bob")).toDF("id", "name"))
    db.createCollection("pets", Seq((1, "rex")).toDF("id", "name"))
    db.listCollectionNames shouldBe Seq("people", "pets")
    db.collection("people").count() shouldBe 2
    db.dropCollection("pets")
    db.listCollectionNames shouldBe Seq("people")
    a[IllegalArgumentException] should be thrownBy db.collection("pets")
  }

  test("store inserts into existing collections and creates missing ones") {
    val db = freshDb()
    db.createCollection("people", Seq((1, "alice")).toDF("id", "name"))
    db.store(Map(
      "people" -> Seq((2, "bob")).toDF("id", "name"),
      "pets" -> Seq((1, "rex")).toDF("owner_id", "pet")))
    db.collection("people").count() shouldBe 2
    db.collection("pets").count() shouldBe 1
  }

  test("executeSql runs ANSI SQL over the collections as views") {
    val db = freshDb()
    db.createCollection("people", Seq((1, "alice", 30), (2, "bob", 25)).toDF("id", "name", "age"))
    db.createCollection("pets", Seq((1, "rex"), (1, "tom"), (2, "flo")).toDF("owner_id", "pet"))
    val r = db.executeSql(
      """SELECT p.name, count(*) AS n_pets
        |FROM people p JOIN pets t ON p.id = t.owner_id
        |GROUP BY p.name ORDER BY p.name""".stripMargin)
      .as[(String, Long)].collect()
    r shouldBe Array(("alice", 2L), ("bob", 1L))
  }

  test("induceSchemaView emits one class definition per collection") {
    val db = freshDb()
    db.createCollection("people", Seq((1, Some("alice")), (2, None)).toDF("id", "name"))
    val sv = db.induceSchemaView()
    sv.keySet shouldBe Set("people")
    val slots = sv("people").attributes.map(s => s.name -> s).toMap
    slots("id").range shouldBe Some("integer")
    slots("name").required shouldBe false
    // the JSON view parses back per entry
    db.induceSchemaViewJson() should startWith("""{"people":{"name":"people"""")
  }

  test("exportDatabase/importDatabase round-trip all collections") {
    val db = freshDb()
    db.createCollection("people", Seq((1, "alice"), (2, "bob")).toDF("id", "name"))
    db.createCollection("pets", Seq((1, "rex")).toDF("owner_id", "pet"))
    val loc = Files.createTempDirectory("graft-exp").toString
    db.exportDatabase(loc, "jsonl")
    val db2 = freshDb()
    db2.importDatabase(loc, "jsonl")
    db2.listCollectionNames shouldBe Seq("people", "pets")
    db2.collection("people").count() shouldBe 2
    db2.collection("pets").df.columns.sorted shouldBe Array("owner_id", "pet")
  }

  test("bucketed tables join with NO shuffle exchange on either side") {
    val db = freshDb()
    val orders = (1 to 200).map(i => (i % 20, s"order_$i")).toDF("cust_id", "item")
    val custs = (0 until 20).map(i => (i, s"cust_$i")).toDF("cust_id", "cname")
    val tOrders = db.saveBucketedTable("bt_orders", orders, "cust_id", 8)
    val tCusts = db.saveBucketedTable("bt_custs", custs, "cust_id", 8)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // exchanges are inserted by EnsureRequirements, which only runs for
    // the EXECUTED plan — sparkPlan never contains them, so the check
    // must look there (with AQE off so the plan is final statically)
    def exchanges(j: org.apache.spark.sql.DataFrame) =
      j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
    try {
      // force a sort-merge join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // NEGATIVE CONTROL: the same join over non-bucketed inputs DOES
      // shuffle — proving this assertion can fail
      exchanges(orders.join(custs, "cust_id")) should not be empty
      // co-located: both sides bucketed on the join key, same count →
      // EnsureRequirements inserts NO exchange
      val j = spark.table(tOrders).join(spark.table(tCusts), "cust_id")
      exchanges(j) shouldBe empty
      j.count() shouldBe 200
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("derived collection materializes mappings and re-materializes on source change") {
    val db = freshDb()
    db.createCollection("orders",
      Seq((1L, "a", 10.0, 3L), (2L, "b", 5.0, 2L), (3L, "a", 2.0, 1L))
        .toDF("order_id", "cust", "price", "qty"))
    val derived = db.createDerivedCollection("big_orders", Derivation(
      source = "orders",
      where = Some("price * qty >= 10.0"),
      mappings = Seq("id" -> "order_id", "customer" -> "cust", "total" -> "price * qty")))
    derived.df.columns.toSeq shouldBe Seq("id", "customer", "total")
    derived.df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq shouldBe Seq((1L, "a", 30.0), (2L, "b", 10.0))
    // the spec round-trips from disk
    db.derivationOf("big_orders").get.mappings.map(_._1) shouldBe Seq("id", "customer", "total")
    // source changes, re-materialization reflects them
    db.collection("orders").insert(Seq((4L, "c", 100.0, 1L)).toDF("order_id", "cust", "price", "qty"))
    db.rematerializeDerived("big_orders")
    db.collection("big_orders").count() shouldBe 3
    // a fresh handle on the same root still knows the derivation
    val again = new Database(spark, db.root, "again")
    again.derivationOf("big_orders").get.source shouldBe "orders"
    again.materializeDerivations()
    again.collection("big_orders").count() shouldBe 3
  }

  test("source-declared collection loads at declare time and refreshes explicitly") {
    val db = freshDb()
    val dir = Files.createTempDirectory("graft-src")
    val f = dir.resolve("people.jsonl")
    Files.writeString(f, "{\"id\": 1, \"name\": \"alice\"}\n{\"id\": 2, \"name\": \"bob\"}\n")
    val coll = db.declareSource("people", f.toString, "jsonl")
    coll.count() shouldBe 2
    // loadIfExists=false (default): an already-populated collection is untouched
    Files.writeString(f, "{\"id\": 3, \"name\": \"carol\"}\n")
    db.loadFromSource("people")
    db.collection("people").count() shouldBe 2
    // explicit refresh re-reads the source
    db.loadFromSource("people", loadIfExists = true)
    db.collection("people").count() shouldBe 1
  }

  test("source-declared glob loads every matching file with format inference") {
    val db = freshDb()
    val dir = Files.createTempDirectory("graft-src-glob")
    Files.writeString(dir.resolve("a.jsonl"), "{\"id\": 1}\n")
    Files.writeString(dir.resolve("b.jsonl"), "{\"id\": 2}\n{\"id\": 3}\n")
    val coll = db.declareSource("merged", s"$dir/*.jsonl")
    coll.count() shouldBe 3
  }

  test("client tracks attached databases") {
    val client = new Client(spark)
    client.attachDatabase("a", Files.createTempDirectory("ga").toString)
    client.attachDatabase("b", Files.createTempDirectory("gb").toString)
    client.databaseNames shouldBe Seq("a", "b")
    a[NoSuchElementException] should be thrownBy client.database("zzz")
  }

  test("dropDatabase detaches the handle and clears collections on disk") {
    val client = new Client(spark)
    val root = Files.createTempDirectory("graft-drop").toString
    val db = client.attachDatabase("d", root)
    db.createCollection("c1", Seq((1, "x")).toDF("id", "v"))
    client.dropDatabase("d")
    client.databaseNames shouldBe empty
    new Database(spark, root, "d").listCollectionNames shouldBe empty
    a[NoSuchElementException] should be thrownBy client.dropDatabase("d")
    client.dropDatabase("d", missingOk = true) // no throw
    // dropAllDatabases empties the handle map
    client.attachDatabase("e", Files.createTempDirectory("ge").toString)
    client.attachDatabase("f", Files.createTempDirectory("gf").toString)
    client.dropAllDatabases()
    client.databaseNames shouldBe empty
  }

  test("attachParquet exposes external data read-only") {
    val db = freshDb()
    val p = Files.createTempDirectory("graft-ext").resolve("t.parquet").toString
    Seq((10, "x")).toDF("id", "v").write.parquet(p)
    db.attachParquet("ext", p).count() shouldBe 1
  }

  test("collection exists and getOne") {
    val db = freshDb()
    db.createCollection("people", Seq((1, "alice"), (2, "bob")).toDF("id", "name"))
    val c = new Collection("people", db.collection("people").df)
    c.exists(Filter.eq("name", "alice")) shouldBe true
    c.exists(Filter.eq("name", "zed")) shouldBe false
    c.getOne("id", 2).get.getAs[String]("name") shouldBe "bob"
    c.getOne("id", 99) shouldBe None
  }

  test("collection search ranks the matching document first") {
    val docs = Seq(
      (1, "spark cluster computing engine"),
      (2, "cats and dogs playing"),
      (3, "spark cluster computing framework")
    ).toDF("doc_id", "text")
    val c = new Collection("docs", docs)
    val top = c.search("text", "spark cluster computing", k = 2)
      .select("doc_id").as[Int].collect()
    top.toSet shouldBe Set(1, 3)
  }

  test("searchMmr diversifies: near-duplicate of rank-1 is demoted") {
    val docs = Seq(
      (1, "spark cluster computing engine"),
      (2, "spark cluster computing engine"), // exact dup of 1
      (3, "spark framework for data"),
      (4, "unrelated gardening tips")
    ).toDF("doc_id", "text")
    val c = new Collection("docs", docs)
    val r = c.searchMmr("text", "spark cluster computing", k = 3,
      fetchK = 4, relevanceFactor = 0.5)
      .orderBy("mmr_rank").select("doc_id").as[String].collect()
    // first pick: one of the two identical top docs; second pick must NOT
    // be its exact duplicate (maximal redundancy)
    Set("1", "2") should contain(r(0))
    r(1) should not be (if (r(0) == "1") "2" else "1")
  }
}
