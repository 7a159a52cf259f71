package graft.ops

import graft.SparkSpec
import graft.text.QualityFilter
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TrainPipelineSpec extends SparkSpec {
  import spark.implicits._

  // --- Chunking ----------------------------------------------------

  test("chunk: overlapping windows with truncated tail") {
    val df = Seq((1L, "a b c d e")).toDF("id", "text")
    val out = Chunking.chunk(df, "id", "text", win = 3, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_chunk_toks", "chunk")
      .collect()
    out.map(_.getString(3)).toSeq shouldBe Seq("a b c", "c d e", "e")
    out.map(_.getInt(2)).toSeq shouldBe Seq(3, 3, 1)
    out.map(_.getInt(1)).toSeq shouldBe Seq(0, 2, 4)
  }

  test("chunk: doc shorter than the window is one whole chunk") {
    val df = Seq((1L, "x y")).toDF("id", "text")
    val out = Chunking.chunk(df, "id", "text", win = 16, stride = 8).collect()
    out.length shouldBe 1
    out.head.getAs[String]("chunk") shouldBe "x y"
    out.head.getAs[Int]("n_chunk_toks") shouldBe 2
  }

  test("chunk: empty string is a single empty chunk; null text drops") {
    val df = Seq((1L, ""), (2L, null)).toDF("id", "text")
    val out = Chunking.chunk(df, "id", "text").collect()
    out.length shouldBe 1
    out.head.getAs[Long]("id") shouldBe 1L
    out.head.getAs[String]("chunk") shouldBe ""
  }

  test("chunk: stride larger than window leaves gaps but covers every start") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val out = Chunking.chunk(df, "id", "text", win = 2, stride = 5)
      .orderBy("chunk_idx").collect()
    out.map(_.getAs[String]("chunk")).toSeq shouldBe Seq("t1 t2", "t6 t7")
  }

  // --- Interleave --------------------------------------------------

  test("interleave: rounds number 1..n within each source, deterministically") {
    val df = (1L to 20L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val out = TrainStream.interleave(df, "id", "src", salt = "s").collect()
    val bySrc = out.groupBy(_.getAs[String]("src"))
    bySrc.foreach { case (_, rows) =>
      rows.map(_.getAs[Int]("round")).sorted.toSeq shouldBe (1 to rows.length)
    }
    // deterministic across invocations
    val again = TrainStream.interleave(df, "id", "src", salt = "s").collect()
    out.map(r => (r.getLong(0), r.getInt(3))).sortBy(_._1).toSeq shouldBe
      again.map(r => (r.getLong(0), r.getInt(3))).sortBy(_._1).toSeq
    // a different salt permutes at least one source's order
    val other = TrainStream.interleave(df, "id", "src", salt = "t").collect()
    val a = out.map(r => (r.getLong(0), r.getInt(3))).toMap
    val b = other.map(r => (r.getLong(0), r.getInt(3))).toMap
    a should not equal b
  }

  // --- Sequence packing --------------------------------------------

  test("packSequences: offsets equal a naive single-node prefix sum") {
    val docs = (0L until 300L).map(i => (i, (0 to (i % 17).toInt).map(j => s"w$j").mkString(" ")))
    val df = docs.toDF("id", "text")
    val out = TrainStream.packSequences(df, "id", "text", seqLen = 64, salt = "p")
      .collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Int]("n_toks"), r.getAs[Long]("start_off"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("pos_in_seq"))).sortBy(_._3)
    // naive: sort by (md5(id ++ salt), id), running offset
    def mk(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"${id}p".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val expected = docs.map { case (id, t) => (id, t.split(" ", -1).length) }
      .sortBy { case (id, _) => (mk(id), id) }
    var off = 0L
    val naive = expected.map { case (id, n) =>
      val r = (id, n, off, off / 64, off % 64); off += n; r
    }
    out.toSeq shouldBe naive
    // every doc's start_off is consistent: sum of all n_toks below it
    out.map(_._2.toLong).sum shouldBe off
  }

  test("packSequences: contiguous — each start_off is the previous end") {
    val df = (0L until 50L).map(i => (i, "a b c")).toDF("id", "text")
    val rows = TrainStream.packSequences(df, "id", "text", seqLen = 7, salt = "")
      .orderBy("start_off").collect()
    rows.sliding(2).foreach {
      case Array(p, n) =>
        n.getAs[Long]("start_off") shouldBe
          p.getAs[Long]("start_off") + p.getAs[Int]("n_toks")
      case _ =>
    }
  }

  // --- Quality filter ----------------------------------------------

  test("quality flags: each rule fires independently; passes is the conjunction") {
    // 30 tokens with stopwords sprinkled in (the stop rule needs >= 2%)
    val good = (1 to 28).map(i => s"word$i").mkString("the ", " ", " of")
    val short = "tiny doc"                                       // fails len
    val punct = ("the" +: (1 to 29).map(_ => "!!!")).mkString(" ") // fails punct
    val digits = ("the" +: (1 to 29).map(_.toString)).mkString(" ") // digit-heavy
    val noStops = (1 to 30).map(i => s"word$i").mkString(" ")    // zero stopwords
    val df = Seq((1L, good), (2L, short), (3L, punct), (4L, digits), (5L, noStops))
      .toDF("id", "text")
    val out = QualityFilter.flags(df, "id", "text")
      .orderBy("id").collect()
    out(0).getAs[Int]("passes") shouldBe 1
    out(1).getAs[Int]("len_ok") shouldBe 0
    out(1).getAs[Int]("passes") shouldBe 0
    out(2).getAs[Int]("punct_ok") shouldBe 0
    out(2).getAs[Int]("passes") shouldBe 0
    out(3).getAs[Int]("digit_ok") shouldBe 0
    out(3).getAs[Int]("passes") shouldBe 0
    out(4).getAs[Int]("stop_ok") shouldBe 0 // the stopword floor fires
    out(4).getAs[Int]("passes") shouldBe 0
  }

  // --- Temperature mixing ------------------------------------------

  test("mixSample: alpha=1 keeps natural proportions; alpha=0 equalizes sources") {
    // source a: 900 docs, source b: 100 docs
    val df = ((1L to 900L).map((_, "a")) ++ (901L to 1000L).map((_, "b")))
      .toDF("id", "src")
    val nat = TrainStream.mixSample(df, "id", "src", alpha = 1.0, targetDocs = 500)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash-cutoff sampling: counts track the expectation within a few %
    nat("a").toDouble shouldBe 450.0 +- 60.0
    nat("b").toDouble shouldBe 50.0 +- 25.0
    val flat = TrainStream.mixSample(df, "id", "src", alpha = 0.0, targetDocs = 200)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    flat("a").toDouble shouldBe 100.0 +- 30.0
    flat("b").toDouble shouldBe 100.0 +- 30.0
  }

  test("mixSample is deterministic per salt and disjoint-ish across salts") {
    val df = (1L to 500L).map((_, "a")).toDF("id", "src")
    val s1 = TrainStream.mixSample(df, "id", "src", 1.0, 100, salt = "x")
      .collect().map(_.getLong(0)).toSet
    val s2 = TrainStream.mixSample(df, "id", "src", 1.0, 100, salt = "x")
      .collect().map(_.getLong(0)).toSet
    s1 shouldBe s2
    val other = TrainStream.mixSample(df, "id", "src", 1.0, 100, salt = "y")
      .collect().map(_.getLong(0)).toSet
    other should not be s1 // an independent draw
    // a 100%-budget request keeps everything (rate caps at 1)
    TrainStream.mixSample(df, "id", "src", 1.0, 10000).count() shouldBe 500L
  }

  // --- Token budget -------------------------------------------------

  test("tokenBudget keeps exactly the hash-order prefix of each source") {
    val df = ((1L to 50L).map(i => (i, "a", ("t " * 10).trim)) ++
      (51L to 60L).map(i => (i, "b", "t t t")))
      .toDF("id", "src", "text")
    val out = TrainStream.tokenBudget(df, "id", "src", "text", budgetPerSource = 100)
      .collect()
    // every kept doc STARTS inside the budget
    out.foreach { r => r.getAs[Long]("cum_before") should be < 100L }
    // source a: 10-token docs -> exactly 10 kept (offsets 0,10,...,90)
    out.count(_.getString(1) == "a") shouldBe 10
    // source b: 3-token docs, all 10 fit (30 tokens total)
    out.count(_.getString(1) == "b") shouldBe 10
    // offsets are a consistent prefix: sorted cum_before steps by n_toks
    val aOffsets = out.filter(_.getString(1) == "a").map(_.getAs[Long]("cum_before")).sorted
    aOffsets shouldBe (0 until 10).map(_ * 10L).toArray
  }

  test("tokenBudget plan: no partition-less window, no cartesian") {
    val df = (0L until 20L).map(i => (i, if (i % 2 == 0) "a" else "b", "x y z"))
      .toDF("id", "src", "text")
    val plan = TrainStream.tokenBudget(df, "id", "src", "text", 10)
      .queryExecution.sparkPlan
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec
    plan.collect { case c: CartesianProductExec => c } shouldBe empty
    plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w } shouldBe empty
    graft.api.CacheScope.global.release(blocking = true)
  }

  test("packSequences plan: no partition-less window, no cartesian") {
    val df = (0L until 20L).map(i => (i, "a b")).toDF("id", "text")
    val plan = TrainStream.packSequences(df, "id", "text")
      .queryExecution.sparkPlan
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec
    plan.collect { case c: CartesianProductExec => c } shouldBe empty
    // every Window must partition (the distributed prefix-sum contract)
    plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w } shouldBe empty
  }

  // --- Token-balanced shard assignment ------------------------------

  test("shardAssign: every shard is a contiguous hash-order run within one doc of the budget") {
    val docs = (1L to 60L).map(i => (i, ("t " * 10).trim)).toDF("id", "text")
    val out = TrainStream.shardAssign(docs, "id", "text", shardTokens = 100)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    graft.api.CacheScope.global.release()
    out.length shouldBe 60
    // 600 tokens / 100-token shards -> shards 0..5, 10 docs each
    val byShard = out.groupBy(_._4)
    byShard.keySet shouldBe (0 to 5).toSet
    byShard.values.foreach(_.length shouldBe 10)
    // shard = cum_before div budget, offsets consistent with doc sizes
    out.foreach { case (_, nt, cum, shard) =>
      nt shouldBe 10
      shard shouldBe (cum / 100).toInt
    }
    // hash-order contiguity: sorting by cum_before gives non-decreasing shard ids
    out.sortBy(_._3).map(_._4).sliding(2).foreach {
      case Array(a, b) => a should be <= b
      case _ =>
    }
  }

  test("shardAssign plan: no partition-less window, no cartesian; deterministic") {
    val docs = (0L until 30L).map(i => (i, "x y z")).toDF("id", "text")
    val plan = TrainStream.shardAssign(docs, "id", "text", 10)
      .queryExecution.sparkPlan
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec
    plan.collect { case c: CartesianProductExec => c } shouldBe empty
    plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w } shouldBe empty
    graft.api.CacheScope.global.release(blocking = true)
    def run() = {
      val r = TrainStream.shardAssign(docs, "id", "text", 10)
        .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
      graft.api.CacheScope.global.release(); r
    }
    run() shouldBe run()
  }

  // --- Length-bucketed batching -----------------------------------

  test("lengthBatches: integer-exact power-of-two buckets, contiguous batches") {
    // token counts 1,2,3,4,7,8,9: buckets 0,1,1,2,2,3,3 — the 4 and 8
    // boundaries are exactly where an FP log2 would misbucket
    val docs = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"),
      (5L, (1 to 7).map(_ => "w").mkString(" ")),
      (6L, (1 to 8).map(_ => "w").mkString(" ")),
      (7L, (1 to 9).map(_ => "w").mkString(" "))).toDF("id", "text")
    val out = TrainStream.lengthBatches(docs, "id", "text", batchSize = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4)))
    graft.api.CacheScope.global.release()
    out.map(t => t._1 -> t._2).toMap shouldBe
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2, 6L -> 3, 7L -> 3)
    // within each bucket: sequence numbers are 0..n-1 (dense) and the
    // batch id is seq div batchSize
    out.groupBy(_._2).foreach { case (_, rows) =>
      rows.map(_._3).sorted shouldBe rows.indices.map(_.toLong)
      rows.foreach { case (_, _, seq, batch) => batch shouldBe seq / 2 }
    }
  }

  test("lengthBatches is deterministic and salt-sensitive") {
    val docs = (1L to 40L).map(i => (i, (1 to 16).map(_ => "w").mkString(" ")))
      .toDF("id", "text")
    def order(salt: String) = {
      val r = TrainStream.lengthBatches(docs, "id", "text", 8, salt)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      graft.api.CacheScope.global.release(); r
    }
    order("x") shouldBe order("x")
    order("x") should not be order("y")
  }

  // --- MLM masking -------------------------------------------------

  test("mlmMask: deterministic, target order preserved, token counts consistent") {
    val df = Seq((1L, "a b c d e f g h i j")).toDF("id", "text")
    val r1 = TrainStream.mlmMask(df, "id", "text", ratePerMille = 500, salt = "s").collect().head
    val r2 = TrainStream.mlmMask(df, "id", "text", ratePerMille = 500, salt = "s").collect().head
    r1 shouldBe r2 // no RNG anywhere
    val masked = r1.getString(3).split(" ")
    val targets = r1.getString(4).split(" ").filter(_.nonEmpty)
    masked.length shouldBe 10
    r1.getInt(2) shouldBe targets.length
    // reconstruct: substituting targets back at [MASK] positions
    // yields the original text (order preserved)
    val it = targets.iterator
    masked.map(t => if (t == "[MASK]") it.next() else t).mkString(" ") shouldBe
      "a b c d e f g h i j"
  }

  test("mlmMask: rate 0 masks nothing, rate 1000 masks everything; salt varies masks") {
    val df = Seq((7L, "x y z w v")).toDF("id", "text")
    val none = TrainStream.mlmMask(df, "id", "text", ratePerMille = 0).collect().head
    none.getInt(2) shouldBe 0
    none.getString(3) shouldBe "x y z w v"
    none.getString(4) shouldBe ""
    val all = TrainStream.mlmMask(df, "id", "text", ratePerMille = 1000).collect().head
    all.getInt(2) shouldBe 5
    all.getString(4) shouldBe "x y z w v"
    // 24 tokens => identical masks across salts has odds ~2^-24
    val long = Seq((9L, (1 to 24).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val a = TrainStream.mlmMask(long, "id", "text", 500, salt = "ep1").collect().head.getString(3)
    val b = TrainStream.mlmMask(long, "id", "text", 500, salt = "ep2").collect().head.getString(3)
    a should not be b // fresh masks per epoch
  }

  test("mlmMask is map-only: no exchange") {
    val plan = TrainStream.mlmMask(Seq((1L, "a b")).toDF("id", "text"), "id", "text")
      .queryExecution.sparkPlan.toString
    (plan should not).include("Exchange")
  }
}
