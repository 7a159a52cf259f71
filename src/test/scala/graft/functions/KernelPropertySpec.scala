package graft.functions

import graft.SparkSpec
import graft.text.BpeTrain
import scala.util.Random

/** Property tests for the round-8 native kernels: on seeded random
  * inputs, each must be BIT-IDENTICAL to the declarative formulation
  * twin the DuckDB oracle mirrors (the house contract for every
  * custom Expression).
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomDoc(rnd: Random): String = {
    val alphabet = "abcde"
    def word() = (1 to 1 + rnd.nextInt(6))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def junk() = rnd.nextInt(4) match {
      case 0 => word().toUpperCase
      case 1 => s"${word()}${rnd.nextInt(10)}"
      case 2 => "x-y"
      case _ => word()
    }
    val seps = Seq(" ", "  ", "\t", " \t ")
    (1 to rnd.nextInt(12)).map(_ => junk())
      .mkString(seps(rnd.nextInt(seps.length)))
  }

  test("BpeApply equals the chained-replace twin on random corpora and random merges") {
    val rnd = new Random(1234)
    for (trial <- 1 to 4) {
      val docs = (1L to 60L).map(i => (i, randomDoc(rnd))).toDF("doc_id", "text")
      // random plausible merges over the same tiny alphabet, including
      // cascades (merged tokens as lhs of later merges)
      val base = Seq("a", "b", "c", "d", "e")
      var vocab = base
      val merges = (1 to 6).map { r =>
        val l = vocab(rnd.nextInt(vocab.length))
        val rr = base(rnd.nextInt(base.length))
        vocab = vocab :+ (l + rr)
        BpeTrain.Merge(r, l, rr, 0L)
      }
      val native = BpeTrain.encode(docs, "text", merges)
        .select($"doc_id", org.apache.spark.sql.functions.array_join($"tokens", " ").as("t"))
      val twin = BpeTrain.encodeLambda(docs, "text", merges)
        .select($"doc_id", org.apache.spark.sql.functions.array_join($"tokens", " ").as("t"))
      withClue(s"trial $trial merges=${merges.map(m => m.lhs + "+" + m.rhs)}: ") {
        native.exceptAll(twin).count() shouldBe 0L
        twin.exceptAll(native).count() shouldBe 0L
      }
    }
  }

  test("AudioRms equals the transform/aggregate twin on random payloads and frame sizes") {
    val rnd = new Random(987)
    import org.apache.spark.sql.functions.{array_join, col, transform => tfm}
    def ser(c: org.apache.spark.sql.Column) =
      array_join(tfm(c, x => x.cast("string")), " ")
    for (frameSize <- Seq(1, 3, 16)) {
      val rows = (1L to 50L).map { i =>
        val n = rnd.nextInt(120)
        (i, (1 to n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
      }.toDF("id", "payload")
      val native = rows.select(col("id"),
        ser(graft.multimodal.Multimodal.audioEnergy(col("payload"), frameSize)).as("e"))
      val twin = rows.select(col("id"),
        ser(graft.multimodal.Multimodal.audioEnergyLambda(col("payload"), frameSize)).as("e"))
      withClue(s"frameSize=$frameSize: ") {
        native.exceptAll(twin).count() shouldBe 0L
        twin.exceptAll(native).count() shouldBe 0L
      }
    }
  }
}
