package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared salted-copy corpus builders for the scale-evidence mains —
  * ONE definition so ScaleSmoke's decade smokes and
  * BucketLoadDecades' fuel audit measure the SAME synthetic corpus
  * (a silent drift between hand-copied builders would make their
  * evidence files incomparable with no compiler signal).
  */
object ScaleCorpus {

  /** k salted copies of an embeddings frame: copy 0 is the original;
    * higher copies shift ids and jitter every component. The jitter
    * must vary PER ROW (vec_id enters the phase): a constant per-copy
    * offset would shift every row of a copy toward the same direction
    * and collapse whole copies into a handful of sign-bit buckets —
    * measuring that artifact, not the operator.
    */
  def embsX(embs: DataFrame, k: Int): DataFrame = (0 until k).map { i =>
    if (i == 0) embs
    else embs.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
      transform(col("embedding"),
        (x, j) => x + lit(0.25f) *
          cos(j.cast("double") * lit(i.toDouble) + col("vec_id").cast("double"))
            .cast("float")).as("embedding"))
  }.reduce(_ unionByName _)

  /** k salted copies of a documents frame (doc_id, lang, text): copy 0
    * is the original; higher copies shift ids and suffix every word
    * with "_i", so cross-copy rows never pair (shingles, signatures
    * and edit distances all diverge) while per-copy near-dup structure
    * replicates exactly. Word-INTERIOR char grams stay shared across
    * copies — their df grows k-fold, which is precisely the hot-token
    * pressure the Ed-Join prefix order must keep out of the inverted
    * index.
    */
  def docsX(docs: DataFrame, k: Int): DataFrame = (0 until k).map { i =>
    if (i == 0) docs
    else docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
      col("lang"),
      concat_ws(" ", transform(split(col("text"), " "),
        t => concat(t, lit(s"_$i")))).as("text"))
  }.reduce(_ unionByName _)
}
