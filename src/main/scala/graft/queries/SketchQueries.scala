package graft.queries

import graft.Tables
import graft.ops.Sketches

/** Deterministic-sketch tier (SURVEY §2 rows 61c-61h): HLL distinct
  * estimation + the register-merge proof, and KMV bottom-k distinct /
  * set-similarity estimation — every estimate audited in-query against
  * its exact counterpart, and every hash portable, so the DuckDB
  * oracle replays the sketch REGISTERS, not just the answer (the
  * q_cms_topk convention; contrast approx_count_distinct, whose
  * engine-internal hash is only rows-checkable).
  *
  * Parameters pick the estimator's honest regime at the driver's
  * sf0.01 gate: lineitem has ~11k distinct orderkeys per returnflag,
  * so p=8 (m=256 registers, ~6.5% stderr) sits in HLL's raw-estimate
  * range and k=64 < n engages the KMV tail formula; the documents
  * sources carry ~1.4k distinct 3-gram shingles each, so k=256 is a
  * genuine union subsample.
  */
object SketchQueries extends QuerySet {

  def all: Seq[Q] = Seq(
    Q("q_hll_distinct",
      (s, d) => Sketches.hllDistinct(
        Tables.df(s, d, "lineitem"), "l_orderkey", "l_returnflag", p = 8),
      Some(Sketches.hllDistinctDuckSql("lineitem", "l_orderkey", "l_returnflag", p = 8))),

    Q("q_hll_union",
      (s, d) => Sketches.hllUnionMerge(
        Tables.df(s, d, "lineitem"), "l_orderkey", "l_returnflag", p = 8),
      Some(Sketches.hllUnionMergeDuckSql("lineitem", "l_orderkey", "l_returnflag", p = 8))),

    Q("q_kmv_distinct",
      (s, d) => Sketches.kmvDistinct(
        Tables.df(s, d, "lineitem"), "l_orderkey", "l_returnflag", k = 64),
      Some(Sketches.kmvDistinctDuckSql("lineitem", "l_orderkey", "l_returnflag", k = 64))),

    Q("q_kmv_jaccard",
      (s, d) => Sketches.kmvJaccard(
        Tables.df(s, d, "documents"), "source", "text", w = 3, k = 256),
      Some(Sketches.kmvJaccardDuckSql("documents", "source", "text", w = 3, k = 256))),

    // Set-operation cardinalities from the same signatures: |A∪B| from
    // the union-kth estimator, |A∩B| = Ĵ·|A∪B|^ (Beyer 2007), audited
    // against exact counts — the signature algebra that substitutes for
    // raw sets at 100 TB (|A\B| follows as |A| − |A∩B|).
    Q("q_kmv_setops",
      (s, d) => Sketches.kmvSetOps(
        Tables.df(s, d, "documents"), "source", "text", w = 3, k = 256),
      Some(Sketches.kmvSetOpsDuckSql("documents", "source", "text", w = 3, k = 256))),

    Q("q_quantile_sketch",
      (s, d) => Sketches.quantileSketch(
        Tables.df(s, d, "events"), "event_type", "value", "event_id", n = 512),
      Some(Sketches.quantileSketchDuckSql("events", "event_type", "value", "event_id", n = 512))),

    // Parameter-accuracy sweep: the same corpus measured at p∈{8,12}
    // and k∈{64,256} so HLL's register count and KMV's signature size
    // are picked from DATA (the q_ann_recall convention for sketches).
    // The corpus hashes once; each grid cell is one bounded aggregate.
    Q("q_sketch_tuning",
      (s, d) => Sketches.sketchTuning(
        Tables.df(s, d, "lineitem"), "l_orderkey",
        hllPs = Seq(8, 12), kmvKs = Seq(64, 256)),
      Some(Sketches.sketchTuningDuckSql("lineitem", "l_orderkey",
        hllPs = Seq(8, 12), kmvKs = Seq(64, 256)))))
}
