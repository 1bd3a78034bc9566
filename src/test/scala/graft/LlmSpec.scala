package graft

import graft.llm.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Property checks for the approximate / non-oracle LLM-data operators
  * (SURVEY.md §5.3): sketch recall vs exact ground truth, hamming
  * behavior, and the multimodal decode plumbing. */
class LlmSpec extends SparkSpec {

  test("minhash_lsh recovers >=90% of exact near-dup pairs (sf0.001)") {
    val exact = Dedup.queries("dedup_near")(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.queries("minhash_lsh")(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "ground truth empty — threshold miscalibrated")
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (|exact|=${exact.size}, |approx|=${approx.size})")
    // verification step means no false positives below the threshold
    assert((approx -- exact).isEmpty, "LSH emitted pairs below the Jaccard threshold")
  }

  test("simhash: identical texts collide, near-identical are hamming-close (literal frames)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "join filter window agg scan sort merge batch"),
      (2L, "join filter window agg scan sort merge batch"),   // identical
      (3L, "join filter window agg scan sort merge stream"),  // one token off
      (4L, "zebra yak xylophone walrus vulture termite")      // disjoint
    ).toDF("doc_id", "text")
    val out = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(out(1L) === out(2L))
    assert(hamming(out(1L), out(3L)) <= 10,
      s"near-identical docs too far: ${hamming(out(1L), out(3L))}")
    assert(hamming(out(1L), out(4L)) > hamming(out(1L), out(3L)),
      "disjoint doc not farther than near-identical doc")
  }

  test("ann_ivf: structurally sound and recall over random-chance (sf0.001)") {
    val exact = Similarity.queries("sim_topk")(spark, sf0001)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.queries("ann_ivf")(spark, sf0001).collect()
    // ≤ 5 per probe, ranks contiguous from 1
    val byProbe = ann.groupBy(_.getLong(0))
    byProbe.foreach { case (p, rows) =>
      val rns = rows.map(_.getLong(3)).sorted.toSeq
      assert(rns === (1L to rns.size).toSeq, s"probe $p ranks $rns")
      assert(rows.length <= 5)
    }
    val annPairs = ann.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & annPairs).size.toDouble / exact.size
    // nprobe=3 of nlist=10 on near-uniform synthetic vectors: random chance
    // ≈ 0.3; centroid correlation must beat it.
    assert(recall >= 0.3, s"IVF recall $recall below random-ish floor")
  }

  test("multimodal decodeFeatures: mapPartitions batch path matches expression path (sf0.001)") {
    val s = spark
    import s.implicits._
    val withPayload = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), unhex(md5(col("text"))).as("payload"))
    val decoded = Multimodal.decodeFeatures(withPayload)
    assert(decoded.count() === 500)
    // width/height derived from the same md5 bytes as the expression path
    val expr_ = Multimodal.queries("multimodal_features")(spark, sf0001)
      .select("doc_id", "width", "height")
    val joined = decoded.as("d").join(expr_.as("e"), "doc_id")
      .filter(col("d.width") =!= col("e.width") || col("d.height") =!= col("e.height"))
    assert(joined.count() === 0, "stub decode disagrees with expression-path metadata")
    assert(decoded.select("byte_len").distinct().collect().map(_.getInt(0)).toSeq === Seq(16))
  }

  test("dedup_exact idempotence (sf0.001)") {
    val out = Dedup.queries("dedup_exact")(spark, sf0001)
    assert(out.count() === out.select("doc_id").distinct().count())
  }
}
