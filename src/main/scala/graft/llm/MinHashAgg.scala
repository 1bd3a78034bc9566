package graft.llm

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * MinHash signature aggregator: per group (document), the element-wise
 * minimum of k seeded 64-bit hashes over the token stream. The
 * demonstrative custom-UDAF surface (SURVEY.md §7b) — a distributive
 * aggregate (min) so partial aggregation works map-side; merge is
 * element-wise min, so the shuffle carries k longs per doc, not tokens.
 *
 * This is the TOKEN-RELATION form of MinHash — the one you need when
 * tokens arrive as (doc_id, tok) rows (e.g. out of an explode or an
 * inverted index). When tokens sit in an in-row array, prefer the
 * expression form [[Dedup.signaturesInline]]; the two are BIT-IDENTICAL
 * because this hash replays exactly what the `xxhash64(i, tok)`
 * expression computes — seed 42, hash the int seed index, then the
 * token's UTF-8 bytes (parity-tested in LlmSpec).
 */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Seq[Long]] {

  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.types.UTF8String

  // xxhash64(i, tok) = string hash seeded with hashInt(i, 42)
  private val seeds: Array[Long] = Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    val u = UTF8String.fromString(tok)
    var i = 0
    while (i < k) {
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seeds(i))
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
