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
 * The hash is a seeded FNV-1a variant — any fixed 64-bit mix works for
 * MinHash as long as seeds decorrelate the permutations; no external
 * hash libs needed.
 */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Seq[Long]] {

  private def hash(tok: String, seed: Int): Long = {
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < tok.length) {
      h ^= tok.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    // final avalanche so low bits of short tokens spread
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
    h
  }

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = hash(tok, i)
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
