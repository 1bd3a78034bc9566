package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property gates for the stress-corpus generator: the BENCH_stress
  * exponents are only meaningful if the planted structure actually has
  * the claimed geometry, so the claims are pinned here (pure functions —
  * no SparkSession needed). */
class StressGenSpec extends AnyFunSuite {

  private def jaccard(a: Array[String], b: Array[String]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    d / math.sqrt(na * nb)
  }

  test("generator is deterministic: same id, same row") {
    assert(StressGen.docRow(12345L) === StressGen.docRow(12345L))
    assert(StressGen.embRow(999L)._2.toSeq === StressGen.embRow(999L)._2.toSeq)
  }

  test("planted near-dup docs (id % 10 == 9) sit at Jaccard >= 0.95 of id-1") {
    val pairs = (0 until 500).map(k => 10L * k + 9)
    val js = pairs.map { id =>
      jaccard(StressGen.docRow(id)._2.split(" "),
        StressGen.docRow(id - 1)._2.split(" "))
    }
    assert(js.forall(_ >= 0.95), s"min planted jaccard = ${js.min}")
    assert(js.forall(_ < 1.0), "mutation must actually change the token set")
  }

  test("planted exact dups (id % 100 == 98) have identical text to id-2") {
    for (k <- 0 until 50) {
      val id = 100L * k + 98
      assert(StressGen.docRow(id)._2 === StressGen.docRow(id - 2)._2)
    }
  }

  test("random doc pairs land far below the 0.95 threshold") {
    val js = (0 until 200).map { k =>
      jaccard(StressGen.docRow(20L * k)._2.split(" "),
        StressGen.docRow(20L * k + 7)._2.split(" "))
    }
    assert(js.max < 0.8, s"random pair jaccard too high: ${js.max}")
  }

  test("docs are 100-250 tokens with Zipf-headed vocab") {
    val lens = (0 until 300).map(k => StressGen.docRow(k * 3L)._2.split(" ").length)
    assert(lens.forall(n => n >= 100 && n <= 250), s"len range ${lens.min}..${lens.max}")
  }

  test("planted near-dup embeddings (id % 10 == 9) have cos >= 0.99 vs id-1") {
    val cs = (0 until 300).map { k =>
      val id = 10L * k + 9
      cos(StressGen.embRow(id)._2, StressGen.embRow(id - 1)._2)
    }
    assert(cs.forall(_ >= 0.99), s"min planted cos = ${cs.min}")
  }

  test("same-cluster embeddings sit near cos 0.5; cross-cluster near 0") {
    val within = (0 until 200).map { k =>
      val base = k.toLong * StressGen.ClusterSize
      cos(StressGen.embRow(base)._2, StressGen.embRow(base + 3)._2)
    }
    val mWithin = within.sum / within.size
    assert(mWithin > 0.35 && mWithin < 0.65, s"mean within-cluster cos $mWithin")
    val across = (0 until 200).map { k =>
      cos(StressGen.embRow(k.toLong * StressGen.ClusterSize)._2,
        StressGen.embRow((k + 1000).toLong * StressGen.ClusterSize)._2)
    }
    val mAcross = across.sum / across.size
    assert(math.abs(mAcross) < 0.1, s"mean cross-cluster cos $mAcross")
    // unit norm
    val v = StressGen.embRow(42L)._2
    assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
  }
}
