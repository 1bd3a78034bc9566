package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Builder-owned stress-corpus generator (VERDICT r4 item 1): the shipped
 * testdata tops out at sf0.1 (600 k lineitem, 5 k docs), where every
 * headline query finishes ≤ 2 s and the bench measures fixed overhead
 * more than algorithmic scaling. This main writes the SAME table shapes
 * at 1×/3×/10× that scale (up to 100 k docs, 200 k vectors, 6 M
 * lineitem) into a builder-owned directory so StressBench can measure
 * growth EXPONENTS, not just absolute times. `/root/testdata` is never
 * touched.
 *
 * Design constraints:
 *  - DETERMINISTIC: every row is a pure function of its id via a
 *    splitmix64 stream — re-running the generator reproduces the corpus
 *    bit-for-bit, so committed bench artifacts are reproducible.
 *  - PLANTED STRUCTURE the dedup/similarity operators are built for:
 *     * documents: ids ≡ 9 (mod 10) are near-dups of id-1 with exactly
 *       one token replaced — distinct-set Jaccard (d-1)/(d+1) ≥ 0.95 for
 *       the ≥ 100-token docs generated here, i.e. above the operators'
 *       0.95 threshold; ids ≡ 98 (mod 100) are EXACT dups of id-2
 *       (exercises the curate pipeline's stage-1 collapse). ~10% of the
 *       corpus is planted near-dup mass, growing LINEARLY with size —
 *       the signal an LSH candidate count must track.
 *     * embeddings: 20-vector clusters around unit centers with
 *       within-cluster cos ≈ 0.5 (matching the fixture's "tops out at
 *       0.5" regime); ids ≡ 9 (mod 10) are tight copies of id-1
 *       (cos ≈ 0.999) — the planted near-dup mass for hyperplane LSH.
 *     * lineitem/orders: replicated from sf0.1 with order keys shifted
 *       per replica and dates/prices untouched — distributions (and so
 *       rows-per-date-bin DENSITY) scale exactly linearly, which is the
 *       quantity join_range_binned's candidate bound is about.
 *  - Zipf token draws (rank = V^u over V=30 000) give documents a
 *    realistic head-heavy vocabulary: random pairs land far below the
 *    0.95 Jaccard threshold while still sharing head tokens, so banding
 *    has genuine noise to prune.
 */
object StressGen {

  val Vocab = 30000

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Counter-mode splitmix64: stateless-per-seed, no coordination. */
  final class Rng(seed: Long) {
    private var n = 0L
    def nextLong(): Long = { n += 1; mix64(seed * 0x632be59bd9b4e019L + n) }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53)
    def nextGaussian(): Double = {
      val u1 = 1.0 - nextDouble() // (0, 1] — ln never sees 0
      val u2 = nextDouble()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
  }

  // ---- documents ----

  private def zipfRank(r: Rng): Int =
    math.min(Vocab, math.max(1, math.pow(Vocab.toDouble, r.nextDouble()).toInt))

  /** 100–250 Zipf tokens; ≥ 100 keeps the one-token-mutation Jaccard
    * (d-1)/(d+1) safely above 0.95 (d ≈ 60+ distinct at this length). */
  def baseTokens(id: Long): Array[String] = {
    val r = new Rng(id * 2 + 1)
    val n = 100 + ((r.nextLong() >>> 1) % 151).toInt
    Array.fill(n)("w" + zipfRank(r))
  }

  /** The token sequence doc `id` actually displays (exact-dup ids show
    * their base's text) — near-dup variants must mutate THIS, not the
    * never-displayed baseTokens of an exact-dup id. */
  private def displayTokens(id: Long): Array[String] =
    if (id % 100 == 98) baseTokens(id - 2) else baseTokens(id)

  def docRow(id: Long): (Long, String, String, String, Long) = {
    val toks =
      if (id % 100 == 98) baseTokens(id - 2) // planted EXACT duplicate
      else if (id % 10 == 9) { // planted NEAR duplicate, j >= 0.95
        val t = displayTokens(id - 1)
        val r = new Rng(id * 7 + 3)
        t(((r.nextLong() >>> 1) % t.length).toInt) = "m" + (r.nextLong() >>> 40)
        t
      } else baseTokens(id)
    val r2 = new Rng(id * 13 + 5)
    val langs = Array("en", "en", "en", "en", "en", "en", "en", "de", "fr", "zh")
    val lang = langs(((r2.nextLong() >>> 1) % 10).toInt)
    val source = "src" + ((r2.nextLong() >>> 1) % 8)
    val text = toks.mkString(" ")
    (id, text, lang, source, text.length.toLong)
  }

  // ---- embeddings ----

  val ClusterSize = 20
  val Dim = 64

  private def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val inv = (1.0 / math.sqrt(s)).toFloat
    v.map(_ * inv)
  }

  private def unitVec(r: Rng): Array[Float] =
    normalize(Array.fill(Dim)(r.nextGaussian().toFloat))

  /** Cluster member: unit center + unit-norm noise → pairwise
    * within-cluster cos ≈ 0.5 (1 / (√2·√2)). */
  private def clusterMember(id: Long): Array[Float] = {
    val center = unitVec(new Rng((id / ClusterSize) * 1000003L + 17))
    val r = new Rng(id * 3 + 11)
    normalize(Array.tabulate(Dim)(i =>
      center(i) + (r.nextGaussian() / 8.0).toFloat))
  }

  def embRow(id: Long): (Long, Array[Float], Int) = {
    val v =
      if (id % 10 == 9) { // planted near-dup: cos ≈ 0.999 vs id-1
        val b = clusterMember(id - 1)
        val r = new Rng(id * 31 + 7)
        normalize(Array.tabulate(Dim)(i =>
          b(i) + (0.05 * r.nextGaussian() / 8.0).toFloat))
      } else clusterMember(id)
    (id, v, ((id / ClusterSize) % 10).toInt)
  }

  // ---- relational replication ----

  /** k disjoint key-shifted copies: distributions, date windows and
    * per-bin densities scale exactly linearly; keys never collide
    * (sf0.1 keys < 10⁷ ≪ the 10⁸ stride). */
  private def replicate(spark: SparkSession, srcDir: String, outDir: String,
      table: String, keyCols: Seq[String], factor: Int): Unit = {
    val df = spark.read.parquet(s"$srcDir/$table.parquet")
    val out = (0 until factor).map { i =>
      keyCols.foldLeft(df) { (d, k) =>
        d.withColumn(k, col(k) + lit(i.toLong * 100000000L))
      }
    }.reduce(_ unionByName _)
    out.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
  }

  def writeScale(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    import spark.implicits._
    val docN = 10000L * factor
    val embN = 20000L * factor
    spark.range(0, docN, 1, 32).map((id: java.lang.Long) => docRow(id))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.range(0, embN, 1, 32).map((id: java.lang.Long) => embRow(id))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    replicate(spark, srcDir, outDir, "lineitem", Seq("l_orderkey"), factor)
    replicate(spark, srcDir, outDir, "orders", Seq("o_orderkey"), factor)
    // events: key-shift user_id AND event_id — each copy is a disjoint
    // user population with an identical timeline, so sessions/windows
    // per user are invariant and total work must scale linearly; the
    // per-hour event density (gap-fill grids, time-rolling frames)
    // grows exactly ×factor.
    replicate(spark, srcDir, outDir, "events", Seq("event_id", "user_id"), factor)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outRoot = if (args.length > 1) args(1) else "stressdata"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stressgen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    for ((name, factor) <- Seq(("s1", 1), ("s3", 3), ("s10", 10), ("s30", 30))) {
      writeScale(spark, srcDir, s"$outRoot/$name", factor)
      println(s"[stressgen] wrote $outRoot/$name (factor $factor)")
    }
    spark.stop()
  }
}
