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

  // ---- Zipf-skewed key variant (VERDICT r5 item 3) ----

  /** Rank support of the skewed key space. */
  val SkewRanks = 10000
  /** Zipf exponent (the verdict's example shape for a 100 TB event
    * log); the Mandelbrot offset below calibrates the HEAD to the
    * stated target instead of the untruncated s=1.2 head of ~21 %. */
  val SkewS = 1.2
  /** Target share of the hottest key (~5 % of all rows). */
  val SkewHotShare = 0.05

  /** Zipf–Mandelbrot CDF over ranks 1..SkewRanks: P(r) ∝ (r+q)^-s with
    * q bisected so P(1) ≈ SkewHotShare — "Zipf-keyed, hottest key ~5 %
    * of rows" exactly as specified. Computed once, driver-side, pure
    * math: the corpus stays bit-reproducible. */
  lazy val skewCdf: Array[Double] = {
    def headShare(q: Double): Double = {
      var h = 0.0
      var r = 1
      while (r <= SkewRanks) { h += math.pow(r + q, -SkewS); r += 1 }
      math.pow(1 + q, -SkewS) / h
    }
    var lo = 0.0
    var hi = 1000.0
    var i = 0
    while (i < 60) {
      val mid = (lo + hi) / 2
      if (headShare(mid) > SkewHotShare) lo = mid else hi = mid
      i += 1
    }
    val q = (lo + hi) / 2
    val w = Array.tabulate(SkewRanks)(r => math.pow(r + 1 + q, -SkewS))
    val total = w.sum
    val cdf = new Array[Double](SkewRanks)
    var acc = 0.0
    var j = 0
    while (j < SkewRanks) { acc += w(j) / total; cdf(j) = acc; j += 1 }
    cdf(SkewRanks - 1) = 1.0 // guard fp drift at the tail
    cdf
  }

  /** Rank (1-based) for a uniform draw u ∈ [0, 1). */
  def skewRank(u: Double): Int = {
    val i = java.util.Arrays.binarySearch(skewCdf, u)
    (if (i >= 0) i else -i - 1) + 1
  }

  /**
   * Skewed twins of the three stress tables, written to `$outDir/skew/`
   * — SAME row counts, timelines and payloads as the uniform corpus,
   * only the KEY distribution changes (uniform → Zipf): the uniform
   * sweep's per-key-work-invariant pass bar (e_time ≈ 1) deliberately
   * can't see hot keys, so AQE skew-split and the salted join had no
   * stress-scale evidence (VERDICT r5 item 1 of "What's missing").
   *
   *  - events.user_id   ← rank(xxhash(event_id)): the hot USER owns ~5 %
   *    of all events at every scale — sessionize/window pain;
   *  - orders.o_custkey ← rank(xxhash(o_orderkey)): the hot CUSTOMER for
   *    topk_per_group's per-group window;
   *  - lineitem.l_orderkey ← rank-1 (ranks 1..10⁴ are all valid
   *    orderkeys in replica 0 — the shipped keys are dense 0..149 999):
   *    the hot JOIN key for salted-vs-plain shuffle joins. Inner-join
   *    matches survive by construction; the probe side's hot partition
   *    is what the skew machinery must absorb.
   *
   * The draw is keyed on xxhash64 of the row's stable id — deterministic,
   * scale-consistent (a row keeps its key across factors; the hot key's
   * row count grows exactly ×factor).
   */
  def writeSkew(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    val rankOf = udf((u: Double) => skewRank(u).toLong)
    def u(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (shiftrightunsigned(xxhash64(c), 11).cast("double")
        / lit((1L << 53).toDouble))
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    // replicate() shape inline: shift the unique event_id per copy, then
    // overwrite the KEY column with its Zipf rank.
    (0 until factor).map { i =>
        ev.withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L))
      }.reduce(_ unionByName _)
      .withColumn("user_id", rankOf(u(col("event_id"))))
      .write.mode("overwrite").parquet(s"$outDir/skew/events.parquet")
    val ord = spark.read.parquet(s"$srcDir/orders.parquet")
    (0 until factor).map { i =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100000000L))
      }.reduce(_ unionByName _)
      .withColumn("o_custkey", rankOf(u(col("o_orderkey"))))
      .write.mode("overwrite").parquet(s"$outDir/skew/orders.parquet")
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    (0 until factor).map { i =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L))
      }.reduce(_ unionByName _)
      .withColumn("l_orderkey",
        rankOf(u(concat_ws("_", col("l_orderkey"), col("l_linenumber")))) - 1)
      .write.mode("overwrite").parquet(s"$outDir/skew/lineitem.parquet")
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

  /** documents + embeddings at `factor` — split out so the s100 point
    * (banded families only, VERDICT r5 item 8) can generate JUST the
    * two tables the LSH sweep reads without 60 M lineitem rows. */
  def writeDocsEmb(spark: SparkSession, outDir: String, factor: Int): Unit = {
    import spark.implicits._
    val docN = 10000L * factor
    val embN = 20000L * factor
    spark.range(0, docN, 1, 32).map((id: java.lang.Long) => docRow(id))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.range(0, embN, 1, 32).map((id: java.lang.Long) => embRow(id))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def writeScale(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    writeDocsEmb(spark, outDir, factor)
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
    def missing(path: String): Boolean =
      !java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path))
    // Generation is deterministic, so existing directories are already
    // bit-identical to what a rewrite would produce — skip them (the
    // uniform corpus is minutes of work at s30; delete a dir to force).
    for ((name, factor) <- Seq(("s1", 1), ("s3", 3), ("s10", 10), ("s30", 30))) {
      val dir = s"$outRoot/$name"
      if (missing(s"$dir/documents.parquet")) {
        writeScale(spark, srcDir, dir, factor)
        println(s"[stressgen] wrote $dir (factor $factor)")
      } else println(s"[stressgen] $dir exists, skipping")
      if (missing(s"$dir/skew/events.parquet")) {
        writeSkew(spark, srcDir, dir, factor)
        println(s"[stressgen] wrote $dir/skew (factor $factor)")
      } else println(s"[stressgen] $dir/skew exists, skipping")
    }
    // s100: documents + embeddings only — the half-order-of-magnitude
    // extension for the banded LSH families (VERDICT r5 item 8); the
    // relational tables would be 60 M rows of replication the banded
    // sweep never reads.
    if (missing(s"$outRoot/s100/documents.parquet")) {
      writeDocsEmb(spark, s"$outRoot/s100", 100)
      println(s"[stressgen] wrote $outRoot/s100 (factor 100, docs+embeddings)")
    } else println(s"[stressgen] $outRoot/s100 exists, skipping")
    spark.stop()
  }
}
