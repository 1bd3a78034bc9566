package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}

/**
 * Codegen'd float-vector kernels (SURVEY.md §4 / §7b contingency): the
 * HOF formulation of a dot product (`aggregate(zip_with(...))`)
 * materializes an intermediate array per row and dispatches a lambda per
 * element; at 2M pairs × 64 dims that dominated the measured baseline
 * (38.8 s probe). This expression compiles to a tight primitive loop over
 * the two `ArrayData` buffers inside whole-stage codegen — no
 * intermediate allocation, no boxing.
 *
 * Float elements are widened to double before multiplying, matching the
 * HOF formulation and the DuckDB oracle exactly (bit-identical sums,
 * since the accumulation order is the same left-to-right).
 */
case class DotF32(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_f32 expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
    }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Exact Jaccard similarity of two SORTED long arrays (token-hash sets) via
 * a single merge scan — no per-pair hash set, no intermediate arrays.
 * Replaces `size(array_intersect(a,b)) / size(array_union(a,b))` in
 * near-dup verification, where string-array set ops dominated the
 * measured LSH cost at sf0.1. Inputs must be sorted and deduplicated
 * (produced with `array_sort(transform(array_distinct(...), xxhash64))`).
 */
case class JaccardSortedLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"jaccard_sorted expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
    }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val xa = x.getLong(i); val yb = y.getLong(j)
      if (xa == yb) { inter += 1; i += 1; j += 1 }
      else if (xa < yb) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val u = ctx.freshName("u")
      val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long $xa = $a.getLong($i); long $yb = $b.getLong($j);
         |  if ($xa == $yb) { $inter++; $i++; $j++; }
         |  else if ($xa < $yb) { $i++; } else { $j++; }
         |}
         |int $u = $na + $nb - $inter;
         |${ev.value} = ($u == 0) ? 1.0 : ((double) $inter) / $u;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Position-wise equality count of two long arrays (MinHash signature
 * match count). The HOF spelling — `size(filter(zip_with(a,b,(x,y)->x=y),
 * b->b))` — dispatches two lambdas per element and allocates two
 * intermediate arrays per pair; over millions of LSH candidates that was
 * the dominant cost after verification was kernelized.
 */
case class SigMatchCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"sig_match expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
    }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var m = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) m += 1; i += 1 }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $m++;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * MinHash signature of a token array as one codegen'd double loop
 * (round 4): the HOF spelling — `aggregate(tokens, [MaxValue]*k,
 * (acc, t) -> zip_with(acc, transform(seq(0,k-1), i -> xxhash64(i,t)),
 * least))` — allocates TWO k-long arrays per token per row and
 * dispatches interpreted lambdas throughout; it was the single largest
 * component of the minhash_lsh bench entry. This kernel folds a k-long
 * accumulator in place: per token, one pass over k seeded hashes, no
 * allocation beyond the result.
 *
 * BIT-IDENTICAL to both the HOF form and [[graft.llm.MinHashAgg]]:
 * sig[i] = min over tokens of XXH64(tokenBytes, seed = XXH64.hashInt(i,
 * 42)) — exactly what `xxhash64(i, tok)` computes (seed 42, int child
 * then string child). Precondition: no null elements (the caller feeds
 * `array_distinct(split(text, ' '))`, which cannot produce one).
 */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string> and k > 0, got $other / k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // xxhash64(i, tok) = token-bytes hash seeded with hashInt(i, 42)
  private lazy val seeds: Array[Long] = Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  override protected def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val s = toks.getUTF8String(t)
        var i = 0
        while (i < k) {
          val h = XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, seeds(i))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("mhSeeds", seeds, "long[]")
      val n = ctx.freshName("n"); val t = ctx.freshName("t")
      val i = ctx.freshName("i"); val sig = ctx.freshName("sig")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $t = 0; $t < $n; $t++) {
         |  if (!$a.isNullAt($t)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($t);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |          $s.numBytes(), $seedsRef[$i]);
         |      if ($h < $sig[$i]) $sig[$i] = $h;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Sorted xxhash64 values of a token array (round 4) — the verify-side
 * feed for [[JaccardSortedLong]]. Replaces
 * `array_sort(transform(tokens, t -> xxhash64(t)))`, whose transform
 * lambda is interpreted and whose sort runs the generic comparator;
 * here: one hash per token into a long[], `Arrays.sort`, done.
 * Hash = XXH64(tokenBytes, 42) — exactly `xxhash64(tok)`. Duplicate
 * hashes (string collisions) are kept, matching array_sort; null
 * elements are skipped (callers feed distinct split tokens — none).
 */
case class TokenHashesSorted(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes_sorted expects array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var out = new Array[Long](n)
    var m = 0
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val s = toks.getUTF8String(t)
        out(m) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        m += 1
      }
      t += 1
    }
    if (m < n) out = java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val t = ctx.freshName("t")
      val m = ctx.freshName("m"); val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |int $m = 0;
         |for (int $t = 0; $t < $n; $t++) {
         |  if (!$a.isNullAt($t)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($t);
         |    $out[$m++] = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |        $s.numBytes(), 42L);
         |  }
         |}
         |if ($m < $n) $out = java.util.Arrays.copyOf($out, $m);
         |java.util.Arrays.sort($out);
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Packed random-hyperplane LSH band keys of a float vector in one pass
 * (round 4): the HOF spelling — 192 `DotF32(emb, element_at(planes, h))`
 * calls inside a transform lambda, then an aggregate fold per band —
 * re-reads the embedding once per plane and dispatches interpreted
 * lambdas for the bit fold; it dominated the embed_lshpairs signature
 * scan. This kernel reads the embedding once and folds each band's bits
 * as it goes: sign of the same left-to-right float→double dot
 * accumulation as [[DotF32]] (bit-identical signs), MSB-first packing
 * exactly like `aggregate(slice(bits, ...), 0, acc*2+x)`.
 *
 * `planes` rides into codegen as one flattened row-major float[]
 * reference object (nBands·bitsPerBand·dim ≈ 49 KB — a plan constant,
 * same shipping story as the typedlit it replaces).
 */
case class HyperplaneBands(child: Expression, planes: Array[Float],
    bitsPerBand: Int, dim: Int) extends UnaryExpression {

  private def nBands: Int = planes.length / (bitsPerBand * dim)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
      if bitsPerBand > 0 && dim > 0 && planes.length % (bitsPerBand * dim) == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands expects array<float> and planes % (bitsPerBand*dim) == 0, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = math.min(v.numElements(), dim)
    val keys = new Array[Int](nBands)
    var p = 0
    var b = 0
    while (b < nBands) {
      var key = 0
      var i = 0
      while (i < bitsPerBand) {
        var s = 0.0
        val base = p * dim
        var j = 0
        while (j < m) {
          s += v.getFloat(j).toDouble * planes(base + j).toDouble
          j += 1
        }
        key = key * 2 + (if (s > 0.0) 1 else 0)
        p += 1; i += 1
      }
      keys(b) = key
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("hplPlanes", planes, "float[]")
      val m = ctx.freshName("m"); val keys = ctx.freshName("keys")
      val p = ctx.freshName("p"); val b = ctx.freshName("b")
      val key = ctx.freshName("key"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val base = ctx.freshName("base")
      val j = ctx.freshName("j")
      s"""
         |int $m = java.lang.Math.min($a.numElements(), $dim);
         |int[] $keys = new int[$nBands];
         |int $p = 0;
         |for (int $b = 0; $b < $nBands; $b++) {
         |  int $key = 0;
         |  for (int $i = 0; $i < $bitsPerBand; $i++, $p++) {
         |    double $s = 0.0;
         |    int $base = $p * $dim;
         |    for (int $j = 0; $j < $m; $j++) {
         |      $s += ((double) $a.getFloat($j)) * ((double) $planesRef[$base + $j]);
         |    }
         |    $key = $key * 2 + ($s > 0.0 ? 1 : 0);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Nearest-centroid id of a float vector against a plan-constant packed
 * centroid matrix — the IVF bucket assignment as ONE codegen'd
 * projection (round 7). The declarative spelling (crossJoin against a
 * broadcast centroid frame + `min_by(struct(cl, embedding),
 * struct(c_dist, cl))` per vec_id) explodes n×nlist rows EACH CARRYING
 * THE FULL EMBEDDING, and min_by over an array-bearing struct is not
 * hash-aggregable — Spark plans a SortAggregate, i.e. it sorts the
 * whole exploded stream twice (partial + final, ~27 GB at s10 in the
 * r7 stress sweep: 124 s of the 135 s ann_ivf build). Here the matrix
 * rides into codegen as a reference object (≤ 4096 × 64 floats ≈ 1 MB)
 * and assignment is n tight argmin loops inside whole-stage codegen —
 * no join, no aggregate, no shuffle, scan shape at any corpus size.
 *
 * Metric parity with the frame it replaced: dist = Σc² − 2·v·c with
 * centroids cast to FLOAT first and both the csq and dot accumulated
 * in double left-to-right (bit-identical to `sumSq(centroid_f) − 2 ·
 * DotF32(emb, centroid_f)`); ties keep the LOWEST cl (strict `<`, ids
 * scanned in ascending-cl pack order — `min_by`'s struct(c_dist, cl)
 * ordering). `clIds` maps pack position back to the cluster id so
 * sparse id sets (empty k-means clusters) resolve exactly like the
 * join resolved them: absent centroids simply cannot win.
 */
case class NearestCentroidF32(child: Expression, centroids: Array[Float],
    clIds: Array[Int], dim: Int) extends UnaryExpression {

  private def m: Int = clIds.length

  // Σc² per packed centroid, double-accumulated over the float values —
  // a plan constant derived once on the driver.
  private lazy val csq: Array[Double] = Array.tabulate(m) { c =>
    var s = 0.0
    var j = 0
    while (j < dim) { s += centroids(c * dim + j).toDouble * centroids(c * dim + j).toDouble; j += 1 }
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
      if dim > 0 && clIds.nonEmpty && centroids.length == clIds.length * dim =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float>, non-empty centroids × dim pack, got $other")
  }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var best = 0
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < m) {
      var dot = 0.0
      val base = c * dim
      var j = 0
      while (j < n) { dot += v.getFloat(j).toDouble * centroids(base + j).toDouble; j += 1 }
      val dist = csq(c) - 2.0 * dot
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    clIds(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centRef = ctx.addReferenceObj("ncCentroids", centroids, "float[]")
      val csqRef = ctx.addReferenceObj("ncCsq", csq, "double[]")
      val idsRef = ctx.addReferenceObj("ncClIds", clIds, "int[]")
      val n = ctx.freshName("n"); val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist"); val c = ctx.freshName("c")
      val dot = ctx.freshName("dot"); val base = ctx.freshName("base")
      val j = ctx.freshName("j"); val dist = ctx.freshName("dist")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |int $best = 0;
         |double $bestDist = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $m; $c++) {
         |  double $dot = 0.0;
         |  int $base = $c * $dim;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += ((double) $a.getFloat($j)) * ((double) $centRef[$base + $j]);
         |  }
         |  double $dist = $csqRef[$c] - 2.0 * $dot;
         |  if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
         |}
         |${ev.value} = $idsRef[$best];
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Top-`nprobe` nearest centroids of a float vector — the MULTI-PROBE
 * bucket choice of the kNN-graph build, codegen'd (round 11, VERDICT
 * r10 #4). [[NearestCentroidF32]] answers "which ONE bucket does this
 * vector live in" (assignment); this kernel answers "which `nprobe`
 * buckets should this vector SEARCH", the per-row argsort that
 * knnGraphBlocked previously spelled as an interpreted HOF
 * (transform→array_sort→slice over all nlist centroids — correct but
 * ~nlist× the work of the codegen'd argmin sitting next to it, and
 * outside whole-stage codegen entirely).
 *
 * Bit-parity with the HOF it replaces (KernelSpec pins it): the
 * distance is the FULL L2 sum Σ((double)xⱼ − cⱼ)² accumulated
 * left-to-right — not the Σc²−2·x·c shortcut the argmin kernel uses,
 * because `array_sort(struct(d, cl))` ordered on the full-L2 VALUE and
 * exact tie groups must resolve identically — and ties keep ascending
 * cluster id (centroids scanned in ascending-id pack order; strict `<`
 * insertion preserves earlier entries on equal distance, exactly the
 * struct sort's (d, cl) order). Selection is a bounded insertion pass
 * (nprobe ≤ nlist ≤ 4096, nprobe ~ 1.5√nlist in practice), O(m·nprobe)
 * worst case but O(m) amortized once the window fills; the centroid
 * matrix rides into codegen as the same ≤ 1 MB plan-constant reference
 * object as the argmin kernel's.
 *
 * The parity contract holds for WELL-FORMED (length == dim) vectors;
 * a mis-sized vector returns null instead of a truncated-distance
 * bucket list (r11 review pass — see `nullable` below).
 */
case class NearestCentroidsF32(child: Expression, centroids: Array[Float],
    clIds: Array[Long], dim: Int, nprobe: Int) extends UnaryExpression {

  private def m: Int = clIds.length
  private def np: Int = math.min(nprobe, m)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
      if dim > 0 && nprobe > 0 && clIds.nonEmpty &&
        centroids.length == clIds.length * dim =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<float>, non-empty centroids × dim "
        + s"pack and nprobe > 0, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Mis-sized input (vector length ≠ centroid dim) returns NULL rather
  // than silently truncating the distance sum: the HOF oracle spelling
  // zip_withs to the longer length and nulls its distances there, so a
  // truncated-but-confident bucket list would diverge from it unseen.
  // A null array feeds the downstream explode() as zero rows — the
  // malformed vector simply gets no candidates (KernelSpec pins both
  // the well-formed parity and this null-out).
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    nullSafeEval(a)
  }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val bestD = new Array[Double](np)
    val bestId = new Array[Long](np)
    var filled = 0
    var c = 0
    while (c < m) {
      var d = 0.0
      val base = c * dim
      var j = 0
      while (j < n) {
        val diff = v.getFloat(j).toDouble - centroids(base + j).toDouble
        d += diff * diff
        j += 1
      }
      if (filled < np || d < bestD(filled - 1)) {
        // insertion position: first slot with a STRICTLY larger distance
        // (equal distances keep the earlier = lower cluster id)
        var p = if (filled < np) filled else np - 1
        while (p > 0 && bestD(p - 1) > d) {
          bestD(p) = bestD(p - 1); bestId(p) = bestId(p - 1); p -= 1
        }
        bestD(p) = d; bestId(p) = clIds(c)
        if (filled < np) filled += 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(bestId, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centRef = ctx.addReferenceObj("npcCentroids", centroids, "float[]")
      val idsRef = ctx.addReferenceObj("npcClIds", clIds, "long[]")
      val n = ctx.freshName("n"); val bd = ctx.freshName("bestD")
      val bi = ctx.freshName("bestId"); val filled = ctx.freshName("filled")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val base = ctx.freshName("base"); val j = ctx.freshName("j")
      val diff = ctx.freshName("diff"); val p = ctx.freshName("p")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $dim;
         |  double[] $bd = new double[$np];
         |  long[] $bi = new long[$np];
         |  int $filled = 0;
         |  for (int $c = 0; $c < $m; $c++) {
         |    double $d = 0.0;
         |    int $base = $c * $dim;
         |    for (int $j = 0; $j < $n; $j++) {
         |      double $diff = ((double) $a.getFloat($j)) - ((double) $centRef[$base + $j]);
         |      $d += $diff * $diff;
         |    }
         |    if ($filled < $np || $d < $bd[$filled - 1]) {
         |      int $p = ($filled < $np) ? $filled : $np - 1;
         |      while ($p > 0 && $bd[$p - 1] > $d) {
         |        $bd[$p] = $bd[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
         |      }
         |      $bd[$p] = $d; $bi[$p] = $idsRef[$c];
         |      if ($filled < $np) $filled++;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(java.util.Arrays.copyOf($bi, $filled));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {
  /** dot(a, b) over float arrays, accumulated in double. */
  def dotF32(a: Column, b: Column): Column =
    GraftShims.exprColumn(DotF32(GraftShims.expr(a), GraftShims.expr(b)))

  /** Jaccard of sorted long arrays via merge scan. */
  def jaccardSorted(a: Column, b: Column): Column =
    GraftShims.exprColumn(JaccardSortedLong(GraftShims.expr(a), GraftShims.expr(b)))

  /** Position-wise match count of two long arrays. */
  def sigMatch(a: Column, b: Column): Column =
    GraftShims.exprColumn(SigMatchCount(GraftShims.expr(a), GraftShims.expr(b)))

  /** k-long MinHash signature of a token array (xxhash64(i, tok) family). */
  def minhashSig(tokens: Column, k: Int): Column =
    GraftShims.exprColumn(MinHashSig(GraftShims.expr(tokens), k))

  /** Sorted xxhash64 values of a token array (JaccardSortedLong feed). */
  def tokenHashesSorted(tokens: Column): Column =
    GraftShims.exprColumn(TokenHashesSorted(GraftShims.expr(tokens)))

  /** Packed hyperplane LSH band keys (planes flattened row-major). */
  def hyperplaneBands(emb: Column, planes: Array[Float],
      bitsPerBand: Int, dim: Int): Column =
    GraftShims.exprColumn(
      HyperplaneBands(GraftShims.expr(emb), planes, bitsPerBand, dim))

  /** Nearest-centroid cluster id (centroids flattened row-major,
    * clIds mapping pack position → cluster id). */
  def nearestCentroid(emb: Column, centroids: Array[Float],
      clIds: Array[Int], dim: Int): Column =
    GraftShims.exprColumn(
      NearestCentroidF32(GraftShims.expr(emb), centroids, clIds, dim))

  /** Top-nprobe nearest cluster ids, ascending (full-L2, cl) order —
    * the multi-probe bucket choice (centroids packed as above). */
  def nearestCentroids(emb: Column, centroids: Array[Float],
      clIds: Array[Long], dim: Int, nprobe: Int): Column =
    GraftShims.exprColumn(
      NearestCentroidsF32(GraftShims.expr(emb), centroids, clIds, dim, nprobe))
}
