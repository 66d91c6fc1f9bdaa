package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpectsInputTypes, Generator, ImplicitCastInputTypes, TernaryExpression,
  UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot paths the built-in
  * functions can't express efficiently (SURVEY §7.3 kept the door
  * open; the profiler pointed here). Preference order per the project
  * brief: built-ins → custom Expression → custom plan node. These two
  * stay at level (b):
  *
  *  - [[CosineSimilarity]]: fused one-pass dot/norm/norm with
  *    whole-stage codegen. The HOF formulation
  *    (aggregate ∘ zip_with ×3) materializes three intermediate
  *    arrays per row and is interpreted.
  *  - [[MinHashSignature]]: one pass over the shingle array updating
  *    all K min-accumulators in a primitive long[] — the HOF
  *    formulation re-walks the array K times through boxed lambdas.
  *
  * Both are bit-compatible with their HOF equivalents (identical
  * operation order), so oracle comparisons are unaffected.
  */

/** might-contain over a BROADCAST bloom filter — the control-plane
  * id-gate predicate ([[graft.ext.StoredIndex.mightContain]]) without
  * the former 4 MiB `Literal(bytes)`: a bloom-sized literal rides
  * EVERY job's serialized task binary (the "Broadcasting large task
  * binary" warning) and is hex-rendered into every plan description
  * the SQL listener builds — per-action costs paid on each gated
  * batch. The broadcast handle is bytes-small in the task binary;
  * the filter ships once per executor through the broadcast store
  * and deserializes once (vs per BloomFilterMightContain eval
  * partition). Membership semantics are bit-identical: the child is
  * the same `xxhash64(id)` the BloomFilterAggregate inserted, and
  * `mightContainLong` is the same probe the literal form ran. */
case class BroadcastBloomMightContain(
    bloom: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.sketch.BloomFilter],
    child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
          $ref.value()).mightContainLong($v);""")
  }

  // the broadcast id, not the filter bytes, names the expression in
  // plan strings — keep it short and stable-ish
  override def toString: String =
    s"bc_bloom_might_contain($child)"

  override protected def withNewChildInternal(
      newChild: Expression): BroadcastBloomMightContain =
    copy(child = newChild)
}

/** cosine(a, b) over two array<double> columns, fused single pass,
  * codegen'd. Float arrays are implicitly cast (embeddings are usually
  * float32 on disk). Null if either input or any element is null. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      ab += xi * yi; aa += xi * xi; bb += yi * yi
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $a.getDouble($i);
          double $yi = $b.getDouble($i);
          $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
        }
        ${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** l2_normalize(v): v / ‖v‖₂ in ONE fused, whole-stage-codegen'd
  * pass (sum of squares in index order, then one divide per
  * element). The declarative form — `transform(v, x -> x / nrm)`
  * with nrm aliased in its own projection — is defeated by
  * CollapseProject whenever nrm has a SINGLE consumer: the alias is
  * inlined back into the lambda and the O(d) norm re-evaluates per
  * ELEMENT (O(d²) per row — exactly the lambda-invariant-recompute
  * anti-pattern PlanGuard flags; it flagged this very helper's HOF
  * draft). Bit-compatible with DuckDB's
  * `list_transform(v, x -> x / sqrt(list_dot_product(v, v)))`:
  * identical accumulation order, identical per-element divide.
  * Empty array → empty array; a zero vector yields NaNs (the
  * caller's lookout, as with [[CosineSimilarity]]). */
case class L2Normalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val xi = x.getDouble(i); ss += xi * xi; i += 1 }
    val nrm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) / nrm; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val ss = ctx.freshName("ss"); val xi = ctx.freshName("xi")
      val nrm = ctx.freshName("nrm"); val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        double $ss = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $a.getDouble($i);
          $ss += $xi * $xi;
        }
        double $nrm = java.lang.Math.sqrt($ss);
        double[] $out = new double[$n];
        for (int $i = 0; $i < $n; $i++) {
          $out[$i] = $a.getDouble($i) / $nrm;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): L2Normalize = copy(child = newChild)
}

/** argmax_cosine(vec, cents): the id of the centroid most cosine-
  * similar to `vec`, ties toward the LOWER id. `cents` is an
  * array<struct<cid: bigint, cvec: array<double>>> — the whole
  * (small) centroid set collapsed into one broadcastable value, so
  * IVF assignment is a zero-shuffle projection over the corpus: each
  * row is scored against every centroid in one fused, whole-stage-
  * codegen'd loop (same accumulation order as [[CosineSimilarity]],
  * so assignments are bit-compatible with the per-pair formulation).
  *
  * Exists because the declarative alternatives both give up
  * something at 100 TB: a per-(row, centroid) join + max_by
  * re-shuffles the corpus to reduce, and `array_max`∘`transform`
  * over the centroid array is a higher-order function — interpreted,
  * never codegen'd, measured 13× slower at sf0.1. NaN cosines rank
  * greatest (java.lang.Double.compare), matching Spark sort order;
  * an empty/all-null centroid array yields NULL. */
case class ArgMaxCosine(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(DoubleType),
    ArrayType(StructType(Seq(
      StructField("cid", LongType),
      StructField("cvec", ArrayType(DoubleType))))))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    var found = false
    var bestCid = 0L
    var bestCos = 0.0
    var j = 0
    val m = cs.numElements()
    while (j < m) {
      if (!cs.isNullAt(j)) {
        val cent = cs.getStruct(j, 2)
        val cid = cent.getLong(0)
        val cvec = cent.getArray(1)
        val n = math.min(vec.numElements(), cvec.numElements())
        var ab = 0.0; var aa = 0.0; var bb = 0.0
        var i = 0
        while (i < n) {
          val xi = vec.getDouble(i); val yi = cvec.getDouble(i)
          ab += xi * yi; aa += xi * xi; bb += yi * yi
          i += 1
        }
        val c = ab / (math.sqrt(aa) * math.sqrt(bb))
        val cmp = java.lang.Double.compare(c, bestCos)
        if (!found || cmp > 0 || (cmp == 0 && cid < bestCid)) {
          found = true; bestCos = c; bestCid = cid
        }
      }
      j += 1
    }
    if (found) bestCid else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cs) => {
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val found = ctx.freshName("found")
      val bestCid = ctx.freshName("bestCid")
      val bestCos = ctx.freshName("bestCos")
      val cent = ctx.freshName("cent")
      val cid = ctx.freshName("cid"); val cvec = ctx.freshName("cvec")
      val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb"); val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
        boolean $found = false;
        long $bestCid = 0L;
        double $bestCos = 0.0;
        int $m = $cs.numElements();
        for (int $j = 0; $j < $m; $j++) {
          if (!$cs.isNullAt($j)) {
            InternalRow $cent = $cs.getStruct($j, 2);
            long $cid = $cent.getLong(0);
            ArrayData $cvec = $cent.getArray(1);
            int $n = java.lang.Math.min($vec.numElements(), $cvec.numElements());
            double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              double $xi = $vec.getDouble($i);
              double $yi = $cvec.getDouble($i);
              $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
            }
            double $c = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
            int $cmp = java.lang.Double.compare($c, $bestCos);
            if (!$found || $cmp > 0 || ($cmp == 0 && $cid < $bestCid)) {
              $found = true; $bestCos = $c; $bestCid = $cid;
            }
          }
        }
        if ($found) { ${ev.value} = $bestCid; } else { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxCosine =
    copy(left = newLeft, right = newRight)
}

/** arg_top_cosine(vec, cents, p): the ids of the `p` centroids most
  * cosine-similar to `vec`, ordered (cosine desc, cid asc) — the
  * multi-probe generalization of [[ArgMaxCosine]] (p=1 yields the
  * same head id). Same zero-shuffle posture: the centroid set is one
  * broadcast array row and the bounded top-p insertion runs inside
  * whole-stage codegen, so multi-probe IVF assignment (each corpus
  * vector indexed under its p nearest buckets — the standard recall
  * dial for IVF near-dup mining, see d9_recall_mp) costs one fused
  * projection pass over the corpus, never a per-(row, centroid)
  * explode + window rank (which would shuffle |corpus| rows keyed on
  * id to rank |cents| candidates each).
  *
  * `p` is a construction-time constant (like MinHashBands' band
  * count): the insertion buffers are stack-sized by it in both eval
  * paths. Fewer than p valid centroids → a shorter array; zero →
  * NULL (the ArgMaxCosine contract). NaN cosines rank greatest
  * (java.lang.Double.compare), ties toward the lower cid. */
case class ArgTopCosine(left: Expression, right: Expression, p: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(p >= 1, s"p must be >= 1, got $p")

  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(DoubleType),
    ArrayType(StructType(Seq(
      StructField("cid", LongType),
      StructField("cvec", ArrayType(DoubleType))))))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val cosArr = new Array[Double](p)
    val cidArr = new Array[Long](p)
    var cnt = 0
    var j = 0
    val m = cs.numElements()
    while (j < m) {
      if (!cs.isNullAt(j)) {
        val cent = cs.getStruct(j, 2)
        val cid = cent.getLong(0)
        val cvec = cent.getArray(1)
        val n = math.min(vec.numElements(), cvec.numElements())
        var ab = 0.0; var aa = 0.0; var bb = 0.0
        var i = 0
        while (i < n) {
          val xi = vec.getDouble(i); val yi = cvec.getDouble(i)
          ab += xi * yi; aa += xi * xi; bb += yi * yi
          i += 1
        }
        val c = ab / (math.sqrt(aa) * math.sqrt(bb))
        // bounded insertion: first slot where (c, cid) outranks the
        // incumbent; everything below shifts down, the last falls off
        var pos = cnt
        var k = 0
        while (k < cnt && pos == cnt) {
          val cmp = java.lang.Double.compare(c, cosArr(k))
          if (cmp > 0 || (cmp == 0 && cid < cidArr(k))) pos = k
          k += 1
        }
        if (pos < p) {
          var t = math.min(cnt, p - 1)
          while (t > pos) {
            cosArr(t) = cosArr(t - 1); cidArr(t) = cidArr(t - 1); t -= 1
          }
          cosArr(pos) = c; cidArr(pos) = cid
          if (cnt < p) cnt += 1
        }
      }
      j += 1
    }
    if (cnt == 0) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(cidArr, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cs) => {
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      val cosArr = ctx.freshName("cosArr")
      val cidArr = ctx.freshName("cidArr")
      val cent = ctx.freshName("cent")
      val cid = ctx.freshName("cid"); val cvec = ctx.freshName("cvec")
      val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb"); val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val pos = ctx.freshName("pos"); val k = ctx.freshName("k")
      val t = ctx.freshName("t")
      s"""
        double[] $cosArr = new double[$p];
        long[] $cidArr = new long[$p];
        int $cnt = 0;
        int $m = $cs.numElements();
        for (int $j = 0; $j < $m; $j++) {
          if (!$cs.isNullAt($j)) {
            InternalRow $cent = $cs.getStruct($j, 2);
            long $cid = $cent.getLong(0);
            ArrayData $cvec = $cent.getArray(1);
            int $n = java.lang.Math.min($vec.numElements(), $cvec.numElements());
            double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              double $xi = $vec.getDouble($i);
              double $yi = $cvec.getDouble($i);
              $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
            }
            double $c = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
            int $pos = $cnt;
            for (int $k = 0; $k < $cnt && $pos == $cnt; $k++) {
              int $cmp = java.lang.Double.compare($c, $cosArr[$k]);
              if ($cmp > 0 || ($cmp == 0 && $cid < $cidArr[$k])) $pos = $k;
            }
            if ($pos < $p) {
              for (int $t = java.lang.Math.min($cnt, $p - 1); $t > $pos; $t--) {
                $cosArr[$t] = $cosArr[$t - 1]; $cidArr[$t] = $cidArr[$t - 1];
              }
              $cosArr[$pos] = $c; $cidArr[$pos] = $cid;
              if ($cnt < $p) $cnt++;
            }
          }
        }
        if ($cnt == 0) { ${ev.isNull} = true; }
        else {
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
            .fromPrimitiveArray(java.util.Arrays.copyOf($cidArr, $cnt));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgTopCosine =
    copy(left = newLeft, right = newRight)
}

/** K-slot MinHash signature of an array<string> shingle column in one
  * pass: base = pmod(xxhash64(s), P) (identical bits to the built-in
  * `xxhash64` — same XXH64 kernel, same seed 42), then
  * min_i((a_i·base + b_i) mod P) for the fixed universal-hash family
  * `params`. Output array<long> of length K. */
case class MinHashSignature(child: Expression, params: Seq[(Long, Long)])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback
    with UserDefinedExpression {

  // UserDefinedExpression keeps optimizer rules that clone expression
  // trees (e.g. InferFiltersFromGenerate re-evaluating the generator
  // child inside a Filter) from duplicating this expensive expression.
  override def name: String = "minhash_sig"

  /** Mersenne prime 2^31-1 — see graft.ext.Dedup. */
  private val P = 2147483647L
  private val as: Array[Long] = params.map(_._1).toArray
  private val bs: Array[Long] = params.map(_._2).toArray

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      // pmod into [0, P)
      val base = { val m = h % P; if (m < 0) m + P else m }
      var i = 0
      while (i < k) {
        val v = (as(i) * base + bs(i)) % P // operands < P < 2^31: no overflow
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** LSH band hashes of a shingle array in one pass: the K-slot MinHash
  * signature (identical to [[MinHashSignature]]) folded into
  * `numBands` band hashes (XXH64-chained over each band's slots).
  *
  * Fusing banding into the expression matters for the plan, not just
  * constant factors: banding as 16 separate `slice(sig, …)` column
  * expressions invites Catalyst's projection collapse to inline the
  * signature — and its shingle input — 16× into the Generate node,
  * which profiled ~100× slower than one fused evaluation. */
case class MinHashBands(child: Expression, params: Seq[(Long, Long)],
                        numBands: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback
    with UserDefinedExpression {

  override def name: String = "minhash_bands" // see MinHashSignature.name

  private val P = 2147483647L
  private val as: Array[Long] = params.map(_._1).toArray
  private val bs: Array[Long] = params.map(_._2).toArray
  private val rowsPerBand = params.length / numBands

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val base = { val m = h % P; if (m < 0) m + P else m }
      var i = 0
      while (i < k) {
        val v = (as(i) * base + bs(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = 42L
      var r = 0
      while (r < rowsPerBand) {
        h = XXH64.hashLong(mins(b * rowsPerBand + r), h)
        r += 1
      }
      bands(b) = h
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** Imperative word-shingling shared by the fused expressions below.
  * Bit-compatible with the HOF formulation in graft.ext.Dedup.shingles
  * (same index bounds, same concat_ws null-skipping via
  * UTF8String.concatWs), minus the array materialization. */
private[functions] object Shingler {
  private val Space = UTF8String.fromString(" ")

  /** Visit every word n-gram of `tokens` (duplicates included). */
  def foreach(tokens: ArrayData, n: Int)(f: UTF8String => Unit): Unit = {
    val nTok = tokens.numElements()
    val count = math.max(nTok - n, 0) + 1
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) {
        val idx = i + j
        parts(j) = if (idx < nTok) tokens.getUTF8String(idx) else null
        j += 1
      }
      f(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
  }
}

/** Generator fusing tokenize-array → shingle → MinHash signature →
  * LSH banding → explode into (band, bhash) rows, one imperative pass
  * per row. Child is the token array (ONE subtree: evaluating the
  * split once per row — the declarative shingle expression duplicates
  * the split into every element_at of the transform lambda, which
  * interpreted eval re-executes ~3× per shingle). Being a custom
  * Generator (not ExplodeBase) also keeps InferFiltersFromGenerate
  * from synthesizing a `size(…) > 0` filter that would re-evaluate
  * the expensive child below the Generate node. Duplicate shingles
  * need no dedup here: duplicates cannot change a min. */
case class MinHashExplode(child: Expression, params: Seq[(Long, Long)],
                          numBands: Int, shingleSize: Int = 3)
    extends UnaryExpression with Generator with CodegenFallback {

  private val P = 2147483647L
  private val as: Array[Long] = params.map(_._1).toArray
  private val bs: Array[Long] = params.map(_._2).toArray
  private val rowsPerBand = params.length / numBands

  override def elementSchema: StructType = new StructType()
    .add("band", IntegerType, nullable = false)
    .add("bhash", LongType, nullable = false)

  override def checkInputDataTypes() =
    ExpectsInputTypes.checkInputDataTypes(children, Seq(ArrayType(StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val tokens = child.eval(input)
    if (tokens == null) return Nil
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    Shingler.foreach(tokens.asInstanceOf[ArrayData], shingleSize) { s =>
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val base = { val m = h % P; if (m < 0) m + P else m }
      var i = 0
      while (i < k) {
        val v = (as(i) * base + bs(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    (0 until numBands).map { b =>
      var h = 42L
      var r = 0
      while (r < rowsPerBand) {
        h = XXH64.hashLong(mins(b * rowsPerBand + r), h)
        r += 1
      }
      InternalRow(b, h)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashExplode =
    copy(child = newChild)
}

/** Generator fusing shingling + distinct + explode: emits each
  * distinct word n-gram of the token-array child as one row. Same
  * output set as `explode(array_distinct(<shingle transform>))` with
  * one split-evaluation per row instead of ~3 per shingle. */
case class NGramExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = new StructType()
    .add("shingle", StringType, nullable = false)

  override def checkInputDataTypes() =
    ExpectsInputTypes.checkInputDataTypes(children, Seq(ArrayType(StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val tokens = child.eval(input)
    if (tokens == null) return Nil
    val seen = new java.util.LinkedHashSet[UTF8String]()
    Shingler.foreach(tokens.asInstanceOf[ArrayData], n)(s => seen.add(s))
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](seen.size)
    seen.forEach(s => out += InternalRow(s))
    out
  }

  override protected def withNewChildInternal(newChild: Expression): NGramExplode =
    copy(child = newChild)
}

/** One-pass 64-bit SimHash of a token array: distinct tokens hashed
  * with the XXH64 kernel (seed 42, matching built-in xxhash64), per-bit
  * ±1 votes, sign → bit. Bit-identical to the HOF formulation in
  * graft.ext.Dedup.simhash (64 interpreted aggregate-folds), ~60×
  * less work per row. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback
    with UserDefinedExpression {

  override def name: String = "simhash64"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (seen.add(s)) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < 64) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 64-bit random-hyperplane LSH signature of an array<double>
  * embedding (sign-random-projection, the classic cosine-LSH family):
  * bit k = sign of the dot product with hyperplane k. The hyperplanes
  * are implicit Rademacher (±1) vectors derived per dimension from the
  * XXH64 kernel — `hashLong(d, 42)`'s 64 bits are the signs of ALL 64
  * hyperplanes at dimension d — so one hash + 64 adds per element, no
  * stored projection matrix, identical bits on every executor. Two
  * vectors' signature Hamming distance estimates their angle, so the
  * SimHash pigeonhole blocking applies unchanged to embeddings. */
case class HyperplaneLsh64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback with UserDefinedExpression {

  override def name: String = "hyperplane_lsh64"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val acc = new Array[Double](64)
    val n = v.numElements()
    var d = 0
    while (d < n) {
      val x = v.getDouble(d)
      val signs = XXH64.hashLong(d.toLong, 42L)
      var k = 0
      while (k < 64) {
        acc(k) += (if (((signs >>> k) & 1L) == 1L) x else -x)
        k += 1
      }
      d += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (acc(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLsh64 =
    copy(child = newChild)
}

/** Banded random-hyperplane LSH: emits one (band, bval) row per band,
  * where `bval` is an independent `bandBits`-bit sign-random-projection
  * signature of the embedding (band b uses hyperplanes none of the
  * other bands see). Two vectors collide in band b iff all bandBits
  * signs agree there — the MinHash-style AND/OR amplification:
  * P[collision in one band] = (1 − θ/π)^bandBits, amplified across
  * `numBands` OR-ed chances. Tuning contract (scaladoc'd at the
  * operator, graft.ext.Similarity.lshNearDups): bandBits positions the
  * selectivity threshold AND sizes the bucket-key space (2^bandBits
  * keys per band — pick bandBits ≳ log2(corpus) so bucket occupancy
  * stays O(1) as the corpus grows; never a fixed 256-value ceiling),
  * numBands buys recall linearly in cost.
  *
  * Like [[HyperplaneLsh64]], the hyperplanes are implicit Rademacher
  * vectors drawn from the XXH64 kernel — `hashLong(d, 42+w)` is the
  * d-th dimension's sign row for global sign-bit word w — so there is
  * no stored projection matrix and every executor derives identical
  * planes. A custom Generator (not posexplode of an array expression)
  * so InferFiltersFromGenerate cannot synthesize a `size(…) > 0`
  * filter that would re-evaluate the signature pass below the
  * Generate node (the round-1 generator trap). */
case class HyperplaneLshExplode(child: Expression, numBands: Int,
                                bandBits: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(numBands >= 1, s"numBands must be >= 1, got $numBands")
  require(bandBits >= 1 && bandBits <= 63,
    s"bandBits must be in [1, 63], got $bandBits")

  private val totalBits = numBands * bandBits
  private val numWords = (totalBits + 63) / 64

  override def elementSchema: StructType = new StructType()
    .add("band", IntegerType, nullable = false)
    .add("bval", LongType, nullable = false)

  override def checkInputDataTypes() =
    ExpectsInputTypes.checkInputDataTypes(children, Seq(ArrayType(DoubleType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val vec = child.eval(input)
    if (vec == null) return Nil
    val v = vec.asInstanceOf[ArrayData]
    val acc = new Array[Double](totalBits)
    val n = v.numElements()
    var d = 0
    while (d < n) {
      val x = v.getDouble(d)
      var w = 0
      while (w < numWords) {
        val signs = XXH64.hashLong(d.toLong, 42L + w)
        val base = w * 64
        val hi = math.min(64, totalBits - base)
        var k = 0
        while (k < hi) {
          acc(base + k) += (if (((signs >>> k) & 1L) == 1L) x else -x)
          k += 1
        }
        w += 1
      }
      d += 1
    }
    (0 until numBands).map { b =>
      var sig = 0L
      var k = 0
      while (k < bandBits) {
        if (acc(b * bandBits + k) > 0) sig |= (1L << k)
        k += 1
      }
      InternalRow(b, sig)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneLshExplode = copy(child = newChild)
}

/** One-pass text-statistics kernel shared by eval and codegen of
  * [[TextStats]]. Counts are defined to be bit-identical to the
  * declarative formulations they replace (graft.ext.TextAnalysis,
  * r1): Java-regex `\s+` split semantics for tokens, the BPE-ish
  * `[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]` match count, `[.,!?;:]` count,
  * code-point length, and per-wordset membership counts.
  */
object TextStatsKernel {

  // set 0 = English stopwords (quality score); sets 1..N = language
  // marker sets in graft.ext.TextAnalysis.LangMarkers order. The
  // language count is derived from LangMarkers everywhere (here, the
  // langs array, the struct schema) so extending the marker table
  // cannot desynchronize the kernel from its schema.
  private[functions] val NumLangs: Int =
    graft.ext.TextAnalysis.LangMarkers.length

  private val wordSets: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    val sets: Seq[Seq[String]] =
      graft.ext.TextAnalysis.EnglishStopwords +:
        graft.ext.TextAnalysis.LangMarkers.map(_._2)
    sets.zipWithIndex.foreach { case (words, idx) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(idx) else prev :+ idx)
      }
    }
    m
  }

  // Java regex \s (default flags): ASCII whitespace only
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\u000B' ||
      cp == '\f' || cp == '\r'

  private def isAsciiLetter(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')

  private def isPunct(cp: Int): Boolean =
    cp == '.' || cp == ',' || cp == '!' || cp == '?' || cp == ';' || cp == ':'

  /** Single pass over the text; see [[TextStats]] for the schema. */
  def analyze(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length
    var nChars = 0; var nBpe = 0; var nPunct = 0; var nStop = 0
    var nonWsRuns = 0
    val langs = new Array[Int](NumLangs)
    var leadingWs = false; var trailingWs = false
    var inLetterRun = false
    var tokStart = -1

    def endToken(end: Int): Unit = {
      val hits = wordSets.get(str.substring(tokStart, end))
      if (hits != null) {
        var i = 0
        while (i < hits.length) {
          if (hits(i) == 0) nStop += 1 else langs(hits(i) - 1) += 1
          i += 1
        }
      }
      tokStart = -1
    }

    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      nChars += 1
      if (isWs(cp)) {
        if (i == 0) leadingWs = true
        if (tokStart >= 0) endToken(i)
        inLetterRun = false
      } else {
        if (tokStart < 0) { tokStart = i; nonWsRuns += 1 }
        if (isAsciiLetter(cp)) {
          if (!inLetterRun) { nBpe += 1; inLetterRun = true }
        } else {
          inLetterRun = false
          nBpe += 1 // single digit or single non-alnum symbol
        }
        if (isPunct(cp)) nPunct += 1
      }
      i += Character.charCount(cp)
    }
    if (tokStart >= 0) endToken(len)
    else if (len > 0) trailingWs = true

    // Java split("\s+", -1): leading/trailing whitespace contribute an
    // empty segment each; the empty string splits to one empty token
    val nTokens =
      if (len == 0) 1
      else nonWsRuns + (if (leadingWs) 1 else 0) + (if (trailingWs) 1 else 0)

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      (Array[Any](nTokens, nBpe, nPunct, nChars, nStop) ++
        langs.map(x => x: Any)))
  }
}

/** Kernel for [[CharEntropy]]: Shannon entropy (bits) of a text's
  * code-point distribution in one imperative pass. The fold iterates
  * code points ASCENDING (TreeMap) — the same order the DuckDB oracle
  * pins with `list(... ORDER BY c)` under its binary UTF-8 collation
  * (byte order = code-point order), so the two engines accumulate the
  * non-associative double sum identically up to the 1-ulp libm
  * `log2` spread the caller's 4-dp rounding absorbs. */
object CharEntropyKernel {
  private val Ln2 = Math.log(2.0)

  def entropy(s: UTF8String): Double = {
    val str = s.toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var total = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      total += 1
      i += Character.charCount(cp)
    }
    if (total == 0L) return 0.0
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / total
      h += p * (Math.log(p) / Ln2)
    }
    // single-distinct-char text: h is -0.0; normalize so the parquet
    // hash cannot split on the sign of zero
    if (h == 0.0) 0.0 else -h
  }
}

/** Per-row character-entropy — the cheap junk detector corpus
  * pipelines run alongside length/punctuation gates: near-zero bits
  * flags degenerate repetition ("aaaa…", padding), ~log2(alphabet)
  * flags random noise (minified blobs, base64, hash dumps); prose
  * sits in a stable mid band. One codegen'd pass per row (the
  * [[TextStats]] pattern — no shuffle, no UDF), so it rides the scan
  * at any corpus size. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {

  override def name: String = "char_entropy"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    CharEntropyKernel.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyKernel.entropy($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** Fused per-row text statistics: token count (Java `\s+` split
  * semantics), BPE-ish token count, punctuation count, code-point
  * length, English-stopword hits and the five language-marker scores
  * — one imperative pass per row instead of ~9 regex/HOF scans
  * (Catalyst does not CSE regex calls across expressions, and the HOF
  * stopword filters are interpreted). Codegen'd (a single static
  * call), so whole-stage codegen's subexpression elimination also
  * collapses multiple references to one evaluation. */
case class TextStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {

  override def name: String = "text_stats"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = TextStats.schema

  override def nullSafeEval(input: Any): Any =
    TextStatsKernel.analyze(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStatsKernel.analyze($c);")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  /** Per-language score field names, in LangMarkers order. */
  val langFields: Seq[String] =
    graft.ext.TextAnalysis.LangMarkers.map { case (lang, _) => s"s_$lang" }

  val schema: StructType =
    (Seq("n_tokens", "n_bpeish", "n_punct", "n_chars", "n_stop") ++ langFields)
      .foldLeft(new StructType())((st, f) =>
        st.add(f, IntegerType, nullable = false))
}

/** Static kernel for [[ByteStats]] — one imperative pass over the
  * payload's data section. Bytes are treated as unsigned (0-255), the
  * way pixel/PCM intensity features read them. */
object ByteStatsKernel {
  def analyze(data: Array[Byte], offset: Int): InternalRow = {
    require(offset >= 0 && offset <= data.length,
      s"byte_stats offset $offset outside payload of ${data.length} bytes")
    var i = offset
    var sum = 0L
    var min = 256
    var max = -1
    while (i < data.length) {
      val b = data(i) & 0xFF
      sum += b
      if (b < min) min = b
      if (b > max) max = b
      i += 1
    }
    val n = data.length - offset
    if (n == 0) { min = 0; max = 0 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, sum, min, max))
  }
}

/** Fused per-row byte statistics over a binary payload's data section
  * (bytes from `offset` to the end): count, sum, min, max of the
  * unsigned byte values in ONE pass, codegen'd as a single static
  * call. This is the feature-extract stage of the multimodal pipeline
  * — brightness/loudness-proxy features computed without leaving
  * whole-stage codegen and without a per-feature scan of the payload.
  * Real pixel/PCM decode would slot in at the same boundary with a
  * codec library; the byte-level features are the honest no-codec
  * stand-in, and (unlike a codec) are exactly oracle-able because the
  * fixture's data section is the document's UTF-8 text. */
case class ByteStats(data: Expression, offset: Expression)
    extends BinaryExpression with ExpectsInputTypes with UserDefinedExpression {

  override def name: String = "byte_stats"
  override def left: Expression = data
  override def right: Expression = offset
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ByteStats.schema

  override def nullSafeEval(d: Any, off: Any): Any =
    ByteStatsKernel.analyze(d.asInstanceOf[Array[Byte]],
      off.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, o) =>
      s"${ev.value} = graft.functions.ByteStatsKernel.analyze($d, $o);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ByteStats =
    copy(data = l, offset = r)
}

object ByteStats {
  val schema: StructType = new StructType()
    .add("n_bytes", IntegerType, nullable = false)
    .add("b_sum", LongType, nullable = false)
    .add("b_min", IntegerType, nullable = false)
    .add("b_max", IntegerType, nullable = false)
}

/** Wrap a raw payload in a real media container for the multimodal
  * fixture table: image rows become a valid PNG stream (signature +
  * CRC'd IHDR, dimensions derived from the doc id), audio/video rows a
  * canonical RIFF/WAVE PCM stream (rate/channels derived from the doc
  * id) — see [[graft.ext.MediaContainers]]. The derivations are plain
  * arithmetic on the id and payload length, so an oracle can predict
  * the decoded metadata without re-implementing the containers. */
case class MediaWrap(docId: Expression, mediaType: Expression,
                     data: Expression)
    extends TernaryExpression with ExpectsInputTypes with CodegenFallback
    with UserDefinedExpression {

  override def name: String = "media_wrap"
  override def first: Expression = docId
  override def second: Expression = mediaType
  override def third: Expression = data

  override def inputTypes: Seq[DataType] =
    Seq(LongType, StringType, BinaryType)
  override def dataType: DataType = BinaryType

  override def nullSafeEval(id: Any, mt: Any, d: Any): Any = {
    val i = id.asInstanceOf[Long]
    // Java % on a negative id would yield non-positive dims / invalid
    // sample rates — a corrupt container the decoder then rejects, and
    // the oracle's derivations silently diverge. Ids are non-negative
    // by the fixture contract; enforce it instead of wrapping garbage.
    require(i >= 0, s"MediaWrap requires a non-negative doc id, got $i")
    val payload = d.asInstanceOf[Array[Byte]]
    mt.asInstanceOf[UTF8String].toString match {
      case "image" =>
        graft.ext.MediaContainers.wrapPng(
          (i % 1920).toInt + 1, (i % 1080).toInt + 1, payload)
      case _ =>
        graft.ext.MediaContainers.wrapWav(
          8000 + (i % 5).toInt * 2000, (i % 2).toInt + 1, payload)
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MediaWrap =
    copy(docId = f, mediaType = s, data = t)
}

/** Column-API and SQL-registry surface for the custom expressions. */
object GraftFunctions {

  import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  def l2_normalize(v: Column): Column =
    column(L2Normalize(expression(v)))

  def argmax_cosine(vec: Column, cents: Column): Column =
    column(ArgMaxCosine(expression(vec), expression(cents)))

  def arg_top_cosine(vec: Column, cents: Column, p: Int): Column =
    column(ArgTopCosine(expression(vec), expression(cents), p))

  def minhash_sig(shingles: Column, params: Seq[(Long, Long)]): Column =
    column(MinHashSignature(expression(shingles), params))

  def minhash_bands(shingles: Column, params: Seq[(Long, Long)],
                    numBands: Int): Column =
    column(MinHashBands(expression(shingles), params, numBands))

  def minhash_explode(tokens: Column, params: Seq[(Long, Long)],
                      numBands: Int): Column =
    column(MinHashExplode(expression(tokens), params, numBands))

  def ngram_explode(tokens: Column, n: Int): Column =
    column(NGramExplode(expression(tokens), n))

  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  def text_stats(text: Column): Column =
    column(TextStats(expression(text)))

  def char_entropy(text: Column): Column =
    column(CharEntropy(expression(text)))

  def media_wrap(docId: Column, mediaType: Column, data: Column): Column =
    column(MediaWrap(expression(docId), expression(mediaType),
      expression(data)))

  def byte_stats(data: Column, offset: Column): Column =
    column(ByteStats(expression(data), expression(offset)))

  def hyperplane_lsh64(vec: Column): Column =
    column(HyperplaneLsh64(expression(vec)))

  def hyperplane_lsh_explode(vec: Column, numBands: Int,
                             bandBits: Int): Column =
    column(HyperplaneLshExplode(expression(vec), numBands, bandBits))

  /** Register the expressions on a live session for SQL use
    * (`SELECT cosine_sim(a, b)`). For registration at session build
    * time — including via `spark.sql.extensions` config — use
    * [[graft.GraftExtensions]]. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def arity(n: Int, name: String)(es: Seq[Expression]): Seq[Expression] = {
      require(es.length == n,
        s"$name expects $n argument(s), got ${es.length}")
      es
    }
    reg.createOrReplaceTempFunction("cosine_sim",
      es => { arity(2, "cosine_sim")(es); CosineSimilarity(es.head, es(1)) },
      "built-in")
    reg.createOrReplaceTempFunction("argmax_cosine",
      es => { arity(2, "argmax_cosine")(es); ArgMaxCosine(es.head, es(1)) },
      "built-in")
    reg.createOrReplaceTempFunction("arg_top_cosine",
      es => { arity(3, "arg_top_cosine")(es)
        val p = es(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"arg_top_cosine p must be a literal int, got $other")
        }
        ArgTopCosine(es.head, es(1), p) },
      "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSignature(es.head, graft.ext.Dedup.hashParams), "built-in")
    reg.createOrReplaceTempFunction("minhash_bands",
      es => MinHashBands(es.head, graft.ext.Dedup.hashParams,
        graft.ext.Dedup.NumBands), "built-in")
    reg.createOrReplaceTempFunction("text_stats",
      es => TextStats(es.head), "built-in")
    reg.createOrReplaceTempFunction("char_entropy",
      es => CharEntropy(es.head), "built-in")
    reg.createOrReplaceTempFunction("byte_stats",
      es => { arity(2, "byte_stats")(es); ByteStats(es.head, es(1)) },
      "built-in")
    reg.createOrReplaceTempFunction("hyperplane_lsh64",
      es => HyperplaneLsh64(es.head), "built-in")
  }
}
