package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnShim.{toColumn, toExpression}

/** Custom Catalyst expressions for the per-row hot loops of the dedup /
  * similarity operators.
  *
  * Why custom expressions instead of higher-order functions: Spark's
  * `transform`/`aggregate`/`zip_with` are interpreted per ELEMENT (they are
  * CodegenFallback and box every value), and CollapseProject freely inlines
  * an aliased array expression into every consumer, multiplying that cost.
  * Each expression below does the whole per-row computation in one tight
  * primitive-typed pass (preference order (b) of the build brief: custom
  * Expression before custom plan).
  */
object VectorExprs {

  /** Distinct 64-bit hashes of word n-gram shingles of a token array.
    * tokens: array<string> → array<long> (sorted ascending, distinct).
    * Hash: XXH64 over each token chained across the n tokens of a shingle —
    * set cardinalities/intersections equal those of string shingles modulo
    * 64-bit collisions.
    */
  case class HashedShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val tokHash = new Array[Long](m)
      var i = 0
      while (i < m) {
        val t = arr.getUTF8String(i)
        tokHash(i) = if (t == null) 42L else XXH64.hashUTF8String(t, 42L)
        i += 1
      }
      val cnt = math.max(m - n + 1, 0)
      val out = new Array[Long](cnt)
      i = 0
      while (i < cnt) {
        var h = 42L
        var j = 0
        while (j < n) { h = XXH64.hashLong(tokHash(i + j), h); j += 1 }
        out(i) = h
        i += 1
      }
      java.util.Arrays.sort(out)
      var w = 0
      i = 0
      while (i < cnt) {
        if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, w))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** k-value MinHash signature of a hashed-shingle array: one pass over the
    * shingles, k running minima of XXH64(shingle, seed=i).
    */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < m) {
        val h = arr.getLong(i)
        var s = 0
        while (s < k) {
          val v = XXH64.hashLong(h, s.toLong)
          if (v < mins(s)) mins(s) = v
          s += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** LSH band hashes of a signature array: `bands` values, band b =
    * XXH64-chain of signature entries [b*r, (b+1)*r). array<long>.
    */
  case class BandHashes(child: Expression, bands: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val sig = input.asInstanceOf[ArrayData]
      val k = sig.numElements()
      val r = k / bands
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 42L
        var j = 0
        while (j < r) { h = XXH64.hashLong(sig.getLong(b * r + j), h); j += 1 }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** dtype tags for the codegen kernels (a generated-Java-friendly stand-in
    * for the DataType object)
    */
  private[expr] def typeTag(et: DataType): Int = et match {
    case FloatType => 0
    case DoubleType => 1
    case LongType => 2
    case IntegerType => 3
    case other => throw new IllegalArgumentException(s"vector element: $other")
  }

  /** Cosine kernel shared by interpreted eval and generated code — the
    * per-pair hot loop of ANN/near-dup verification. Public because
    * whole-stage-generated Java calls it via `VectorExprs$.MODULE$`.
    */
  def cosineKernel(la: ArrayData, ra: ArrayData, ta: Int, tb: Int): Double = {
    def elemAt(a: ArrayData, t: Int, i: Int): Double = t match {
      case 0 => a.getFloat(i).toDouble
      case 1 => a.getDouble(i)
      case 2 => a.getLong(i).toDouble
      case _ => a.getInt(i).toDouble
    }
    val n = math.min(la.numElements(), ra.numElements())
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      val x = elemAt(la, ta, i); val y = elemAt(ra, tb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Cosine similarity of two numeric arrays, accumulated in double in
    * element order — bit-for-bit identical to the zip_with/aggregate
    * formulation (and to any engine that folds sequentially in double).
    * Codegen'd via a static kernel call, so the surrounding stage stays
    * whole-stage-compiled (a CodegenFallback here would force row
    * materialization in the ANN scan loop).
    */
  case class VecCosine(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private def tagOf(e: Expression): Int =
      typeTag(e.dataType.asInstanceOf[ArrayType].elementType)
    override def nullSafeEval(l: Any, r: Any): Any =
      cosineKernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
        tagOf(left), tagOf(right))
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"${ev.value} = graft.expr.VectorExprs$$.MODULE$$" +
          s".cosineKernel($l, $r, ${tagOf(left)}, ${tagOf(right)});")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Index of the nearest (squared-Euclidean) centroid for a numeric
    * vector — the IVF cell-assignment hot loop. The centroid table is a
    * plan-local constant (it is tiny — `nlist` × dim doubles), so the full
    * corpus pass stays a single primitive-typed expression instead of a
    * boxing UDF + MLlib `transform`. Ties resolve to the lowest index.
    */
  /** Argmin-centroid kernel shared by interpreted eval and generated code
    * (the [[pqEncodeKernel]] pattern).
    */
  def nearestCentroidKernel(arr: ArrayData, centroids: Array[Array[Double]],
                            tag: Int): Int = {
    val n = arr.numElements()
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val m = math.min(cen.length, n)
      var d = 0d; var i = 0
      while (i < m) {
        val x = tag match {
          case 0 => arr.getFloat(i).toDouble
          case 1 => arr.getDouble(i)
          case 2 => arr.getLong(i).toDouble
          case _ => arr.getInt(i).toDouble
        }
        val t = cen(i) - x; d += t * t; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    private lazy val tag =
      typeTag(child.dataType.asInstanceOf[ArrayType].elementType)
    override def nullSafeEval(input: Any): Any =
      java.lang.Integer.valueOf(
        nearestCentroidKernel(input.asInstanceOf[ArrayData], centroids, tag))
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expr.VectorExprs$$.MODULE$$.nearestCentroidKernel($c, $ref, $tag);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Polynomial rolling hash of a string: fold `h = (h * 31 + codepoint)
    * mod 1e9+7` over the Unicode code points, matching the portable
    * list-reduce formulation any engine can reproduce ((1e9+6)*31 + cp
    * never overflows a long). Unlike the HOF spelling
    * (`aggregate(transform(sequence(...)))`, interpreted per character,
    * boxing every element), this participates in whole-stage codegen — a
    * scan-side map with zero allocation per row.
    */
  case class RollingHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      java.lang.Long.valueOf(h)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        val cp = ctx.freshName("cp")
        s"""
           |java.lang.String $s = $c.toString();
           |long $h = 0L;
           |int $i = 0;
           |while ($i < $s.length()) {
           |  int $cp = $s.codePointAt($i);
           |  $h = ($h * 31L + $cp) % 1000000007L;
           |  $i += java.lang.Character.charCount($cp);
           |}
           |${ev.value} = $h;
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** N-gram profile kernel shared by interpreted eval and generated code:
    * hash every word n-gram position (NOT distinct — multiplicities matter
    * here, unlike [[HashedShingles]]), sort, and scan runs once for
    * (total, n_distinct, top_count). Counts equal those over the string
    * n-grams themselves modulo 64-bit collisions.
    */
  def ngramProfileKernel(arr: ArrayData, n: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val m = arr.numElements()
    val tokHash = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      tokHash(i) = if (t == null) 42L else XXH64.hashUTF8String(t, 42L)
      i += 1
    }
    val cnt = math.max(m - n + 1, 0)
    val out = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(tokHash(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var distinct = 0; var top = 0; var run = 0
    i = 0
    while (i < cnt) {
      if (i == 0 || out(i) != out(i - 1)) { distinct += 1; run = 1 }
      else run += 1
      if (run > top) top = run
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cnt, distinct, top))
  }

  /** Per-document n-gram repetition profile over a token array:
    * struct(total, n_distinct, top_count) — the inputs to the Gopher-style
    * repetition quality filters (duplicate-n-gram fraction, most-frequent-
    * n-gram fraction). One primitive-typed pass per row; codegen'd via the
    * static kernel, same pattern as [[VecCosine]].
    */
  case class NgramProfile(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("total", IntegerType, nullable = false),
      StructField("n_distinct", IntegerType, nullable = false),
      StructField("top_count", IntegerType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      ngramProfileKernel(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expr.VectorExprs$$.MODULE$$.ngramProfileKernel($c, $n);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** SimHash kernel shared by interpreted eval and generated code. */
  def simhashKernel(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** 64-bit SimHash from a hashed-token array: per-bit ±1 votes.
    * Codegen'd via the static kernel, same pattern as [[VecCosine]].
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(simhashKernel(input.asInstanceOf[ArrayData]))
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expr.VectorExprs$$.MODULE$$.simhashKernel($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Product-quantization encode kernel shared by interpreted eval and
    * generated code: nearest centroid per subspace (squared-L2, ties to the
    * lowest code), one primitive pass over the vector. `codebooks` is
    * m × ksub × subDim.
    */
  def pqEncodeKernel(arr: ArrayData, codebooks: Array[Array[Array[Double]]],
                     tag: Int): ArrayData = {
    val m = codebooks.length
    val out = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val cb = codebooks(s)
      val sub = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cen = cb(c)
        var d = 0d
        var i = 0
        while (i < sub) {
          val x = tag match {
            case 0 => arr.getFloat(off + i).toDouble
            case 1 => arr.getDouble(off + i)
            case 2 => arr.getLong(off + i).toDouble
            case _ => arr.getInt(off + i).toDouble
          }
          val t = cen(i) - x
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      off += sub
      s += 1
    }
    new GenericArrayData(out)
  }

  /** PQ code of a numeric vector under the given codebooks: array<int> of
    * length m. The codebook table is a plan-local constant (m × ksub ×
    * subDim doubles — broadcast-sidecar size class, like
    * [[NearestCentroid]]); the full-corpus encode pass stays inside
    * whole-stage codegen via the static kernel, riding the codebooks in as
    * a codegen reference object (same pattern as [[BloomAnyLong]]).
    */
  case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    private lazy val tag =
      typeTag(child.dataType.asInstanceOf[ArrayType].elementType)
    override def nullSafeEval(input: Any): Any =
      pqEncodeKernel(input.asInstanceOf[ArrayData], codebooks, tag)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expr.VectorExprs$$.MODULE$$.pqEncodeKernel($c, $ref, $tag);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** ADC lookup kernel: Σ_s lut[s*ksub + codes[s]] — the asymmetric-
    * distance hot loop of PQ search (one table lookup per subspace, no
    * per-element arithmetic on the vector itself).
    */
  def pqAdcKernel(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var s = 0
    var acc = 0d
    while (s < m) {
      acc += lut.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    acc
  }

  /** Asymmetric-distance (ADC) accumulation of a PQ code array against a
    * flattened m×ksub lookup table (per-query dot-product tables, or the
    * constant centroid-norm table). Codegen'd via the static kernel, same
    * pattern as [[VecCosine]].
    */
  case class PqAdc(left: Expression, right: Expression, ksub: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(codes: Any, lut: Any): Any =
      pqAdcKernel(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], ksub)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"${ev.value} = graft.expr.VectorExprs$$.MODULE$$.pqAdcKernel($l, $r, $ksub);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Bloom membership kernel: true iff ANY element of the long array might
    * be in the filter. Early-exits on the first hit.
    */
  def bloomAnyKernel(arr: ArrayData,
                     bf: org.apache.spark.util.sketch.BloomFilter): Boolean = {
    var i = 0
    while (i < arr.numElements()) {
      if (bf.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }

  /** "Any element in the Bloom filter" over an array<long> column, against
    * a driver-built `org.apache.spark.util.sketch.BloomFilter` (a few MB
    * even for 1e9 items at 1% — the broadcast-sidecar size class, like
    * [[NearestCentroid]]'s centroids). The filter deserializes once per
    * executor (transient lazy) and rides into generated code as a codegen
    * reference object — the membership probe stays inside whole-stage
    * codegen with no join, no shuffle, no per-row deserialization.
    */
  case class BloomAnyLong(child: Expression, bloomBytes: Array[Byte])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    @transient private lazy val bf =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes))
    override def nullSafeEval(input: Any): Any =
      java.lang.Boolean.valueOf(bloomAnyKernel(input.asInstanceOf[ArrayData], bf))
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val bfRef = ctx.addReferenceObj("bloomFilter", bf,
        "org.apache.spark.util.sketch.BloomFilter")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expr.VectorExprs$$.MODULE$$.bloomAnyKernel($c, $bfRef);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** NFC-normalization kernel shared by interpreted eval and generated
    * code. ASCII fast path: a UTF8String whose byte and codepoint counts
    * match is pure ASCII, and NFC is the identity on ASCII — the input
    * buffer is returned with no decode and no allocation (the common case
    * for a filtered web corpus). Non-ASCII strings already in NFC also
    * return the input buffer (`Normalizer.isNormalized` is a scan, not a
    * rewrite); only genuinely decomposed text pays for normalization.
    */
  def nfcKernel(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    if (s.numBytes == s.numChars) return s // pure ASCII: NFC is identity
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }

  /** Unicode NFC composition of a string — the first step of the CCNet/C4
    * text-normalization recipes (Wenzek 2020 §3; Raffel 2020 §2.2), which
    * the built-in function library lacks. Stays inside whole-stage codegen
    * via the static kernel (same pattern as [[SimHash64]]); SQL-callable
    * as `nfc_normalize` (the DuckDB name) via [[graft.GraftExtensions]].
    */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      nfcKernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expr.VectorExprs$$.MODULE$$.nfcKernel($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Affine projection of a numeric vector — the PCA / whitening kernel:
    * `y(j) = scale(j) · Σ_i mat(j)(i) · (x(i) − shift(i))` (center, rotate,
    * optionally rescale) in one primitive-typed pass. The k×d matrix,
    * d-element shift, and k-element scale ride the plan as expression
    * state like [[NearestCentroid]]'s centroids (broadcast-sidecar size
    * class: PCA models are k·d doubles, KBs–MBs). Ragged input vectors
    * fail loudly — a silent truncation would project garbage.
    */
  case class AffineProject(child: Expression, mat: Array[Array[Double]],
                           shift: Array[Double], scale: Array[Double])
      extends UnaryExpression with CodegenFallback {
    require(mat.forall(_.length == shift.length),
      s"AffineProject: matrix rows must match shift dim ${shift.length}")
    require(scale.length == mat.length,
      s"AffineProject: scale length ${scale.length} != matrix rows ${mat.length}")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      val d = shift.length
      if (arr.numElements() != d)
        throw new IllegalArgumentException(
          s"AffineProject: vector has ${arr.numElements()} elements, model has $d")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        // a null ELEMENT would read back as 0.0 from the unsafe accessors
        // and project garbage silently — the exact failure this class's
        // loud-contract exists to prevent
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"AffineProject: null element at index $i")
        x(i) = (et match {
          case FloatType => arr.getFloat(i).toDouble
          case DoubleType => arr.getDouble(i)
          case LongType => arr.getLong(i).toDouble
          case IntegerType => arr.getInt(i).toDouble
          case other => throw new IllegalArgumentException(s"AffineProject: $other")
        }) - shift(i)
        i += 1
      }
      val k = mat.length
      val out = new Array[Double](k)
      var j = 0
      while (j < k) {
        val row = mat(j)
        var s = 0d
        i = 0
        while (i < d) { s += row(i) * x(i); i += 1 }
        out(j) = s * scale(j)
        j += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Decodes a string to Unicode code points — the unit every fuzzy
    * kernel measures in, matching both the candidate generation
    * (Spark `substring`/`length` count code points) and DuckDB's
    * UTF-8-aware distance functions. On BMP text this is exactly the
    * UTF-16 char array; with astral chars (emoji) it keeps a surrogate
    * PAIR as one unit, so a one-emoji edit costs 1, not 2.
    */
  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0; var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Full (unrestricted) Damerau–Levenshtein distance kernel — the
    * Lowrance–Wagner 1975 DP with a last-occurrence table, NOT the
    * restricted OSA variant: a transposed pair may be further edited
    * (dl("ca","abc") = 2, where OSA says 3). This is the definition
    * DuckDB's `damerau_levenshtein` implements, which is what lets the
    * fuzzy queries be exact-oracle-checked. Operates on Unicode code
    * points — the same unit as the deletion-variant candidate generation
    * (Spark substring/length) and Spark's built-in `levenshtein`.
    * DuckDB's function counts UTF-8 BYTES instead (an emoji delete costs
    * 4 there), so oracle agreement is exact on ASCII text and the engine
    * is the more principled one beyond it.
    */
  def damerauKernel(ua: org.apache.spark.unsafe.types.UTF8String,
                    ub: org.apache.spark.unsafe.types.UTF8String): Int = {
    val a = codePoints(ua.toString); val b = codePoints(ub.toString)
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is offset by one: d(i+1)(j+1) = distance over prefixes a[0,i) b[0,j)
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val last = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1 = { val v = last.get(Integer.valueOf(b(j - 1))); if (v == null) 0 else v.intValue() }
        val j1 = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trn = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trn < best) best = trn
        d(i + 1)(j + 1) = best
        j += 1
      }
      last.put(Integer.valueOf(a(i - 1)), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  /** Jaro–Winkler similarity kernel, matching DuckDB's
    * `jaro_winkler_similarity` exactly on ASCII text (verified
    * empirically; DuckDB measures UTF-8 bytes, this kernel Unicode code
    * points — the consistent unit across the fuzzy family): Jaro with
    * the match window max(max(|a|,|b|)/2 − 1, 0) and half-transpositions,
    * Winkler prefix boost p = 0.1 over at most 4 common leading chars
    * applied ONLY when jaro > 0.7 (the standard boost threshold), and
    * 0.0 whenever either string is empty — including both-empty.
    */
  def jaroWinklerKernel(ua: org.apache.spark.unsafe.types.UTF8String,
                        ub: org.apache.spark.unsafe.types.UTF8String): Double = {
    val a = codePoints(ua.toString); val b = codePoints(ub.toString)
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val fa = new Array[Boolean](n); val fb = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, m)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!fb(j) && a(i) == b(j)) {
          fa(i) = true; fb(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < n) {
      if (fa(i)) {
        while (!fb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (matches.toDouble / n + matches.toDouble / m +
      (matches - half).toDouble / matches) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(n, m))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** `jaro_winkler(a, b)` as a codegen'd expression (static-kernel
    * pattern) — the similarity verify of the sorted-neighborhood linkage
    * stays inside whole-stage codegen.
    */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      jaroWinklerKernel(l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"${ev.value} = graft.expr.VectorExprs$$.MODULE$$.jaroWinklerKernel($l, $r);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** `damerau_levenshtein(a, b)` as a codegen'd expression (static-kernel
    * pattern, like [[VecCosine]]) — the verify step of the fuzzy join's
    * transposition-aware mode stays inside whole-stage codegen.
    */
  case class DamerauLevenshtein(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(l: Any, r: Any): Any =
      damerauKernel(l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"${ev.value} = graft.expr.VectorExprs$$.MODULE$$.damerauKernel($l, $r);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ------------------------------------------------------- Column wrappers

  def hashed_shingles(tokens: Column, n: Int): Column =
    toColumn(HashedShingles(toExpression(tokens), n))
  def minhash_sig(shingles: Column, k: Int): Column =
    toColumn(MinHashSig(toExpression(shingles), k))
  def band_hashes(sig: Column, bands: Int): Column =
    toColumn(BandHashes(toExpression(sig), bands))
  def vec_cosine(a: Column, b: Column): Column =
    toColumn(VecCosine(toExpression(a), toExpression(b)))
  def nearest_centroid(vec: Column, centroids: Array[Array[Double]]): Column =
    toColumn(NearestCentroid(toExpression(vec), centroids))
  def simhash64(hashedTokens: Column): Column =
    toColumn(SimHash64(toExpression(hashedTokens)))
  def rolling_hash(text: Column): Column =
    toColumn(RollingHash(toExpression(text)))
  def ngram_profile(tokens: Column, n: Int): Column =
    toColumn(NgramProfile(toExpression(tokens), n))
  def bloom_any(hashedGrams: Column, bloomBytes: Array[Byte]): Column =
    toColumn(BloomAnyLong(toExpression(hashedGrams), bloomBytes))
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    toColumn(PqEncode(toExpression(vec), codebooks))
  def pq_adc(codes: Column, lut: Column, ksub: Int): Column =
    toColumn(PqAdc(toExpression(codes), toExpression(lut), ksub))
  def nfc_normalize(text: Column): Column =
    toColumn(NfcNormalize(toExpression(text)))
  def damerau_levenshtein(a: Column, b: Column): Column =
    toColumn(DamerauLevenshtein(toExpression(a), toExpression(b)))
  def jaro_winkler(a: Column, b: Column): Column =
    toColumn(JaroWinkler(toExpression(a), toExpression(b)))
  def affine_project(vec: Column, mat: Array[Array[Double]],
                     shift: Array[Double], scale: Array[Double]): Column =
    toColumn(AffineProject(toExpression(vec), mat, shift, scale))
}
