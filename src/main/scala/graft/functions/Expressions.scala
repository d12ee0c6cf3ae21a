package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static, codegen-callable kernels. Keeping the per-row work in
  * static methods lets the Expressions below emit a single call in
  * `doGenCode`, so they stay inside whole-stage codegen (no virtual
  * `eval` dispatch per row) while the loops themselves are tight
  * JIT-friendly Java.
  */
object Kernels {
  private final val Seed = 42L

  def hashToken(s: UTF8String, seed: Long): Long =
    XXH64.hashUTF8String(s, seed)

  /** 64-bit SimHash over an array of string tokens: sum +-1 per bit of
    * each token hash; output bit j set iff the sum is positive. */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashToken(tokens.getUTF8String(i), Seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Cosine similarity between two float vectors (single fused loop). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Word n-gram shingles of a token array, space-joined, in one
    * pass. Exists because the compose-first form
    * `transform(sequence(...), i -> concat_ws(slice(tokens, ...)))`
    * is a higher-order function: Spark interprets the whole subtree
    * (CodegenFallback), and CollapseProject re-inlines the `split`
    * producing `tokens` into every lambda slot — turning shingling
    * into O(shingles) full re-splits of the document per row. */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements() - n + 1
    if (cnt <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (tokens.isNullAt(i + j)) UTF8String.EMPTY_UTF8
                   else tokens.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** MinHash band signature in ONE pass over the shingle array.
    * k = bands*rows seeded hashes per shingle: one string hash, then
    * k independent long-rehashes (an affine family h1 + j*h2 is NOT
    * enough here — it correlates the per-j argmins, so docs sharing
    * any popular shingle collide on whole bands and candidate
    * generation goes quadratic). Each band's `rows` minima fold into
    * one 64-bit bucket key. Output: array<long> of
    * length `bands`. Replaces a 64-deep nested higher-order-function
    * pipeline that Spark can only interpret (HOFs are
    * CodegenFallback) — this is the difference between an LSH pass
    * being CPU-bound on hashing and being bound on expression
    * interpretation overhead. */
  def minhashBands(shingles: ArrayData, bands: Int, rows: Int): ArrayData = {
    val k = bands * rows
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val u = shingles.getUTF8String(i)
        val h1 = XXH64.hashUTF8String(u, Seed)
        var j = 0
        while (j < k) {
          val g = XXH64.hashLong(h1, Seed + j)
          if (g < mins(j)) mins(j) = g
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = Seed
      var r = 0
      while (r < rows) {
        acc = XXH64.hashLong(mins(b * rows + r), acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Jaccard similarity of two SORTED distinct string arrays via a
    * single merge pass — no per-pair hash sets (array_intersect/
    * array_union allocate and hash both sides for every row, which
    * dominates all-pairs similarity joins). */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val (na, nb) = (a.numElements(), b.numElements())
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** Deterministic pseudo-random +-1 hyperplane component for plane j,
    * dimension d (hash-derived; no RNG state to ship to executors). */
  @inline private def planeSign(j: Int, d: Int): Double =
    if ((XXH64.hashLong((j.toLong << 32) | d.toLong, Seed) & 1L) == 0L) 1.0
    else -1.0

  /** Random-hyperplane LSH signature: bit j = sign(dot(vec, r_j)).
    * With `planes` <= 64 the signature packs into one long, so the
    * LSH bucket join is a plain long-key shuffle. */
  def rhpBits(vec: ArrayData, planes: Int): Long = {
    val n = vec.numElements()
    var out = 0L
    var j = 0
    while (j < planes) {
      var dot = 0.0
      var d = 0
      while (d < n) { dot += vec.getFloat(d).toDouble * planeSign(j, d); d += 1 }
      if (dot > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** 64-bit SimHash of an array<string> token column. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
}

/** Bloom-filter membership probe on a BIGINT key. The built sketch
  * rides inside the expression (serialized once per task, referenced
  * via `addReferenceObj` in generated code), so the probe is a single
  * unboxed call inside whole-stage codegen — unlike a Scala UDF,
  * which pays per-row Long boxing and a lambda dispatch. Used by
  * [[graft.operators.RuntimeFilter]] as the pre-shuffle fact prune. */
case class BloomProbeExpr(filter: org.apache.spark.util.sketch.BloomFilter,
                          child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(c: Expression): BloomProbeExpr =
    copy(child = c)
}

/** Cosine similarity of two array<float> columns. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : CosineSimExpr = copy(left = l, right = r)
}

/** Word n-gram shingles (space-joined) of an array<string> tokens
  * column. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle width must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShinglesExpr =
    copy(child = c)
}

/** MinHash-LSH band bucket keys (array<long>, one per band) of an
  * array<string> shingle column. */
case class MinHashBandsExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {
  require(bands > 0 && rows > 0, "bands and rows must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.minhashBands(input.asInstanceOf[ArrayData], bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.minhashBands($c, $bands, $rows)")
  override protected def withNewChildInternal(c: Expression): MinHashBandsExpr =
    copy(child = c)
}

/** Merge-based Jaccard of two sorted distinct array<string> columns. */
case class SortedJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.sortedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Kernels.sortedJaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : SortedJaccardExpr = copy(left = l, right = r)
}

/** Random-hyperplane LSH bucket signature of an array<float> column. */
case class RhpLshExpr(child: Expression, planes: Int) extends UnaryExpression {
  require(planes > 0 && planes <= 64, "planes must be in 1..64")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.rhpBits(input.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.rhpBits($c, $planes)")
  override protected def withNewChildInternal(c: Expression): RhpLshExpr =
    copy(child = c)
}

/** Column-level API for the custom expressions. */
object GraftFunctions {
  private def toExpr(c: Column): Expression = GraftColumnBridge.expression(c)
  private def toCol(e: Expression): Column = GraftColumnBridge.column(e)

  /** 64-bit SimHash of an array<string> of tokens. */
  def simhash64(tokens: Column): Column = toCol(SimHash64Expr(toExpr(tokens)))

  /** Cosine similarity of two array<float> embedding columns. */
  def cosine_sim(a: Column, b: Column): Column =
    toCol(CosineSimExpr(toExpr(a), toExpr(b)))

  /** Bloom membership probe of a BIGINT key column (codegen'd). */
  def bloom_might_contain(
      filter: org.apache.spark.util.sketch.BloomFilter,
      key: Column): Column =
    toCol(BloomProbeExpr(filter, toExpr(key)))

  /** Random-hyperplane LSH signature (long) of an array<float>. */
  def rhp_lsh(vec: Column, planes: Int): Column =
    toCol(RhpLshExpr(toExpr(vec), planes))

  /** MinHash-LSH band bucket keys of an array<string> of shingles. */
  def minhash_bands(shingles: Column, bands: Int, rows: Int): Column =
    toCol(MinHashBandsExpr(toExpr(shingles), bands, rows))

  /** Word n-gram shingles (space-joined) of a token array. */
  def text_shingles(tokens: Column, n: Int): Column =
    toCol(ShinglesExpr(toExpr(tokens), n))

  /** Merge-based Jaccard of two sorted distinct string arrays. */
  def sorted_jaccard(a: Column, b: Column): Column =
    toCol(SortedJaccardExpr(toExpr(a), toExpr(b)))
}
