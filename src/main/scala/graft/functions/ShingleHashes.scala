package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by the interpreted eval and the generated code
  * (janino calls the static forwarders). All arithmetic mirrors the SQL
  * forms in `graft.ext.Dedup`/`TextStats` exactly:
  *  - token hash = ((ascii₀·31 + ascii₁)·31 + ascii₂)·31 + length
  *    (`TextStats.tokenHash`), with chars read as UTF-16 units — equal to
  *    Spark's `ascii`/`length` for all BMP text (the engine's token
  *    vocabulary is ASCII);
  *  - shingle hash = left fold `acc·1000003 + tokenHash mod (1e9+7)` over
  *    each n-token window (`Dedup.shingleHashFrame`), texts shorter than
  *    n tokens yield no shingles, duplicates drop (first occurrence);
  *  - minhash = min over shingles of `(a·s + b) mod (2³¹−1)` per
  *    permutation (`Dedup.minhashPerms` constants).
  */
object ShingleKernels {
  private val M = 1000000007L
  private val B = 1000003L

  def tokenHash(t: String): Long = {
    val c0 = if (t.length > 0) t.charAt(0).toLong else 0L
    val c1 = if (t.length > 1) t.charAt(1).toLong else 0L
    val c2 = if (t.length > 2) t.charAt(2).toLong else 0L
    ((c0 * 31 + c1) * 31 + c2) * 31 + t.length
  }

  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val k = toks.length
    if (k < n) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](k)
    var i = 0
    while (i < k) { th(i) = tokenHash(toks(i)); i += 1 }
    val seen = new java.util.HashSet[java.lang.Long](k * 2)
    val buf = new scala.collection.mutable.ArrayBuilder.ofLong
    i = 0
    while (i + n <= k) {
      var acc = th(i) % M
      var j = 1
      while (j < n) { acc = (acc * B + th(i + j)) % M; j += 1 }
      if (seen.add(acc)) buf += acc
      i += 1
    }
    new GenericArrayData(buf.result())
  }

  /** (a, b) permutation constants, flattened [a0,b0,a1,b1,…] — identical
    * to `Dedup.minhashPerms`. */
  def permConstants(numPerms: Int): Array[Long] = {
    val P = 2147483647L
    val out = new Array[Long](numPerms * 2)
    var i = 0
    while (i < numPerms) {
      out(2 * i) = (((i + 1).toLong * 2654435761L) % P) | 1L
      out(2 * i + 1) = ((i + 1).toLong * 2246822519L) % P
      i += 1
    }
    out
  }

  /** 61-bit SimHash fingerprint: per-token spread hash
    * `tokenHash · 2654435761 mod (2⁶¹−1)` (`Dedup.spreadHashes`), then
    * sign-aggregated bit counts — all exact integer math, identical to
    * the explode + 61-sum aggregate form. */
  def simhash(s: UTF8String): Long = {
    val toks = s.toString.split(" ", -1)
    val counts = new Array[Int](61)
    var i = 0
    while (i < toks.length) {
      val h = (tokenHash(toks(i)) * 2654435761L) % 2305843009213693951L
      var b = 0
      while (b < 61) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 61) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  def minhashSig(hs: ArrayData, perms: Array[Long]): ArrayData = {
    val P = 2147483647L
    val numPerms = perms.length / 2
    val m = hs.numElements()
    val out = new Array[Long](numPerms)
    var p = 0
    while (p < numPerms) {
      val a = perms(2 * p); val b = perms(2 * p + 1)
      var best = Long.MaxValue
      var i = 0
      while (i < m) {
        val v = (a * hs.getLong(i) + b) % P
        if (v < best) best = v
        i += 1
      }
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct word n-gram shingle hashes of a text column as a native
  * codegen expression — replaces the explode + per-doc window + distinct
  * pipeline (`Dedup.shingleHashFrame`'s former body) with one per-row
  * pass: no shuffle at all until the inverted-index join consumes the
  * exploded output. Scale note: per-row compute in the projection; the
  * dedup family's first shuffle is now the index join itself. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle size must be positive, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(s: Any): Any =
    ShingleKernels.shingleHashes(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ShingleKernels.shingleHashes($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** SimHash fingerprint as a native codegen expression — replaces the
  * explode + 61 bit-sum aggregate pipeline with one per-row pass (no
  * shuffle before the block-pigeonhole candidate join). */
case class Simhash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(s: Any): Any =
    ShingleKernels.simhash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ShingleKernels.simhash($s);")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/** MinHash signature over a shingle-hash array as a native codegen
  * expression: all `numPerms` minima in one per-row loop — replaces the
  * broadcast-perms join + two hash aggregates + collect_list assembly
  * (bit-identical minima; the permutation constants are the same LCG the
  * oracle SQL mirrors). Empty shingle arrays yield Long.MaxValue minima,
  * matching the aggregate form's absence semantics only when callers
  * filter empty docs — the banded join keys on the signature either way. */
case class MinhashSig(child: Expression, numPerms: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numPerms >= 1, s"numPerms must be positive, got $numPerms")

  private val perms: Array[Long] = ShingleKernels.permConstants(numPerms)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(hs: Any): Any =
    ShingleKernels.minhashSig(hs.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("minhashPerms", perms, "long[]")
    nullSafeCodeGen(ctx, ev, hs =>
      s"${ev.value} = graft.functions.ShingleKernels.minhashSig($hs, $pRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}
