package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass sketch kernels over a precomputed `array<long>` of element
  * hashes (callers do `transform(toks, xxhash64)` once — Spark's own hash —
  * then these fold all signature positions in ONE traversal).
  *
  * The composed higher-order-function forms traverse the array once per
  * signature slot (64 `aggregate`/`array_min` passes with two lambda
  * dispatches per element each); on a 100 TB document corpus the signature
  * map is the dominant cost of MinHash/SimHash dedup, so slot-in-one-pass
  * matters. Cross-checked bit-for-bit against the HOF forms in
  * SketchExpressionsSpec.
  */

/** 64-bit SimHash from element hashes: bit k of the output = sign of
  * Σ_elements (bit k of hash ? +1 : −1).
  */
case class SimHashBits(hashes: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(hashes)
  override def dataType: DataType = LongType
  override def nullable: Boolean = hashes.nullable

  override def checkInputDataTypes(): TypeCheckResult = hashes.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits expects array<bigint>, got ${t.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = hashes.eval(input)
    if (a == null) return null
    val arr = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) out |= (1L << k)
      k += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ae = hashes.genCode(ctx)
    val votes = ctx.freshName("votes")
    val i = ctx.freshName("i")
    val k = ctx.freshName("k")
    val h = ctx.freshName("h")
    val n = ctx.freshName("n")
    ev.copy(code =
      code"""
        ${ae.code}
        boolean ${ev.isNull} = ${ae.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          int[] $votes = new int[64];
          int $n = ${ae.value}.numElements();
          for (int $i = 0; $i < $n; $i++) {
            if (!${ae.value}.isNullAt($i)) {
              long $h = ${ae.value}.getLong($i);
              for (int $k = 0; $k < 64; $k++) {
                if ((($h >>> $k) & 1L) == 1L) $votes[$k]++; else $votes[$k]--;
              }
            }
          }
          for (int $k = 0; $k < 64; $k++) {
            if ($votes[$k] > 0) ${ev.value} |= (1L << $k);
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(hashes = newChildren(0))

  override def prettyName: String = "simhash_bits"
}

/** MinHash signature from element hashes: slot i =
  * min_elements pmod(pmod(h, p)·aᵢ + bᵢ, p) with p = 2³¹−1,
  * aᵢ = 2i+1, bᵢ = 104729·(i+1) — exactly the arithmetic of the composed
  * column form (TextFunctions.minHashSignature), one pass instead of
  * `perms` passes. Empty/all-null input yields an array of p (the identity
  * of min over the [0, p) range — matches array_min over empty = null?
  * No: the HOF form yields null slots on empty input; this returns null for
  * the whole signature then, keeping null semantics aligned).
  */
case class MinHashSig(hashes: Expression, perms: Int) extends CodegenFallback {

  private val P = 2147483647L

  override def children: Seq[Expression] = Seq(hashes)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = hashes.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = hashes.eval(input)
    if (a == null) return null
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null // HOF form: array_min over empty → null slots
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val hp = java.lang.Math.floorMod(arr.getLong(i), P)
        var s = 0
        while (s < perms) {
          val v = java.lang.Math.floorMod(hp * (2L * s + 1L) + 104729L * (s + 1), P)
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(hashes = newChildren(0))

  override def prettyName: String = "minhash_sig"
}
