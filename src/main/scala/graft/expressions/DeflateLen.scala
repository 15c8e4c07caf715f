package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd DEFLATE-compressed length of a string's UTF-8 bytes — the
  * primitive behind the compression-ratio quality signal (highly
  * compressible text = boilerplate / repetition; used as a document
  * filter in the Gopher/MassiveText pipeline, Rae et al. 2021 §A.1.1).
  * One `java.util.zip.Deflater` pass per row (level 6, zlib framing), no
  * intermediate compressed buffer retained — only the length is counted,
  * so the hot path allocates one scratch buffer per call and never
  * materializes the compressed payload.
  *
  * Deterministic for a fixed zlib implementation (the JVM bundles one),
  * which is exactly the scope the catalog claims for it: ext97 is
  * rows-only at the gate (DuckDB has no deflate), with byte-for-byte
  * semantics pinned by DeflateLenSpec against an independent
  * java.util.zip recomputation.
  */
case class DeflateLen(str: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(str)

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = str.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects string, got ${str.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val s = str.eval(input)
    if (s == null) null
    else DeflateLen.compressedLength(s.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val se = str.genCode(ctx)
    val cls = DeflateLen.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${se.code}
        boolean ${ev.isNull} = ${se.isNull};
        int ${ev.value} = 0;
        if (!${ev.isNull}) {
          ${ev.value} = $cls.compressedLength(${se.value}.getBytes());
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(str = newChildren.head)
}

object DeflateLen {

  /** zlib-framed DEFLATE length at the default level (6). A fresh
    * Deflater per call keeps the expression thread-safe under
    * whole-stage codegen's per-task execution; the scratch buffer only
    * receives (and discards) output, so cost is one pass over the input.
    */
  def compressedLength(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
