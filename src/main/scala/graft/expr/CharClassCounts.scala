package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass alphanumeric character histogram — `char_class_counts(text)` →
  * array<long>[36] of occurrence counts for 'a'..'z' (indices 0..25) and
  * '0'..'9' (26..35). The entropy scorer's per-class
  * `length(text) − length(replace(text, c, ''))` formulation walks the
  * string once PER CLASS and allocates a copy each time — 36 O(len)
  * passes per row (measured ~2.4 s at sf0.1 even with the counts
  * projection split); this expression is ONE tight loop over the UTF-8
  * bytes, zero allocation beyond the fixed 36-slot array.
  *
  * Byte-level counting is exact for these classes under UTF-8: the target
  * code points are single-byte ASCII, and every byte of a multi-byte
  * sequence is ≥ 0x80, so no continuation byte can collide with an ASCII
  * target — byte counts equal character counts whatever else the text
  * holds. The DuckDB oracle keeps the replace() formulation; the counts
  * are exact integers, so the two formulations hash-identically.
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_class_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_class_counts requires STRING, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Long](36)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') out(b - 'a') += 1L
      else if (b >= '0' && b <= '9') out(26 + (b - '0')) += 1L
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long[] $out = new long[36];
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $b = $bytes[$i];
         |  if ($b >= 'a' && $b <= 'z') { $out[$b - 'a'] += 1L; }
         |  else if ($b >= '0' && $b <= '9') { $out[26 + ($b - '0')] += 1L; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}
