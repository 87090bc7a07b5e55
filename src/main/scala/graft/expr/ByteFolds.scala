package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Unsigned-byte folds over a BINARY column — `byte_sum` / `byte_min` /
  * `byte_max(bin)` — the pixel-statistics primitives of the media decode
  * path (Multimodal.pgmDecode): a parsed payload's pixel section is raw
  * bytes, and per-byte feature extraction via HOFs would build a
  * substring per index (quadratic, interpreted — the WinnowFps lesson).
  * One tight codegen loop each; bytes read unsigned (0..255); NULL for an
  * empty payload (no identity element leaks into min/max).
  *
  * Sum of a 2 GB payload maxes at ~5.5e11 — far inside Long. */
abstract class ByteFold extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  protected def init: Long
  protected def fold(acc: Long, v: Int): Long
  /** Java expression folding `acc` with unsigned byte `v`. */
  protected def foldJava(acc: String, v: String): String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null
    else {
      var acc = init
      var i = 0
      while (i < bytes.length) { acc = fold(acc, bytes(i) & 0xff); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |if ($a.length == 0) { ${ev.isNull} = true; } else {
         |  long $acc = ${init}L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    int $v = $a[$i] & 0xff;
         |    $acc = ${foldJava(acc, v)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

case class ByteSum(child: Expression) extends ByteFold {
  override def prettyName: String = "byte_sum"
  override protected def init: Long = 0L
  override protected def fold(acc: Long, v: Int): Long = acc + v
  override protected def foldJava(acc: String, v: String): String = s"$acc + $v"
  override protected def withNewChildInternal(c: Expression): ByteSum = copy(child = c)
}

case class ByteMin(child: Expression) extends ByteFold {
  override def prettyName: String = "byte_min"
  override protected def init: Long = 255L
  override protected def fold(acc: Long, v: Int): Long = math.min(acc, v)
  override protected def foldJava(acc: String, v: String): String =
    s"java.lang.Math.min($acc, (long) $v)"
  override protected def withNewChildInternal(c: Expression): ByteMin = copy(child = c)
}

case class ByteMax(child: Expression) extends ByteFold {
  override def prettyName: String = "byte_max"
  override protected def init: Long = 0L
  override protected def fold(acc: Long, v: Int): Long = math.max(acc, v)
  override protected def foldJava(acc: String, v: String): String =
    s"java.lang.Math.max($acc, (long) $v)"
  override protected def withNewChildInternal(c: Expression): ByteMax = copy(child = c)
}

case class ByteSumSq(child: Expression) extends ByteFold {
  override def prettyName: String = "byte_sumsq"
  override protected def init: Long = 0L
  override protected def fold(acc: Long, v: Int): Long = acc + v.toLong * v
  override protected def foldJava(acc: String, v: String): String =
    s"$acc + ((long) $v) * $v"
  override protected def withNewChildInternal(c: Expression): ByteSumSq = copy(child = c)
}
