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

/** STRIDED byte folds — `byte_sum_stride` / `byte_min_stride` /
  * `byte_max_stride(bin, off, stride)` — the per-CHANNEL statistics
  * primitives of the color decode path (Multimodal.ppmDecode): an
  * interleaved RGB pixel section samples one channel as bytes
  * off, off+stride, off+2·stride, …. `off` is 0-based; non-positive
  * stride, out-of-range offset, or an empty selection folds to NULL
  * (same no-identity-leak contract as the contiguous folds). One codegen
  * loop, no per-index substring HOFs. */
abstract class ByteFoldStride
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  def bin: Expression
  def off: Expression
  def stride: Expression

  override def first: Expression = bin
  override def second: Expression = off
  override def third: Expression = stride
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  protected def init: Long
  protected def fold(acc: Long, v: Int): Long
  protected def foldJava(acc: String, v: String): String

  override def checkInputDataTypes(): TypeCheckResult =
    (bin.dataType, off.dataType, stride.dataType) match {
      case (BinaryType, org.apache.spark.sql.types.IntegerType,
            org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, INT, INT), got $other")
    }

  override def nullSafeEval(b: Any, o: Any, st: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    val start = o.asInstanceOf[Int]
    val step = st.asInstanceOf[Int]
    if (step <= 0 || start < 0 || start >= bytes.length) null
    else {
      var acc = init
      var i = start
      while (i < bytes.length) { acc = fold(acc, bytes(i) & 0xff); i += step }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o, st) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |if ($st <= 0 || $o < 0 || $o >= $b.length) { ${ev.isNull} = true; } else {
         |  long $acc = ${init}L;
         |  for (int $i = $o; $i < $b.length; $i += $st) {
         |    int $v = $b[$i] & 0xff;
         |    $acc = ${foldJava(acc, v)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

case class ByteSumStride(bin: Expression, off: Expression, stride: Expression)
    extends ByteFoldStride {
  override def prettyName: String = "byte_sum_stride"
  override protected def init: Long = 0L
  override protected def fold(acc: Long, v: Int): Long = acc + v
  override protected def foldJava(acc: String, v: String): String = s"$acc + $v"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ByteSumStride =
    copy(bin = f, off = s, stride = t)
}

case class ByteMinStride(bin: Expression, off: Expression, stride: Expression)
    extends ByteFoldStride {
  override def prettyName: String = "byte_min_stride"
  override protected def init: Long = 255L
  override protected def fold(acc: Long, v: Int): Long = math.min(acc, v)
  override protected def foldJava(acc: String, v: String): String =
    s"java.lang.Math.min($acc, (long) $v)"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ByteMinStride =
    copy(bin = f, off = s, stride = t)
}

case class ByteMaxStride(bin: Expression, off: Expression, stride: Expression)
    extends ByteFoldStride {
  override def prettyName: String = "byte_max_stride"
  override protected def init: Long = 0L
  override protected def fold(acc: Long, v: Int): Long = math.max(acc, v)
  override protected def foldJava(acc: String, v: String): String =
    s"java.lang.Math.max($acc, (long) $v)"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ByteMaxStride =
    copy(bin = f, off = s, stride = t)
}

/** 2× box downsample of a row-major 8-bit bitmap: `pgm_shrink(px, w, h)`
  * averages each 2×2 pixel block (integer floor mean) into one output
  * byte — the REAL resize stage of the media pipeline
  * (Multimodal.pgmResize), one codegen loop per row, no codec library.
  * Output dims are (w/2, h/2) floored; odd trailing rows/columns are
  * dropped (box filter semantics). NULL when the payload is shorter than
  * the declared w·h (corrupt payload) or a dim is non-positive. */
case class PgmShrink(bin: Expression, wExpr: Expression, hExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = bin
  override def second: Expression = wExpr
  override def third: Expression = hExpr
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pgm_shrink"

  override def checkInputDataTypes(): TypeCheckResult =
    (bin.dataType, wExpr.dataType, hExpr.dataType) match {
      case (BinaryType, org.apache.spark.sql.types.IntegerType,
            org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pgm_shrink requires (BINARY, INT, INT), got $other")
    }

  override def nullSafeEval(b: Any, wv: Any, hv: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    val w = wv.asInstanceOf[Int]
    val h = hv.asInstanceOf[Int]
    if (w <= 0 || h <= 0 || bytes.length < w.toLong * h) null
    else {
      val ow = w / 2
      val oh = h / 2
      val out = new Array[Byte](ow * oh)
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          val i = oy * 2 * w + ox * 2
          val s = (bytes(i) & 0xff) + (bytes(i + 1) & 0xff) +
            (bytes(i + w) & 0xff) + (bytes(i + w + 1) & 0xff)
          out(oy * ow + ox) = (s / 4).toByte
          ox += 1
        }
        oy += 1
      }
      out
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, w, h) => {
      val ow = ctx.freshName("ow")
      val oh = ctx.freshName("oh")
      val out = ctx.freshName("out")
      val oy = ctx.freshName("oy")
      val ox = ctx.freshName("ox")
      val i = ctx.freshName("i")
      val sAcc = ctx.freshName("sAcc")
      s"""
         |if ($w <= 0 || $h <= 0 || $b.length < (long) $w * $h) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $ow = $w / 2;
         |  int $oh = $h / 2;
         |  byte[] $out = new byte[$ow * $oh];
         |  for (int $oy = 0; $oy < $oh; $oy++) {
         |    for (int $ox = 0; $ox < $ow; $ox++) {
         |      int $i = $oy * 2 * $w + $ox * 2;
         |      int $sAcc = ($b[$i] & 0xff) + ($b[$i + 1] & 0xff)
         |        + ($b[$i + $w] & 0xff) + ($b[$i + $w + 1] & 0xff);
         |      $out[$oy * $ow + $ox] = (byte) ($sAcc / 4);
         |    }
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PgmShrink =
    copy(bin = f, wExpr = s, hExpr = t)
}
