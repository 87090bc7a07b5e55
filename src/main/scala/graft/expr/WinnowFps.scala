package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole winnowing fingerprint chain (Schleimer et al., SIGMOD'03) in
  * ONE expression evaluation per row: 3-gram join → md5 32-bit prefix hash
  * → sliding minimum over `w` consecutive gram hashes → sorted distinct
  * minima.
  *
  * Exists because the declarative formulation (three chained `transform`
  * HOFs over toks→grams→hashes→minima) is interpreted AND subject to
  * projection collapse: Catalyst inlines each step's defining expression
  * into the next lambda's body, so `split(text)` ends up re-evaluated per
  * lambda ELEMENT — O(tokens²) per document (observed: a single
  * fingerprint-relation build arm pinned one core for minutes at sf0.1
  * once q_dedup_winnow referenced the relation on three join arms). One
  * opaque expression evaluates each stage exactly once: O(tokens·w).
  *
  * Hash parity with the DuckDB oracle: gh = first 4 md5 digest bytes
  * big-endian, unsigned — identical to
  * `conv(substring(md5(CAST(g AS BINARY)), 1, 8), 16, 10)` /
  * DuckDB's hex-digit fold of `substr(md5(g), 1, 8)`. Guarantee
  * unchanged: docs sharing a run of >= w+2 tokens share a fingerprint.
  * Inputs shorter than w+2 tokens yield an empty array (callers filter
  * them out; the guard keeps the expression total).
  */
case class WinnowFps(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires array<string> and w >= 1, got " +
        s"${child.dataType.simpleString}, w=$w")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < 2 + w) return new GenericArrayData(Array.empty[Any])
    val nGrams = len - 2
    val md = java.security.MessageDigest.getInstance("MD5")
    val gh = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val g = UTF8String.concatWs(space,
        arr.getUTF8String(i), arr.getUTF8String(i + 1), arr.getUTF8String(i + 2))
      md.reset()
      val dig = md.digest(g.getBytes)
      gh(i) = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      i += 1
    }
    // O(n·w) sliding window minimum — w is a small constant (default 4);
    // TreeSet gives distinct + ascending order in one structure
    val seen = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j <= nGrams - w) {
      var m = gh(j)
      var k = 1
      while (k < w) { if (gh(j + k) < m) m = gh(j + k); k += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next().longValue(); x += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}
