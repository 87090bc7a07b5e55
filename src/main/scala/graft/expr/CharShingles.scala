package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram shingles of a string in ONE expression evaluation per
  * row — the char-level sibling of [[WordShingles]], for trigram
  * language-ID profiles and char-level fingerprints.
  *
  * The declarative formulation
  * (`transform(sequence(1, length(c)-2), i -> substring(c, i, 3))`) runs
  * an interpreted lambda per POSITION, each substring decoding the string
  * from the start (measured as the dominant cost of `q_lang_ngram` —
  * 5.2 s at sf0.1). This decodes the string to codepoints once and builds
  * each n-gram from the codepoint array: O(chars) total, matching
  * DuckDB's codepoint-based `substr`/`length` semantics exactly
  * (surrogate pairs count as one, as `len()` does).
  *
  * Shorter-than-n inputs yield an empty array (the sequence() formulation
  * needed an explicit length guard against Spark's descending-sequence
  * behavior). `distinct = false` keeps every occurrence in position order.
  */
case class CharShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"char_shingles requires a string and n >= 1, got " +
        s"${child.dataType.simpleString}, n=$n")
  }

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cps.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out.add(UTF8String.fromString(new String(cps, i, n)))
      i += 1
    }
    new GenericArrayData(out.toArray[AnyRef](Array.empty[AnyRef]))
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}
