package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-level n-gram shingles of an array<string> in ONE
  * expression evaluation per row.
  *
  * The declarative formulation
  * (`array_distinct(transform(sequence(...), i -> concat_ws(element_at×n)))`)
  * costs ~(4n) interpreted expression evaluations per array element —
  * measured as the floor of the near-dup pipeline. This walks the array
  * once with UTF8String concatenation and a LinkedHashSet (first-occurrence
  * order, matching array_distinct). Shorter-than-n inputs yield an empty
  * array (the sequence() formulation needed an explicit guard against
  * Spark's descending-sequence behavior).
  *
  * CodegenFallback: one virtual call per row; generating the set-building
  * loop inline buys little over that.
  *
  * `distinct = false` keeps every occurrence in position order (the
  * multiplicity variant repetition-quality scoring needs: the top-bigram
  * fraction is a count over ALL bigrams, not the distinct set).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string> and n >= 1, got " +
        s"${child.dataType.simpleString}, n=$n")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet dedups in first-occurrence order (matching
    // array_distinct); the multiplicity variant keeps every occurrence
    val seen: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](Array.empty[AnyRef]))
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
