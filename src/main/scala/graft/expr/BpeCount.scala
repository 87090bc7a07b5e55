package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Approximate BPE token count of a string as a NATIVE codegen expression —
  * the tokenizer-aware budget a pretraining packing stage needs without
  * shipping a tokenizer: a GPT-2-style pre-tokenizer split into maximal
  * runs of letters / digits / other-non-whitespace, each run contributing
  * `ceil(len/4)` tokens (the ~4-chars-per-BPE-token rule), whitespace
  * contributing zero.
  *
  * Equivalent to
  * `aggregate(regexp_extract_all(s, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]+'),
  *  0L, (acc, p) -> acc + ceil(len(p)/4))` — but that formulation runs one
  * regex pass plus an interpreted lambda call per piece outside whole-stage
  * codegen (the measured cost floor of every HOF here; see vec_dot /
  * word_shingles). This is a single branchy byte loop inside the generated
  * code: ASCII classes are byte compares, any non-ASCII codepoint is an
  * "other" run member, and run lengths count CODEPOINTS (only UTF-8 lead
  * bytes increment), matching DuckDB's `len()` on the regex pieces — the
  * cross-engine oracle replays the regex formulation bit-for-bit.
  *
  * Run classes are disjoint, so the regex alternation's leftmost-first vs
  * leftmost-longest ambiguity (Java vs RE2) cannot bite: at any position
  * exactly one alternative can match.
  */
case class BpeCount(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_count requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var total = 0L
    var runClass = -1
    var runLen = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      // negative bytes are non-ASCII; ASCII ranges are positive byte compares
      var countChar = true
      val cls =
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) 0
        else if (b >= '0' && b <= '9') 1
        else if (b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f') 2
        else {
          // UTF-8: continuation bytes (10xxxxxx) extend the current
          // codepoint — same "other" run, but not a new character
          countChar = (b & 0xC0) != 0x80
          3
        }
      if (cls != runClass) {
        if (runClass >= 0 && runClass != 2) total += (runLen + 3) / 4
        runClass = cls
        runLen = 0L
      }
      if (countChar) runLen += 1
      i += 1
    }
    if (runClass >= 0 && runClass != 2) total += (runLen + 3) / 4
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val cls = ctx.freshName("cls")
      val runClass = ctx.freshName("runClass")
      val runLen = ctx.freshName("runLen")
      val total = ctx.freshName("total")
      val countChar = ctx.freshName("countChar")
      s"""
         |int $n = $s.numBytes();
         |long $total = 0L;
         |int $runClass = -1;
         |long $runLen = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $b = $s.getByte($i);
         |  boolean $countChar = true;
         |  int $cls;
         |  if (($b >= 'A' && $b <= 'Z') || ($b >= 'a' && $b <= 'z')) { $cls = 0; }
         |  else if ($b >= '0' && $b <= '9') { $cls = 1; }
         |  else if ($b == ' ' || $b == '\\t' || $b == '\\n' || $b == '\\r' || $b == '\\f') { $cls = 2; }
         |  else { $countChar = (($b & 0xC0) != 0x80); $cls = 3; }
         |  if ($cls != $runClass) {
         |    if ($runClass >= 0 && $runClass != 2) { $total += ($runLen + 3) / 4; }
         |    $runClass = $cls;
         |    $runLen = 0L;
         |  }
         |  if ($countChar) { $runLen += 1; }
         |}
         |if ($runClass >= 0 && $runClass != 2) { $total += ($runLen + 3) / 4; }
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}
