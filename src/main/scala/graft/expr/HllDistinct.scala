package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** The deterministic 64-register HLL distinct estimator as ONE custom
  * aggregate — the single-expression twin of the relational register
  * chain `q_distinct_sketch` builds (queries/Relational.scala
  * distinctSketch), with bit-identical semantics so the SAME DuckDB
  * replay adjudicates both:
  *
  *   h = first 32 md5 bits of CAST(x AS VARCHAR); bucket = h mod 64;
  *   w = h div 64; rho = 27 (w = 0) | 27 − bitlen(w); register =
  *   max(rho) per bucket; raw estimate = 0.709·64² / Σ 2^−reg (absent
  *   buckets contribute 2⁰ — the (m − nb) term of the relational form).
  *
  * Every Σ term is an exact dyadic 2^−k (k ≤ 27) and 64 such terms span
  * < 52 mantissa bits, so every partial sum is EXACT and the estimate is
  * order-independent — the property that makes the cross-engine replay
  * possible and the merge associative (register-wise max). Exists for
  * [[graft.plans.ApproxDistinctRewrite]], which swaps `count(DISTINCT x)`
  * for this aggregate under an opt-in conf: O(registers) state per group
  * instead of the exact distinct's per-group key set (the 100 TB trade
  * every approximate-query engine offers). Null inputs are skipped —
  * count(DISTINCT) ignores nulls too. */
case class HllDistinct(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Int]] {

  private val m = 64

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an integral or string child (a decimal-digit " +
        s"VARCHAR cast the oracle can replay), got ${t.sql}")
  }

  // register value 0 = bucket never hit; present rho is always >= 1
  // (w < 2^26 so bitlen(w) <= 26 -> rho >= 1; w = 0 -> 27)
  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  private def md5 = {
    // MessageDigest is stateful and the expression instance can be shared;
    // one digest per thread
    HllDistinct.digests.get()
  }

  override def update(regs: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val d = md5
      d.reset()
      val bytes = d.digest(
        v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars = first 4 bytes, as an unsigned 32-bit value
      val h = ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
        ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
      val bucket = (h % m).toInt
      val w = h / m
      val rho =
        if (w == 0L) 27
        else 27 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    regs
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(regs: Array[Int]): Any = {
    var sp = 0.0
    var nb = 0
    var i = 0
    while (i < m) {
      if (regs(i) > 0) { nb += 1; sp += 1.0 / (1L << regs(i)) }
      i += 1
    }
    // empty sketch (every input NULL): the raw formula would report
    // alpha·m ≈ 45, but count(DISTINCT) of an all-null group is 0 —
    // the review-caught boundary; oracles LEFT-join and coalesce to 0
    if (nb == 0) 0.0
    else {
      // identical constant expression to the relational/oracle form
      val raw = (0.709 * m * m) / (sp + (m - nb))
      // LINEAR COUNTING below 2.5·m (the standard HLL small-range
      // correction, same branch as the q_profile_sketch oracle): the raw
      // estimator is ~20× high at tiny cardinalities (review-measured:
      // 2 distinct → 46). The branch condition compares the SAME exact
      // double both engines compute, so they always take the same arm;
      // ln() itself is last-ulp shared risk only at a rounding .5
      // boundary, measure-zero over the 63 discrete nb values.
      if (nb < m && raw <= 2.5 * m)
        m * math.log(m.toDouble / (m - nb))
      else raw
    }
  }

  override def serialize(regs: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * m)
    regs.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(m)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(offset: Int): HllDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HllDistinct = copy(child = c(0))
}

object HllDistinct {
  private val digests =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
}
