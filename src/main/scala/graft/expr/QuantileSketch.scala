package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Sketch state: total row count + the k smallest (priority, value) pairs
  * (the [[SampleKBuf]] heap discipline — admission O(log k), memory O(k)).
  * `admit` inserts without counting so merges never double-count `n`. */
final class QuantileSketchBuf(val k: Int) extends Serializable {
  var n: Long = 0L
  val heap: scala.collection.mutable.PriorityQueue[(Long, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Long, Long)]
  def admit(pri: Long, v: Long): Unit = {
    if (heap.size < k) heap.enqueue((pri, v))
    else if (Ordering.Tuple2[Long, Long].lt((pri, v), heap.head)) {
      heap.dequeue(); heap.enqueue((pri, v))
    }
  }
  def add(pri: Long, v: Long): Unit = { n += 1; admit(pri, v) }
}

/** `quantile_sketch(pri, value, k)` — MERGEABLE quantile sketch with O(k)
  * state per group, emitting `struct<n, kept, p50, p90>` (nearest-rank
  * quantiles of the sketch, as stored bigints).
  *
  * The sketch is a hash-priority bottom-k sample plus an exact count: the
  * kept set is the k rows with the smallest (priority, value) pairs, and a
  * quantile estimate is the nearest-rank statistic of the kept values —
  * rank error O(1/√k) with certainty ~4σ (the classic sampling bound;
  * StatsSpec pins a containment window against the exact percentile).
  *
  * Why NOT a literal KLL/t-digest: both compress further (O(1/ε) vs
  * O(1/ε²)) by making data-dependent compaction decisions — KLL drops
  * every other item of a FULL buffer, t-digest merges adjacent centroids —
  * so their state depends on arrival/merge ORDER. On a cluster that makes
  * the result a function of partition interleaving: nondeterministic
  * across runs and impossible for a cross-engine oracle to replay. Hash
  * priorities make this sketch a pure function of the data multiset —
  * order-independent, merge-associative (min-merge of heaps + count add),
  * retry-safe — which is the property every other aggregate in this
  * library guarantees, at the price of the weaker √k error bound. The
  * DuckDB oracle replays it row-for-row (`row_number() OVER (ORDER BY
  * pri, val) <= k`, then the ceil(q·m)-th smallest kept value).
  *
  * Scale shape: ObjectHashAggregateExec with map-side partials — only the
  * O(k) pair buffer + one count per group crosses the exchange, regardless
  * of group size; this is what `q_quantile_hist`'s bounded-integer-bin
  * assumption could not give unbounded/real-valued domains.
  */
case class QuantileSketch(
    priExpr: Expression,
    valExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[QuantileSketchBuf] {

  override def children: Seq[Expression] = Seq(priExpr, valExpr)
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("kept", LongType, nullable = false),
    StructField("p50", LongType, nullable = true),
    StructField("p90", LongType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be positive, got $k")
    else {
      def integral(t: DataType) = t match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      if (integral(priExpr.dataType) && integral(valExpr.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName arguments must be integral, got " +
          s"(${priExpr.dataType.sql}, ${valExpr.dataType.sql})")
    }

  override def createAggregationBuffer(): QuantileSketchBuf = new QuantileSketchBuf(k)

  override def update(buf: QuantileSketchBuf, input: InternalRow): QuantileSketchBuf = {
    val p = priExpr.eval(input)
    val v = valExpr.eval(input)
    if (p != null && v != null)
      buf.add(p.asInstanceOf[Number].longValue, v.asInstanceOf[Number].longValue)
    buf
  }

  override def merge(buf: QuantileSketchBuf, other: QuantileSketchBuf): QuantileSketchBuf = {
    buf.n += other.n
    other.heap.foreach { case (p, v) => buf.admit(p, v) }
    buf
  }

  override def eval(buf: QuantileSketchBuf): Any = {
    // nearest-rank on the kept values sorted by VALUE: the ceil(q·m)-th
    // smallest — value ties make the selected VALUE order-independent even
    // though ranks among equals are not
    val vals = buf.heap.toArray.map(_._2).sorted
    def q(p: Double): Any =
      if (vals.isEmpty) null
      else vals(math.ceil(p * vals.length).toInt - 1)
    new GenericInternalRow(Array[Any](buf.n, vals.length.toLong, q(0.5), q(0.9)))
  }

  override def serialize(buf: QuantileSketchBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + 16 * buf.heap.size)
    bb.putInt(buf.k).putLong(buf.n).putInt(buf.heap.size)
    buf.heap.foreach { case (p, v) => bb.putLong(p).putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketchBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new QuantileSketchBuf(bb.getInt)
    buf.n = bb.getLong
    val m = bb.getInt
    (0 until m).foreach(_ => buf.admit(bb.getLong, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileSketch =
    copy(priExpr = c(0), valExpr = c(1))
}
