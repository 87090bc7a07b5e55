package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Saturating list buffer: appends stop at `cap` elements. Once saturated
  * the CONTENT is no longer meaningful (it depends on arrival order) but
  * the SIZE is — it pins `size == cap`, which is the overflow sentinel the
  * caller filters on. */
final class CollectUpToBuf(val cap: Int) extends Serializable {
  val items = scala.collection.mutable.ArrayBuffer.empty[Long]
  def add(v: Long): Unit = if (items.size < cap) items += v
}

/** `collect_up_to(value, k)`: `collect_list` with a hard per-group buffer
  * bound — accumulates at most `k` integral values per group and emits
  * them ASCENDING-SORTED as `array<bigint>`; groups whose true cardinality
  * exceeds `k` saturate at exactly `k` elements.
  *
  * Contract (what makes the cap sound, not lossy): with `k = maxDf + 1`,
  * any group the consumer keeps (`size(ds) <= maxDf`) was NEVER truncated
  * — truncation only begins past element k, so a kept group's list is
  * complete and its sort deterministic; any group that DID truncate
  * reports `size == k > maxDf` and is filtered out, exactly as if the full
  * list had been built and measured. Which elements survive saturation is
  * therefore irrelevant (merge-order dependence is confined to discarded
  * groups), and the aggregate is a drop-in for the
  * `sort_array(collect_list(x))`-then-`filter(size(ds) <= maxDf)` idiom
  * with per-group state O(k) instead of O(group).
  *
  * Why this exists: the inverted-index dedup family
  * ([[graft.llm.Dedup]] ngram/containment/substring/winnow) df-caps
  * posting lists AFTER aggregation — correct, but at corpus scale a
  * boilerplate shingle shared by millions of documents would build a
  * multi-GB collect_list buffer only to be discarded by the df filter.
  * This aggregate moves the df ceiling INTO the aggregation buffer: the
  * hot gram's group state is k longs (~88 bytes at the default maxDf=10)
  * no matter how many documents carry it. Same single exchange, same
  * ObjectHashAggregate partial/final shape as collect_list — partial
  * buffers cap at k too, so at most k values per group per map task cross
  * the wire.
  */
case class CollectUpTo(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CollectUpToBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_up_to"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be positive, got $k")
    else child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName value must be integral, got ${other.sql}")
    }

  override def createAggregationBuffer(): CollectUpToBuf = new CollectUpToBuf(k)

  override def update(buf: CollectUpToBuf, input: InternalRow): CollectUpToBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Number].longValue)
    buf
  }

  override def merge(buf: CollectUpToBuf, other: CollectUpToBuf): CollectUpToBuf = {
    // add() saturates, so the merged size is min(cap, |a| + |b|) — the
    // overflow sentinel survives any merge tree shape
    other.items.foreach(buf.add)
    buf
  }

  override def eval(buf: CollectUpToBuf): Any =
    new GenericArrayData(buf.items.toArray.sorted)

  override def serialize(buf: CollectUpToBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.items.size)
    bb.putInt(buf.cap).putInt(buf.items.size)
    buf.items.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CollectUpToBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CollectUpToBuf(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CollectUpTo =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CollectUpTo =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CollectUpTo =
    copy(child = c(0))
}
