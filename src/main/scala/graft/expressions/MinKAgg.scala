package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded min-k buffer: the k smallest DISTINCT long values seen so
  * far, kept sorted ascending in a fixed k-slot array. Insertion is a
  * binary search + tail shift — O(log k + k) per value, O(k) memory,
  * independent of group cardinality.
  */
final class MinKState(val k: Int) {
  val buf = new Array[Long](k)
  var n = 0

  def insert(v: Long): Unit = {
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < n && buf(lo) == v) return // already kept (distinct semantics)
    if (lo == k) return                // larger than all k kept values
    val keep = math.min(n, k - 1)      // values surviving right of the slot
    System.arraycopy(buf, lo, buf, lo + 1, keep - lo)
    buf(lo) = v
    if (n < k) n += 1
  }

  def mergeFrom(o: MinKState): Unit = {
    var i = 0
    while (i < o.n) { insert(o.buf(i)); i += 1 }
  }
}

/** `min_k(col, k)`: the k smallest distinct LONG values per group, as a
  * sorted ascending array. The piece Spark's built-ins can't express
  * with bounded state: `slice(sort_array(collect_set(x)), 1, k)` is
  * semantically identical but its partial aggregation state is the FULL
  * distinct set — a posting list for a stopword token is corpus-sized
  * long before the slice runs. This aggregate's partial state is k
  * longs flat, map-side combine included, so a groupBy over a 100 TB
  * token stream carries at most `k * |vocab-per-task|` of state no
  * matter how hot the hottest key is. First use: q111's capped inverted
  * index postings.
  */
case class MinKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKState]
  with UnaryLike[Expression] {

  require(k > 0 && k <= 4096, s"min_k cap out of range: $k")

  override def createAggregationBuffer(): MinKState = new MinKState(k)

  override def update(b: MinKState, row: InternalRow): MinKState = {
    val v = child.eval(row)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: MinKState, o: MinKState): MinKState = {
    b.mergeFrom(o)
    b
  }

  override def eval(b: MinKState): Any =
    new GenericArrayData(java.util.Arrays.copyOf(b.buf, b.n))

  override def serialize(b: MinKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKState = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new MinKState(k)
    val n = bb.getInt
    var i = 0
    while (i < n) { s.buf(i) = bb.getLong; i += 1 }
    s.n = n
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKAgg =
    copy(inputAggBufferOffset = o)

  // (no ExpectsInputTypes: AbstractDataType is private[sql]; the
  // builder in graft.functions.min_k only ever binds a LONG child)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"min_k expects a BIGINT child, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_k"

  override protected def withNewChildInternal(newChild: Expression): MinKAgg =
    copy(child = newChild)
}
