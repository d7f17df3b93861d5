package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Upper-triangle Gramian accumulator: `d*(d+1)/2` long sums. */
final class GramianState(val d: Int) {
  val buf = new Array[Long](d * (d + 1) / 2)

  /** Multiply-accumulate one vector's outer product (upper triangle). */
  def add(v: ArrayData): Unit = {
    var i = 0
    var off = 0
    while (i < d) {
      val vi = v.getLong(i)
      var j = i
      while (j < d) {
        buf(off + (j - i)) += vi * v.getLong(j)
        j += 1
      }
      off += d - i
      i += 1
    }
  }

  def mergeFrom(o: GramianState): Unit = {
    var i = 0
    while (i < buf.length) { buf(i) += o.buf(i); i += 1 }
  }
}

/** `gramian(vec, d)`: elementwise sum of `vec ⊗ vec` outer products per
  * group, packed as the upper triangle (row-major: (0,0)..(0,d-1),
  * (1,1)..(1,d-1), ...) in a `d*(d+1)/2`-long array. The distributed
  * Gramian/covariance shape (same contract as Spark MLlib
  * `RowMatrix.computeGramianMatrix`'s treeAggregate): partial state is
  * one fixed d²/2-long array per task — map-side combine included — so
  * the shuffle moves `O(partitions * d²)` longs, never `O(rows * d²)`
  * exploded cells. Inputs are expected pre-quantized to longs (q114's
  * fixed-point posture), so sums are exact integers and the downstream
  * eigensolve is bit-reproducible at any partitioning. Overflow headroom:
  * centered 1e-4-quantized unit vectors give |v_i*v_j| <= ~4e8, so a
  * single state cell holds ~2e10 rows-per-task before wrapping — far
  * beyond any real task size at 128 MB splits. First use: q155's PCA.
  */
case class GramianAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramianState]
  with UnaryLike[Expression] {

  require(d > 0 && d <= 256, s"gramian dimension out of range: $d")

  override def createAggregationBuffer(): GramianState = new GramianState(d)

  override def update(b: GramianState, row: InternalRow): GramianState = {
    val v = child.eval(row)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      // fail LOUDLY on a wrong-dimension vector (TopK's posture for
      // contract violations) — silently skipping would yield an
      // all-zero Gramian and a wrong eigensolve downstream
      require(a.numElements() == d,
        s"gramian input vector has ${a.numElements()} elements, expected $d")
      b.add(a)
    }
    b
  }

  override def merge(b: GramianState, o: GramianState): GramianState = {
    b.mergeFrom(o)
    b
  }

  override def eval(b: GramianState): Any =
    new GenericArrayData(java.util.Arrays.copyOf(b.buf, b.buf.length))

  override def serialize(b: GramianState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.buf.length)
    var i = 0
    while (i < b.buf.length) { bb.putLong(b.buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramianState = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new GramianState(d)
    var i = 0
    while (i < s.buf.length) { s.buf(i) = bb.getLong; i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): GramianAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramianAgg =
    copy(inputAggBufferOffset = o)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gramian expects ARRAY<BIGINT>, got ${t.catalogString}")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gramian"

  override protected def withNewChildInternal(newChild: Expression): GramianAgg =
    copy(child = newChild)
}
