package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: a binary max-heap under WORST-FIRST order (lowest
  * score first, ties to the HIGHEST id), so the root is always the entry
  * the next better candidate evicts — k entries live at any moment no
  * matter how many rows stream through. The keep-preference is
  * (score DESC, id ASC), the row_number convention of the kNN surface. */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** a-slot worse than b-slot under (score DESC, id ASC) keep order. */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    if (c != 0) c < 0 else ia > ib
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      swap(i, w)
      i = w
    }
  }

  def offer(score: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown()
    }

  /** Ids in emit order: score DESC, id ASC. */
  def sortedIds: Array[Long] = {
    val idx = Array.range(0, size).sortWith { (a, b) =>
      val c = java.lang.Double.compare(scores(b), scores(a))
      if (c != 0) c < 0 else ids(a) < ids(b)
    }
    idx.map(ids)
  }
}

/** Native bounded top-k aggregate — `topk_ids(score, id, k)` returns the
  * ids of the k highest scores (ties to the lowest id), as a real
  * Catalyst `TypedImperativeAggregate`: the map side keeps ONE k-entry
  * heap per group per partition (partial aggregation), the shuffle
  * carries ≤ groups·partitions·k serialized entries, and the merge folds
  * heaps. This is `TakeOrderedAndProject`'s bounded-heap discipline as a
  * grouped aggregate — the operator the per-query kNN ranking
  * ([[graft.pipeline.Similarity.topKPerQuery]]) funnels through, replacing
  * the window that would sort a corpus-sized partition per group. */
final case class TopKIds(scoreExpr: Expression, idExpr: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, s"topk_ids needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_ids expects (double, bigint), got $other")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      b.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.size) { b.offer(o.scores(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any = new GenericArrayData(b.sortedIds)

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + b.size * 16)
    buf.putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putDouble(b.scores(i)); buf.putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new TopKBuffer(k)
    var i = 0
    while (i < n) { b.offer(buf.getDouble, buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKIds =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKIds =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKIds =
    copy(scoreExpr = cs(0), idExpr = cs(1))
  override def prettyName: String = "topk_ids"
}

object TopKIds {
  /** Column-API face: ids of the k highest `score`s per group
    * (score DESC, id ASC). */
  def topk_ids(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(TopKIds(GraftBridge.expression(score),
      GraftBridge.expression(id), k).toAggregateExpression())
  }
}
