package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Primitive top-k buffer: parallel long/double arrays with periodic
  * sort-compaction — the distributed form of the reference's bounded
  * min-heap (reference: BruteForceVectorIndex.cs:291-359) without
  * per-row object allocation. */
final class TopKBuf(val k: Int) {
  private val cap = math.max(4 * k, 64)
  var n = 0
  var ids = new Array[Long](cap)
  var scores = new Array[Double](cap)
  // once full of k known-good entries, this is the kth-best score: cheap
  // admission filter that rejects most rows without touching the arrays
  private var threshold = Double.NegativeInfinity
  private var compacted = false

  /** Current admission floor: scores strictly below it can never enter the
    * top k (NegativeInfinity until k entries are known). Lets scorers
    * early-abandon work on monotone distances (e.g. partial L2 sums). */
  def admissionThreshold: Double =
    if (compacted) threshold else Double.NegativeInfinity

  def add(id: Long, score: Double): Unit = {
    // strict-below-threshold rows can never enter the top k; ties at the
    // threshold are kept and resolved by the next compaction
    if (compacted && score < threshold) return
    if (n == cap) {
      compact()
      if (compacted && score < threshold) return
    }
    ids(n) = id
    scores(n) = score
    n += 1
  }

  /** keep the best k by (score desc, id asc). */
  def compact(): Unit = {
    val order = Array.range(0, n).sortBy(i => (-scores(i), ids(i)))
    // k <= 0 keeps nothing (m clamped at 0) and must not read
    // scores(-1) below: `topk_hits(id, s, 0)` is a legal degenerate
    // call that returns an empty list, matching the typed Aggregator
    val m = math.max(0, math.min(k, n))
    val ni = new Array[Long](cap); val ns = new Array[Double](cap)
    var i = 0
    while (i < m) { ni(i) = ids(order(i)); ns(i) = scores(order(i)); i += 1 }
    ids = ni; scores = ns; n = m
    if (k > 0 && n >= k) { threshold = scores(n - 1); compacted = true }
  }

  def mergeFrom(o: TopKBuf): Unit = {
    var i = 0
    while (i < o.n) { add(o.ids(i), o.scores(i)); i += 1 }
  }
}

/** Native bounded top-k aggregate: `topk_hits(id, score, k)` →
  * `ARRAY<STRUCT<id BIGINT, score DOUBLE>>` sorted by (score desc, id asc).
  *
  * Why TypedImperativeAggregate instead of a typed `Aggregator`: the
  * udaf/Aggregator path pays an encoder conversion per input row and kryo
  * per buffer ser/de; this implementation reads two primitives per row and
  * serializes 16 bytes per kept entry, which is what the scoring hot path
  * (billions of candidate rows at 100 TB) needs. Partial aggregation still
  * applies: each task ships ≤ k entries per group to the exchange.
  */
case class TopKHits(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (idExpr.dataType == LongType && scoreExpr.dataType == DoubleType) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName requires (BIGINT id, DOUBLE score), got " +
        s"(${idExpr.dataType.simpleString}, ${scoreExpr.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))))

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val idv = idExpr.eval(input)
    val sv = scoreExpr.eval(input)
    if (idv != null && sv != null) {
      buf.add(idv.asInstanceOf[Long], sv.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    buf.compact()
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.ids(i), buf.scores(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    buf.compact()
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getLong(), bb.getDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKHits =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKHits =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKHits =
    copy(idExpr = cs(0), scoreExpr = cs(1))
  override def prettyName: String = "topk_hits"
}
