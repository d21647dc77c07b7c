package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k heap over (df, h) pairs — the native aggregate form
  * of the PPJoin rarest-prefix selection (VERDICT r14 top-next item).
  *
  * What it replaces: `row_number().over(Window.partitionBy(id)
  * .orderBy(df, h)) <= prefixLen` — a full shuffle of EVERY posting row
  * onto the doc id plus a per-partition sort, paid by every PPJoin-branch
  * query (dedup_ppjoin_jaccard, pipeline_training_corpus, and every
  * jaccardPairs/containmentPairs call above the dense crossover). As an
  * aggregate it partial-aggregates map-side: each partition reduces a
  * doc's postings to ≤k (df, h) pairs BEFORE the exchange — when the
  * posting⋈freq join broadcasts (AQE does at bench SFs; at 100 TB the
  * doc's postings are scan-co-located by construction), the exchange
  * carries prefix-sized buffers instead of the full posting list, and the
  * per-partition SORT of all postings disappears at any scale (heap
  * maintenance is O(rows·log k) vs O(rows·log rows)).
  *
  * Why TypedImperativeAggregate and not the typed `Aggregator` the r14
  * round REFUTED (2× slower): the udaf path decoded every input row into
  * a boxed (Double, Long) tuple and re-sorted an immutable Vector per
  * insert. This buffer is two primitive long arrays with O(log k)
  * allocation-free sift insert, updated straight off the InternalRow —
  * the "native codegen'd bounded-heap expression" lane the refutation
  * left open (ObjectHashAggregateExec keeps the buffer as a live object;
  * only the exchange serializes it).
  *
  * Semantics (property-pinned ≡ the window twin,
  * DedupOps.rarestPrefixesWindow): keeps the k lexicographically
  * SMALLEST (df, h) pairs of the group and evals to the h values in
  * ascending (df, h) order — exactly the rows `row_number() <= k` keeps
  * under `orderBy(df, h)`, in rank order, because (df, h) is unique per
  * group (h is distinct within a doc's encoded set). `k` must be
  * group-constant (the callers derive it from a grouping column — the
  * doc's set size); the first row's k sizes the heap. Null df/h/k rows
  * are skipped (none occur on the deployed paths — posting⋈freq is an
  * inner join). An empty group yields an empty array, never null.
  */
final class RarestHeap(var k: Int) {
  var n: Int = 0
  // max-heap on (df, h) lexicographic — root is the WORST kept pair, so
  // a new pair replaces the root iff it is smaller
  var dfs: Array[Long] = null
  var hs: Array[Long] = null

  private def lt(df1: Long, h1: Long, df2: Long, h2: Long): Boolean =
    df1 < df2 || (df1 == df2 && h1 < h2)

  private def ensure(cap: Int): Unit = {
    if (dfs == null) {
      val c = math.max(math.min(k, 8), 1)
      dfs = new Array[Long](c); hs = new Array[Long](c)
    }
    if (cap > dfs.length) {
      val c = math.min(k, math.max(dfs.length * 2, cap))
      dfs = java.util.Arrays.copyOf(dfs, c)
      hs = java.util.Arrays.copyOf(hs, c)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (lt(dfs(p), hs(p), dfs(i), hs(i))) {
        val td = dfs(p); dfs(p) = dfs(i); dfs(i) = td
        val th = hs(p); hs(p) = hs(i); hs(i) = th
        i = p
      } else return
    }
  }

  private def siftDown(i0: Int, end: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < end && lt(dfs(m), hs(m), dfs(l), hs(l))) m = l
      if (r < end && lt(dfs(m), hs(m), dfs(r), hs(r))) m = r
      if (m == i) return
      val td = dfs(m); dfs(m) = dfs(i); dfs(i) = td
      val th = hs(m); hs(m) = hs(i); hs(i) = th
      i = m
    }
  }

  def insert(df: Long, h: Long): Unit = {
    if (k <= 0) return
    if (n < k) {
      ensure(n + 1)
      dfs(n) = df; hs(n) = h
      siftUp(n)
      n += 1
    } else if (lt(df, h, dfs(0), hs(0))) {
      dfs(0) = df; hs(0) = h
      siftDown(0, n)
    }
  }

  /** Drain into ascending (df, h) order and return the h values —
    * in-place heapsort (pop max to the back), no allocation beyond the
    * result array. The heap is consumed (only called from eval, which is
    * terminal for the buffer). */
  def sortedHs(): Array[Long] = {
    val out = new Array[Long](n)
    var end = n
    while (end > 0) {
      out(end - 1) = hs(0)
      end -= 1
      dfs(0) = dfs(end); hs(0) = hs(end)
      siftDown(0, end)
    }
    n = 0
    out
  }
}

case class BottomKRarestAgg(first: Expression, second: Expression,
    third: Expression, mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RarestHeap] with TernaryLike[Expression] {

  // first = df (long), second = h (long), third = k (int, group-constant)
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"bottom_k_rarest expects (long df, long h, int k), got " +
          s"${a.simpleString}, ${b.simpleString}, ${c.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_rarest"

  override def createAggregationBuffer(): RarestHeap = new RarestHeap(-1)

  override def update(buf: RarestHeap, input: InternalRow): RarestHeap = {
    val dfV = first.eval(input)
    val hV = second.eval(input)
    val kV = third.eval(input)
    if (dfV != null && hV != null && kV != null) {
      if (buf.k < 0) buf.k = kV.asInstanceOf[Int]
      buf.insert(dfV.asInstanceOf[Long], hV.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: RarestHeap, b: RarestHeap): RarestHeap = {
    if (a.k < 0) return b
    var i = 0
    while (i < b.n) { a.insert(b.dfs(i), b.hs(i)); i += 1 }
    a
  }

  override def eval(buf: RarestHeap): Any =
    new GenericArrayData(buf.sortedHs())

  override def serialize(buf: RarestHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * buf.n)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.dfs(i)).putLong(buf.hs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): RarestHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val h = new RarestHeap(bb.getInt())
    val n = bb.getInt()
    if (n > 0) {
      // the arrays were serialized in heap-array order, so restoring them
      // verbatim restores a valid heap
      h.dfs = new Array[Long](n); h.hs = new Array[Long](n)
      var i = 0
      while (i < n) { h.dfs(i) = bb.getLong(); h.hs(i) = bb.getLong(); i += 1 }
      h.n = n
    }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKRarestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKRarestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): BottomKRarestAgg = copy(first = f, second = s, third = t)
}

object BottomKRarest {
  import org.apache.spark.sql.graft.bridge
  def apply(df: Column, h: Column, k: Column): Column =
    bridge.column(BottomKRarestAgg(bridge.expression(df),
      bridge.expression(h), bridge.expression(k)).toAggregateExpression())
}
