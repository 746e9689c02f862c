package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch over a string column: one pass,
  * `capacity` counters, mergeable partials — the frequent-vocabulary
  * primitive for corpus statistics where an exact `groupBy(token)` would
  * shuffle the full token multiset. Guarantee (classic MG, preserved by
  * the Agarwal et al. merge): for every item,
  *
  *   trueCount − N/(capacity+1)  ≤  estimate  ≤  trueCount
  *
  * so any item with frequency above N/(capacity+1) is guaranteed
  * present. Output: map item → lower-bound estimate.
  *
  * Scale shape: partial sketches are `capacity`-bounded regardless of
  * input size and merge map-side; only O(capacity) entries per partition
  * cross the shuffle (vs the full distinct-token set for exact counts).
  */
case class FreqItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity > 0, s"FreqItemsAgg: capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "freq_items_sketch"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key.clone(), 1L)
        case None =>
          // classic MG decrement step: shrink every counter by 1 and
          // drop zeros — amortized O(1) per input item
          val dead = mutable.ArrayBuffer[UTF8String]()
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1
            if (c == 0) dead += k else buf.update(k, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      // Agarwal et al. merge: subtract the (capacity+1)-th largest count
      // from everything, drop the non-positive — bound is preserved
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer[UTF8String]()
      buf.keysIterator.foreach { k =>
        val c = buf(k) - cut
        if (c <= 0) dead += k else buf.update(k, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val (keys, values) = buf.toArray.sortBy(_._1).unzip
    ArrayBasedMapData(keys.toArray[Any], values.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)
}
