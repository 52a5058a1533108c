package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable

/** Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable
  * form per Agarwal et al., "Mergeable Summaries", PODS 2012): at most
  * k counters; a resident item increments its counter, a non-resident
  * item either claims a free counter or decrements ALL counters (the
  * classic "cancel k distinct items" step). The merged summary
  * undercounts any item by at most N/(k+1), so EVERY item with true
  * frequency above N/(k+1) — in particular every `count > N/k` heavy
  * hitter — survives with a positive counter. That makes the summary a
  * guaranteed-superset CANDIDATE set: the exact heavy-hitter pass
  * re-counts candidates only (a broadcast semi-join), never the full
  * key space.
  *
  * This is the 100 TB shape for "top keys of a huge-cardinality
  * column": a plain groupBy must shuffle every distinct key; this
  * aggregate ships at most k (key, count) pairs per partial, one
  * O(k log k) merge per exchange row, and the follow-up exact count
  * touches only rows whose key is already known to matter.
  *
  * Merge (Agarwal et al.): sum counters pairwise; if more than k
  * remain, subtract the (k+1)-th largest counter from all and drop the
  * non-positive ones — at most k survive and the total undercount
  * bound telescopes. Update and merge are order-dependent in the
  * counter VALUES (like any MG stream), so `eval` exposes keys only;
  * exactness comes from the verify pass, not the sketch counts. */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k >= 1, s"Misra-Gries needs k >= 1 counters, got $k")

  override def inputTypes: Seq[GraftSqlShim.AbstractType] = Seq(StringType)

  override def prettyName: String = "mg_candidates"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      b.get(key) match {
        case Some(c) => b(key) = c + 1
        case None if b.size < k => b(key) = 1L
        case None =>
          // decrement-all: cancels one occurrence of k+1 distinct items
          val dead = mutable.ArrayBuffer.empty[String]
          b.foreach { case (kk, c) =>
            if (c == 1L) dead += kk else b(kk) = c - 1
          }
          dead.foreach(b.remove)
      }
    }
    b
  }

  override def merge(x: mutable.HashMap[String, Long],
                     y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    y.foreach { case (kk, c) => x(kk) = x.getOrElse(kk, 0L) + c }
    if (x.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0
      val cut = x.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      x.foreach { case (kk, c) =>
        if (c - cut <= 0L) dead += kk else x(kk) = c - cut
      }
      dead.foreach(x.remove)
    }
    x
  }

  override def eval(b: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      b.keysIterator.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = b.toArray
    val enc = items.map { case (kk, _) => kk.getBytes("UTF-8") }
    val buf = ByteBuffer.allocate(4 + enc.map(_.length + 12).sum)
    buf.putInt(items.length)
    var i = 0
    while (i < items.length) {
      buf.putInt(enc(i).length)
      buf.put(enc(i))
      buf.putLong(items(i)._2)
      i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val kb = new Array[Byte](len)
      buf.get(kb)
      m(new String(kb, "UTF-8")) = buf.getLong
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MisraGries =
    copy(child = c)
}

object MisraGries {
  /** Aggregate column: the MG candidate key set (sorted array<string>),
    * a guaranteed superset of every key with count > N/k. */
  def candidates(key: Column, k: Int): Column =
    GraftSqlShim.toColumn(
      MisraGries(GraftSqlShim.toExpression(key.cast("string")), k)
        .toAggregateExpression())
}
