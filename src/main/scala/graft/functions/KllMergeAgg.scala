package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, StructType}

/** Binary-merge Aggregator over serialized KLL doubles sketches
  * (DataSketches; Karnin–Lang–Liberty 2016). Input rows are ALREADY
  * per-partition sketches (built by [[KllMergeAgg.partitionSketches]]), so
  * the heapify-merge-serialize cost per row is a few KB of sketch, paid once
  * per (partition × group) — never per data row. Null/empty inputs are
  * skipped; an all-null group yields an empty sketch's bytes.
  *
  * Mirrors Spark's own hll_union_agg shape for the HLL fold
  * ([[graft.operators.Relational.foldDistinctSketch]]); Spark ships no KLL
  * SQL surface, hence the custom Aggregator. */
final class KllMergeAgg(k: Int)
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  import org.apache.spark.sql.{Encoder, Encoders}

  private def heapify(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))
  private def fresh: KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)

  override def zero: Array[Byte] = fresh.toByteArray
  override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
    if (in == null || in.isEmpty) buf
    else {
      val s = heapify(buf)
      s.merge(heapify(in))
      s.toByteArray
    }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    reduce(a, b)
  override def finish(buf: Array[Byte]): Array[Byte] = buf
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object KllMergeAgg {

  /** One KLL sketch per (partition, group): the map-side partial aggregate
    * feeding [[KllMergeAgg]]. Narrow (no shuffle); the per-partition state is
    * group-cardinality-bounded, the same assumption every hash aggregate
    * makes. Null values are skipped (SQL aggregate semantics). */
  def partitionSketches(df: DataFrame, keys: Seq[String], valueCol: String,
                        out: String, k: Int): DataFrame = {
    val keySchema = StructType(keys.map(n => df.schema(n)))
    val outSchema = keySchema.add(out, BinaryType)
    val keyed = df.select(keys.map(col) :+ col(valueCol).cast("double"): _*)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val nk = keys.length
    keyed.mapPartitions { rows =>
      val m = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], KllDoublesSketch]
      rows.foreach { r =>
        val key = (0 until nk).map(r.get)
        val sk = m.getOrElseUpdate(key, KllDoublesSketch.newHeapInstance(k))
        if (!r.isNullAt(nk)) sk.update(r.getDouble(nk))
      }
      m.iterator.map { case (key, sk) => Row.fromSeq(key :+ sk.toByteArray) }
    }(enc)
  }

  /** Quantile estimate from serialized sketch bytes; null when empty. */
  def quantile(bytes: Array[Byte], q: Double): java.lang.Double = {
    if (bytes == null || bytes.isEmpty) return null
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (s.isEmpty) null else java.lang.Double.valueOf(s.getQuantile(q))
  }
}
