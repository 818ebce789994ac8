package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries frequent-items summary as a typed
  * [[Aggregator]] — the 100 TB form of "top words/values": a fixed-size
  * (≤ k entries) summary per partition, merged associatively, instead of
  * a full-cardinality groupBy whose distinct-key shuffle dwarfs the
  * answer. Guarantee (mergeable-summaries form, Agarwal et al. 2012):
  * after summarizing n items, every item with true count > n/(k+1) is
  * present, and every stored estimate undercounts its true count by at
  * most n/(k+1). The compensation trick on overflow — subtract the
  * (k+1)-th largest count from everything and drop non-positives — is
  * what makes MERGE (not just insert) preserve the bound: a plain
  * min-decrement is only correct for single inserts, where the minimum
  * IS the (k+1)-th largest.
  *
  * The buffer is a small Scala map behind a Kryo encoder — opaque to
  * Tungsten, which is the honest trade for a k-entry buffer: the rows
  * it absorbs never reach the shuffle at all.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k >= 1, s"capacity must be >= 1, got $k")

  private def compensate(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val dec = m.values.toSeq.sortBy(-_)(Ordering.Long).apply(k)
      m.collect { case (x, c) if c > dec => x -> (c - dec) }
    }

  private def add(m: Map[String, Long], x: String, c: Long) =
    compensate(m.updated(x, m.getOrElse(x, 0L) + c))

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    add(m, x, 1L)

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] =
    compensate((a.keySet ++ b.keySet).map(x =>
      x -> (a.getOrElse(x, 0L) + b.getOrElse(x, 0L))).toMap)

  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (x, c) => (-c, x) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
