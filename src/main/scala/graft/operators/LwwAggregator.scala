package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.core.SequenceKey

/** Typed last-writer-wins as an `Aggregator[IN, BUF, OUT]` — the
  * user-facing typed-Dataset form of A1 for callers who work with
  * `Dataset[T]` + `groupByKey` rather than DataFrames (SURVEY §2.9's
  * custom-aggregate surface). Functionally identical to
  * `ApplyOps.lastWriterWins`; the DataFrame `max_by` path is preferred on
  * hot paths (codegen'd), this one gives compile-time row types.
  *
  * Usage:
  * {{{
  * ds.groupByKey(_.pk)
  *   .agg(LwwAggregator[MyRow](r => SequenceKey(r.lsn, r.ord)).toColumn)
  * }}}
  */
object LwwAggregator {
  def apply[T](seqOf: T => SequenceKey)(implicit enc: Encoder[T])
      : Aggregator[T, Option[(SequenceKey, T)], T] =
    new Aggregator[T, Option[(SequenceKey, T)], T] {
      override def zero: Option[(SequenceKey, T)] = None
      override def reduce(b: Option[(SequenceKey, T)], in: T)
          : Option[(SequenceKey, T)] = {
        val k = seqOf(in)
        b match {
          case Some((bk, _)) if bk >= k => b
          case _ => Some((k, in))
        }
      }
      override def merge(l: Option[(SequenceKey, T)],
          r: Option[(SequenceKey, T)]): Option[(SequenceKey, T)] =
        (l, r) match {
          case (Some((lk, _)), Some((rk, _))) => if (lk >= rk) l else r
          case (x, None) => x
          case (None, y) => y
        }
      override def finish(b: Option[(SequenceKey, T)]): T = b match {
        case Some((_, v)) => v
        case None => throw new IllegalStateException("empty group")
      }
      override def bufferEncoder: Encoder[Option[(SequenceKey, T)]] =
        Encoders.kryo[Option[(SequenceKey, T)]]
      override def outputEncoder: Encoder[T] = enc
    }
}
