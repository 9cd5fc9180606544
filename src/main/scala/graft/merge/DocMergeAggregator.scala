package graft.merge

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed UDAF surface for the window→document merge (SURVEY.md §2.11: the
 * reference's window-merge fold `relik/inference/data/window/manager.py:
 * 466-529` maps to an `Aggregator[WindowRow, Acc, Out]`).
 *
 * Semantically identical to `Windows.mergeWindows` (the column-algebra
 * form); this typed form exists for pipelines that need per-group imperative
 * state (e.g. conflict resolution on span annotations) where expression
 * folds get unwieldy. The buffer keeps windows sorted by offset; merge
 * handles out-of-order and cross-partition combination.
 */
object DocMergeAggregator {

  case class WindowRow(offset: Int, window: Seq[String])

  /** Accumulator: offset-sorted windows seen so far. */
  type Acc = List[WindowRow]

  val mergeTokens: Aggregator[WindowRow, Acc, Seq[String]] =
    new Aggregator[WindowRow, Acc, Seq[String]] {
      def zero: Acc = Nil

      def reduce(acc: Acc, w: WindowRow): Acc = insert(acc, w)

      def merge(a: Acc, b: Acc): Acc = b.foldLeft(a)(insert)

      def finish(acc: Acc): Seq[String] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        acc.foreach { w =>
          val skip = out.length - w.offset // overlap with what's already built
          if (skip < w.window.length)
            out ++= w.window.drop(math.max(0, skip))
        }
        out.toSeq
      }

      private def insert(acc: Acc, w: WindowRow): Acc = {
        val (before, after) = acc.span(_.offset <= w.offset)
        before ::: (w :: after)
      }

      def bufferEncoder: Encoder[Acc] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Acc]()
      def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    }
}
