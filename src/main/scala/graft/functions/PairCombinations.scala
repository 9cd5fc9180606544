package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `PairCombinations(members ARRAY<T>)` — a streaming UDTF (Catalyst
 * Generator, SURVEY.md §2.11) emitting one row per unordered pair
 * {members[i], members[j]}, i < j, as columns (a, b).
 *
 * Replaces the higher-order-function formulation
 * `flatten(transform(m, (a,i) -> transform(slice(m, i+2, n), b -> struct(a,b))))`,
 * which materializes the full C(n,2) nested array per input row before
 * exploding — an allocation storm that turns block pair-generation
 * GC-bound (measured: the HOF path stopped scaling past ~8 cores).
 * The generator yields pairs lazily; peak memory per input row is O(n).
 */
case class PairCombinations(child: Expression)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def position: Boolean = false
  override def inline: Boolean = false

  private lazy val elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", elementType, nullable = true),
    StructField("b", elementType, nullable = true)))

  override def collectionType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"PairCombinations requires ARRAY, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Iterator.empty
    else {
      val n = arr.numElements()
      val et = elementType
      // Hoist element extraction: ArrayData.get allocates a fresh view
      // (UnsafeRow wrapper for struct elements) per call, and the pair loop
      // visits each element n-1 times — C(n,2) block pairs paid O(n²)
      // extractions. One upfront pass makes it O(n) allocations; the views
      // are stable (each wraps its own offset into the array buffer), so
      // sharing them across emitted rows is safe — the same sharing the
      // per-call form already relied on within a row.
      val elems = new Array[Any](n)
      var e = 0
      while (e < n) { elems(e) = arr.get(e, et); e += 1 }
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = n >= 2 && i < n - 1
        override def next(): InternalRow = {
          val row = InternalRow(elems(i), elems(j))
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombinations =
    copy(child = newChild)
}
