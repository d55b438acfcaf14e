package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the classic top-k idiom
  *
  *   Project [cols…]                      (rn not referenced)
  *     Filter rn <= k  (or rn < k, rn = 1)
  *       Window [row_number() over (partition by keys order by ord) AS rn]
  *
  * into the native [[TopKPerKeyPlan]] — bounded heaps and a k·keys-sized
  * shuffle instead of a full partition sort. Only `row_number` qualifies
  * (rank/dense_rank keep ties, so their filter can exceed k rows), and
  * only when the rank column itself is projected away (the operator
  * doesn't materialize rank numbers). Sessions get it via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rnId: Long): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.exprId.id == rnId => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.exprId.id == rnId => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.exprId.id == rnId => Some(1)
    case _ => None
  }

  /** Float/double partition keys are excluded: this rule runs before
    * the NormalizeFloatingNumbers batch, which would rewrite the Window
    * partition spec so 0.0/-0.0 (and NaN bit patterns) group together —
    * replacing the Window first would hash raw bytes and split those
    * groups. Bailing out keeps vanilla semantics for floating keys;
    * integral/string keys (the common top-k shape) still rewrite. */
  private def hasFloatingPoint(e: Expression): Boolean = {
    import org.apache.spark.sql.types._
    def rec(dt: DataType): Boolean = dt match {
      case FloatType | DoubleType => true
      case ArrayType(et, _)       => rec(et)
      case MapType(k, v, _)       => rec(k) || rec(v)
      case StructType(fields)     => fields.exists(f => rec(f.dataType))
      case _                      => false
    }
    rec(e.dataType)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // the Seq(...) pattern itself pins windowExpressions to exactly one
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(Alias(WindowExpression(
          _: RowNumber,
          WindowSpecDefinition(partitionSpec, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _))) =>
      val rnAttr = w.windowOutputSet.head
      rankLimit(cond, rnAttr.exprId.id) match {
        case Some(k) if k > 0 &&
            !projectList.exists(_.references.contains(rnAttr)) &&
            partitionSpec.forall(e => e.isInstanceOf[Attribute] && !hasFloatingPoint(e)) &&
            orderSpec.forall(_.child.isInstanceOf[Attribute]) =>
          Project(projectList, TopKPerKeyPlan(partitionSpec, orderSpec, k, child))
        case _ => p
      }
  }
}
