package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule rewriting the portable higher-order-function polyhash
  * pattern
  *
  * {{{ aggregate(split(s, ''), 0L, (acc, c) -> (acc * 31 + ascii(c)) % 1000000007) }}}
  *
  * into the native codegen'd [[PolyHash]] expression. The HOF form is
  * what cross-engine code writes (it is directly portable to the DuckDB
  * oracle); this rule gives such code the compiled loop automatically —
  * semantics are identical (equivalence is property-tested in
  * PropertySpec/SimilaritySpec).
  *
  * Install on an existing session via
  * `spark.experimental.extraOptimizations :+= PolyHashRewrite`, or for
  * built sessions through `GraftExtensions` (`spark.sql.extensions`).
  * The match is deliberately conservative: any structural deviation
  * (different constants, a non-empty split pattern, a non-identity
  * finish lambda) leaves the expression untouched.
  */
object PolyHashRewrite extends Rule[LogicalPlan] {

  private def isEmptyStringLit(e: Expression): Boolean = e match {
    case Literal(s: UTF8String, StringType) => s.numChars() == 0
    case _ => false
  }

  private def isLit(e: Expression, v: Long): Boolean = e match {
    case Literal(x: Int, _) => x.toLong == v
    case Literal(x: Long, _) => x == v
    case Cast(inner, _, _, _) => isLit(inner, v)
    case _ => false
  }

  private def sameVar(a: Expression, b: NamedLambdaVariable): Boolean = a match {
    case v: NamedLambdaVariable => v.exprId == b.exprId
    case Cast(inner, _, _, _) => sameVar(inner, b)
    case _ => false
  }

  /** merge lambda must be (acc, c) -> (acc * 31 + ascii(c)) % P. */
  private def isPolyMerge(merge: Expression): Boolean = merge match {
    case LambdaFunction(body, Seq(acc: NamedLambdaVariable, ch: NamedLambdaVariable), _) =>
      body match {
        case Remainder(Add(Multiply(l, m, _), r, _), p, _) =>
          sameVar(l, acc) && isLit(m, 31L) && isLit(p, PolyHash.P) &&
            (r match {
              case Cast(Ascii(c), LongType, _, _) => sameVar(c, ch)
              case Ascii(c) => sameVar(c, ch)
              case _ => false
            })
        case _ => false
      }
    case _ => false
  }

  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        StringSplit(child, pattern, limit), zero, merge, finish)
        if isEmptyStringLit(pattern) && isLit(limit, -1L) && isLit(zero, 0L) &&
          isPolyMerge(merge) && isIdentity(finish) =>
      PolyHash(child)
  }
}
