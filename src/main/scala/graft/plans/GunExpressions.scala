package graft.plans

import graft.core.{CanonicalJson, GunValue}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the HAM tiebreak key: byte-exact Go
  * `encoding/json` serialization of a gun value struct (gun/state.go:68-78).
  *
  * This is the (b)-tier extension point from the build plan (custom
  * `Expression` over UDF): unlike a Scala UDF it needs no
  * serialization-boundary row conversion and composes with null-safety in
  * the expression tree. Evaluation goes through [[CanonicalJson]] (the same
  * code the typed Aggregator uses), with `CodegenFallback` — the builtin
  * replace-chain in [[graft.functions.GunFunctions.canonicalJsonBuiltin]]
  * remains the fully-codegen'd fast path; this expression is the
  * byte-exact reference form, also exposed to SQL as `gun_canonical_json`.
  */
case class GunCanonicalJson(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case s: StructType
        if Seq("kind", "str", "num", "bool", "rel").forall(f => s.fieldNames.contains(f)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gun_canonical_json expects a gun value struct, got ${other.sql}")
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val s = child.dataType.asInstanceOf[StructType]
    def str(name: String): Option[String] = {
      val i = s.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getUTF8String(i).toString)
    }
    val boolIdx = s.fieldIndex("bool")
    val v = GunValue(
      kind = str("kind").getOrElse("null"),
      str = str("str"),
      num = str("num"),
      bool = if (row.isNullAt(boolIdx)) None else Some(row.getBoolean(boolIdx)),
      rel = str("rel"))
    UTF8String.fromString(CanonicalJson.encode(v))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session extensions: registers the gun SQL surface. Use with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.canonicalJsonDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val canonicalJsonDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("gun_canonical_json"),
    new ExpressionInfo(classOf[GunCanonicalJson].getName, "gun_canonical_json"),
    (children: Seq[Expression]) => GunCanonicalJson(children.head))

  /** Imperative registration for an existing session (same registry path
    * the extensions use).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      canonicalJsonDescriptor._1, canonicalJsonDescriptor._2, canonicalJsonDescriptor._3)
}
