package graft.plans

import graft.core.{CanonicalJson, GunValue}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the HAM tiebreak key: byte-exact Go
  * `encoding/json` serialization of a gun value struct (gun/state.go:68-78).
  *
  * This is the (b)-tier extension point from the build plan (custom
  * `Expression` over UDF): unlike a Scala UDF it needs no
  * serialization-boundary row conversion and composes with null-safety in
  * the expression tree. `doGenCode` emits a direct static call on the
  * struct's InternalRow — the expression stays inside whole-stage codegen
  * with no per-row boxing or `eval` indirection (the CodegenFallback
  * path would box every input); interpreted eval shares the exact same
  * encoder, so both paths are byte-identical. Also exposed to SQL as
  * `gun_canonical_json`.
  */
case class GunCanonicalJson(child: Expression)
    extends UnaryExpression {

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

  private lazy val fieldIdx: (Int, Int, Int, Int, Int) = {
    val s = child.dataType.asInstanceOf[StructType]
    (s.fieldIndex("kind"), s.fieldIndex("str"), s.fieldIndex("num"),
      s.fieldIndex("bool"), s.fieldIndex("rel"))
  }

  override protected def nullSafeEval(input: Any): Any = {
    val (k, st, n, b, r) = fieldIdx
    GunCanonicalJson.encodeFromRow(input.asInstanceOf[InternalRow], k, st, n, b, r)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val (k, st, n, b, r) = fieldIdx
    defineCodeGen(ctx, ev, row =>
      s"graft.plans.GunCanonicalJson.encodeFromRow($row, $k, $st, $n, $b, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GunCanonicalJson {
  /** Static encoder shared by interpreted eval and generated code: reads
    * the gun value struct's fields directly off the InternalRow (no
    * boxing) and defers to [[CanonicalJson]] for the Go-byte-exact text.
    * Public + JVM-static-reachable so Janino can call it.
    */
  def encodeFromRow(
      row: InternalRow,
      kindIdx: Int, strIdx: Int, numIdx: Int, boolIdx: Int, relIdx: Int): UTF8String = {
    def str(i: Int): Option[String] =
      if (row.isNullAt(i)) None else Some(row.getUTF8String(i).toString)
    val v = GunValue(
      kind = str(kindIdx).getOrElse("null"),
      str = str(strIdx),
      num = str(numIdx),
      bool = if (row.isNullAt(boolIdx)) None else Some(row.getBoolean(boolIdx)),
      rel = str(relIdx))
    UTF8String.fromString(CanonicalJson.encode(v))
  }
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
