package graft.core

import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * The reference (cretz/esgopeta) models data as a schema-less directed graph:
  * nodes are identified by a "soul" string and hold a map of named scalar
  * values; an edge is a field whose value is a relation (the soul of the
  * target node). Physical storage is a flat cell store keyed by
  * `(parentSoul, field)` → `(value, state)` (reference: gun/storage.go:33-45,
  * gun/node.go:25-30).
  *
  * Spark has no sum types, so the closed 5-way value union
  * (gun/node.go:81-159: null | string | number | bool | relation) becomes a
  * tagged struct: a `kind` discriminator plus one nullable branch per arm.
  * Numbers stay as STRING exactly like the reference (gun/node.go:130-133,
  * "since it can overflow numeric types"); callers cast at the edge.
  */
object ValueKind {
  val Null = "null"
  val Str = "string"
  val Num = "number"
  val Bool = "bool"
  val Rel = "rel"
}

/** A Gun scalar value as a tagged struct. Exactly one branch (or none, for
  * kind=null) is populated, selected by `kind`.
  */
final case class GunValue(
    kind: String,
    str: Option[String] = None,
    num: Option[String] = None,
    bool: Option[Boolean] = None,
    rel: Option[String] = None
)

object GunValue {
  val nullValue: GunValue = GunValue(ValueKind.Null)
  def string(s: String): GunValue = GunValue(ValueKind.Str, str = Some(s))
  def number(n: String): GunValue = GunValue(ValueKind.Num, num = Some(n))
  def number(n: Long): GunValue = number(n.toString)
  def number(n: Double): GunValue = number(
    // Mirror Go strconv/json.Number formatting for integral doubles.
    if (n == n.floor && !n.isInfinite && math.abs(n) < 1e15) n.toLong.toString
    else n.toString
  )
  def bool(b: Boolean): GunValue = GunValue(ValueKind.Bool, bool = Some(b))
  def relation(soul: String): GunValue = GunValue(ValueKind.Rel, rel = Some(soul))

  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("str", StringType, nullable = true),
    StructField("num", StringType, nullable = true),
    StructField("bool", BooleanType, nullable = true),
    StructField("rel", StringType, nullable = true)
  ))
}

/** One cell of the canonical storage relation:
  * `(soul, field) → (value, state)` — the Spark mirror of the reference's
  * in-memory map (gun/storage.go:40-45). `state` is the HAM conflict state,
  * a unix-time-in-ms double (gun/state.go:11). `valueExists` preserves the
  * reference's three-valued "absent / exists-nil / exists-value" distinction
  * (gun/scoped_fetch.go:26-36).
  */
final case class GunCell(
    soul: String,
    field: String,
    value: GunValue,
    state: Double,
    valueExists: Boolean = true
)

object GunCell {
  val schema: StructType = StructType(Seq(
    StructField("soul", StringType, nullable = false),
    StructField("field", StringType, nullable = false),
    StructField("value", GunValue.schema, nullable = false),
    StructField("state", DoubleType, nullable = false),
    StructField("valueExists", BooleanType, nullable = false)
  ))
}

/** Result of a point read — mirror of the reference's FetchResult envelope
  * (gun/scoped_fetch.go:15-40) minus per-peer attribution (no peers in a
  * single authoritative distributed store).
  */
final case class FetchResult(
    field: String,
    value: Option[GunValue],
    state: Option[Double],
    valueExists: Boolean
)
