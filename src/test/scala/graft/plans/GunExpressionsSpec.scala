package graft.plans

import graft.SparkSuite
import graft.core.{CanonicalJson, GunCell, GunValue}
import org.apache.spark.sql.functions.{col, expr}

class GunExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private val cells = Seq(
    GunCell("s", "a", GunValue.string("a<b>&\"x\\y"), 1),
    GunCell("s", "b", GunValue.number("42.50"), 1),
    GunCell("s", "c", GunValue.bool(false), 1),
    GunCell("s", "d", GunValue.relation("S2"), 1),
    GunCell("s", "e", GunValue.nullValue, 1))

  GraftExtensions.register(spark)

  test("native expression matches CanonicalJson byte-for-byte") {
    val out = cells.toDS().toDF()
      .withColumn("cj", expr("gun_canonical_json(value)"))
      .select("field", "cj").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = cells.map(c => c.field -> CanonicalJson.encode(c.value)).toMap
    assert(out == expected)
    assert(out("a") == "\"a\\u003cb\\u003e\\u0026\\\"x\\\\y\"")
    assert(out("b") == "\"42.50\"") // quoted like Go json.Marshal(ValueNumber), raw text preserved
  }

  test("registered as SQL function gun_canonical_json") {
    cells.toDS().toDF().createOrReplaceTempView("gcells")
    val rows = spark.sql(
      "SELECT field, gun_canonical_json(value) AS cj FROM gcells ORDER BY field")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("d") == "{\"#\":\"S2\"}")
    assert(rows("e") == "null")
  }

  test("builtin escape chain agrees with the exact expression on wire shapes") {
    import graft.functions.GunFunctions
    val both = cells.toDS().toDF().select(
      expr("gun_canonical_json(value)").as("exact"),
      GunFunctions.canonicalJsonBuiltin(col("value")).as("builtin"))
      .collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}
