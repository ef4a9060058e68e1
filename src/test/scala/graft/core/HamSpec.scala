package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Table-driven HAM outcomes — exactly the reference's own unwritten-test
  * TODO list (gun/tests/gun_test.go:127-134) — plus the CRDT laws the
  * reference assumes but never tests (FIXTURES.md §2).
  */
class HamSpec extends AnyFunSuite {
  import Ham._

  /** Deterministic sampler (no scalatestplus bridge in the offline cache). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val a = GunValue.string("a")
  private val b = GunValue.string("b")

  test("never-seen → update (insert), even when future") {
    assert(resolve(None, a, 1000, 2000) == NeverSeenUpdate)
    assert(resolve(None, a, 3000, 2000) == NeverSeenUpdate)
  }
  test("too-future conflicting write → deferred") {
    assert(resolve(Some((a, 1000.0)), b, 3000, 2000) == TooFutureDeferred)
  }
  test("older write → historical discard") {
    assert(resolve(Some((a, 1000.0)), b, 500, 2000) == OlderHistorical)
  }
  test("newer write → update") {
    assert(resolve(Some((a, 1000.0)), b, 1500, 2000) == NewerUpdate)
  }
  test("same state, lexically smaller incoming → keep existing") {
    assert(resolve(Some((b, 1000.0)), a, 1000, 2000) == SameKeep)
  }
  test("same state, lexically larger incoming → update") {
    assert(resolve(Some((a, 1000.0)), b, 1000, 2000) == SameUpdate)
  }
  test("same state, equal value → keep") {
    assert(resolve(Some((a, 1000.0)), a, 1000, 2000) == SameKeep)
  }
  test("immediate-update classification matches reference enum") {
    assert(NeverSeenUpdate.isImmediateUpdate && NewerUpdate.isImmediateUpdate &&
      SameUpdate.isImmediateUpdate)
    assert(!TooFutureDeferred.isImmediateUpdate && !OlderHistorical.isImmediateUpdate &&
      !SameKeep.isImmediateUpdate)
  }

  test("canonical json mirrors Go encoding/json (incl. HTML escapes)") {
    assert(CanonicalJson.encode(GunValue.nullValue) == "null")
    assert(CanonicalJson.encode(GunValue.string("hi")) == "\"hi\"")
    assert(CanonicalJson.encode(GunValue.string("a<b>&\"\\\n")) ==
      "\"a\\u003cb\\u003e\\u0026\\\"\\\\\\n\"")
    // ValueNumber is a named string type in Go → json.Marshal quotes it
    assert(CanonicalJson.encode(GunValue.number("42.5")) == "\"42.5\"")
    assert(CanonicalJson.encode(GunValue.bool(true)) == "true")
    assert(CanonicalJson.encode(GunValue.relation("S1")) == "{\"#\":\"S1\"}")
    assert(CanonicalJson.encode(GunValue(ValueKind.Str, Some("\u0001"))) == "\"\\u0001\"")
  }

  // ---- CRDT laws over the pairwise merge ----
  private val genValue: Gen[GunValue] = Gen.oneOf(
    Gen.const(GunValue.nullValue),
    Gen.alphaNumStr.map(GunValue.string),
    Gen.chooseNum(-1000000L, 1000000L).map(GunValue.number),
    Gen.oneOf(true, false).map(GunValue.bool),
    Gen.alphaNumStr.map(GunValue.relation))
  private val genCell: Gen[GunCell] = for {
    v <- genValue
    st <- Gen.chooseNum(0L, 5000L)
  } yield GunCell("s", "f", v, st.toDouble)

  private lazy val cellPool: Seq[GunCell] = samples(genCell, 120)

  test("merge is commutative") {
    for (x <- cellPool.take(40); y <- cellPool.slice(40, 80)) {
      assert(mergeCells(x, y).value == mergeCells(y, x).value)
      assert(mergeCells(x, y).state == mergeCells(y, x).state)
    }
  }
  test("merge is associative") {
    for (Seq(x, y, z) <- cellPool.grouped(3) if cellPool.size >= 3) {
      val l = mergeCells(mergeCells(x, y), z)
      val r = mergeCells(x, mergeCells(y, z))
      assert(l.value == r.value && l.state == r.state)
    }
  }
  test("merge is idempotent") {
    for (x <- cellPool) assert(mergeCells(x, x) == x)
  }
}
