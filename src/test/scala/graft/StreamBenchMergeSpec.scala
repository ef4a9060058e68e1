package graft

import org.scalatest.funsuite.AnyFunSuite

/** The filtered-leg re-run path of [[StreamBench]]: a partial run must
  * overlay only its legs' readings onto the recorded out-file, keeping every
  * untouched leg's numbers and the original key order intact.
  */
class StreamBenchMergeSpec extends AnyFunSuite {

  test("fresh run (no existing file) writes updates in order") {
    val json = StreamBench.mergedJson(None, Seq(
      "metric" -> "\"m\"", "value" -> "1.5", "ingest" -> """{"cells":10}"""))
    assert(json == """{"metric":"m","value":1.5,"ingest":{"cells":10}}""")
  }

  test("overlay replaces a key in place, untouched keys keep value and order") {
    val existing =
      """{"metric":"m","value":1.5,"ingest":{"cells":10},""" +
        """"pipeline_compact_on":{"docs_per_sec":32.0},""" +
        """"linededup_compact_on":{"docs_per_sec":98.2}}"""
    val json = StreamBench.mergedJson(Some(existing),
      Seq("pipeline_compact_on" -> """{"docs_per_sec":105.3}"""))
    assert(json ==
      """{"metric":"m","value":1.5,"ingest":{"cells":10},""" +
        """"pipeline_compact_on":{"docs_per_sec":105.3},""" +
        """"linededup_compact_on":{"docs_per_sec":98.2}}""")
  }

  test("keys absent from the existing file are appended") {
    val json = StreamBench.mergedJson(Some("""{"a":1}"""),
      Seq("b" -> "2", "a" -> "3"))
    assert(json == """{"a":3,"b":2}""")
  }

  test("untouched float values survive byte-identical (no reformatting)") {
    // ADVICE_r14: default Jackson parses floats to DoubleNode, whose
    // toString can rewrite e.g. 12345678.9 as 1.23456789E7 — an untouched
    // leg's reading must come back with its source digits
    val existing =
      """{"big":12345678.9,"rate":103.9,"tiny":0.0001,"n":42}"""
    val json = StreamBench.mergedJson(Some(existing), Seq("n" -> "43"))
    assert(json == """{"big":12345678.9,"rate":103.9,"tiny":0.0001,"n":43}""")
  }

  test("merged output is itself mergeable (round-trip)") {
    val first = StreamBench.mergedJson(None,
      Seq("a" -> """{"x":[1,2],"y":"s"}""", "b" -> "2.0"))
    val second = StreamBench.mergedJson(Some(first), Seq("b" -> "3.5"))
    assert(second == """{"a":{"x":[1,2],"y":"s"},"b":3.5}""")
  }
}
