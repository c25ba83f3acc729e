package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the shared measurement plumbing: the JSON emitter's non-finite
  * handling (ADVICE r16: bare NaN/Infinity tokens made committed reports
  * invalid JSON for jq-grade parsers) and the one bench-record queries-map
  * parser (ADVICE r16: two ad-hoc regex copies would silently mis-select
  * entries if the record format ever nested an object inside `queries`).
  */
class MetricsSpec extends AnyFunSuite {

  test("toJson emits null for NaN and Infinity, never a bare token") {
    val j = Metrics.toJson(Map(
      "flatness" -> Double.NaN,
      "ratio" -> Double.PositiveInfinity,
      "neg" -> Double.NegativeInfinity,
      "f" -> Float.NaN,
      "ok" -> 1.5))
    assert(!j.contains("NaN") && !j.contains("Infinity"), j)
    assert(j.contains("\"flatness\":null") && j.contains("\"ratio\":null"))
    assert(j.contains("\"ok\":1.5"))
    // strict-parser check: Jackson in default (non-lenient) mode rejects
    // bare NaN/Infinity tokens, so a parse proves the record is real JSON
    org.json4s.jackson.JsonMethods.parse(j)
  }

  test("toJson escapes control chars and quotes in strings") {
    val j = Metrics.toJson(Map("k" -> ("a\"b\\c\nd" + '\u0001' + "e")))
    org.json4s.jackson.JsonMethods.parse(j)
    assert(j == "{\"k\":\"a\\\"b\\\\c\\nd\\u0001e\"}")
  }

  test("parseQueriesMap reads the flat name:seconds map") {
    val rec = """{"metric":"total","value":9.1,"queries":{"q1_agg":0.42,"q_top":1.5e1,"q_failed":-1.0},"sf":"/x"}"""
    val m = Metrics.parseQueriesMap(rec)
    assert(m == Map("q1_agg" -> 0.42, "q_top" -> 15.0, "q_failed" -> -1.0))
  }

  test("parseQueriesMap fails LOUDLY if the map nests an object") {
    val rec = """{"queries":{"q1":{"sec":0.4,"rows":6},"q2":1.0}}"""
    val e = intercept[IllegalArgumentException](Metrics.parseQueriesMap(rec))
    assert(e.getMessage.contains("flat name:seconds"))
  }

  test("parseQueriesMap fails LOUDLY when the map is absent") {
    intercept[IllegalArgumentException](Metrics.parseQueriesMap("{\"metric\":\"x\"}"))
  }
}
