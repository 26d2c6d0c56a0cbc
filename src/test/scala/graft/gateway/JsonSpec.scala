package graft.gateway

import org.scalatest.funsuite.AnyFunSuite

import JValue._

class JsonSpec extends AnyFunSuite {

  test("round-trips nested structures") {
    val in = """{"a":[1,2.5,-3],"b":{"c":"x\"y","d":null,"e":true},"f":[]}"""
    val v = Json.parse(in)
    assert(Json.parse(Json.render(v)) == v)
  }

  test("64-bit integers survive without precision loss") {
    val v = Json.parse("""{"id":9007199254740993}""").asInstanceOf[JObj]
    assert(v.get("id").contains(JNum(BigDecimal("9007199254740993"))))
    assert(Json.render(v) == """{"id":9007199254740993}""")
  }

  test("string escapes render and parse") {
    val s = JStr("line1\nline2\ttab \"quote\" \\ back ctl")
    assert(Json.parse(Json.render(s)) == s)
  }

  test("unicode escapes parse") {
    assert(Json.parse("\"\\u0041\\u00e9\"") == JStr("Aé"))
  }

  test("malformed input throws JsonParseException") {
    Seq("{", "[1,", "\"unterminated", "{'single':1}", "{\"a\":}", "1 2").foreach { bad =>
      intercept[Json.JsonParseException](Json.parse(bad))
    }
  }

  test("NaN/Infinity render as null") {
    assert(JValue.num(Double.NaN) == JNull)
    assert(JValue.num(Double.PositiveInfinity) == JNull)
  }
}
