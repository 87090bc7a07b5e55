package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The oracle_sql.json serialization is hand-rolled (no JSON dep in main):
  * prove it parses back to exactly the declared map with a real JSON parser
  * (Jackson, from Spark's classpath) — a stray control character in future
  * oracle SQL would otherwise silently zero a round's correctness. */
class VerifySpec extends AnyFunSuite {

  test("oracle_sql.json round-trips through a strict JSON parser") {
    val mapper = new ObjectMapper()
    val node = mapper.readTree(Verify.oracleJson)
    val keys = {
      val it = node.fieldNames()
      Iterator.continually(if (it.hasNext) it.next() else null)
        .takeWhile(_ != null).toSet
    }
    assert(keys == SparkEntry.oracleSql.keySet)
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(node.get(k).asText() == sql, s"round-trip mismatch for $k")
    }
  }

  test("jsonQuote escapes every control character and JSON metachar") {
    val nasty = "a\"b\\c\nd\re\tfg"
    val parsed = new ObjectMapper().readTree(s"{${Verify.jsonQuote("k")}: ${Verify.jsonQuote(nasty)}}")
    assert(parsed.get("k").asText() == nasty)
  }
}
