package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{AggKind, SamplingStrategy}
import graft.parser.QueryParser

class ParserSpec extends AnyFunSuite {

  test("plain exact query") {
    val s = QueryParser.parse("SELECT SUM(l_extendedprice) FROM lineitem")
    assert(s.agg === AggKind.Sum)
    assert(s.column === "l_extendedprice")
    assert(s.table === "lineitem")
    assert(s.sampling === SamplingStrategy.Exact)
  }

  test("WHERE and GROUP BY are captured") {
    val s = QueryParser.parse(
      "SELECT AVG(l_quantity) FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus")
    assert(s.agg === AggKind.Avg)
    assert(s.where === Some("l_returnflag = 'R'"))
    assert(s.groupBy === Some("l_linestatus"))
  }

  test("COUNT(*) works") {
    val s = QueryParser.parse("SELECT COUNT(*) FROM orders")
    assert(s.agg === AggKind.Count && s.column === "*")
  }

  test("--sample percent becomes Uniform") {
    val s = QueryParser.parse("SELECT SUM(x) FROM t", samplePercent = Some(10.0))
    assert(s.sampling === SamplingStrategy.Uniform(0.10))
  }

  test("--error becomes Adaptive") {
    val s = QueryParser.parse("SELECT SUM(x) FROM t", errorThresholdPct = Some(2.0))
    s.sampling match {
      case a: SamplingStrategy.Adaptive => assert(a.errorThresholdPct === 2.0)
      case other => fail(s"expected Adaptive, got $other")
    }
  }

  test("APPROX() embedded syntax strips and defaults to 10% uniform") {
    val s = QueryParser.parse("SELECT APPROX(SUM(amount)) FROM sales")
    assert(s.agg === AggKind.Sum && s.column === "amount")
    assert(s.sampling === SamplingStrategy.Uniform(0.10))
  }

  test("sample=100 degenerates to exact") {
    val s = QueryParser.parse("SELECT SUM(x) FROM t", samplePercent = Some(100.0))
    assert(s.sampling === SamplingStrategy.Exact)
  }

  test("unsupported shapes throw") {
    intercept[IllegalArgumentException] {
      QueryParser.parse("SELECT a, b FROM t JOIN u ON a = b")
    }
  }
}
