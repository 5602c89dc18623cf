package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench driver contract: the final stdout line must stay
  * parseable and under the driver's tail-capture window (~300 bytes) —
  * the contract that silently failed for three rounds when the envelope
  * carried the full per-query map. No Spark session needed.
  */
class BenchEnvelopeSpec extends AnyFunSuite {

  private def demo(total: Double): String =
    Bench.envelope(total,
      Bench.Headline.map(_ -> 9999.999), nErrors = 156, reps = 99,
      sfName = "graft_sf100")

  test("envelope stays under 300 bytes at worst-case field widths") {
    val line = demo(99999.999)
    assert(line.getBytes("UTF-8").length < 300,
      s"envelope grew to ${line.length} bytes: $line")
  }

  test("envelope is single-line minified JSON with the contract fields") {
    val line = demo(144.725)
    assert(!line.contains("\n"))
    for (f <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
                  "\"queries\":", "\"errors\":", "\"reps\":", "\"sf\":"))
      assert(line.contains(f), s"missing $f in $line")
    // negative (failed-query) totals serialize as -1, not 9-digit floats
    assert(Bench.envelope(-1.0, Nil, 0, 1, "sf0.1").contains("\"value\":-1"))
  }

  test("envelope escapes hostile names instead of breaking the JSON") {
    val line = Bench.envelope(1.0, Seq("q_\"evil\"\nquery" -> 1.0), 0, 1,
      "dir\"with\\quotes")
    assert(!line.contains("\n"))
    assert(line.contains("\\\"evil\\\""))
    assert(line.contains("\\\\quotes"))
  }
}
