package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the full PII scrub: every pattern hits,
  * the replacement ORDER is proven load-bearing (keys survive intact
  * as one tag instead of being shredded by the phone pattern; SSNs and
  * IPs win over the phone-shaped catch-all), and non-PII text passes
  * through byte-identical.
  */
class PiiRedactSpec extends SparkSpec {

  private def red(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextAnalysis.redactPii(col("t"))).head().getString(0)
  }

  test("each PII type maps to its typed tag") {
    assert(red("mail a.b+c@ex-ample.org now") === "mail <EMAIL> now")
    assert(red("ssn 123-45-6789 end") === "ssn <SSN> end")
    assert(red("host 192.168.10.1 end") === "host <IP> end")
    assert(red("call +1 (415) 555-0199 end") === "call <PHONE> end")
    assert(red("key AbCdEf0123456789AbCdEf0123456789AbCdEf01 end") ===
      "key <KEY> end")
    assert(red("pin 123456 end") === "pin <NUM> end")
  }

  test("order is load-bearing: keys are not shredded by the phone pattern") {
    // the 40-char token contains a 10+-digit run; phone-first would
    // leave 'AbCdEf<PHONE>AbCdEf...' fragments
    val out = red("token Qx0123456789012345Qx0123456789012345Qx99 tail")
    assert(out === "token <KEY> tail", out)
  }

  test("SSN and IP win over the phone-shaped catch-all") {
    assert(red("a 123-45-6789 b") === "a <SSN> b")
    assert(red("a 10.20.30.40 b") === "a <IP> b")
  }

  test("non-PII text is untouched; short digit runs survive") {
    val s = "a plain sentence with year 2024 and room 42."
    assert(red(s) === s)
  }

  test("composed sentence with every type") {
    val out = red("mail u@e.io ssn 123-45-6789 ip 10.0.0.7 " +
      "call +44 20 7946 0958 key " +
      "AbCdEf0123456789AbCdEf0123456789AbCdEf01 pin 654321.")
    assert(out === "mail <EMAIL> ssn <SSN> ip <IP> " +
      "call <PHONE> key <KEY> pin <NUM>.", out)
  }
}
