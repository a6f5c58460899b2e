package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {

  import spark.implicits._

  private def redactOne(s: String): (String, Seq[Int]) = {
    val row = Pii.redact(Seq((1L, s)).toDF("id", "t"), "t")
      .select(col("t_clean"), col("n_email"), col("n_ipv4"), col("n_phone"), col("n_digits"))
      .head()
    (row.getString(0), Seq(row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4)))
  }

  test("masks emails, ips, phones and long digit runs") {
    val (clean, counts) = redactOne(
      "mail bob.smith+x@corp.example.org host 10.0.255.7 call 415-555-0042 card 4111111111111111 end")
    assert(clean == "mail <EMAIL> host <IP> call <PHONE> card <NUM> end")
    assert(counts == Seq(1, 1, 1, 1))
  }

  test("clean text is untouched and counts are zero") {
    val (clean, counts) = redactOne("just words and a 42 and v1.2 nothing else")
    assert(clean == "just words and a 42 and v1.2 nothing else")
    assert(counts == Seq(0, 0, 0, 0))
  }

  test("earlier rules claim their span: digits inside an email are not re-counted as <NUM> in the output") {
    val (clean, _) = redactOne("a 123456789@example.com b")
    // the email rule wins the masking even though the local part is 9 digits
    assert(clean == "a <EMAIL> b")
  }

  test("multiple occurrences all masked (global replace)") {
    val (clean, counts) = redactOne("x@a.io y@b.io 1.2.3.4 5.6.7.8")
    assert(clean == "<EMAIL> <EMAIL> <IP> <IP>")
    assert(counts(0) == 2 && counts(1) == 2)
  }

  // Adversarial fixtures, asserted LITERALLY — expectations written by hand
  // from the published pattern semantics, not derived from Pii.Rules, so a
  // rule-table regression cannot silently rewrite the expected values.
  test("adversarial: quoted/tagged emails and boundary punctuation") {
    assert(redactOne("""mail "john.doe+tag@sub.example.co.uk" now""")._1 ==
      """mail "<EMAIL>" now""")
    assert(redactOne("(support@example.com).")._1 == "(<EMAIL>).")
  }

  test("adversarial: international phone keeps its country-code prefix") {
    // the NANP-shaped core is masked; '+1-' survives (documented rule scope)
    assert(redactOne("call +1-800-555-0123 today")._1 == "call +1-<PHONE> today")
    // SSN shape (3-2-4) is NOT a phone and its runs are under 9 digits
    assert(redactOne("ssn 123-45-6789 not matched")._1 == "ssn 123-45-6789 not matched")
  }

  test("adversarial: IP-like strings — version numbers safe, syntactic matches greedy") {
    // three components: never an IPv4
    assert(redactOne("semver v1.2.3 is fine")._1 == "semver v1.2.3 is fine")
    // out-of-range octets still match (rule is syntactic, documented)
    assert(redactOne("ip 999.999.999.999 here")._1 == "ip <IP> here")
    // 4-digit last octet: the 3-digit cap splits it — mask plus remainder
    assert(redactOne("octets 10.2.3.4000 overflow")._1 == "octets <IP>0 overflow")
  }

  test("adversarial: card-like runs and punctuation boundaries") {
    assert(redactOne("card 4111111111111111!")._1 == "card <NUM>!")
    // 8 digits is below the 9+ threshold
    assert(redactOne("order 12345678 ok")._1 == "order 12345678 ok")
  }
}
