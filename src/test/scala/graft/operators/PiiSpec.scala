package graft.operators

import graft.SparkTestBase

/** Pins [[Pii.piiScrubbed]]'s per-pattern matching and the
  * sequential-redaction semantics (URL → email → IP → phone, counts on
  * the previous step's output) on handcrafted rows — cases the
  * injection-based gated query can't construct, like an IP inside a
  * URL path.
  */
class PiiSpec extends SparkTestBase {
  import spark.implicits._

  private def scrub(rows: (Long, String)*) =
    Pii.piiScrubbed(rows.toSeq.toDF("doc_id", "text"))
      .select($"doc_id", $"n_urls", $"n_emails", $"n_ips", $"n_phones",
        $"redacted")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
          r.getString(5))).toMap

  test("each entity type is found and replaced by its own token") {
    val got = scrub(
      1L -> "write to bob@corp.io today",
      2L -> "docs at https://a.b/c and http://x.y/z",
      3L -> "host 10.0.0.1 responded",
      4L -> "dial 555-0199 now",
      5L -> "nothing personal here")
    assert(got(1L) == ((0L, 1L, 0L, 0L), "write to [EMAIL] today"))
    assert(got(2L) == ((2L, 0L, 0L, 0L), "docs at [URL] and [URL]"))
    assert(got(3L) == ((0L, 0L, 1L, 0L), "host [IP] responded"))
    assert(got(4L) == ((0L, 0L, 0L, 1L), "dial [PHONE] now"))
    assert(got(5L) == ((0L, 0L, 0L, 0L), "nothing personal here"))
  }

  test("an IP inside a URL is swallowed by the URL pass, not double-counted") {
    val got = scrub(1L -> "see http://10.1.2.3/admin but ping 10.1.2.4")
    assert(got(1L) == ((1L, 0L, 1L, 0L), "see [URL] but ping [IP]"))
  }

  test("a phone-shaped fragment inside an IP-redacted span does not resurface") {
    // 123-4567 after 'tel ' is a phone; the dotted quad goes to [IP]
    // first, so its digits never feed the phone pass
    val got = scrub(1L -> "tel 123-4567 at 111.222.111.222")
    assert(got(1L) == ((0L, 0L, 1L, 1L), "tel [PHONE] at [IP]"))
  }

  test("multiple entities of one type all redact (global replace)") {
    val got = scrub(1L -> "a@b.co c@d.org e@f.net")
    assert(got(1L) == ((0L, 3L, 0L, 0L), "[EMAIL] [EMAIL] [EMAIL]"))
  }

  test("facade equals the gated ta_pii on the test corpus") {
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)), r.getString(5))
    val gated = Pii.taPii(spark, sf0001).collect().map(key).toMap
    // the gated query IS injection + piiScrubbed; spot-check the
    // injection hit the expected residue classes
    assert(gated.nonEmpty)
    val ids = gated.keySet
    assert(ids.filter(_ % 3 == 0).forall(id => gated(id)._1._2 == 1L))
    assert(ids.filter(_ % 3 != 0).forall(id => gated(id)._1._2 == 0L))
    assert(ids.filter(_ % 5 == 0).forall(id => gated(id)._1._4 == 1L))
    assert(ids.filter(_ % 7 == 0).forall(id => gated(id)._1._3 == 1L))
    assert(ids.filter(_ % 11 == 0).forall(id => gated(id)._1._1 == 1L))
    // all four types present somewhere, and some doc has several
    assert(ids.exists(id => id % 3 == 0 && id % 5 == 0 && id % 7 == 0))
  }
}
