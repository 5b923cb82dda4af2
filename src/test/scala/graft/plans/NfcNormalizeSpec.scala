package graft.plans

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {

  import spark.implicits._

  private val acute = 0x301.toChar
  private val grave = 0x300.toChar

  test("composition cases: combining marks compose, uncomposable and " +
      "compatibility chars pass through, and the result matches the " +
      "JDK reference on every row") {
    val rows = Seq(
      (1L, "caf" + "e" + acute),        // e + U+0301 -> é
      (2L, "A" + grave + "bc"),          // A + U+0300 -> À
      (3L, "q" + acute),                 // no precomposed q-acute: kept
      (4L, "" + 0xfb01.toChar),          // fi ligature: NFC preserves
      (5L, "café"),                 // already NFC: identity
      (6L, ""))                          // empty: identity
      .toDF("id", "raw")
    val got = rows.select(col("id"), TextFunctions.nfc(col("raw")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = rows.collect().map { r =>
      r.getLong(0) -> java.text.Normalizer.normalize(
        r.getString(1), java.text.Normalizer.Form.NFC)
    }.toMap
    assert(got == want)
    assert(got(1L) == "café" && got(2L) == "Àbc")
    assert(got(3L) == "q" + acute && got(4L) == "" + 0xfb01.toChar)
  }

  test("nulls propagate and the digest family sees one text after " +
      "normalization (the reason the pass exists)") {
    val rows = Seq((1L, Some("e" + acute)), (2L, Some("é")),
      (3L, None: Option[String])).toDF("id", "raw")
    val out = rows.select(col("id"),
        md5(TextFunctions.nfc(col("raw"))).as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).isDefined && out(1L) == out(2L),
      "decomposed and precomposed must hash identically after NFC")
    assert(out(3L).isEmpty, "null text stays null")
    // without normalization the same visible text hashes differently
    val raw = rows.filter(col("raw").isNotNull)
      .select(md5(col("raw"))).distinct().count()
    assert(raw == 2L)
  }
}
