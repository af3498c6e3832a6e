package graft

import graft.functions._
import org.apache.spark.sql.functions._

class FunctionsSpec extends GraftSuite {
  import spark.implicits._

  test("TimeFns.bucket floors to 15-minute boundaries") {
    val df = Seq("2024-01-01 00:14:59", "2024-01-01 00:15:00", "2024-01-01 23:59:59")
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val got = df.select(TimeFns.bucket($"ts", 15).cast("string")).as[String].collect()
    assert(got.toSeq == Seq("2024-01-01 00:00:00", "2024-01-01 00:15:00", "2024-01-01 23:45:00"))
  }

  test("TimeFns.dayType marks weekends") {
    val df = Seq("2024-01-06 10:00:00", "2024-01-08 10:00:00") // Sat, Mon
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val got = df.select(TimeFns.dayType($"ts")).as[String].collect()
    assert(got.toSeq == Seq("weekend", "weekday"))
  }

  test("GeoFns.haversineKm matches a known distance") {
    // NYC City Hall → Times Square ≈ 5.3 km
    val df = Seq((40.7128, -74.0060, 40.7580, -73.9855)).toDF("a", "b", "c", "d")
    val km = df.select(GeoFns.haversineKm($"a", $"b", $"c", $"d")).as[Double].head()
    assert(km > 5.0 && km < 5.6, s"got $km")
  }

  test("GeoFns.haversineKm is zero for identical points") {
    val df = Seq((40.0, -74.0)).toDF("lat", "lon")
    val km = df.select(GeoFns.haversineKm($"lat", $"lon", $"lat", $"lon")).as[Double].head()
    assert(km == 0.0)
  }

  test("TextFns.shingles produces n-grams, distinct, empty when too short") {
    val df = Seq("a b c d", "a b").toDF("text")
    val got = df.select(TextFns.shingles($"text", 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("TextFns.bigrams keeps repeats and is empty below 2 tokens") {
    val df = Seq("a b a b", "solo").toDF("text")
    val got = df.select(TextFns.bigrams($"text")).as[Seq[String]].collect()
    assert(got(0) == Seq("a b", "b a", "a b")) // multiset: the repeat survives
    assert(got(1).isEmpty)
  }

  test("TextFns ratios and langId") {
    val df = Seq("the the data!").toDF("text")
    val row = df.select(
      TextFns.stopwordRatio($"text").as("sr"),
      TextFns.punctRatio($"text").as("pr"),
      TextFns.langId($"text").as("lang"))
      .head()
    assert(math.abs(row.getDouble(0) - 2.0 / 3.0) < 1e-9)
    assert(math.abs(row.getDouble(1) - 1.0 / 13.0) < 1e-9) // one '!'
    assert(row.getString(2) == "en")
  }

  test("TextFns.fingerprint is deterministic and order-sensitive") {
    val df = Seq("abc", "abc", "acb").toDF("text")
    val got = df.select(TextFns.fingerprint($"text")).as[Long].collect()
    assert(got(0) == got(1))
    assert(got(0) != got(2))
  }

  test("VecFns.cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 2.0f))).toDF("a", "b")
    val got = df.select(VecFns.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
  }

  test("native minhash signature agreement is 1 for identical sets") {
    val df = Seq(("x", "a b c d e f g h")).toDF("id", "text")
    val sig = df.select(
      graft.plans.NativeFns.minhashSig(TextFns.shingles($"text", 3), 16).as("s"))
    val agree = sig.select(HashFns.signatureAgreement($"s", $"s")).as[Double].head()
    assert(agree == 1.0)
  }

  test("HashFns.bandKeys passes NULL signatures through as NULL (r8 ADVICE fix)") {
    // ShingleMinHash returns NULL for null text / too-short docs; bandKeys
    // must propagate that NULL instead of tripping the length assert
    // (size(NULL) = -1), so lshBandIndex's isNotNull filter can drop them
    val df = Seq(("ok", "alpha beta gamma delta epsilon"), ("short", "a"),
      ("nul", null: String)).toDF("id", "text")
    val got = df.select($"id",
      HashFns.bandKeys(
        graft.plans.NativeFns.minhashText($"text", 3, 16), 16, 4).as("bks"))
      .select($"id", $"bks".isNull.as("isnull")).as[(String, Boolean)]
      .collect().toMap
    assert(!got("ok"), "real signature must band")
    assert(got("short") && got("nul"), "NULL signatures must stay NULL, not throw")
    // the length assert still fires on a genuinely wrong-length signature
    val e = intercept[Exception] {
      df.filter($"id" === "ok").select(
        HashFns.bandKeys(
          graft.plans.NativeFns.minhashText($"text", 3, 8), 16, 4)).collect()
    }
    assert(e.getMessage.contains("bandKeys") ||
      Option(e.getCause).exists(_.getMessage.contains("bandKeys")), e.getMessage)
  }

  test("HashFns simhash: identical docs hamming 0; different docs > 0") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "x y z w")).toDF("t1", "t2")
    val got = df.select(HashFns.hamming(
      HashFns.simhash64(TextFns.tokens($"t1")),
      HashFns.simhash64(TextFns.tokens($"t2")))).as[Long].collect()
    assert(got(0) == 0L)
    assert(got(1) > 0L)
  }
}
