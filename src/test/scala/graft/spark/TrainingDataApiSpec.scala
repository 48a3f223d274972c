package graft.spark

import graft.api.TrainingData
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The public TrainingData facade on arbitrary (non-fixture) frames: the
  * gates delegate to these functions, but a library user calls them with
  * their own columns, rates, salts, and budgets — so pin the general
  * contracts, not the fixture outputs.
  */
class TrainingDataApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("trainingdata-api-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def people = {
    val s = spark; import s.implicits._
    (1L to 4000L).map(i => (i, s"group${i % 7}", 10 + (i % 50)))
      .toDF("id", "grp", "toks")
  }

  test("sampleDeterministic tracks the rate and composes disjointly") {
    val df = people
    val r30 = TrainingData.sampleDeterministic(df, "id", 0.30, "s1")
    val n = r30.count()
    assert(math.abs(n / 4000.0 - 0.30) < 0.05, s"rate ${n / 4000.0} far from 0.30")
    // rate monotonicity: a 10% cut is a subset of a 30% cut (same salt)
    val r10 = TrainingData.sampleDeterministic(df, "id", 0.10, "s1")
    assert(r10.join(r30, Seq("id"), "left_anti").count() == 0)
    // rate 1.0 keeps everything, 0.0 nothing
    assert(TrainingData.sampleDeterministic(df, "id", 1.0, "s1").count() == 4000)
    assert(TrainingData.sampleDeterministic(df, "id", 0.0, "s1").count() == 0)
  }

  test("withSplit covers every row with bands near their weights") {
    val got = TrainingData.withSplit(people, "id", "s2",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("train", "val", "test"))
    assert(got.values.sum == 4000)
    assert(math.abs(got("train") / 4000.0 - 0.8) < 0.05)
  }

  test("sampleStratified honors quotas per stratum and is rerun-stable") {
    val a = TrainingData.sampleStratified(people, "grp", "id", 25, "s3")
    assert(a.groupBy("grp").count().collect().forall(_.getLong(1) == 25))
    val b = TrainingData.sampleStratified(people, "grp", "id", 25, "s3")
    assert(a.collect().map(_.toString).sorted
      .sameElements(b.collect().map(_.toString).sorted))
  }

  test("packSequences conserves tokens and respects the budget boundary") {
    val packed = TrainingData.packSequences(people, "id", "toks",
      budget = 256, shardSize = 500, strataCols = Seq("grp"))
    val rows = packed.select("grp", "shard", "pack_id", "start", "toks").collect()
    assert(rows.length == 4000)
    // every start offset is the div-consistent pack
    rows.foreach { r =>
      assert(r.getLong(3) / 256 == r.getLong(2), s"start/budget mismatch: $r")
    }
    // within a (grp, shard): starts are a strictly increasing cumsum from 0
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (_, rs) =>
      val total = rs.map(_.getLong(4)).sum
      assert(rs.map(_.getLong(3)).max < total)
      assert(rs.map(_.getLong(3)).min == 0L)
    }
  }

  test("decontaminate flags planted overlaps and nothing else") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares 2 shingles w/ bench
      (2L, "one two three four five six seven"),   // clean
      (3L, "alpha beta gamma unrelated tail here") // shares 1 shingle: below min
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = TrainingData.decontaminate(corpus, bench, "doc_id", "text",
        n = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 100L, 3L)),
      s"expected only doc 1 flagged (3 shared 3-grams), got ${got.toSeq}")
  }

  test("minhashLshCandidates pairs near-identical docs and skips unrelated ones") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
      (3L, "completely different words nothing shared with any other entry here at all")
    ).toDF("doc_id", "text")
    val got = TrainingData.minhashLshCandidates(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, minJaccardEst = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)), s"expected only the planted near-dup pair, got ${got.toSeq}")
  }

  test("similarity scores are DOUBLE, not DECIMAL — every hash mode") {
    // A decimal literal inside expr(...) silently turns int/decimal
    // division into DECIMAL(p,s): values render with trailing zeros
    // ('1.0000' vs '1.0') and an exact cross-engine compare fails even
    // though the numbers are equal. Pin the result dtypes of every
    // score-bearing public API.
    val s = spark; import s.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely different words nothing shared with any other entry here at all")
    ).toDF("doc_id", "text")
    for (portable <- Seq(false, true)) {
      val sch = TrainingData.minhashLshCandidates(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, portableHash = portable).schema
      assert(sch("jaccard_est").dataType == DoubleType,
        s"portableHash=$portable jaccard_est must be DOUBLE, got ${sch("jaccard_est").dataType}")
    }
    // sibling score APIs: cosine similarity is double, n-gram jaccard is
    // deliberately integer basis points (engine-exact by design)
    val vecs = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "e")
    val qs = Seq((10L, Seq(1.0f, 0.0f))).toDF("qid", "qe")
    val ct = TrainingData.cosineTopK(vecs, qs, k = 1).schema
    assert(ct("cos").dataType == DoubleType, s"cos must be DOUBLE, got ${ct("cos").dataType}")
    val nj = TrainingData.ngramJaccardPairs(docs, "doc_id", "text", n = 3).schema
    assert(nj("jaccard_bp").dataType == LongType,
      s"jaccard_bp stays integral basis points, got ${nj("jaccard_bp").dataType}")
  }

  test("signLshBucket is map-only and separates opposite-sign vectors") {
    val s = spark; import s.implicits._
    val vecs = Seq(
      (1L, Seq(1.0, 1.0)), (2L, Seq(0.9, 1.1)),   // same quadrant -> same bucket
      (3L, Seq(-1.0, -1.0))                        // opposite -> different bucket
    ).toDF("id", "e")
    val planes = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = vecs.withColumn("b", TrainingData.signLshBucket(org.apache.spark.sql.functions.col("e"), planes))
    val by = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(by(1L) == by(2L) && by(1L) != by(3L), s"buckets: $by")
    assert(by(1L) == 3L && by(3L) == 0L) // both positive dots -> bits 0 and 1 set
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "bucketing must not shuffle")
  }

  test("cosineTopK ranks the aligned vector first and excludes self") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.0, 1.0))
    ).toDF("vec_id", "e")
    val queries = Seq((1L, Seq(1.0, 0.0))).toDF("qid", "qe")
    val got = TrainingData.cosineTopK(corpus, queries, k = 2, excludeSelf = true)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 3L)), s"got ${got.toSeq}")
  }

  test("sampleToMixture approaches the target mix and keeps the floor stratum whole") {
    val s = spark; import s.implicits._
    // skewed strata: 2800/1000/200 — uniform target => T = 600, keep ~200 each
    val df = (1L to 4000L).map { i =>
      val g = if (i <= 2800) "big" else if (i <= 3800) "mid" else "small"
      (i, g)
    }.toDF("id", "grp")
    val kept = TrainingData.sampleToMixture(df, "grp", "id",
      Map("big" -> (1.0 / 3), "mid" -> (1.0 / 3), "small" -> (1.0 / 3)), "mx")
    val by = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by("small") == 200, "the floor stratum keeps everything")
    assert(math.abs(by("big") - 200.0) / 200.0 < 0.25, s"big kept ${by("big")}, want ~200")
    assert(math.abs(by("mid") - 200.0) / 200.0 < 0.25, s"mid kept ${by("mid")}, want ~200")
    // deterministic: same inputs, same kept set
    val again = TrainingData.sampleToMixture(df, "grp", "id",
      Map("big" -> (1.0 / 3), "mid" -> (1.0 / 3), "small" -> (1.0 / 3)), "mx")
    assert(kept.collect().map(_.toString).sorted
      .sameElements(again.collect().map(_.toString).sorted))
  }

  test("sampleToMixture rejects target strata absent from the data") {
    val s = spark; import s.implicits._
    val df = (1L to 100L).map(i => (i, "only")).toDF("id", "grp")
    val e = intercept[IllegalArgumentException] {
      TrainingData.sampleToMixture(df, "grp", "id",
        Map("only" -> 0.5, "ghost" -> 0.5), "mx")
    }
    assert(e.getMessage.contains("ghost"), e.getMessage)
  }

  test("minhashLshCandidates with StorageLevel.NONE matches the cached result") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely different words nothing shared with any other entry here at all")
    ).toDF("doc_id", "text")
    val uncached = TrainingData.minhashLshCandidates(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, minJaccardEst = 0.25,
        signatureStorage = org.apache.spark.storage.StorageLevel.NONE)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(uncached.toSeq == Seq((1L, 2L)), s"got ${uncached.toSeq}")
  }

  test("simhash fingerprints are stable and near for near-duplicate docs") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // 1 token differs
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val fp = TrainingData.simhash(docs, "doc_id", "text", bits = 32)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    assert(fp.values.forall(f => f.length == 32 && f.forall(c => c == '0' || c == '1')))
    assert(hamming(fp(1L), fp(2L)) < hamming(fp(1L), fp(3L)),
      s"near-dups must be closer: ${fp(1L)} / ${fp(2L)} / ${fp(3L)}")
    // deterministic across runs
    val again = TrainingData.simhash(docs, "doc_id", "text", bits = 32)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == fp)
  }

  test("redactPii scrubs emails and IPv4s, leaves clean text alone") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "write a.b-c_d%e+f@sub.domain.co and 10.0.0.1 here"),
      (2L, "two mails x@y.io y@z.org one ip 192.168.255.254"),
      (3L, "version 1.2 is not an ip, nor is user@localhost a mail")
    ).toDF("id", "text")
    val got = TrainingData.redactPii(df, "text")
      .select("id", "redacted").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "write <EMAIL> and <IP> here")
    assert(got(2L) == "two mails <EMAIL> <EMAIL> one ip <IP>")
    assert(got(3L) == "version 1.2 is not an ip, nor is user@localhost a mail")
  }

  test("dedupExact keeps exactly the first writer per content") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "cc"), (5L, "bb"))
      .toDF("id", "text")
    val kept = TrainingData.dedupExact(df, "id", "text")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 2L, 4L)))
  }

  test("chunkByChars covers every character with the declared overlap") {
    val s = spark; import s.implicits._
    val text = ('a' to 'z').mkString * 10 // 260 chars
    val df = Seq((1L, text), (2L, "short"), (3L, "")).toDF("id", "text")
    val got = TrainingData.chunkByChars(df, "id", "text", width = 100, overlap = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // empty doc: no chunks; short doc: one short chunk
    assert(!got.exists(_._1 == 3L))
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, "short")))
    // 260 chars, step 80: windows at 0/80/160 (+ final shorter tail at 240)
    val one = got.filter(_._1 == 1L).sortBy(_._2)
    assert(one.map(_._2).sameElements(Array(0, 1, 2)) ||
      one.map(_._2).sameElements(Array(0, 1, 2, 3)))
    // reconstruction: dropping each chunk's overlap prefix re-yields the doc
    val rebuilt = one.head._3 + one.tail.map(_._3.drop(20)).mkString
    assert(rebuilt == text, "chunks must tile the document exactly")
    // every chunk except the last is exactly `width` wide
    assert(one.init.forall(_._3.length == 100))
  }

  test("chunkByChars rejects degenerate widths") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "x")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      TrainingData.chunkByChars(df, "id", "text", width = 10, overlap = 10)
    }
    intercept[IllegalArgumentException] {
      TrainingData.chunkByChars(df, "id", "text", width = 0, overlap = 0)
    }
  }

  test("chunkByChars: NULL text chunks like empty text (no NULL chunk rows)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "abcdef"), (2L, ""), (3L, null: String)).toDF("id", "text")
    val got = TrainingData.chunkByChars(df, "id", "text", width = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // id 1 -> windows at step 3: "abcd", "def"; ids 2 and 3 -> nothing
    assert(got == Set((1L, 0, "abcd"), (1L, 1, "def")))
  }

  // The stop-shingle corpus: one 3-gram ("h h h") shared by 13 documents.
  // Uncapped, that single hot shingle alone pairs every two of them —
  // the df² blowup the cap exists to stop.
  private def stopShingleCorpus = {
    val s = spark; import s.implicits._
    val hot = (1L to 12L).map(i => (i, "h h h"))
    val rest = Seq(
      (100L, "p q r s"),      // {"p q r","q r s"}
      (101L, "p q r t"),      // {"p q r","q r t"}
      (200L, "m n o h h h"),  // {"m n o","n o h","o h h","h h h"}
      (201L, "m n o q"))      // {"m n o","n o q"}
    (hot ++ rest).toDF("doc_id", "text")
  }

  test("ngramJaccardPairs: maxDocFreq bounds the candidate pairs of a stop shingle") {
    val docs = stopShingleCorpus
    val uncapped = TrainingData.ngramJaccardPairs(docs, "doc_id", "text", n = 3)
      .count()
    // 66 hot-hot pairs + 12 hot-200 pairs + (100,101) + (200,201)
    assert(uncapped == 80L, s"uncapped candidate count $uncapped")
    val capped = TrainingData.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the df=13 shingle is gone: only rare-shingle pairs survive
    assert(capped == Set((100L, 101L, 3333L), (200L, 201L, 2500L)))
  }

  test("ngramJaccardPairs: capped sizes keep numerator and denominator consistent") {
    // doc 200 holds 4 shingles but only 3 survive the cap; its Jaccard
    // with 201 must use the CAPPED size (inter=1, na=3, nb=2 -> 2500 bp),
    // not the raw one (na=4 -> 2000 bp)
    val capped = TrainingData.ngramJaccardPairs(stopShingleCorpus, "doc_id",
        "text", n = 3, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped((200L, 201L)) == 2500L)
    val uncapped = TrainingData.ngramJaccardPairs(stopShingleCorpus, "doc_id",
        "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(uncapped((200L, 201L)) == 2000L)
  }

  test("ngramJaccardPairs: minJaccardBp filters and ordering doc_a < doc_b holds") {
    val got = TrainingData.ngramJaccardPairs(stopShingleCorpus, "doc_id",
        "text", n = 3, minJaccardBp = 3000, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == Set((100L, 101L, 3333L)))
    assert(got.forall(p => p._1 < p._2))
  }

  test("profile: nulls, distincts, and deterministic min/max rendering") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Some(3L), Some("b"), Some(1.5)),
      (Some(1L), None, Some(857.71)),
      (None, Some("a"), Some(1.5)),
      (Some(3L), Some("c"), None)
    ).toDF("k", "txt", "price")
    val p = TrainingData.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(p("k") === ((4L, 1L, 2L, "1.00", "3.00")))
    assert(p("txt") === ((4L, 1L, 3L, "a", "c")))
    assert(p("price") === ((4L, 1L, 2L, "1.50", "857.71")))
    // rows come out ordered by column name
    assert(TrainingData.profile(df).select("col_name").as[String].collect()
      .toSeq === Seq("k", "price", "txt"))
  }

  test("kAnonymize suppresses exactly the groups below k, keeps full rows") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", "x", 1), ("a", "x", 2), ("a", "x", 3),  // group of 3
      ("a", "y", 4), ("a", "y", 5),                 // group of 2
      ("b", "x", 6)                                 // singleton
    ).toDF("q1", "q2", "payload")
    val k2 = TrainingData.kAnonymize(df, Seq("q1", "q2"), 2)
    assert(k2.count() === 5)
    assert(k2.columns.toSeq === Seq("q1", "q2", "payload")) // helper col dropped
    val k3 = TrainingData.kAnonymize(df, Seq("q1", "q2"), 3)
    assert(k3.select("payload").as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    // k=1 keeps everything
    assert(TrainingData.kAnonymize(df, Seq("q1", "q2"), 1).count() === 6)
    intercept[IllegalArgumentException](TrainingData.kAnonymize(df, Nil, 2))
  }

  test("profile: timestamp columns render as plain ISO strings") {
    val s = spark; import s.implicits._
    val df = Seq("2024-01-02 03:04:05", "2023-12-31 23:59:59")
      .toDF("raw").select($"raw".cast("timestamp").as("ts"))
    val row = TrainingData.profile(df).collect()(0)
    assert(row.getString(4) === "2023-12-31 23:59:59")
    assert(row.getString(5) === "2024-01-02 03:04:05")
  }

  test("temperatureMixture flattens the mix: small strata keep a larger share") {
    val s = spark; import s.implicits._
    // skewed strata: big=3000, mid=800, small=200
    val df = ((1L to 3000L).map(i => (i, "big")) ++
      (3001L to 3800L).map(i => (i, "mid")) ++
      (3801L to 4000L).map(i => (i, "small"))).toDF("id", "src")
    val kept = TrainingData.temperatureMixture(df, "src", "id",
      alpha = 0.5, targetRows = 1000, salt = "t1")
    val by = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keepRate = Map("big" -> by("big") / 3000.0, "mid" -> by("mid") / 800.0,
      "small" -> by("small") / 200.0)
    // alpha < 1: keep RATE increases as stratum size decreases
    assert(keepRate("small") > keepRate("mid") && keepRate("mid") > keepRate("big"))
    // expected rates ~ 1000*sqrt(c)/sum(sqrt)/c; sum(sqrt) ≈ 97.2
    assert(math.abs(by("big") - 3000 * 1000 * math.sqrt(3000) / 97.31 / 3000) < 80)
    // deterministic: rerun is identical
    val again = TrainingData.temperatureMixture(df, "src", "id",
      alpha = 0.5, targetRows = 1000, salt = "t1")
    assert(kept.select("id").as[Long].collect().sorted.toSeq ===
      again.select("id").as[Long].collect().sorted.toSeq)
    // alpha = 1 is proportional sampling: rates equal across strata (±noise)
    val prop = TrainingData.temperatureMixture(df, "src", "id",
      alpha = 1.0, targetRows = 1000, salt = "t1")
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Seq(prop("big") / 3000.0, prop("mid") / 800.0, prop("small") / 200.0)
    assert(rates.max - rates.min < 0.08, s"alpha=1 rates spread: $rates")
    intercept[IllegalArgumentException](
      TrainingData.temperatureMixture(df, "src", "id", 1.5, 100, "t1"))
    intercept[IllegalArgumentException](
      TrainingData.temperatureMixture(df, "src", "id", 0.5, 0, "t1"))
    // NULL strata would silently vanish while inflating the denominator
    val withNull = df.unionByName(
      Seq((9999L, null.asInstanceOf[String])).toDF("id", "src"))
    val e = intercept[IllegalArgumentException](
      TrainingData.temperatureMixture(withNull, "src", "id", 0.5, 100, "t1"))
    assert(e.getMessage.contains("NULL"))
  }

  test("dedupIncremental drops corpus dups and in-batch dups, keeps first writers") {
    val s = spark; import s.implicits._
    val corpus = Seq((1L, "aaa"), (2L, "bbb")).toDF("id", "content")
    val index = TrainingData.dedupExactSummary(corpus, "id", "content").select("fp")
    val batch = Seq(
      (10L, "ccc"), (11L, "aaa"),          // 11 duplicates the corpus
      (12L, "ddd"), (13L, "ccc"),          // 13 duplicates 10 in-batch
      (14L, "bbb"), (15L, "eee")           // 14 duplicates the corpus
    ).toDF("id", "content")
    val kept = TrainingData.dedupIncremental(batch, index, "id", "content")
    assert(kept.select("id").as[Long].collect().sorted.toSeq === Seq(10L, 12L, 15L))
    assert(kept.columns.toSeq === Seq("id", "content")) // helper col dropped
    // empty index: plain self-dedup (only the in-batch ccc dup drops)
    val none = index.filter($"fp" === "nope")
    assert(TrainingData.dedupIncremental(batch, none, "id", "content").count() === 5)
    intercept[IllegalArgumentException](
      TrainingData.dedupIncremental(batch, corpus, "id", "content"))
  }

  test("lDiversify keeps only groups where the sensitive column is l-diverse") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", "s1", 1), ("a", "s2", 2), ("a", "s3", 3), // 3-diverse
      ("b", "s1", 4), ("b", "s1", 5), ("b", "s2", 6), // 2-diverse (big but homogeneous-ish)
      ("c", "s1", 7), ("c", "s1", 8), ("c", "s1", 9)  // 1-diverse despite size 3
    ).toDF("quasi", "secret", "payload")
    val l2 = TrainingData.lDiversify(df, Seq("quasi"), "secret", 2)
    assert(l2.select("payload").as[Int].collect().sorted.toSeq === Seq(1, 2, 3, 4, 5, 6))
    val l3 = TrainingData.lDiversify(df, Seq("quasi"), "secret", 3)
    assert(l3.select("payload").as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    assert(l3.columns.toSeq === Seq("quasi", "secret", "payload"))
    // l=1 keeps everything; bad args refused
    assert(TrainingData.lDiversify(df, Seq("quasi"), "secret", 1).count() === 9)
    intercept[IllegalArgumentException](TrainingData.lDiversify(df, Nil, "secret", 2))
    intercept[IllegalArgumentException](TrainingData.lDiversify(df, Seq("quasi"), "secret", 0))
  }
}
