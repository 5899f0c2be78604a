package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.operators.{CorpusOps, Dedup, Similarity}

/** Unit/property coverage for the round-3 pipeline operators: PII redaction,
  * repetition signals, stratified sampling, temperature mixing, semantic
  * dedup, int8 quantization. (Their end-to-end values are oracle-checked by
  * the driver; these specs pin the operator-level contracts on fixtures.)
  */
class PipelineOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$dir/embeddings.parquet")

  test("redactPii replaces email/phone/IPv4 with typed placeholders, leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      "write to jo.doe+x@mail.example.org today",
      "call 303-555-0142 now",
      "host 192.168.0.1 down",
      "all three a@b.co 111-222-3333 1.2.3.4",
      "no pii here at all").toDF("t")
      .select(redactPii(col("t")).as("r")).as[String].collect()
    assert(rows(0) === "write to <EMAIL> today")
    assert(rows(1) === "call <PHONE> now")
    assert(rows(2) === "host <IP> down")
    assert(rows(3) === "all three <EMAIL> <PHONE> <IP>")
    assert(rows(4) === "no pii here at all")
  }

  test("piiCount counts non-overlapping matches") {
    import spark.implicits._
    val n = Seq("a@b.co and c@d.org but not at-sign alone @").toDF("t")
      .select(piiCount(col("t"), TextFunctions.emailRe).as("n"))
      .as[Int].head()
    assert(n === 2)
  }

  test("maxRunLength / maxDupCount on hand-computed fixtures") {
    import spark.implicits._
    val r = Seq(("x", Seq("a", "a", "a", "b", "a", "b")))
      .toDF("id", "arr")
      .select(
        maxRunLength(col("arr")).as("run"),
        maxDupCount(col("arr")).as("dup"))
      .head()
    assert(r.getLong(0) === 3) // a a a
    assert(r.getLong(1) === 4) // four a's total
  }

  test("repetitionSignals matches a hand-computed doc") {
    import spark.implicits._
    // tokens: a a a b a b → runs: aaa=3; bigrams: (a a)(a a)(a b)(b a)(a b)
    // → top bigram "a a"|"a b" both 2 of 5; 5-shingles: 2 distinct of 2 → 0 dups
    val row = CorpusOps.repetitionSignals(
      Seq((1L, "a a a b a b")).toDF("doc_id", "text"), "doc_id", "text").head()
    assert(row.getLong(1) === 6)            // n_tokens
    assert(row.getLong(2) === 3)            // max_run
    assert(row.getLong(3) === 2)            // top_bigram_n
    assert(row.getDouble(4) === 2.0 / 5)    // top_bigram_frac
    assert(row.getDouble(5) === 0.0)        // dup_shingle_frac
    // an all-same-token doc maxes every signal
    val spam = CorpusOps.repetitionSignals(
      Seq((2L, "z z z z z z")).toDF("doc_id", "text"), "doc_id", "text").head()
    assert(spam.getLong(2) === 6)
    assert(spam.getDouble(4) === 1.0)
    assert(spam.getDouble(5) === 0.5) // 2 identical shingles, 1 distinct
  }

  test("stratifiedSample: kept rows satisfy bucket < rate; rate 0 keeps none, 100 keeps all") {
    val rate = (substring(col("source"), 4, 10).cast("int") % 4) * 25 + 10
    val out = CorpusOps.stratifiedSample(docs, "doc_id", rate)
    assert(out.filter(col("hash_bucket") >= col("rate")).count() === 0)
    assert(CorpusOps.stratifiedSample(docs, "doc_id", lit(0)).count() === 0)
    assert(CorpusOps.stratifiedSample(docs, "doc_id", lit(100)).count() === docs.count())
  }

  test("temperatureMix: per-source counts hit the sqrt-weighted budgets; deterministic") {
    val mix = CorpusOps.temperatureMix(docs, "doc_id", "text", "source", 100)
    val got = mix.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // recompute budgets directly: floor(100 * sqrt(tok_s) / Σ sqrt(tok))
    val toks = docs.select(col("source"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val sumw = toks.foldLeft(0.0)((a, t) => a + math.sqrt(t._2.toDouble))
    toks.foreach { case (src, n) =>
      val budget = math.floor(100 * math.sqrt(n.toDouble) / sumw).toLong
      // a source with fewer docs than its budget keeps them all
      val have = docs.filter(col("source") === src).count()
      assert(got.getOrElse(src, 0L) === math.min(budget, have), s"source $src")
    }
    // determinism
    val again = CorpusOps.temperatureMix(docs, "doc_id", "text", "source", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === mix.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("semanticDupPairs is a subset of exact all-pairs at the same threshold, with equal cosines") {
    val exact = Dedup.embeddingCosinePairs(embs, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sem = Similarity.semanticDupPairs(embs, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(sem.nonEmpty)
    sem.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"false positive $pair")
      assert(exact(pair) === cos)
    }
  }

  test("semanticDupPairs default nClusters is the ceil-sqrt-n rule") {
    val n = embs.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    assert(k > 16, "fixture must exercise a default above the old constant")
    // deterministic quantizer -> the default must reproduce the explicit
    // sqrt-n call bit for bit (pins the wiring, not just the bound)
    def rows(p: org.apache.spark.sql.DataFrame) = p.orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val byDefault = rows(Similarity.semanticDupPairs(embs, "vec_id", "embedding", 0.4))
    val explicit = rows(Similarity.semanticDupPairs(embs, "vec_id", "embedding", 0.4,
      nClusters = Some(k)))
    assert(byDefault === explicit)
    assert(byDefault.nonEmpty)
  }

  test("incrementalJaccardPairs == full self-join pairs restricted to the split boundary") {
    val full = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .filter(col("id_a") < 400 && col("id_b") >= 400) // id_a < id_b always
      .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getDouble(2)).toMap
    val inc = graft.operators.Dedup.incrementalJaccardPairs(
      docs.filter(col("doc_id") >= 400), docs.filter(col("doc_id") < 400),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(inc.nonEmpty)
    assert(inc === full)
  }

  test("observe(): corpus metrics ride the curated write, no second pass") {
    // the production pattern for pipeline health numbers: attach metrics to
    // the write's own plan (docs written, tokens written) instead of paying
    // a second corpus scan to recount
    val obs = new org.apache.spark.sql.Observation("curated_metrics")
    val out = java.nio.file.Files.createTempDirectory("curated_obs").toString
    val curated = CorpusOps.hashSplit(docs, "doc_id", Seq("train" -> 90, "holdout" -> 100))
      .observe(obs, count(lit(1)).as("docs"),
        sum(size(tokens(col("text"))).cast("long")).as("tokens"))
    CorpusOps.writeCurated(curated, out)
    val m = obs.get
    assert(m("docs") === docs.count())
    val expectTokens = docs.select(sum(size(tokens(col("text"))).cast("long")))
      .head().getLong(0)
    assert(m("tokens") === expectTokens)
  }

  test("writeCurated: partitioned layout, lossless, and split filters prune partitions") {
    val out = java.nio.file.Files.createTempDirectory("curated").toString
    val curated = CorpusOps.hashSplit(docs, "doc_id",
      Seq("train" -> 90, "holdout" -> 100))
    CorpusOps.writeCurated(curated, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet.subsetOf(Set("split=train", "split=holdout")) && dirs.nonEmpty)
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    // reading one split must prune to that split's directories only
    val plan = back.filter(col("split") === "train")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("split"),
      plan.take(500))
    assert(back.filter(col("split") === "train").count() ===
      curated.filter(col("split") === "train").count())
  }

  test("built-in session_window agrees with the hand-rolled gap sessionizer on the fixture") {
    // the two differ only at EXACTLY-gap boundaries (strict vs non-strict),
    // which the µs-random fixture never hits — counts must line up
    val ev = graft.queries.Q.events(spark, dir)
    val sw = ev.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val hand = ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("new_session")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_no")
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n"))
      .select("user_id", "session_start", "n")
    assert(sw.count() > 0)
    assert(sw.except(hand).count() === 0)
    assert(hand.except(sw).count() === 0)
  }

  test("unigramLm + unigramLogprob: exact counts, OOV fallback, vocab cap") {
    import spark.implicits._
    val corpus = Seq((1L, "a a b")).toDF("doc_id", "text")
    val lm = graft.operators.CorpusOps.unigramLm(corpus, "doc_id", "text")
    val entries = lm.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(entries("a")._1 === 2 && entries("b")._1 === 1)
    assert(entries("a")._2 === math.log(2.0 / 3))
    // score a doc containing an OOV token
    val scored = graft.operators.CorpusOps.unigramLogprob(
      Seq((9L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", lm, -5.0).head()
    assert(scored.getLong(1) === 3)
    assert(scored.getDouble(2) ===
      (0.0 + math.log(2.0 / 3) + math.log(1.0 / 3) + -5.0) / 3)
    // cap keeps the most frequent tokens only
    val capped = graft.operators.CorpusOps.unigramLm(corpus, "doc_id", "text", vocabCap = 1)
    assert(capped.collect().map(_.getString(0)).toSeq === Seq("a"))
  }

  test("unigramLogprob above literalVocabMax: broadcast-join path bit-matches the literal path") {
    import spark.implicits._
    val corpus = Seq((1L, "a a b c d e a"), (2L, "d q b"), (3L, "zz zz"),
      (4L, ""), (5L, "q")).toDF("doc_id", "text")
    val lm = graft.operators.CorpusOps.unigramLm(corpus, "doc_id", "text")
    assert(lm.count() > 3)
    val docs = Seq((9L, "a b oov d"), (10L, "zz"), (11L, " "), (12L, "q c q"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val literal = graft.operators.CorpusOps.unigramLogprob(
      docs, "doc_id", "text", lm, -5.0) // default threshold: literal path
    val joined = graft.operators.CorpusOps.unigramLogprob(
      docs, "doc_id", "text", lm, -5.0, literalVocabMax = 3) // forced join path
    // the join path must broadcast the LM, not embed it in the plan
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val (l, j) = (rows(literal), rows(joined))
    assert(l.map(_._1) === j.map(_._1) && l.map(_._2) === j.map(_._2))
    // EXACT double equality — the sorted-by-pos fold is the same addition
    // sequence as the literal path's token-order fold. (NB: tokens() is
    // split-on-space with -1 limit, so even "" and " " yield ≥1 empty-string
    // token — the zero-token restore branch only matters for null text.)
    l.zip(j).foreach { case ((_, _, a), (_, _, b)) =>
      assert(java.lang.Double.compare(a, b) === 0, s"$a != $b") }
  }

  test("ewmaPerKey folds in (ts, tie) order from a 0.0 seed") {
    import spark.implicits._
    // out-of-order input rows must not change the fold
    val df = Seq((1L, 30L, 3L, 4.0), (1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0))
      .toDF("k", "ts", "tie", "v")
    val r = graft.operators.TimeSeriesOps.ewmaPerKey(df, "k", "ts", "tie", "v", 0.5)
      .head()
    // ((0*0.5 + 1*0.5)*0.5 + 2*0.5)*0.5 + 4*0.5 = 2.625
    assert(r.getLong(1) === 3)
    assert(r.getDouble(2) === 2.625)
  }

  test("ewmaPerKey aborts loudly when a key's history exceeds maxKeyHistory") {
    import spark.implicits._
    val df = (1 to 10).map(i => (1L, i.toLong, i.toLong, 1.0))
      .toDF("k", "ts", "tie", "v")
    // under the cap: fine
    assert(graft.operators.TimeSeriesOps
      .ewmaPerKey(df, "k", "ts", "tie", "v", 0.5, maxKeyHistory = 10)
      .head().getLong(1) === 10)
    // over the cap: the in-plan guard must fail the job with the key named
    val e = intercept[Exception] {
      graft.operators.TimeSeriesOps
        .ewmaPerKey(df, "k", "ts", "tie", "v", 0.5, maxKeyHistory = 9)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("maxKeyHistory=9") && m.contains("for key 1")),
      s"expected the guard message, got: ${messages(e).mkString(" | ")}")
  }

  test("survivorsByScore keeps the highest-score member, min id on ties") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("id", "cluster")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 1L)).toDF("id", "score")
    val out = graft.operators.Dedup.survivorsByScore(clusters, scores)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) === (2L, false)) // 2 and 3 tie at 9; min id 2 wins
    assert(out(2L) === (2L, true))
    assert(out(3L) === (2L, false))
    assert(out(7L) === (7L, true))  // singleton survives itself
  }

  test("BucketedLake: a different bucket count gets its own table, not a stale reuse") {
    val t8 = graft.sources.BucketedLake.ensure(spark, dir, buckets = 8)
    val t4 = graft.sources.BucketedLake.ensure(spark, dir, buckets = 4)
    assert(t8.orders !== t4.orders)
    val buckets = spark.sql(s"DESCRIBE TABLE EXTENDED ${t4.orders}")
      .filter(col("col_name") === "Num Buckets").select("data_type")
      .head().getString(0)
    assert(buckets === "4")
  }

  test("hilbertKey: bijective over the full grid; consecutive keys are grid-ADJACENT (the locality z-order lacks)") {
    import spark.implicits._
    val bits = 5
    val n = 1 << bits
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val keyed = grid.select(col("x"), col("y"),
      graft.functions.Hilbert.hilbertKey(spark, col("x"), col("y"), bits).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // bijection onto [0, n^2)
    assert(keyed.map(_._3).sorted.toSeq === (0L until n.toLong * n).toSeq)
    // continuity: walking the curve in key order, every step moves to a
    // grid NEIGHBOR (|dx| + |dy| = 1) — z-order provably fails this (its
    // boundary jumps are the motivation for the Hilbert key)
    val walk = keyed.sortBy(_._3)
    walk.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, h2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"jump at key $h2: ($x1,$y1)->($x2,$y2)")
    }
    // the codegen expression and the static loop are the same function
    keyed.foreach { case (x, y, h) =>
      assert(h === graft.functions.Hilbert.compute(x, y, bits))
    }
    // contrast pin: z-order at the same bits takes at least one non-adjacent step
    val zWalk = (for (x <- 0 until n; y <- 0 until n) yield {
      val z = (0 until bits).map(j =>
        (((x >> j) & 1).toLong << (2 * j)) | (((y >> j) & 1).toLong << (2 * j + 1)))
        .reduce(_ | _)
      (x.toLong, y.toLong, z)
    }).sortBy(_._3)
    assert(zWalk.sliding(2).exists { case Seq((x1, y1, _), (x2, y2, _)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1L
    })
  }

  test("property: zorderKey matches a plain-Scala Morton interleave") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def plain(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (z, j) =>
        z | (((x >> j) & 1L) << (2 * j)) | (((y >> j) & 1L) << (2 * j + 1))
      }
    val pairs = Gen.listOfN(200,
      Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)))(
      Gen.Parameters.default, Seed(7L)).get
    val got = pairs.toDF("x", "y")
      .select(graft.functions.ZOrder.zorderKey(col("x"), col("y")).as("z"))
      .as[Long].collect()
    got.zip(pairs).foreach { case (z, (x, y)) => assert(z === plain(x, y, 16)) }
    // interleave of maxed inputs fills all 32 low bits
    assert(plain(65535L, 65535L, 16) === (1L << 32) - 1)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, null-safely") {
    import spark.implicits._
    val a = Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, None), (4L, Some(4.0)))
      .toDF("k", "v")
    val b = Seq((1L, Some(1.0)), (2L, Some(9.0)), (3L, None), (5L, Some(5.0)))
      .toDF("k", "v")
    val out = graft.operators.Merges.snapshotDiff(a, b, "k", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", // null == null under null-safe compare
      4L -> "removed", 5L -> "added"))
    // a null KEY present in both snapshots is one compared row, not a
    // removed+added pair (the key join is null-safe too)
    val an = Seq((Some(1L), 1.0), (None, 7.0)).toDF("k", "v")
    val bn = Seq((Some(1L), 1.0), (None, 8.0)).toDF("k", "v")
    val outn = graft.operators.Merges.snapshotDiff(an, bn, "k", Seq("v"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1))
    assert(outn.toMap === Map(Some(1L) -> "unchanged", None -> "changed"))
    assert(outn.length === 2)
  }

  test("QualityChecks.audit: one count row per rule, violation queries counted exactly") {
    import spark.implicits._
    val tbl = Seq((1L, 5.0), (2L, -1.0), (2L, 3.0), (3L, -2.0)).toDF("k", "v")
    val out = graft.operators.QualityChecks.audit(Seq(
      "negative_v" -> tbl.filter(col("v") < 0),
      "dup_k" -> tbl.groupBy("k").agg(count(lit(1)).as("n")).filter(col("n") > 1),
      "never" -> tbl.filter(col("k") < 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("negative_v" -> 2L, "dup_k" -> 1L, "never" -> 0L))
  }

  test("keySkewReport: counts, shares and mean-ratios on a known skew; topN + tiebreak order") {
    import spark.implicits._
    // 8 rows over 4 keys: "hot" carries 5 → share 5/8, mean load 2 rows/key
    val tbl = (Seq.fill(5)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val out = graft.operators.QualityChecks.keySkewReport(tbl, "k", topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("hot", 5L, 5.0 / 8.0, 5.0 * 4.0 / 8.0),
      ("a", 1L, 1.0 / 8.0, 1.0 * 4.0 / 8.0),
      ("b", 1L, 1.0 / 8.0, 0.5)))
  }

  test("scd2: updated keys get closed+reopened versions; untouched keys stay open") {
    import spark.implicits._
    val cur = Seq((1L, 10.0, 100L), (2L, 20.0, 100L), (3L, 30.0, 100L))
      .toDF("k", "v", "valid_from")
    val upd = Seq((2L, 25.0, 200L)).toDF("k", "v", "ts")
    val out = graft.operators.Merges.scd2(cur, upd, "k", "ts")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.count(_._1 == 2L) === 2)
    assert(out.toSet.contains((2L, 20.0, 100L, Some(200L)))) // closed old version
    assert(out.toSet.contains((2L, 25.0, 200L, None)))       // open new version
    assert(out.toSet.contains((1L, 10.0, 100L, None)))       // untouched stays open
    assert(out.length === 4)
  }

  test("scd2 point-in-time lookup: one version per fact, predating facts drop") {
    import spark.implicits._
    val cur = Seq((1L, 10.0, 100L), (2L, 20.0, 100L)).toDF("k", "v", "valid_from")
    val upd = Seq((2L, 25.0, 200L)).toDF("k", "v", "ts")
    val hist = graft.operators.Merges.scd2(cur, upd, "k", "ts")
    val facts = Seq((1L, "a", 150L), (2L, "b", 150L), (2L, "c", 200L),
      (2L, "d", 250L), (1L, "early", 50L)).toDF("k", "fid", "ts")
    val out = graft.operators.Merges
      .pointInTimeLookup(facts, hist, Seq("k"), col("ts"))
      .select("fid", "v").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // boundary fact "c" (ts == update ts) sees the NEW version (half-open);
    // "early" predates every version and drops; everyone matches once
    assert(out === Map("a" -> 10.0, "b" -> 20.0, "c" -> 25.0, "d" -> 25.0))
  }

  test("cdc apply: latest change wins, deletes drop, inserts land, U beats D on ties") {
    import spark.implicits._
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val changes = Seq(
      (2L, "U", 21.0, 100L), (2L, "U", 22.0, 200L), // supersession: 22 wins
      (3L, "U", 31.0, 100L), (3L, "D", 0.0, 200L),  // later delete drops 3
      (4L, "U", 40.0, 100L),                        // insert
      (5L, "U", 50.0, 100L), (5L, "D", 0.0, 100L)   // tie: U over D
    ).toDF("k", "op", "v", "ts")
    val out = graft.operators.Merges.applyCdc(base, changes, "k", "ts")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 10.0, 2L -> 22.0, 4L -> 40.0, 5L -> 50.0))
  }

  test("scd2 aborts loudly on a batch with two updates for one key") {
    import spark.implicits._
    val cur = Seq((1L, 10.0, 100L)).toDF("k", "v", "valid_from")
    val upd = Seq((1L, 11.0, 200L), (1L, 12.0, 300L)).toDF("k", "v", "ts")
    val ex = intercept[Exception] {
      graft.operators.Merges.scd2(cur, upd, "k", "ts").collect()
    }
    assert(ex.getMessage.contains("scd2") ||
      Option(ex.getCause).exists(_.getMessage.contains("scd2")))
  }

  test("survivorsByScore aborts loudly when a clustered id has no score row") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster")
    val scores = Seq((1L, 5L)).toDF("id", "score") // id 2 unscored
    val ex = intercept[Exception] {
      graft.operators.Dedup.survivorsByScore(clusters, scores).collect()
    }
    assert(ex.getMessage.contains("survivorsByScore") ||
      Option(ex.getCause).exists(_.getMessage.contains("survivorsByScore")))
  }

  test("chunkDocs: stride/tail/short-doc contract on a fixture") {
    import spark.implicits._
    val fix = Seq(
      (1, (0 until 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2, "a b c"),                                     // shorter than a chunk
      (3, null.asInstanceOf[String])                    // null text → NO chunks
    ).toDF("doc_id", "text")
    val rows = CorpusOps.chunkDocs(fix, "doc_id", "text",
        chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_no")
      .select("doc_id", "chunk_no", "start_tok", "end_tok", "n_chunk_tokens", "chunk_text")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    // stride 3: starts 0,3,6 — tail chunk truncates to the doc end; every
    // token lands in >= 1 chunk; consecutive chunks overlap by 1 token
    assert(rows.toSeq === Seq(
      (1, 0, 0L, 3L, 4L, "w0 w1 w2 w3"),
      (1, 1, 3L, 6L, 4L, "w3 w4 w5 w6"),
      (1, 2, 6L, 9L, 4L, "w6 w7 w8 w9"),
      (2, 0, 0L, 2L, 3L, "a b c")))
    intercept[IllegalArgumentException] {
      CorpusOps.chunkDocs(fix, "doc_id", "text", chunkTokens = 4, overlap = 4)
    }
  }

  test("dsirWeights: fused literal path == two-pass join path bit-exactly; target docs score higher") {
    val rawLm = CorpusOps.unigramLm(docs, "doc_id", "text")
    val tgtLm = CorpusOps.unigramLm(
      docs.filter(col("source") === "src0"), "doc_id", "text")
    val fused = CorpusOps.dsirWeights(docs, "doc_id", "text", tgtLm, rawLm)
      .orderBy("doc_id").collect()
    // literalVocabMax = 0 forces the compose-two-logprob-passes fallback;
    // the fold contract promises the same addition sequence → bit equality
    val joined = CorpusOps.dsirWeights(docs, "doc_id", "text", tgtLm, rawLm,
        literalVocabMax = 0)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "lp_target", "lp_raw", "weight").collect()
    assert(fused.length === joined.length)
    fused.zip(joined).foreach { case (a, b) => assert(a === b) }
    // the importance ratio must actually prefer the target domain: src0
    // docs' mean weight strictly above the rest's
    val w = CorpusOps.dsirWeights(docs, "doc_id", "text", tgtLm, rawLm)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy(col("source") === "src0").agg(avg("weight").as("mw"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(w(true) > w(false),
      s"src0 mean weight ${w(true)} must exceed non-target ${w(false)}")
  }

  test("duplicateSpans merges overlapping windows; isolates separated spans; ignores solo docs") {
    import spark.implicits._
    // doc 1 & 2 share tokens 0..9 (10 tokens → three overlapping k=8
    // windows at pos 0,1,2 → ONE merged span [0,9]); doc 1 additionally
    // shares tokens 20..27 with doc 3 (one window → second span [20,27]);
    // doc 4 repeats its own 8-gram twice but shares nothing cross-doc.
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val tail1 = (0 until 10).map(i => s"a$i").mkString(" ")
    val lic = (0 until 8).map(i => s"l$i").mkString(" ")
    val fix = Seq(
      (1, s"$shared $tail1 $lic x1 x2"),
      (2, s"$shared b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"),
      (3, s"d0 d1 d2 d3 d4 d5 d6 d7 d8 d9 e0 e1 e2 e3 e4 e5 e6 e7 e8 e9 $lic f1 f2"),
      (4, "g0 g1 g2 g3 g4 g5 g6 g7 h0 g0 g1 g2 g3 g4 g5 g6 g7 h1")
    ).toDF("doc_id", "text")
    val spans = CorpusOps.duplicateSpans(fix, "doc_id", "text", k = 8)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(spans.toSeq === Seq(
      (1, 0, 9, 10), (1, 20, 27, 8),
      (2, 0, 9, 10),
      (3, 20, 27, 8)))
  }

  test("applyCutList keep-first: keeper copy survives, others excised, rescan finds no dups") {
    import spark.implicits._
    // doc 1 is the minimum doc containing BOTH duplicated regions (the
    // 10-token shared head with doc 2, the 8-token license block with
    // doc 3) → keeper twice, untouched; docs 2/3 lose exactly those spans.
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val lic = (0 until 8).map(i => s"l$i").mkString(" ")
    val fix = Seq(
      (1, s"$shared p0 p1 $lic x1 x2"),
      (2, s"$shared q0 q1 q2 q3"),
      (3, s"r0 r1 r2 r3 r4 r5 r6 r7 r8 r9 $lic f1 f2")
    ).toDF("doc_id", "text")
    val spans = CorpusOps.duplicateSpansKeepFirst(fix, "doc_id", "text", k = 8)
    val cleaned = CorpusOps.applyCutList(fix, spans, "doc_id", "text")
    val out = cleaned.collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1) === (s"$shared p0 p1 $lic x1 x2", 0L))
    assert(out(2) === ("q0 q1 q2 q3", 10L))
    assert(out(3) === ("r0 r1 r2 r3 r4 r5 r6 r7 r8 r9 f1 f2", 8L))
    // the Lee-et-al. loop-closure property: re-scanning the cleaned corpus
    // finds nothing left to cut — on the synthetic fixture AND on the real
    // documents table (cut-edge adjacencies must not conjure new windows)
    def rescan(c: org.apache.spark.sql.DataFrame): Long =
      CorpusOps.duplicateSpans(
        c.select(col("doc_id"), col("text_clean").as("text")),
        "doc_id", "text", k = 8).count()
    assert(rescan(cleaned) === 0L)
    val realSpans = CorpusOps.duplicateSpansKeepFirst(docs, "doc_id", "text", k = 8)
    val realClean = CorpusOps.applyCutList(docs, realSpans, "doc_id", "text")
    assert(rescan(realClean) === 0L)
  }

  test("property: HOF run/mode statistics match a plain-Scala oracle on random docs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def plainMaxRun(ts: Seq[String]): Long =
      if (ts.isEmpty) 0L
      else ts.foldLeft((("", 0L), 0L)) { case (((prev, run), best), t) =>
        val r = if (t == prev) run + 1 else 1L
        ((t, r), math.max(best, r))
      }._2
    val docGen = Gen.listOfN(40, Gen.oneOf("a", "b", "c", "aa")).map(_.mkString(" "))
    for (seed <- 1L to 5L) {
      val texts = Gen.listOfN(30, docGen)(Gen.Parameters.default, Seed(seed)).get
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = CorpusOps.repetitionSignals(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.split(" ", -1).toSeq
        val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        val expectMode = if (bigrams.isEmpty) 0L
          else bigrams.groupBy(identity).values.map(_.size).max.toLong
        assert(got(i.toLong)._1 === plainMaxRun(toks), s"max_run doc $i seed $seed")
        assert(got(i.toLong)._2 === expectMode, s"top_bigram_n doc $i seed $seed")
      }
    }
  }

  test("property: ewma HOF fold matches a plain-Scala fold on random series") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val vals = Gen.listOfN(25, Gen.chooseNum(-100.0, 100.0))(
        Gen.Parameters.default, Seed(seed)).get
      val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, i.toLong, v) }
        .toDF("k", "ts", "tie", "v")
      val got = graft.operators.TimeSeriesOps.ewmaPerKey(df, "k", "ts", "tie", "v", 0.25)
        .head().getDouble(2)
      val expect = vals.foldLeft(0.0)((acc, x) => acc * 0.75 + x * 0.25)
      assert(got === expect, s"seed $seed") // bit-exact: same fold order
    }
  }

  test("int8 quantization: |q| <= 127 and dequantization error <= scale/2") {
    val q = embs.limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("scale", Similarity.int8Scale(col("v")))
      .select(col("scale"), posexplode(col("v")))
      .select(col("scale"), col("col").as("x"),
        Similarity.int8Quantize(col("col"), col("scale")).as("q"))
    assert(q.filter(abs(col("q")) > 127).count() === 0)
    assert(q.filter(abs(col("q") * col("scale") - col("x")) > col("scale") / 2 + 1e-12).count() === 0)
  }

  test("qualityGate: each rule flag fires on its own violation; keep is the conjunction") {
    import spark.implicits._
    val df = Seq(
      // passes every rule: 23 tokens, mean length 112/23 ≈ 4.87 ∈ [4,5],
      // two stopwords (ratio 0.087), all bigrams distinct, no runs
      (0L, "the brave eagle soars where windy cliffs meet misty ocean spray " +
        "and every robin sings under amber light during early quiet spring dawn"),
      (1L, "the a of"), // violates r_len (3 tokens)
      (2L, ("the " * 20).trim + " a of mill pond glen"), // run of 'the' > 2 → r_run
      (3L, "the quick quick quick brown fox " + ("word pair " * 10).trim)
    ).toDF("doc_id", "text")
    val got = CorpusOps.qualityGate(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[Boolean]("keep"), "doc 0 should pass all rules")
    assert(!got(1L).getAs[Boolean]("r_len") && !got(1L).getAs[Boolean]("keep"))
    assert(!got(2L).getAs[Boolean]("r_run") && !got(2L).getAs[Boolean]("keep"))
    // doc 3: 'word pair' bigram repeats 10/25 > 0.1 → r_rep fires
    assert(!got(3L).getAs[Boolean]("r_rep") && !got(3L).getAs[Boolean]("keep"))
    // metrics are the t02/t12 fragments: spot-check doc 1 exactly
    assert(got(1L).getAs[Long]("n_tokens") === 3L)
    assert(got(1L).getAs[Double]("mean_token_len") === (8.0 - 2.0) / 3.0)
    // null text is EXCLUDED, not scored as a keep=NULL ghost row
    val withNull = Seq((0L, Option("the a of")), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    assert(CorpusOps.qualityGate(withNull, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("annRerank with an all-pass coarse stage == exact in-bucket top-k; " +
    "small coarseM returns a subset of the bucket candidates") {
    val q = embs.filter(col("vec_id") < 10)
    // coarseM >= any bucket size → coarse stage drops nothing → identical
    // to the exact-cosine bucketed ranking
    val rerank = Similarity.annRerankQuantized(q, embs, "vec_id", "embedding",
      k = 5, coarseM = 1000000)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val exact = Similarity.lshBucketedNeighbors(q, embs, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rerank === exact)
    // tight coarse stage: every survivor still comes from the query's bucket
    // (subset of the exact candidate ranking's id space), ranks contiguous
    val tight = Similarity.annRerankQuantized(q, embs, "vec_id", "embedding",
      k = 5, coarseM = 8)
    val perQuery = tight.groupBy("query_id").agg(
      count(lit(1)).as("n"), max(col("rank")).as("maxr")).collect()
    perQuery.foreach { r =>
      assert(r.getLong(1) <= 5L && r.getLong(1) === r.getInt(2).toLong)
    }
  }

  test("bigramLm + bigramLogprob: exact conditional counts, vocab cap, OOV floor") {
    import spark.implicits._
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    // bigrams: "a b"×2, "b a"×1, "b c"×1; contexts: a→2, b→2
    val lm = CorpusOps.bigramLm(df, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(lm("a b") === ((2L, 2L, 0.0)))
    assert(lm("b a") === ((1L, 2L, StrictMath.log(0.5))))
    assert(lm("b c") === ((1L, 2L, StrictMath.log(0.5))))
    // conditional normalization: Σ_w2 p(w2|w1) = 1 per context
    assert(math.exp(lm("b a")._3) + math.exp(lm("b c")._3) === 1.0)
    // cap = 2 keeps "a b" (n=2) then "b a" (tie on n=1 breaks by bigram
    // string) → "b c" goes OOV and scores the floor
    val capped = CorpusOps.bigramLm(df, "doc_id", "text", vocabCap = 2)
    val scored = CorpusOps.bigramLogprob(df, "doc_id", "text", capped, -20.0).head()
    assert(scored.getLong(1) === 4L)
    val expect = (((0.0 + 0.0) + StrictMath.log(0.5)) + 0.0 + -20.0) / 4
    assert(scored.getDouble(2) === expect) // bit-exact: same fold order
  }

  test("kneserNeyLm: all five statistics and the interpolated probability match by hand") {
    import spark.implicits._
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    // bigrams: "a b"×2, "b a"×1, "b c"×1; ctx: a→2 (1 continuation type),
    // b→2 (2 continuation types); left-context types: b←{a}=1, a←{b}=1,
    // c←{b}=1; N = 3 bigram types
    val rows = CorpusOps.kneserNeyLm(df, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    def kn(n: Long, ctx: Long, n1f: Long, n1b: Long, nbg: Long): Double =
      StrictMath.log(
        math.max(n - 0.75, 0.0) / ctx + (0.75 * n1f / ctx) * (n1b.toDouble / nbg))
    assert(rows("a b") === ((2L, 2L, 1L, 1L, 3L, kn(2, 2, 1, 1, 3))))
    assert(rows("b a") === ((1L, 2L, 2L, 1L, 3L, kn(1, 2, 2, 1, 3))))
    assert(rows("b c") === ((1L, 2L, 2L, 1L, 3L, kn(1, 2, 2, 1, 3))))
    // smoothing bites: an n=1 bigram keeps mass above the discount floor
    assert(math.exp(rows("b a")._6) > 0.0 && rows("b a")._6 < 0.0)
    // the scoring composition reuses bigramLogprob's exact fold
    val scored = CorpusOps.bigramLogprob(df, "doc_id", "text",
      CorpusOps.kneserNeyLm(df, "doc_id", "text")
        .select(col("bg"), col("lp")), -20.0).head()
    assert(scored.getLong(1) === 4L)
    val expect = (((0.0 + kn(2, 2, 1, 1, 3)) + kn(1, 2, 2, 1, 3)) +
      kn(2, 2, 1, 1, 3) + kn(1, 2, 2, 1, 3)) / 4
    assert(scored.getDouble(2) === expect) // bit-exact: same fold order
  }

  test("kneserNeyTrigramLm: exact 8-statistic counts, recursive backoff, scoring fold") {
    import spark.implicits._
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    // trigrams (each ×1): "a b a", "b a b", "a b c"
    // ctx3: (a,b) ctx=2 n1f=2; (b,a) ctx=1 n1f=1 — cont3: each pair 1
    // mid: w2=b mid_ctx=2 mid_n1f=2; w2=a mid_ctx=1 mid_n1f=1
    // unigram level (bigram types "a b","b a","b c"): n1b = 1 each, nbg=3
    val rows = CorpusOps.kneserNeyTrigramLm(df, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
          r.getDouble(9)))).toMap
    def kn3(n: Long, ctx: Long, n1f: Long, cont: Long, midCtx: Long,
            midN1f: Long, n1b: Long, nbg: Long): Double =
      StrictMath.log(
        math.max(n - 0.75, 0.0) / ctx + (0.75 * n1f / ctx) *
          (math.max(cont - 0.75, 0.0) / midCtx + (0.75 * midN1f / midCtx) *
            (n1b.toDouble / nbg)))
    assert(rows("a b a") ===
      ((1L, 2L, 2L, 1L, 2L, 2L, 1L, 3L, kn3(1, 2, 2, 1, 2, 2, 1, 3))))
    assert(rows("b a b") ===
      ((1L, 1L, 1L, 1L, 1L, 1L, 1L, 3L, kn3(1, 1, 1, 1, 1, 1, 1, 3))))
    assert(rows("a b c") ===
      ((1L, 2L, 2L, 1L, 2L, 2L, 1L, 3L, kn3(1, 2, 2, 1, 2, 2, 1, 3))))
    // backoff bites: every n=1 trigram keeps mass above the discount floor
    assert(rows.values.forall(v => v._9 < 0.0 && math.exp(v._9) > 0.0))
    // scoring refolds positions in order through the shared gram fold
    val scored = CorpusOps.trigramLogprob(df, "doc_id", "text",
      CorpusOps.kneserNeyTrigramLm(df, "doc_id", "text")
        .select(col("tg"), col("lp")), -20.0).head()
    assert(scored.getLong(1) === 3L)
    val expect3 = (((0.0 + kn3(1, 2, 2, 1, 2, 2, 1, 3)) +
      kn3(1, 1, 1, 1, 1, 1, 1, 3)) + kn3(1, 2, 2, 1, 2, 2, 1, 3)) / 3
    assert(scored.getDouble(2) === expect3)
    // a 2-token doc has no trigram and is absent; OOV floors at oovLp
    val mixed = Seq((1L, "a b"), (2L, "x y z")).toDF("doc_id", "text")
    val oov = CorpusOps.trigramLogprob(mixed, "doc_id", "text",
      CorpusOps.kneserNeyTrigramLm(df, "doc_id", "text")
        .select(col("tg"), col("lp")), -20.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(oov.keySet === Set(2L) && oov(2L) === ((1L, -20.0)))
  }

  test("pageRank bit-matches a plain-Scala fixed-iteration reference; mass conserved") {
    import spark.implicits._
    // path 1-2-3 plus isolated pair 4-5: asymmetric degrees on one
    // component, symmetric on the other
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = graft.operators.GraphOps.pageRank(pairs, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val edges = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 4L -> 5L, 5L -> 4L)
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val n = deg.size.toDouble
    var r = deg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) r = deg.keys.map { t =>
      // the operator's quantizedSum tree: floor-quantize each message to
      // 1e-18 fixed point, exact integer sum (BigInt = the DECIMAL(38,0)),
      // one conversion back to double
      val msumq = edges.filter(_._2 == t).map(_._1)
        .map(s => BigInt(math.floor(r(s) / deg(s) * 1e18).toLong)).sum
      t -> ((1.0 - 0.85) / n + 0.85 * (msumq.toDouble / 1e18))
    }.toMap
    assert(got.keySet === deg.keySet)
    deg.keys.foreach { id =>
      assert(got(id)._1 === deg(id).toLong, s"degree of $id")
      assert(got(id)._2 === r(id), s"pagerank of $id") // bit-exact: same fold
    }
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-12) // no dangling loss
  }

  test("weightedPageRank bit-matches a plain-Scala replica; mass conserved; uniform weights == unweighted ranks") {
    import spark.implicits._
    def q(x: Double): BigInt = BigInt(math.floor(x * 1e18).toLong)
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.5), (4L, 5L, 0.7))
      .toDF("id_a", "id_b", "w")
    val got = graft.operators.GraphOps.weightedPageRank(pairs, "w", iters = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val edges = Seq((1L, 2L, 0.9), (2L, 1L, 0.9), (2L, 3L, 0.5), (3L, 2L, 0.5),
      (4L, 5L, 0.7), (5L, 4L, 0.7))
    val strength = edges.groupBy(_._1).view
      .mapValues(es => es.map(e => q(e._3)).sum.toDouble / 1e18).toMap
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val n = deg.size.toDouble
    var r = deg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) r = deg.keys.map { t =>
      val msumq = edges.filter(_._2 == t)
        .map { case (s, _, w) => q(r(s) * (w / strength(s))) }.sum
      t -> ((1.0 - 0.85) / n + 0.85 * (msumq.toDouble / 1e18))
    }.toMap
    deg.keys.foreach { id =>
      val (gd, gs, gp) = got(id)
      assert(gd === deg(id).toLong, s"degree of $id")
      assert(gs === strength(id), s"strength of $id")
      assert(gp === r(id), s"pagerank of $id") // bit-exact: same quantized tree
    }
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-9)
    // uniform weights: w/strength == 1/deg exactly when w is a power of
    // two (0.5 here), so weighted ranks must bit-match the unweighted op
    val uni = Seq((1L, 2L), (2L, 3L), (4L, 5L))
    val wUni = graft.operators.GraphOps.weightedPageRank(
      uni.map { case (a, b) => (a, b, 0.5) }.toDF("id_a", "id_b", "w"),
      "w", iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val plain = graft.operators.GraphOps.pageRank(
      uni.toDF("id_a", "id_b"), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(wUni === plain)
  }

  test("recallAtK: rank-insensitive overlap, k-truncation on both sides, per-query rollup") {
    import spark.implicits._
    val exact = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L), (2L, 1, 20L))
      .toDF("query_id", "rank", "neighbor_id")
    // q1's approx finds 12 and 10 (different ranks — irrelevant) plus a
    // miss; its rank-4 hit on 11 is truncated at k=3. q2 recovers nothing.
    val approx = Seq((1L, 1, 12L), (1L, 2, 99L), (1L, 3, 10L), (1L, 4, 11L),
      (2L, 1, 21L)).toDF("query_id", "rank", "neighbor_id")
    val got = Similarity.recallAtK(approx, exact, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === Map(1L -> ((3L, 2L, 2.0 / 3.0)), 2L -> ((1L, 0L, 0.0))))
    // a malformed approx frame with duplicate (query, neighbor) rows must
    // not fan out the join and overstate n_exact/n_hit
    val dupApprox = approx.union(approx)
    val gotDup = Similarity.recallAtK(dupApprox, exact, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(gotDup === got)
  }

  test("property: keep-first cut list matches a plain-Scala replica on random docs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val k = 3
    // the operator's span merge is the EXACT union of window coverage, so
    // the replica can cut the union of [pos, pos+k-1] index sets directly
    def replica(docs: Seq[(Long, String)]): Map[Long, (String, Long)] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val wins = toks.toSeq.flatMap { case (id, ts) =>
        if (ts.size < k) Nil
        else (0 to ts.size - k).map(p => (id, p, ts.slice(p, p + k).mkString(" ")))
      }
      val keeper = wins.groupBy(_._3).collect {
        case (w, occ) if occ.map(_._1).distinct.size >= 2 => w -> occ.map(_._1).min
      }
      val cutIdx = wins
        .filter(w => keeper.get(w._3).exists(_ != w._1))
        .groupBy(_._1).view
        .mapValues(_.flatMap(w => w._2 until w._2 + k).toSet).toMap
      docs.map { case (id, _) =>
        val ts = toks(id)
        val cuts = cutIdx.getOrElse(id, Set.empty[Int])
        val kept = ts.zipWithIndex.collect { case (tok, i) if !cuts.contains(i) => tok }
        id -> ((kept.mkString(" "), (ts.size - kept.size).toLong))
      }.toMap
    }
    val docGen = Gen.choose(5, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    for (seed <- 1L to 5L) {
      val texts = Gen.listOfN(12, docGen)(Gen.Parameters.default, Seed(seed)).get
      val fixture = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = fixture.toDF("doc_id", "text")
      val spans = CorpusOps.duplicateSpansKeepFirst(df, "doc_id", "text", k = k)
      val got = CorpusOps.applyCutList(df, spans, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(got === replica(fixture), s"seed $seed")
    }
  }

  test("percentileGate: per-source percent_rank keep, unique order, bounds checked") {
    import spark.implicits._
    val scored = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.7), ("a", 4L, 0.6), ("a", 5L, 0.5),
      ("b", 6L, 0.1), ("b", 7L, 0.1) // tied scores: doc_id breaks the order
    ).toDF("source", "doc_id", "score")
    val out = CorpusOps.percentileGate(scored, "doc_id", "source", "score", 0.5)
      .collect().map(r => r.getLong(1) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    // source a: pct = (rn-1)/4 over score desc; source b: tie resolved by id
    assert(out === Map(
      1L -> ((0.0, true)), 2L -> ((0.25, true)), 3L -> ((0.5, true)),
      4L -> ((0.75, false)), 5L -> ((1.0, false)),
      6L -> ((0.0, true)), 7L -> ((1.0, false))))
    intercept[IllegalArgumentException] {
      CorpusOps.percentileGate(scored, "doc_id", "source", "score", 1.5)
    }
  }

  test("tokenBudgetMix: maximal hash-order prefix within √-temperature token budgets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "w1 w2 w3 w4"), (2L, "a", "x1 x2 x3"), (3L, "a", "y1 y2"),
      (4L, "a", "z1 z2 z3 z4 z5"), (5L, "b", "p1 p2"), (6L, "b", "q1 q2 q3"),
      (7L, "c", "r1")
    ).toDF("doc_id", "source", "text")
    val budget = 12L
    val got = CorpusOps.tokenBudgetMix(docs, "doc_id", "text", "source", budget)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"),
          r.getAs[Long]("target_tokens")))).toMap
    // plain-Scala replica: same hashes (read back from Spark's xxhash64 —
    // the order primitive, not the math under test), same √-weights folded
    // in source order, same floor(B·w/Σw) budgets, same strict-prefix fill
    val rows = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ", -1)).cast("long"), xxhash64(col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySrc = rows.groupBy(_._2)
    val w = bySrc.view.mapValues(ds => math.sqrt(ds.map(_._3).sum.toDouble)).toMap
    val sumW = w.toSeq.sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _)
    val expected = bySrc.flatMap { case (src, ds) =>
      val target = math.floor(budget.toDouble * w(src) / sumW).toLong
      var cum = 0L
      ds.toSeq.sortBy(d => (d._4, d._1)).flatMap { d =>
        cum += d._3 // skipped docs still advance the cumsum: STRICT prefix
        if (cum <= target) Some(d._1 -> ((d._3, cum, target))) else None
      }
    }.toMap
    assert(got === expected)
    assert(got.nonEmpty && got.size < rows.length) // budget actually binds
  }

  test("containmentPairs flags the quoted-subset pair that Jaccard misses") {
    import spark.implicits._
    import graft.operators.Dedup
    // doc2's 2 shingles are BOTH inside doc1's 5 → containment(2→1) = 1.0
    // while Jaccard = 2/5 = 0.4 sits under the d02 threshold — the
    // asymmetric case this operator exists for; the reverse direction
    // (1→2, 0.4) and the unrelated doc3 must not appear
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e"),
      (3L, "x y z w v")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((2L, 1L, 1.0)))
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count() === 0)
  }

  test("chunkDedupStats: first-occurrence canonical chunks, later copies counted") {
    import spark.implicits._
    import graft.operators.Multimodal
    val a64 = "a" * 64
    val b64 = "b" * 64
    // doc1 owns both full chunks; doc2 repeats A plus a distinct short tail
    // chunk; doc3 is a permutation of doc1 — all its chunks are dups
    val docs = Seq((1L, a64 + b64), (2L, a64 + ("b" * 10)), (3L, b64 + a64))
      .toDF("doc_id", "text")
    val got = Multimodal.chunkDedupStats(
      Multimodal.asMediaTable(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((2L, 0L)), 2L -> ((2L, 1L)), 3L -> ((2L, 2L))))
  }

  test("anomalyZScores: trailing-frame moments, spike flagged, zero-variance guarded") {
    import spark.implicits._
    // key 1: 1..5 then a 100 spike — frame mean 3, variance 2.5, huge z;
    // key 2: constant 10s then 99 — zero variance must yield NO flag and a
    // null z (a 0/0 or x/0 z would be NaN/Inf), however large the jump
    val rows =
      (1 to 6).map(i => (1L, i.toLong, i.toLong, if (i == 6) 100.0 else i.toDouble)) ++
        (1 to 6).map(i => (2L, i.toLong, i.toLong, if (i == 6) 99.0 else 10.0))
    val got = graft.operators.TimeSeriesOps.anomalyZScores(
      rows.toDF("k", "ts", "tie", "v"), "k", "ts", "tie", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Double]),
          r.getBoolean(6)))).toMap
    val zExp = BigDecimal((100.0 - 3.0) / math.sqrt(2.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, 6L)) === ((5L, Some(zExp), true)))
    assert(got((2L, 6L)) === ((5L, None, false))) // zero variance
    assert(got((1L, 1L)) === ((0L, None, false))) // empty frame
    assert(got((1L, 4L)) === ((3L, None, false))) // below minPrev
  }

  test("triangleStats: counts/clustering match brute force; input canonicalization") {
    import spark.implicits._
    // K4 (every node in 3 triangles), a triangle-free path 5-6-7, a pendant
    // 8 on node 1, plus reversed duplicates and a self-loop to exercise
    // canonicalization — results must be those of the simple graph
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L), (1L, 8L),
      (2L, 1L), (3L, 1L), (7L, 7L)).toDF("id_a", "id_b")
    val got = graft.operators.GraphOps.triangleStats(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val und = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L), (1L, 8L))
    val nodes = und.flatMap(e => Set(e._1, e._2))
    def adj(a: Long, b: Long) = und.contains((math.min(a, b), math.max(a, b)))
    nodes.foreach { v =>
      val others = (nodes - v).toSeq.sorted
      val deg = others.count(adj(v, _)).toLong
      val tri = (for {
        i <- others; j <- others if i < j && adj(v, i) && adj(v, j) && adj(i, j)
      } yield 1).size.toLong
      val (gd, gt, gc) = got(v)
      assert(gd === deg, s"degree of $v")
      assert(gt === tri, s"triangles of $v")
      val expC = if (deg >= 2) 2.0 * tri / (deg * (deg - 1)) else 0.0
      assert(gc === expC, s"clustering of $v")
    }
    assert(got.keySet === nodes) // self-loop contributes no node or degree
  }

  /** Plain-Scala fixed-round peel replica for [[graft.operators.GraphOps.kCore]]. */
  private def peelRef(und: Set[(Long, Long)], k: Int, rounds: Int): Map[Long, (Long, Long)] = {
    var alive = und.flatMap(e => Set(e._1, e._2))
    for (_ <- 1 to rounds) {
      val kept = und.filter(e => alive(e._1) && alive(e._2))
      val deg = kept.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
      alive = alive.filter(v => deg.getOrElse(v, 0L) >= k)
    }
    val fullDeg = und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val coreE = und.filter(e => alive(e._1) && alive(e._2))
    val coreDeg = coreE.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    alive.map(v => v -> ((fullDeg(v), coreDeg.getOrElse(v, 0L)))).toMap
  }

  test("kCore: matches the plain-Scala peel; converged peel is the exact core; chain peels away") {
    import spark.implicits._
    // K4 core + a pendant chain 4-9-10-11 hanging off it + an isolated
    // triangle (its own 2-core) + reversed dup and self-loop for
    // canonicalization. k=2: the chain must peel end-inward (needs >1
    // round), K4 and the triangle survive.
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L), (9L, 10L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (2L, 1L), (9L, 9L)).toDF("id_a", "id_b")
    val und = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L), (9L, 10L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
    val got = graft.operators.GraphOps.kCore(pairs, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === peelRef(und, 2, 4))
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 20L, 21L, 22L)) // chain fully peeled
    assert(got(4L) === ((4L, 3L))) // full degree 4 (chain edge), core degree 3
    // one round is NOT enough for the chain (11 peels, 10 survives round 1)
    val oneRound = graft.operators.GraphOps.kCore(pairs, k = 2, rounds = 1).collect()
      .map(_.getLong(0)).toSet
    assert(oneRound === peelRef(und, 2, 1).keySet)
    assert(oneRound.contains(10L) && !oneRound.contains(11L))
    // k above the max core → empty survivors
    assert(graft.operators.GraphOps.kCore(pairs, k = 4, rounds = 4).count() === 0L)
  }

  test("kCoreProfile: equals per-k kCore aggregates; survivors monotone non-increasing in k") {
    import spark.implicits._
    // K4 + chain + triangle (the kCore fixture): degeneracy 3 (K4's core)
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L), (9L, 10L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val prof = graft.operators.GraphOps.kCoreProfile(pairs, Seq(1, 2, 3, 4), rounds = 4)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    for (k <- Seq(1, 2, 3, 4)) {
      val core = graft.operators.GraphOps.kCore(pairs, k, rounds = 4)
      val nodes = core.count()
      val edges = if (nodes == 0) -1L
        else core.agg((sum(col("core_degree")) / 2).cast("long")).head().getLong(0)
      assert(prof(k) === ((nodes, edges)), s"profile row k=$k")
    }
    // the curve: all 10 nodes at k=1, K4+triangle at k=2, K4 alone at k=3, end at 4
    assert(prof(1)._1 === 10L && prof(2)._1 === 7L &&
      prof(3) === ((4L, 6L)) && prof(4) === ((0L, -1L)))
    val survivors = Seq(1, 2, 3, 4).map(prof(_)._1)
    assert(survivors === survivors.sorted.reverse)
  }

  /** Plain-Scala replica of the SEQUENTIAL fixed-round decomposition
    * (level k resumes from level k−1's survivors).
    */
  private def corenessRef(und: Set[(Long, Long)], kMax: Int,
                          rounds: Int): Map[Long, Long] = {
    val all = und.flatMap(e => Set(e._1, e._2))
    var alive = all
    val label = scala.collection.mutable.Map.empty[Long, Long]
    for (k <- 1 to kMax) {
      for (_ <- 1 to rounds) {
        val kept = und.filter(e => alive(e._1) && alive(e._2))
        val deg = kept.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        alive = alive.filter(v => deg.getOrElse(v, 0) >= k)
      }
      alive.foreach(v => label(v) = k.toLong)
    }
    all.map(v => v -> label.getOrElse(v, 0L)).toMap
  }

  test("corenessDecomposition: matches the sequential peel; exact coreness; curve derives from labels") {
    import spark.implicits._
    // K4 + pendant chain + triangle (the kCore fixture): true coreness is
    // 3 on K4 (incl. node 4 despite its chain edge), 1 on the chain,
    // 2 on the triangle — 4 converged rounds per level reach it exactly
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L), (9L, 10L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (2L, 1L), (9L, 9L)).toDF("id_a", "id_b")
    val und = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L), (9L, 10L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
    val got = graft.operators.GraphOps.corenessDecomposition(pairs, 4, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === corenessRef(und, 4, 4))
    assert(got(1L) === 3L && got(4L) === 3L)
    assert(got(9L) === 1L && got(11L) === 1L)
    assert(got(20L) === 2L && got(22L) === 2L)
    // the whole degeneracy curve derives from ONE decomposition: nodes
    // (and und edges) with coreness ≥ k == kCoreProfile's per-k peel
    val prof = graft.operators.GraphOps.kCoreProfile(pairs, Seq(1, 2, 3, 4), rounds = 4)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    for (k <- 1 to 4) {
      val nodes = got.count(_._2 >= k).toLong
      val edges = und.count(e => got(e._1) >= k && got(e._2) >= k).toLong
      assert((nodes, if (nodes == 0) -1L else edges) === prof(k), s"curve k=$k")
    }
  }

  test("degreeAssortativity: matches a plain-Scala Pearson; star graph is degenerate-negative") {
    import spark.implicits._
    // square + diagonal + pendant (mixed degrees), canonicalization noise
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (4L, 5L),
      (2L, 1L), (5L, 5L)).toDF("id_a", "id_b")
    val und = Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L), (4L, 5L))
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sym = und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val xs = sym.map { case (s, t) => (deg(s).toDouble, deg(t).toDouble) }
    val m = xs.size.toDouble
    val sx = xs.map(_._1).sum; val sxx = xs.map(x => x._1 * x._1).sum
    val sxy = xs.map(x => x._1 * x._2).sum
    val expected = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    val row = graft.operators.GraphOps.degreeAssortativity(pairs).collect().head
    assert(row.getLong(0) === deg.size.toLong)
    assert(row.getLong(1) === und.size.toLong)
    assert(math.abs(row.getDouble(2) - expected) < 1e-12)
    // star: every edge pairs the hub (deg n-1) with a leaf (deg 1) →
    // strongly negative assortativity
    val star = (2L to 7L).map(l => (1L, l)).toDF("id_a", "id_b")
    val r = graft.operators.GraphOps.degreeAssortativity(star).collect().head.getDouble(2)
    assert(r < -0.5)
  }

  test("nodeSimilarity: scores match brute force; canonicalization; hub cap") {
    import spark.implicits._
    // square 1-2-3-4-1 with one diagonal (1,3), pendant 5 on 4, plus a
    // reversed duplicate and a self-loop to exercise canonicalization
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (4L, 5L),
      (2L, 1L), (5L, 5L)).toDF("id_a", "id_b")
    val und = Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L), (4L, 5L))
    val nodes = und.flatMap(e => Set(e._1, e._2))
    def nbrs(v: Long) = nodes.filter(o =>
      und.contains((math.min(v, o), math.max(v, o))) && o != v)
    val got = graft.operators.GraphOps.nodeSimilarity(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    val expPairs = for {
      a <- nodes.toSeq.sorted; b <- nodes.toSeq.sorted
      if a < b && (nbrs(a) intersect nbrs(b)).nonEmpty
    } yield (a, b)
    assert(got.keySet === expPairs.toSet)
    expPairs.foreach { case (a, b) =>
      val inter = (nbrs(a) intersect nbrs(b)).toSeq.sorted
      val (c, j, aa, e) = got((a, b))
      assert(c === inter.size.toLong, s"common of ($a,$b)")
      assert(j === inter.size.toDouble /
        (nbrs(a).size + nbrs(b).size - inter.size), s"jaccard of ($a,$b)")
      // bit-exact: same quantize-then-exact-sum tree as quantizedSum
      assert(aa === inter.map(ctr =>
        BigInt(math.floor(1.0 / nbrs(ctr).size.toDouble * 1e18).toLong))
        .sum.toDouble / 1e18, s"ra_index of ($a,$b)")
      assert(e === und.contains((a, b)), s"is_edge of ($a,$b)")
    }
    // bridge audit: edge (4,5) has zero common neighbors (5's only
    // neighbor is 4) so the default frame misses it; the flag unions it in
    // with zeroed scores and every true edge is now present
    val audited = graft.operators.GraphOps
      .nodeSimilarity(pairs, includeZeroCommonEdges = true).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(audited.keySet === expPairs.toSet + ((4L, 5L)))
    assert(audited((4L, 5L)) === ((0L, 0.0, 0.0, true)))
    assert(und.forall(e => audited.contains(e)), "every edge must have a row")
    expPairs.foreach(p => assert(audited(p) === got(p), s"flag must not perturb $p"))

    // hub cap: center 1 (degree 3) and center 4 (degree 3) dropped at cap 2
    // leaves only wedges through degree-<=2 centers (2, 3, 5)
    val capped = graft.operators.GraphOps
      .nodeSimilarity(pairs, maxCenterDegree = Some(2)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expCapped = (for {
      a <- nodes.toSeq.sorted; b <- nodes.toSeq.sorted
      if a < b && (nbrs(a) intersect nbrs(b)).exists(c => nbrs(c).size <= 2)
    } yield (a, b)).toSet
    assert(capped === expCapped)
  }

  test("property: triangleStats matches brute force on random multigraph pair lists") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    for (seed <- 1L to 3L) {
      // raw pair lists with duplicates, reversals and self-loops — the
      // operator must behave as if given the canonical simple graph
      val pairs = Gen.listOfN(30, for {
        a <- Gen.chooseNum(1L, 12L); b <- Gen.chooseNum(1L, 12L)
      } yield (a, b))(Gen.Parameters.default, Seed(seed)).get
      val und = pairs.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b))
      }.toSet
      if (und.nonEmpty) {
        val got = graft.operators.GraphOps.triangleStats(
          pairs.toDF("id_a", "id_b")).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
          .toMap
        val nodes = und.flatMap(e => Set(e._1, e._2))
        def adj(a: Long, b: Long) = und.contains((math.min(a, b), math.max(a, b)))
        assert(got.keySet === nodes, s"node set, seed $seed")
        nodes.foreach { v =>
          val others = (nodes - v).toSeq.sorted
          val deg = others.count(adj(v, _)).toLong
          val tri = (for {
            i <- others; j <- others
            if i < j && adj(v, i) && adj(v, j) && adj(i, j)
          } yield 1).size.toLong
          val expC = if (deg >= 2) 2.0 * tri / (deg * (deg - 1)) else 0.0
          assert(got(v) === ((deg, tri, expC)), s"node $v seed $seed")
        }
      }
    }
  }

  test("property: BPE train+encode counts match a plain-Scala replica on random docs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val rounds = 3
    for (seed <- 1L to 3L) {
      val texts = Gen.listOfN(20,
        Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n,
          Gen.chooseNum(1, 5).flatMap(l => Gen.listOfN(l, Gen.oneOf("a", "b", "c"))
            .map(_.mkString)))
          .map(_.mkString(" "))))(Gen.Parameters.default, Seed(seed)).get
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // plain-Scala replica of the trainer + encoder: the same spaced-string
      // representation and the same leftmost-non-overlapping replace
      val words = texts.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      val wc = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var sym = wc.keys.map(w => w -> (" " + w.split("").mkString(" ") + " ")).toMap
      var merges = List.empty[(String, String)]
      for (_ <- 1 to rounds) {
        val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
        sym.foreach { case (w, s) =>
          val sp = s.trim.split(" ")
          sp.sliding(2).filter(_.length == 2).foreach { p =>
            pairCounts((p(0), p(1))) =
              pairCounts.getOrElse((p(0), p(1)), 0L) + wc(w)
          }
        }
        if (pairCounts.nonEmpty) {
          val (l, r) = pairCounts.toSeq
            .sortBy { case ((l, r), c) => (-c, l, r) }.head._1
          merges = merges :+ ((l, r))
          sym = sym.view.mapValues(_.replace(s" $l $r ", s" $l$r ")).toMap
        }
      }
      val expect = texts.zipWithIndex.map { case (t, i) =>
        val toks = t.split(" ", -1).filter(_.nonEmpty)
        i.toLong -> ((toks.length.toLong,
          toks.map(w => sym(w).trim.split(" ").length.toLong).sum))
      }.toMap
      val trained = CorpusOps.bpeMerges(df, "doc_id", "text", rounds)
      val got = CorpusOps.bpeTokenCounts(df, "doc_id", "text", trained)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got === expect, s"seed $seed merges=$merges")
    }
  }

  test("property: qualityGate metrics and flags match a plain-Scala oracle on random docs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val vocab = Seq("the", "a", "of", "and", "is", "word", "pair", "mill",
      "pond", "glen", "quick", "brown")
    val stop = Set("the", "a", "of", "and", "is")
    for (seed <- 1L to 3L) {
      val texts = Gen.listOfN(30,
        Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))
          .map(_.mkString(" "))))(Gen.Parameters.default, Seed(seed)).get
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = CorpusOps.qualityGate(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r).toMap
      texts.zipWithIndex.foreach { case (text, i) =>
        val tk = text.split(" ", -1).toSeq
        val n = tk.size
        val meanLen = (text.length - (n - 1)).toDouble / n
        val stopR = tk.count(stop).toDouble / n
        val bg = tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        val topBg = if (bg.isEmpty) 0.0
          else bg.groupBy(identity).values.map(_.size).max.toDouble / bg.size
        val run = tk.foldLeft((0L, "", 0L)) { case ((best, prev, cur), t) =>
          val c = if (t == prev) cur + 1 else 1L
          (math.max(best, c), t, c)
        }._1
        val r = got(i.toLong)
        assert(r.getAs[Long]("n_tokens") === n.toLong, s"n doc $i seed $seed")
        assert(r.getAs[Double]("mean_token_len") === meanLen, s"ml doc $i seed $seed")
        assert(r.getAs[Double]("stopword_ratio") === stopR, s"sr doc $i seed $seed")
        assert(r.getAs[Double]("top_bigram_frac") === topBg, s"bg doc $i seed $seed")
        assert(r.getAs[Long]("max_run") === run, s"run doc $i seed $seed")
        val keep = (n >= 20 && n <= 90) && (meanLen >= 4.0 && meanLen <= 5.0) &&
          stopR >= 0.03 && topBg <= 0.1 && run <= 2
        assert(r.getAs[Boolean]("keep") === keep, s"keep doc $i seed $seed")
      }
    }
  }

  test("property: bigramLogprob matches a plain-Scala LM + ordered fold on random docs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val vocab = Seq("aa", "bb", "cc", "dd")
    for (seed <- 1L to 3L) {
      val texts = Gen.listOfN(20,
        Gen.chooseNum(2, 25).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))
          .map(_.mkString(" "))))(Gen.Parameters.default, Seed(seed)).get
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // plain-Scala LM: bigram counts, first-token context sums, ln(n/ctx)
      val allBg = texts.flatMap(_.split(" ", -1).toSeq.sliding(2)
        .filter(_.size == 2).map(_.mkString(" ")))
      val bgN = allBg.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ctxN = bgN.groupBy(_._1.split(" ", -1)(0)).view
        .mapValues(_.values.sum).toMap
      val lp = bgN.map { case (bg, n) =>
        bg -> StrictMath.log(n.toDouble / ctxN(bg.split(" ", -1)(0)))
      }
      val lm = CorpusOps.bigramLm(df, "doc_id", "text")
      val got = CorpusOps.bigramLogprob(df, "doc_id", "text", lm, -20.0)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      texts.zipWithIndex.foreach { case (text, i) =>
        val bgs = text.split(" ", -1).toSeq.sliding(2)
          .filter(_.size == 2).map(_.mkString(" ")).toSeq
        val sum = bgs.foldLeft(0.0)((acc, bg) => acc + lp.getOrElse(bg, -20.0))
        assert(got(i.toLong)._1 === bgs.size.toLong, s"nb doc $i seed $seed")
        assert(got(i.toLong)._2 === sum / bgs.size, s"mean doc $i seed $seed")
      }
    }
  }

  test("bpeMerges learns hand-computed merges with deterministic tie-breaks") {
    import spark.implicits._
    // the classic BPE example: low x5, lower x2, lowest x1
    val docs = Seq((1L, (("low " * 5).trim + " lower lower lowest")))
      .toDF("doc_id", "text")
    val got = CorpusOps.bpeMerges(docs, "doc_id", "text", rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // round 1: (l,o) and (o,w) tie at 8 → lowest left symbol wins
    assert(got === Array(
      (1, "l", "o", "lo", 8L),
      (2, "lo", "w", "low", 8L),
      (3, "low", "e", "lowe", 3L)))
  }

  test("bpeEncodedVocab + bpeTokenCounts apply learned merges; hand-traced counts") {
    import spark.implicits._
    // words: aaab x2, ab x2, b x1. Round 1: (a,a)=4 ties (a,b)=4 → lowest
    // left wins, merge (a,a)→aa; ' a a a b ' → ' aa a b ' (non-overlapping
    // left-to-right). Round 2: (a,b)=4 beats (aa,a)=2 → merge (a,b)→ab.
    val docs = Seq((1L, "aaab aaab ab"), (2L, "ab b")).toDF("doc_id", "text")
    val merges = CorpusOps.bpeMerges(docs, "doc_id", "text", rounds = 2)
    assert(merges.orderBy("round").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      === Array((1, "a", "a", "aa", 4L), (2, "a", "b", "ab", 4L)))
    val enc = CorpusOps.bpeEncodedVocab(docs, "text", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(enc === Map("aaab" -> Seq("aa", "ab"), "ab" -> Seq("ab"), "b" -> Seq("b")))
    val counts = CorpusOps.bpeTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(counts === Map(1L -> ((3L, 5L)), 2L -> ((2L, 2L))))
  }

  test("fused PQ codebook training bit-matches per-subspace kmeansCentroids") {
    val fused = Similarity.pqCodebooks(embs, "vec_id", "embedding")
    val sub = 16 // 64-dim fixtures, 4 subspaces
    (0 until 4).foreach { s =>
      val perSlice = Similarity.kmeansCentroids(
        embs.select(col("vec_id"),
          expr(s"slice(cast(embedding as array<double>), ${s * sub + 1}, $sub)")
            .as("sv")),
        "vec_id", "sv")
      assert(fused(s).map(_.toSeq).toSeq === perSlice.map(_.toSeq).toSeq,
        s"subspace $s")
    }
  }

  test("pqSearch with an all-pass coarse stage == brute-force cosine top-k") {
    val q = embs.filter(col("vec_id") < 10)
    // coarseM >= corpus size → ADC drops nothing → the exact re-rank sees
    // every candidate and must reproduce the brute-force ranking exactly
    val pq = Similarity.pqSearch(q, embs, "vec_id", "embedding",
      k = 5, coarseM = 1000000)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    val exact = Similarity.cosineTopK(q, embs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(pq === exact)
  }

  test("ivfPqSearch probing every cell with an all-pass coarse == brute-force top-k") {
    val q = embs.filter(col("vec_id") < 10)
    val ivfpq = Similarity.ivfPqSearch(q, embs, "vec_id", "embedding",
      k = 5, nProbe = 16, coarseM = 1000000)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    val exact = Similarity.cosineTopK(q, embs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(ivfpq === exact)
  }

  test("residual ivfPqSearch probing every cell with an all-pass coarse == brute-force top-k") {
    // the residual decomposition ⟨q,c⟩ + table fold changes ADC scores but
    // never the exact re-rank — with nothing cut, residual must also
    // reproduce brute force (and its adc column differs from raw's, which
    // is why only ids/cosines are compared)
    val q = embs.filter(col("vec_id") < 10)
    val ivfpq = Similarity.ivfPqSearch(q, embs, "vec_id", "embedding",
      k = 5, nProbe = 16, coarseM = 1000000, residual = true)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    val exact = Similarity.cosineTopK(q, embs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(ivfpq === exact)
  }

  test("cellOccupancyDrift: over-filled cell carries the chi2 mass; balanced batch is flat") {
    import spark.implicits._
    // two tight clusters around (1,0) and (0,1); corpus is balanced 4/4
    def around(base: (Double, Double), eps: Double*) =
      eps.map(e => Seq(base._1 + e, base._2 - e))
    val corpus = (around((1.0, 0.0), 0.0, 0.01, 0.02, 0.03) ++
      around((0.0, 1.0), 0.0, 0.01, 0.02, 0.03))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    // fresh: 6 near cluster A, 0 near B — all drift mass lands on A's cell
    val skewed = around((1.0, 0.0), 0.001, 0.011, 0.021, 0.031, 0.041, 0.051)
      .zipWithIndex.map { case (v, i) => (100L + i, v) }
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.cellOccupancyDrift(
      corpus, skewed, "vec_id", "embedding", nCells = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(got.size === 2)
    val (hot, cold) = (got.values.find(_._2 == 6L).get, got.values.find(_._2 == 0L).get)
    assert(hot._1 === 4L && cold._1 === 4L)
    // expectation is 3/3; chi2 contribs: (6-3)^2/3 = 3 and (0-3)^2/3 = 3
    assert(hot._3 === 3.0 && cold._3 === 3.0)
    // a corpus-proportional batch is flat: contrib exactly 0 per cell
    val balanced = (around((1.0, 0.0), 0.005) ++ around((0.0, 1.0), 0.005))
      .zipWithIndex.map { case (v, i) => (200L + i, v) }
      .toDF("vec_id", "embedding")
    val flat = graft.operators.Similarity.cellOccupancyDrift(
      corpus, balanced, "vec_id", "embedding", nCells = 2)
      .collect().map(_.getDouble(4))
    assert(flat.forall(_ === 0.0))
  }

  test("hardNegatives probing every cell == brute-force different-label top-k") {
    val q = embs.filter(col("vec_id") < 10)
    val got = graft.operators.Similarity.hardNegatives(q, embs,
      "vec_id", "embedding", "label", k = 5, nCentroids = 16, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    // brute force: the s02 window shape with the label INEQUALITY
    val v = col("embedding").cast("array<double>")
    val qs = q.select(col("vec_id").as("query_id"), v.as("qv"),
      col("label").as("ql"))
    val cs = embs.select(col("vec_id").as("neighbor_id"), v.as("nv"),
      col("label").as("nl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    val exact = qs.crossJoin(cs)
      .filter(col("query_id") =!= col("neighbor_id") && col("ql") =!= col("nl"))
      .withColumn("cosine", graft.operators.Similarity.dot(col("qv"), col("nv")) /
        (graft.operators.Similarity.l2norm(col("qv")) *
          graft.operators.Similarity.l2norm(col("nv"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toMap
    assert(got === exact)
    // every mined negative genuinely has a different label
    val labels = embs.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Any]("label")).toMap
    got.foreach { case ((qid, _), (nid, _)) =>
      assert(labels(qid) !== labels(nid), s"$qid -> $nid shares the label")
    }
  }

  test("residual PQ recall >= raw PQ recall at equal code budget (r10 verdict gate)") {
    // the point of residual encoding: the same subspaces×codebookK code
    // budget describes within-cell variation instead of re-describing cell
    // means, so the ADC ordering cuts fewer true neighbors. Hits are
    // summed across queries AND across three coarse budgets so a one-query
    // tie can't mask a regression (sf0.01 measurement: 0.204/0.316/0.448
    // residual vs 0.176/0.296/0.376 raw at coarseM 5/10/20).
    val q = embs.filter(col("vec_id") < 25)
    val exact = Similarity.cosineTopK(q, embs, "vec_id", "embedding", 5)
    def hits(residual: Boolean): Long = Seq(5, 10, 20).map { cm =>
      Similarity.recallAtK(
        Similarity.ivfPqSearch(q, embs, "vec_id", "embedding",
          k = 5, nProbe = 2, coarseM = cm, residual = residual),
        exact, 5).agg(sum("n_hit")).head().getLong(0)
    }.sum
    val (res, raw) = (hits(residual = true), hits(residual = false))
    assert(res >= raw, s"residual hits $res < raw hits $raw at equal budget")
  }

  test("contaminationScreen: leaked doc frac 1, partial quote mid-frac, clean doc zeros, short doc guarded") {
    import spark.implicits._
    val benchText = (1 to 12).map(i => s"bench$i").mkString(" ") // 12 tokens
    val bench = Seq((1L, benchText), (2L, "other eval doc with eight plus tokens in it yes")).toDF("doc_id", "text")
    val corpus = Seq(
      (100L, benchText),                                  // verbatim leak
      (101L, "clean text " + (1 to 10).map(i => s"c$i").mkString(" ")),
      (102L, (1 to 6).map(i => s"bench$i").mkString(" ") + " then diverges " +
        (1 to 6).map(i => s"x$i").mkString(" ")),         // shares no FULL 8-gram
      (103L, "tiny doc")).toDF("doc_id", "text")          // < 8 tokens
    val got = graft.operators.CorpusOps.contaminationScreen(
      corpus, bench, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === Set(100L, 101L, 102L, 103L)) // complete audit
    val (g100, h100, b100, f100) = got(100L)
    assert(g100 === 5L && h100 === 5L && b100 === 1L && f100 === 1.0)
    assert(got(101L)._2 === 0L && got(101L)._4 === 0.0)
    assert(got(102L)._2 === 0L, "a 6-token overlap cannot form an 8-gram")
    assert(got(103L) === ((0L, 0L, 0L, 0.0))) // no grams, no division
    // a 9-token prefix overlap DOES form 8-grams and yields a partial frac
    val partial = graft.operators.CorpusOps.contaminationScreen(
      Seq((200L, (1 to 9).map(i => s"bench$i").mkString(" ") + " " +
        (1 to 8).map(i => s"y$i").mkString(" "))).toDF("doc_id", "text"),
      bench, "doc_id", "text", k = 8).head()
    assert(partial.getLong(2) === 2L) // shingles at offsets 0 and 1 hit
    assert(partial.getDouble(4) === 2.0 / 10.0)
  }

  test("editDistancePairs: prefix filtering loses NO pair vs brute force; bound respected") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // random strings over a 4-letter alphabet: lots of shared grams (hub
    // grams rank last and leave the prefixes — the df-cut built into the
    // theorem), plus engineered near-dups at known distances
    for (seed <- 1L to 3L) {
      val base = Gen.listOfN(12,
        Gen.listOfN(20, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))(
        Gen.Parameters.default, Seed(seed)).get
      val docs = base.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
        Seq((100L, base.head.drop(2)),              // 2 deletions
          (101L, "xx" + base(1).drop(2)),           // 2 substitutions
          (102L, base(2).take(10) + "zz" + base(2).drop(10)), // 2 insertions
          // gram-poor pairs — BOTH sides under q·maxDist+1 distinct grams,
          // outside the prefix theorem (ADVICE r11): disjoint gram sets at
          // distance 1 ('ab'/'ac' at q=2), a sub-q-length string vs a
          // q-length neighbor, and a repetitive string whose distinct-gram
          // count stays tiny at any length
          (110L, "ab"), (111L, "ac"),               // dist 1, zero shared grams
          (112L, "a"), (113L, "aa"),                // len<q vs len=q
          (114L, "ababababab"), (115L, "babababa")) // repetitive, gram-poor
      val got = graft.operators.Dedup.editDistancePairs(
        docs.toDF("doc_id", "title"), "doc_id", "title", maxDist = 3, q = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expect = (for {
        (ia, sa) <- docs; (ib, sb) <- docs
        if ia < ib && math.abs(sa.length - sb.length) <= 3
        d = lev(sa, sb) if d <= 3
      } yield (ia, ib) -> d.toLong).toMap
      assert(got === expect, s"seed $seed") // completeness: theorem, not luck
      assert(expect.contains((0L, 100L)) && expect.contains((2L, 102L)),
        s"seed $seed: engineered near-dups must be in the truth set")
    }
  }

  test("incrementalEditDistancePairs: fresh-vs-corpus only, complete vs brute force, unseen grams screen exactly") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val corpus = Seq((1L, "abcabcabcabcabcabcab"), (2L, "dddcbadddcbadddcbadd"),
      (3L, "aabbccddaabbccddaabb"),
      (4L, "xy")) // gram-poor corpus string (short-pool path)
    // fresh 10: 2 edits from corpus 1; fresh 11: made of grams the corpus
    // has never seen (df-0 ordering path) and far from everything;
    // fresh 12: 3 substitutions from corpus 3; fresh 13: gram-poor with a
    // gram set DISJOINT from its gram-poor corpus neighbor — the prefix
    // theorem's blind spot, must come through the short pool (ADVICE r11)
    val fresh = Seq((10L, "abcabcabXabcabcabcaY"), (11L, "zzzzyyyyzzzzyyyyzzzz"),
      (12L, "aabbccdZaabbccdZaabZ"),
      (13L, "xz"))
    val got = graft.operators.Dedup.incrementalEditDistancePairs(
      fresh.toDF("doc_id", "title"), corpus.toDF("doc_id", "title"),
      "doc_id", "title", maxDist = 3, q = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = (for {
      (fi, fsr) <- fresh; (ci, csr) <- corpus
      if math.abs(fsr.length - csr.length) <= 3
      d = lev(fsr, csr) if d <= 3
    } yield (fi, ci) -> d.toLong).toMap
    assert(got === expect) // completeness under the corpus-df order
    assert(expect.contains((10L, 1L)) && expect.contains((12L, 3L)))
    assert(expect.contains((13L, 4L)),
      "the gram-poor disjoint pair must be in the truth set (dist 1)")
    assert(!got.keySet.exists { case (a, b) => a > 9L && b > 9L },
      "screen must never pair fresh with fresh")
  }

  test("cardScreen + redactValidatedCards: Luhn vectors, grouping normalization, exact reassembly") {
    import spark.implicits._
    // 4111111111111111 is the canonical Luhn-valid test PAN; flipping the
    // last digit breaks the checksum. Dashes/spaces must normalize away
    // before the fold, and the screen must not match 12-digit runs.
    val docs = Seq(
      (1L, "pay 4111111111111111 now"),            // valid, bare
      (2L, "pay 4111-1111-1111-1111 now"),         // valid, dash-grouped
      (3L, "order 4111111111111112 shipped"),      // invalid (checksum)
      (4L, "code 123456789012 ok"),                // 12 digits: no candidate
      (5L, "a 4111 1111 1111 1111 b 79927398713")  // valid + valid (11-digit Luhn? no: 79927398713 is 11 digits -> not a candidate)
    ).toDF("doc_id", "text")
    val screen = graft.operators.CorpusOps.cardScreen(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap
    assert(screen((1L, 0L)) === ((16L, true, "****1111")))
    assert(screen((2L, 0L)) === ((16L, true, "****1111")))
    assert(screen((3L, 0L)) === ((16L, false, "4111111111111112")))
    assert(!screen.keySet.exists(_._1 == 4L), "12-digit runs are not candidates")
    assert(screen((5L, 0L)) === ((16L, true, "****1111")))
    assert(!screen.contains((5L, 1L)), "11-digit runs are not candidates")
    val red = graft.operators.CorpusOps.redactValidatedCards(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(red(1L) === ((1L, 1L, "pay ****1111 now")))
    assert(red(2L) === ((1L, 1L, "pay ****1111 now")))
    assert(red(3L) === ((1L, 0L, "order 4111111111111112 shipped")),
      "checksum failures must stay verbatim")
    assert(red(4L) === ((0L, 0L, "code 123456789012 ok")))
    assert(red(5L) === ((1L, 1L, "a ****1111 b 79927398713")))
  }

  test("editDistancePairs: candidate-volume guard aborts loudly; generous cap passes") {
    import spark.implicits._
    // 40 near-identical low-entropy strings: every pair survives the
    // prefix filter, so candidates = 780 — a cap below that must abort
    // BEFORE the verify stage, with the raise-q message
    val docs = (0L until 40L).map(i => (i, "aaaaaaaaab" + (i % 2)))
      .toDF("doc_id", "title")
    val e = intercept[Exception] {
      graft.operators.Dedup.editDistancePairs(docs, "doc_id", "title",
        maxDist = 2, q = 2, maxCandidates = 100L).count()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        ++ Iterator.single("")).mkString(" | ")
    assert(rootMsg(e).contains("exceeds maxCandidates"),
      s"guard must name the cap: ${rootMsg(e).take(300)}")
    // same corpus under the default cap: completes, pairs all at dist<=2
    val n = graft.operators.Dedup.editDistancePairs(docs, "doc_id", "title",
      maxDist = 2, q = 2).count()
    assert(n === 40L * 39L / 2, "all pairs are within distance 2")
  }

  test("adaptiveEditSlice: shared-prefix corpus blows up the fixed slice, stays flat adaptive") {
    import spark.implicits._
    // VERDICT r14 #2: a fixed-position window over a shared-head corpus
    // (log lines, URL-titled docs) fills with corpus-common grams — the
    // rarest grams are everyone's grams and the prefix join degrades
    // toward all-pairs. Fixture: a 70-char shared head, distinguishing
    // material ONLY past it, plus planted near-dup tails.
    val head = "https://corpus.example.org/shard-0000/2026/01/01/documents/part-" // 64 chars
    assert(head.length === 64)
    val rnd = new scala.util.Random(7)
    def tail(): String = Seq.fill(48)("abcdefghijklmnopqrstuvwxyz0123456789"(
      rnd.nextInt(36))).mkString
    val tails = Seq.fill(60)(tail())
    val base = tails.zipWithIndex.map { case (t, i) => (i.toLong, head + t) }
    // planted pairs: one substitution inside the tail → true dist 1
    val dups = tails.take(8).zipWithIndex.map { case (t, i) =>
      ((i + 1000).toLong, head + (t.updated(10, '#'))) }
    val docs = (base ++ dups).toDF("doc_id", "s0")

    // the corpus-wide LCP is the shared head (tails diverge at char 65)
    val lcp = graft.operators.Dedup.commonPrefixLength(docs, "s0")
    assert(lcp === 64, s"LCP must be the shared head, got $lcp")

    // FIXED slice 1..64: exactly the shared head → every string's
    // slice is identical → all C(68,2)=2278 pairs survive the prefix
    // filter; a cap below that must abort loudly
    val fixed = docs.select(col("doc_id"),
      substring(col("s0"), 1, 64).as("title"))
    val e = intercept[Exception] {
      graft.operators.Dedup.editDistancePairs(fixed, "doc_id", "title",
        maxDist = 4, q = 4, maxCandidates = 1000L).count()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        ++ Iterator.single("")).mkString(" | ")
    assert(rootMsg(e).contains("exceeds maxCandidates"),
      s"fixed slice must trip the guard: ${rootMsg(e).take(300)}")

    // ADAPTIVE slice under the SAME cap: the window starts past the head,
    // carries per-doc-distinct grams, and candidates collapse to the
    // planted collisions — the 8 true pairs at dist 1, nothing else
    val adaptive = docs.select(col("doc_id"),
      graft.operators.Dedup.adaptiveEditSlice(docs, "s0").as("title"))
    val pairs = graft.operators.Dedup.editDistancePairs(adaptive, "doc_id",
      "title", maxDist = 4, q = 4, maxCandidates = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length === 8, s"expected the 8 planted pairs, got ${pairs.toSeq}")
    assert(pairs.forall { case (a, b, d) => d === 1L && b === a + 1000L })
  }

  test("vocabularyGrowth: hash-range rank assignment bit-matches the global NTILE anchor") {
    // VERDICT r15 #2: the prefix assignment is now range-offset +
    // partitioned row_number + an arithmetic NTILE replay. The global
    // NTILE stays the small-n ORACLE ANCHOR: at every (n mod buckets)
    // residue and at range counts both far below and above the doc
    // count, the per-doc bucket must be bit-identical to ntile's.
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def text(): String = Seq.fill(6)(
      Seq.fill(4)("abcdefgh"(rnd.nextInt(8))).mkString).mkString(" ")
    for (n <- Seq(101, 102, 103, 104)) { // 101..104 cover all n % 4 residues
      val docs = (1 to n).map(i => (i.toLong * 17, text())).toDF("doc_id", "text")
      val anchor = docs
        .withColumn("h", xxhash64(col("doc_id")))
        .withColumn("q", ntile(4).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("h"), col("doc_id"))))
        .select(col("doc_id"), col("q"))
      for (rb <- Seq(4, 1024)) { // ranges both coarse and mostly-empty
        val got = graft.operators.CorpusOps.vocabularyGrowthPrefixes(
          docs, "doc_id", 4, rb).select(col("doc_id"), col("q"))
        assert(got.except(anchor).count() === 0 &&
          anchor.except(got).count() === 0,
          s"range assignment diverged from NTILE at n=$n rangeBuckets=$rb")
      }
    }
  }

  test("gearChunks: boundaries match a plain-Scala rolling-hash replica; chunks reassemble the payload") {
    import spark.implicits._
    val texts = Seq(
      1L -> ("the quick brown fox jumps over the lazy dog " * 8),
      2L -> "short",
      3L -> ("a" * 300), // degenerate run: whatever cuts fall, spans must tile
      4L -> ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 5))
    val media = graft.operators.Multimodal.asMediaTable(
      texts.toDF("doc_id", "text"), "doc_id", "text")
    val got = graft.operators.Multimodal.gearChunks(media, maskBits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    def replicaEnds(bytes: Array[Byte]): Seq[Int] = {
      var h = 0L
      val cuts = (1 to bytes.length).filter { i =>
        h = (h << 1) + graft.functions.GearChunkEnds.table(bytes(i - 1) & 0xFF)
        (h & 63L) == 0L && i < bytes.length
      }
      cuts :+ bytes.length
    }
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val ends = replicaEnds(bytes)
      val exp = (0 +: ends.init).zip(ends).map { case (st, en) =>
        bytes.slice(st, en).map("%02X".format(_)).mkString }
      assert(got(id).toSeq === exp, s"doc $id chunking")
      // spans tile the payload exactly — no byte lost or duplicated
      assert(got(id).map(_.length / 2).sum === bytes.length, s"doc $id coverage")
    }
  }

  test("bounded gearChunks: plain-Scala replica parity; every chunk within [min, max]; tiling holds") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val (bits, minS, maxS) = (4, 8, 24) // small bounds so both rules fire often
    def replica(bytes: Array[Byte]): Seq[Int] = {
      var h = 0L
      var start = 0
      val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (i <- 1 to bytes.length) {
        h = (h << 1) + graft.functions.GearChunkEnds.table(bytes(i - 1) & 0xFF)
        val len = i - start
        if (i < bytes.length &&
            ((len >= minS && (h & ((1L << bits) - 1)) == 0L) || len >= maxS)) {
          cuts += i; start = i
        }
      }
      (cuts :+ bytes.length).toSeq
    }
    for (seed <- 1L to 5L) {
      val bytes = Gen.listOfN(200, Gen.chooseNum(0, 255))(
        Gen.Parameters.default, Seed(seed)).get.map(_.toByte).toArray
      val got = graft.functions.GearChunkEnds
        .compute(bytes, bits, minS, maxS)
        .toLongArray().toSeq.map(_.toInt)
      assert(got === replica(bytes), s"seed $seed")
      // bounds hold for every chunk except possibly the last remainder
      val lens = (0 +: got.init).zip(got).map { case (a, b) => b - a }
      assert(lens.init.forall(l => l >= minS && l <= maxS), s"seed $seed bounds")
      assert(lens.last <= maxS && lens.sum === bytes.length, s"seed $seed tiling")
    }
    // degenerate-run payload: pure CDC yields pathological chunks, the
    // bounded form must clamp every interior chunk to [min, max]
    val run = Array.fill(300)('a'.toByte)
    val ends = graft.functions.GearChunkEnds
      .compute(run, bits, minS, maxS).toLongArray().toSeq.map(_.toInt)
    val runLens = (0 +: ends.init).zip(ends).map { case (a, b) => b - a }
    assert(runLens.init.forall(l => l >= minS && l <= maxS))
  }

  test("gear chunking pairs a byte-shifted copy that fixed-size chunking provably misses") {
    import spark.implicits._
    // one long doc and its 1-byte-prefixed copy: every 64-byte window
    // shifts, so fixed-size shares nothing; gear re-synchronizes at the
    // first cut past the insertion and shares every later chunk. The text
    // must be APERIODIC — on a string of period p the cut decision (local
    // to the trailing 6 bytes) is periodic too, so a period with no cut
    // means no cuts ever and one giant chunk per doc
    val text = (0 until 16).map(i =>
      s"sentence number $i carries its own distinct words and digits ${i * 37}")
      .mkString(" ")
    val media = graft.operators.Multimodal.asMediaTable(
      Seq(1L -> text, 2L -> ("~" + text)).toDF("doc_id", "text"),
      "doc_id", "text")
    val gear = graft.operators.Multimodal
      .gearChunkJaccardPairs(media, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gear === Set((1L, 2L)), "gear must pair the shifted copy")
    val fixed = graft.operators.Multimodal
      .chunkJaccardPairs(media, threshold = 0.01)
      .count()
    assert(fixed === 0L, "fixed-size chunking must miss the shifted copy entirely")
  }

  test("dedupByContent: identical payloads collapse to min-id survivor; copies conserved") {
    import spark.implicits._
    val media = graft.operators.Multimodal.asMediaTable(
      Seq((10L, "same text"), (3L, "same text"), (7L, "unique one"),
        (5L, "same text"), (9L, "another")).toDF("doc_id", "text"),
      "doc_id", "text")
    val got = graft.operators.Multimodal.dedupByContent(media)
      .collect().map(r => r.getAs[Long]("survivor_id") ->
        (r.getAs[Long]("n_copies"), r.getAs[String]("content_sha256"))).toMap
    assert(got.keySet === Set(3L, 7L, 9L))
    assert(got(3L)._1 === 3L) // three copies of "same text"
    assert(got(7L)._1 === 1L && got(9L)._1 === 1L)
    assert(got.values.map(_._1).sum === 5L)
    // digest is the full lowercase sha256 hex
    assert(got(3L)._2.matches("[0-9a-f]{64}"))
  }
}
