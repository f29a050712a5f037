package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("chunk: exact boundaries, overlap, and the no-contained-chunk rule") {
    val text = (1 to 25).map(i => s"t$i").mkString(" ")
    val out = Curation.chunk(docs(1L -> text), "doc_id", "text",
        chunkTokens = 10, overlapTokens = 4)
      .orderBy("chunk_id").collect()
    // stride 6; starts 0,6,12,18 (start <= 25-4-1=20); start 24 would add
    // only token 25, already past... 24 > 20 so excluded
    assert(out.map(_.getAs[Long]("chunk_id")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out(0).getAs[String]("chunk_text") == (1 to 10).map("t" + _).mkString(" "))
    assert(out(1).getAs[String]("chunk_text") == (7 to 16).map("t" + _).mkString(" "))
    assert(out(3).getAs[String]("chunk_text") == (19 to 25).map("t" + _).mkString(" "))
    assert(out(3).getAs[Long]("n_chunk_tokens") == 7L)
    // consecutive chunks overlap by exactly overlapTokens (when full)
    val c0 = out(0).getAs[String]("chunk_text").split(" ").toSet
    val c1 = out(1).getAs[String]("chunk_text").split(" ").toSet
    assert((c0 & c1) == (7 to 10).map("t" + _).toSet)
  }

  test("chunk: short doc yields exactly one chunk; bad params rejected") {
    val out = Curation.chunk(docs(1L -> "a b c"), "doc_id", "text", 10, 4).collect()
    assert(out.length == 1 && out(0).getAs[String]("chunk_text") == "a b c")
    intercept[IllegalArgumentException] {
      Curation.chunk(docs(1L -> "a"), "doc_id", "text", 4, 4)
    }
  }

  test("chunk reconstruction: dropping the overlap from each later chunk rebuilds every doc") {
    // the coverage invariant that makes chunking lossless for training:
    // chunk0 ++ (chunks 1..n minus their leading overlap) == token
    // stream — held across doc lengths 10..99 and several (chunk,
    // overlap) configurations, including zero overlap and a stride of 1
    val d = docs((0L until 50L).map { i =>
      i -> (1 to (10 + (i * 7 % 90)).toInt).map(t => s"d${i}t$t").mkString(" ")
    }: _*)
    for ((ck, ov) <- Seq((16, 5), (8, 0), (12, 11), (40, 10))) {
      val chunks = Curation.chunk(d, "doc_id", "text", ck, ov)
        .collect().groupBy(_.getAs[Long]("doc_id"))
      d.collect().foreach { r =>
        val id = r.getLong(0)
        val toks = r.getString(1).split(" ").toSeq
        val cs = chunks(id).sortBy(_.getAs[Long]("chunk_id"))
          .map(_.getAs[String]("chunk_text").split(" ").toSeq)
        val rebuilt = cs.head ++ cs.tail.flatMap(_.drop(ov))
        assert(rebuilt == toks,
          s"($ck,$ov) doc $id: ${rebuilt.length} vs ${toks.length}")
      }
    }
  }

  test("shardId rejects a non-positive shard count") {
    intercept[IllegalArgumentException] { Curation.shardId(lit(1L), 0) }
    intercept[IllegalArgumentException] { Curation.shardId(lit(1L), -3) }
  }

  test("chunk with zero overlap: disjoint cover, stride == chunkTokens") {
    val text = (1 to 23).map(i => s"t$i").mkString(" ")
    val out = Curation.chunk(docs(1L -> text), "doc_id", "text", 10, 0)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(10L, 10L, 3L))
    assert(out.flatMap(_.getAs[String]("chunk_text").split(" ")).toSeq ==
      (1 to 23).map("t" + _))
  }

  test("contamination: empty eval set flags nothing, all rows still emitted") {
    val d = docs(1L -> "a b c d", 2L -> "e f g h")
    val ev = Seq.empty[String].toDF("s").select(md5($"s").as("g"))
    val out = Curation.contamination(d, "doc_id", "text", ev, shingleLen = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getAs[Long]("n_hits") == 0L &&
      !r.getAs[Boolean]("contaminated")))
  }

  test("fuzzyContamination: ratio threshold, boundary inclusive, integer comparison") {
    // doc 1: 4 distinct trigram shingles, 2 in eval → ratio 0.5 (AT the
    // 1/2 threshold — must flag, the comparison is ≥); doc 2: 1 of 4 →
    // 0.25, below; doc 3: whole-doc shingle in eval → 1.0
    val d = docs(
      1L -> "a b c d e f",        // shingles: abc bcd cde def
      2L -> "a b c x y z",        // shingles: abc bcx cxy xyz
      3L -> "q r")                // short doc: one whole-doc shingle
    val ev = Seq("a b c", "b c d", "q r")
      .toDF("s").select(md5($"s").as("g"))
    val out = Curation.fuzzyContamination(d, "doc_id", "text", ev,
        shingleLen = 3, thresholdNum = 1, thresholdDen = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("n_grams"),
      r.getAs[Long]("n_hits"))).toSeq ==
      Seq((1L, 4L, 2L), (2L, 4L, 1L), (3L, 1L, 1L)))
    assert(out.map(_.getAs[Boolean]("contaminated")).toSeq ==
      Seq(true, false, true))
    assert(out.map(_.getAs[Double]("overlap")).toSeq == Seq(0.5, 0.25, 1.0))
    // a stricter threshold (3/4) drops the boundary doc
    val strict = Curation.fuzzyContamination(d, "doc_id", "text", ev,
        shingleLen = 3, thresholdNum = 3, thresholdDen = 4)
      .orderBy("doc_id").collect()
    assert(strict.map(_.getAs[Boolean]("contaminated")).toSeq ==
      Seq(false, false, true))
  }

  test("fuzzyContamination: empty eval inventory flags nothing, rows kept") {
    val d = docs(1L -> "a b c d", 2L -> "e f g h")
    val ev = Seq.empty[String].toDF("s").select(md5($"s").as("g"))
    val out = Curation.fuzzyContamination(d, "doc_id", "text", ev,
        shingleLen = 3, thresholdNum = 1, thresholdDen = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getAs[Long]("n_hits") == 0L &&
      !r.getAs[Boolean]("contaminated")))
  }

  test("redactPii is idempotent: redacting redacted text changes nothing") {
    val messy = "a bob@x.io b https://y.z/1234567890 c 8.8.8.8 d 123456789012 e"
    val once = Seq(messy).toDF("t")
      .select(Curation.redactPii($"t").as("r")).as[String].head()
    val twice = Seq(once).toDF("t")
      .select(Curation.redactPii($"t").as("r")).as[String].head()
    assert(once == twice)
  }

  test("contamination: flags exactly the docs sharing a shingle with the eval set") {
    val d = docs(
      1L -> "the quick brown fox jumps",  // contains eval trigram
      2L -> "a b c d e f",
      3L -> "slow brown fox jumps high")  // contains eval trigram
    val ev = Seq("quick brown fox", "brown fox jumps")
      .toDF("s").select(md5($"s").as("g"))
    val out = Curation.contamination(d, "doc_id", "text", ev, shingleLen = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("n_hits"))).toSeq ==
      Seq((1L, 2L), (2L, 0L), (3L, 1L)))
    assert(out.map(_.getAs[Boolean]("contaminated")).toSeq ==
      Seq(true, false, true))
  }

  test("redactPii: each class redacted; order makes URL-embedded digits <URL>") {
    val s = Seq(("mail bob.smith+x@ex-a.co.uk then https://a.b/c?id=123456789 " +
      "ip 10.0.255.3 card 4111111111111111 keep 12345678 and 1.2.3.4567"))
      .toDF("t").select(Curation.redactPii($"t").as("r")).as[String].head()
    assert(s.contains("<EMAIL>") && s.contains("<URL>") &&
      s.contains("ip <IP>") && s.contains("card <NUM>"))
    // URL consumed its embedded long digit run before <NUM> could
    assert(!s.contains("123456789"))
    // 8 digits is below the long-run floor; 4567 after a dotted triple is
    // not an IPv4 octet boundary match
    assert(s.contains("keep 12345678") && s.contains("4567"))
  }

  test("shardId: in-range, deterministic, layout-independent, salt-sensitive") {
    val ids = spark.range(5000L).toDF("id")
    val a = ids.select($"id", Curation.shardId($"id", 25, "epoch0").as("s"))
    assert(a.agg(min($"s"), max($"s")).as[(Long, Long)].head() == (0L, 24L))
    // pure key function: survives repartitioning
    val b = ids.repartition(13, $"id" % 5)
      .select($"id", Curation.shardId($"id", 25, "epoch0").as("s"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // roughly balanced (5000/25 = 200 ± 40%)
    val sizes = a.groupBy("s").count().as[(Long, Long)].collect().map(_._2)
    assert(sizes.length == 25 && sizes.min > 120 && sizes.max < 280)
    // a different salt is a different permutation
    val c = ids.select($"id", Curation.shardId($"id", 25, "epoch1").as("s"))
    assert(a.except(c).count() > 0)
    // fast path agrees on range + balance (not on assignment)
    val f = ids.select(Curation.shardIdFast($"id", 25).as("s"))
    assert(f.agg(min($"s"), max($"s")).as[(Long, Long)].head() == (0L, 24L))
  }

  test("contamination: eval grams join as a broadcast, corpus side never shuffles") {
    val d = docs((0L until 200L).map(i => i -> s"w$i x$i y$i z$i q$i"): _*)
    val ev = Seq("w1 x1 y1").toDF("s").select(md5($"s").as("g"))
    val out = Curation.contamination(d, "doc_id", "text", ev, shingleLen = 3)
    out.collect()
    val plan = out.queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n$plan")
    assert(!plan.toString.contains("SortMergeJoin"))
  }

  test("partitioned shard sink: a single-shard read prunes at the directory level") {
    val path = graft.sources.Io.scratchDir("graft_shard_sink_spec")
    val df = spark.range(2000L).toDF("id")
      .withColumn("shard", Curation.shardId($"id", 8, "s"))
      .withColumn("payload", md5($"id".cast("string")))
    graft.sources.Io.writeParquet(df, path, partitionBy = Seq("shard"))
    val one = spark.read.parquet(path).filter($"shard" === 3)
    one.collect()
    val scan = one.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    // the shard predicate must land in PartitionFilters (directory
    // pruning), NOT as a data filter over all shards
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "shard")),
      s"partitionFilters: ${scan.partitionFilters}")
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles,
      "scan read every shard directory")
    // and the round trip preserves membership
    val expected = df.filter($"shard" === 3).count()
    assert(one.count() == expected && expected > 0)
  }

  test("sequence packing invariant: bins are contiguous and never overflow by more than one doc") {
    // mirror the q95 shape on a synthetic frame: within each shard's
    // deterministic order, bin = (cum-1) div B. A bin's total can exceed
    // B only by the straddling doc's tokens — never by more.
    val B = 100L
    val df = spark.range(1000L).toDF("id")
      .withColumn("n_tokens", ($"id" % 37) + 1)
      .withColumn("shard", Curation.shardId($"id", 4, "p"))
      .withColumn("ord", Curation.shardOrder($"id", "p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("ord")
    val packed = df.withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("bin", expr(s"(cum - 1) div $B"))
    val bins = packed.groupBy("shard", "bin")
      .agg(sum($"n_tokens").as("tot"), max($"n_tokens").as("mx"))
      .collect()
    bins.foreach { r =>
      val (tot, mx) = (r.getAs[Long]("tot"), r.getAs[Long]("mx"))
      assert(tot <= B + mx - 1,
        s"bin ${r.getAs[Long]("bin")} overflows: tot=$tot max_doc=$mx")
    }
    // bins within a shard are contiguous 0..maxBin
    packed.groupBy("shard").agg(countDistinct($"bin").as("nb"), max($"bin").as("mb"))
      .collect().foreach(r =>
        assert(r.getAs[Long]("nb") == r.getAs[Long]("mb") + 1))
  }

  test("content-defined chunking re-aligns after an insertion (fixed windows don't)") {
    // build a ~200-token doc, then a copy with 3 tokens inserted near
    // the front. CDC boundaries depend only on token content, so every
    // chunk strictly after the insertion point is IDENTICAL across the
    // two versions — while q81-style fixed windows shift all later
    // chunk contents. Mirror q99's derivation exactly.
    val toks = (1 to 200).map(i => s"w${i * 7 % 97}")
    val orig = toks.mkString(" ")
    val edited = (toks.take(10) ++ Seq("INS1", "INS2", "INS3") ++ toks.drop(10)).mkString(" ")
    val chunks = Curation.cdcChunk(docs(1L -> orig, 2L -> edited), "doc_id", "text")
      .collect().groupBy(_.getLong(0))
    val c1 = chunks(1L).map(_.getAs[String]("chunk_text")).toSet
    val c2 = chunks(2L).map(_.getAs[String]("chunk_text")).toSet
    // the tail chunks (well past the insertion) re-align: strong overlap
    val shared = c1 & c2
    assert(shared.size >= c1.size / 2,
      s"expected re-alignment: ${shared.size} shared of ${c1.size}")
    // and the doc content differs, so at least one chunk must differ
    assert(c1 != c2)
  }

  test("shingleMd5s: distinct shingles; short doc gets one whole-doc shingle") {
    val out = docs(1L -> "a b a b a").toDF()
      .select(TextOps.tokens($"text").as("toks"))
      .select(Curation.shingleMd5s($"toks", 3).as("sh"))
      .select(size($"sh")).as[Int].head()
    // shingles: "a b a", "b a b", "a b a" -> 2 distinct
    assert(out == 2)
    val short = docs(2L -> "x y").toDF()
      .select(TextOps.tokens($"text").as("toks"))
      .select(Curation.shingleMd5s($"toks", 3).as("sh"))
      .select(size($"sh")).as[Int].head()
    assert(short == 1)
  }
}
