package graft

import graft.queries.TextOps
import org.apache.spark.sql.functions._

/** Merge-table-driven BPE (`text_bpe_merges` / `text_bpe_tokens`):
  * encode∘decode identity, piece-count bounds, and the determinism of the
  * learned rank table. */
class BpeSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("merge ranks are a deterministic total order and actually learned") {
    val m = SparkEntry.queries("text_bpe_merges")(spark, d).collect()
    assert(m.length === 50)
    assert(m.map(_.getLong(0)).toSeq === (1L to 50L))
    // (cnt desc, a asc, b asc) strictly ordered
    val keys = m.map(r => (-r.getLong(3), r.getString(1), r.getString(2)))
    assert(keys.toSeq === keys.sortBy(identity).toSeq)
    // single-char pair alphabet from the [a-z] tokenizer
    assert(m.forall(r => r.getString(1).length == 1 &&
      r.getString(2).length == 1))
    // and the driver-collected table the encoder compiles is the same
    assert(TextOps.bpeMerges(spark, d, 50).toSeq ===
      m.map(r => (r.getString(1), r.getString(2))).toSeq)
  }

  test("encode∘decode identity and piece-count bounds over the vocabulary") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val merges = TextOps.bpeMerges(spark, d, 50)
    val vocab = Tables.documents(spark, d)
      .select(explode(graft.functions.GraftFunctions
        .termCounts(col("text")))).toDF("word", "tf")
      .select(col("word")).distinct()
      .withColumn("s", TextOps.bpeEncodeCol(col("word"), merges))
    val rows = vocab.select(col("word"), col("s"),
      size(split(col("s"), " ")).as("np")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (word, s, np) = (r.getString(0), r.getString(1), r.getInt(2))
      // decode = drop separators: the pieces concatenate to the word
      assert(s.replace(" ", "") === word, s"decode($s) != $word")
      assert(np >= 1 && np <= word.length, s"$word -> $s")
      // every piece is a nonempty substring of the word
      assert(s.split(" ").forall(p => p.nonEmpty && word.contains(p)))
    }
    // the merge table does real work: frequent words compress below
    // their character count
    assert(rows.exists(r => r.getInt(2) < r.getString(0).length))
  }

  test("native graft_bpe_encode == the declarative replace-fold on the " +
    "learned table, word for word") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val merges = TextOps.bpeMerges(spark, d, 50)
    val rows = Tables.documents(spark, d)
      .select(explode(graft.functions.GraftFunctions
        .termCounts(col("text")))).toDF("word", "tf")
      .select(col("word")).distinct()
      .select(col("word"),
        TextOps.bpeEncodeCol(col("word"), merges).as("fold"),
        graft.functions.GraftFunctions.bpeEncode(col("word"), merges)
          .as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(1) === r.getString(2),
      s"${r.getString(0)}: fold/native diverged"))
  }

  test("the 1,024-rule encode runs INSIDE WholeStageCodegen with " +
    "fallbacks disabled — the fold-breaching depth as a compiled loop") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val merges = TextOps.syntheticMerges(1024)
    // forbid silent interpretation: whole-stage fallback AND expression
    // codegen fallback off — a Janino failure now throws instead of
    // quietly running interpreted. AQE off so the WholeStageCodegen
    // containment check sees one flat physical plan instead of nested
    // query stages.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val df = Tables.documents(spark, d)
      .select(explode(graft.functions.GraftFunctions
        .termCounts(col("text")))).toDF("word", "tf")
      .select(col("word")).distinct()
      .select(col("word"),
        graft.functions.GraftFunctions.bpeEncode(col("word"), merges)
          .as("enc"))
    try {
      val rows = df.collect()
      assert(rows.nonEmpty)
      rows.foreach(r =>
        assert(r.getString(1).replace(" ", "") === r.getString(0)))
      // the encode expression's host node is inside a WholeStageCodegen
      // stage (structurally — the collapsed plan fuses the projection
      // into the aggregate's result expressions, so string-grepping the
      // compact form misses it)
      import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val finalPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      def hostsBpe(p: SparkPlan): Boolean = p.expressions.exists(
        _.find(_.isInstanceOf[graft.functions.GraftBpeEncode]).isDefined)
      val inWscg = finalPlan.collect { case w: WholeStageCodegenExec => w }
        .exists(w => w.collect { case p if hostsBpe(p) => p }.nonEmpty)
      assert(inWscg,
        s"encode expression left WholeStageCodegen:\n$finalPlan")
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("a 50,000-rule table executes through the native kernel and " +
    "matches the reference walk — the production-table-size claim") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val merges = TextOps.syntheticMerges(50000)
    val words = Seq("interchangeable", "tokenization", "aaaaaa", "zq", "a")
    val got = words.toDF("word")
      .select(col("word"),
        graft.functions.GraftFunctions.bpeEncode(col("word"), merges))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // reference walk: the same literal-replace fold in plain Scala
    def ref(w: String): String =
      merges.foldLeft(w.toCharArray.mkString(" ")) { case (acc, (a, b)) =>
        acc.replace(a + " " + b, a + b)
      }
    words.foreach(w => assert(got(w) === ref(w), s"50k-rule encode($w)"))
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("per-doc BPE token counts are bounded by words below and chars above") {
    val out = SparkEntry.queries("text_bpe_tokens")(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nWords, nBpe) = (r.getLong(1), r.getLong(2))
      assert(nBpe >= nWords, s"doc ${r.getLong(0)}: $nBpe < $nWords")
    }
    // and compression is visible in aggregate: strictly fewer BPE tokens
    // than characters-in-words (the no-merge upper bound)
    val totBpe = out.map(_.getLong(2)).sum
    val totChars = Tables.documents(spark, d)
      .select(explode(graft.queries.TextOps.tokens(col("text"))).as("w"))
      .agg(sum(length(col("w")))).collect().head.getLong(0)
    assert(totBpe < totChars)
  }

  test("native graft_bpe_decode inverts the native encode over the " +
    "learned, synthetic, and empty tables (the roundtrip gate's law)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val fns = graft.functions.GraftFunctions
    val learned = TextOps.bpeMerges(spark, d, 50)
    val synth = TextOps.syntheticMerges(1024)
    val rows = Tables.documents(spark, d)
      .select(explode(fns.termCounts(col("text")))).toDF("word", "tf")
      .select(col("word")).distinct()
      .select(col("word"),
        fns.bpeDecode(fns.bpeEncode(col("word"), learned)).as("dl"),
        fns.bpeDecode(fns.bpeEncode(col("word"), synth)).as("ds"),
        fns.bpeDecode(fns.bpeEncode(col("word"), Nil)).as("d0"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(0), "learned-table roundtrip")
      assert(r.getString(2) === r.getString(0), "synthetic-table roundtrip")
      assert(r.getString(3) === r.getString(0), "no-merge roundtrip")
    }
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("decode∘encode identity on random words × random tables " +
    "(kernel-level property, incl. a 50k-rule table)") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(13)
    def randWord(): String =
      (1 to (1 + rnd.nextInt(24))).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString
    def randTable(n: Int): (Array[String], Array[String]) = {
      // random pairs over pieces seen so far — merges can chain (ab + c)
      val pieces = scala.collection.mutable.ArrayBuffer(
        ('a' to 'z').map(_.toString): _*)
      val pats = new Array[String](n); val reps = new Array[String](n)
      for (i <- 0 until n) {
        val a = pieces(rnd.nextInt(pieces.length))
        val b = pieces(rnd.nextInt(pieces.length))
        pats(i) = a + " " + b; reps(i) = a + b; pieces += (a + b)
      }
      (pats, reps)
    }
    for (_ <- 1 to 200) {
      val w = randWord()
      val (pats, reps) = randTable(1 + rnd.nextInt(40))
      val enc = graft.functions.BpeEncodeKernel.encode(
        UTF8String.fromString(w), pats, reps)
      assert(graft.functions.BpeDecodeKernel.decode(enc).toString === w,
        s"roundtrip($w) via ${pats.length}-rule table")
    }
    // production-size: one 50k-rule table
    val (p5, r5) = randTable(50000)
    val w = "interchangeabletokenization"
    val enc = graft.functions.BpeEncodeKernel.encode(
      UTF8String.fromString(w), p5, r5)
    assert(graft.functions.BpeDecodeKernel.decode(enc).toString === w)
    // multi-byte safety: 0x20 never occurs inside a UTF-8 sequence
    assert(graft.functions.BpeDecodeKernel.decode(
      UTF8String.fromString("é ş 日")).toString === "éş日")
    // and NULL flows through the expression as NULL
    graft.functions.GraftFunctions.ensureRegistered(spark)
    assert(spark.sql("SELECT graft_bpe_decode(CAST(NULL AS STRING))")
      .collect().head.isNullAt(0))
  }

  test("a NULL rule-array element is a type-check failure, not an NPE") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_bpe_encode('ab', " +
        "array('a b', CAST(NULL AS STRING)), array('ab', 'x'))").collect())
    assert(e.getMessage.toLowerCase.contains("null element") ||
      e.getMessage.contains("must not contain NULL"),
      s"unexpected analysis message: ${e.getMessage}")
  }
}
