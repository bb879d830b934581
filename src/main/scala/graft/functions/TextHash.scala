package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing kernels for the dedup/fingerprint family.
  *
  * Each expression here replaces a declarative formulation whose hot loop
  * ran as *interpreted* higher-order functions (`filter`/`zip_with`/
  * `transform` bind lambda variables per element) or as a row-exploding
  * aggregation (SimHash's 60-bits-per-token explode, MinHash's
  * posting-level groupBy). The semantics are bit-identical to the
  * declarative forms — pinned by `TextHashSpec`, which evaluates both on
  * the real corpus — so the DuckDB oracle SQL is unchanged; only the
  * Spark-side plan gets cheaper (projection-local, whole-stage codegen,
  * no shuffle/explode for per-document values).
  *
  * Shared tokenizer contract (same as `TextOps.tokens`, the reference's
  * observable tokenization, `/root/reference/slave.cc:77-98`): a token is
  * a maximal run of [a-z] after ASCII lowercasing (A–Z → a–z); any other
  * byte delimits, including every byte ≥ 0x80 — so multi-byte UTF-8
  * sequences delimit and the kernels match
  * `split(asciiLower(text), "[^a-z]+")` on ALL inputs, not just ASCII
  * (UTF-8 continuation bytes never overlap [a-z]; pinned incl. unicode in
  * UnicodeTextSpec). Full-casing `lower()` must NOT re-enter this path:
  * its 'İ' → "i̇" expansion maps a non-ASCII char INTO [a-z]. All md5
  * primitives match the cross-engine recipe used everywhere else:
  * `int(hex(md5(x))[i, n])` is the same value in Spark, DuckDB, and here.
  */
object TextHashKernels {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of a digest = first 15 hex chars parsed base-16. */
  @inline private def top60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Maximal [a-z] runs after ASCII lowercasing (see object doc). */
  private def tokenize(b: Array[Byte]): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < b.length) {
      var c = b(i) & 0xff
      if (c >= 'A' && c <= 'Z') c += 32
      if (c >= 'a' && c <= 'z') sb.append(c.toChar)
      else if (sb.length > 0) { out.add(sb.toString); sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out.add(sb.toString)
    out
  }

  /** Distinct space-joined 3-word shingles, first-occurrence order —
    * `array_distinct(zip_with(zip_with(slice...)))` over the shared
    * tokenizer, in one compiled pass. */
  def shingles(s: UTF8String): ArrayData = {
    val toks = tokenize(s.getBytes)
    val n = toks.size
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + 2 < n) {
      seen.add(toks.get(i) + " " + toks.get(i + 1) + " " + toks.get(i + 2))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Distinct 60-bit shingle hashes (first 15 hex chars of md5(shingle)),
    * first-occurrence order — the posting keys for the inverted-index
    * near-dup join: an 8-byte join/shuffle key instead of a ~20-byte
    * shingle string. Deduped AFTER hashing, so a (astronomically rare)
    * in-document hash collision shrinks the set exactly as the oracle's
    * count-distinct-over-hashes does. */
  def shingleHashes(s: UTF8String): ArrayData = {
    val toks = tokenize(s.getBytes)
    val n = toks.size
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    val digest = md5.get()
    var i = 0
    while (i + 2 < n) {
      val sh = toks.get(i) + " " + toks.get(i + 1) + " " + toks.get(i + 2)
      digest.reset()
      seen.add(top60(digest.digest(
        sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** POSITIONAL k-gram 60-bit hashes — one entry per gram position, NOT
    * deduped (multiplicity is the exact-substring metric's unit, unlike
    * [[shingleHashes]]' set semantics). Hash = first 15 hex chars of
    * md5(space-joined gram) — the shared cross-engine convention. Empty
    * array when the document has fewer than k tokens. */
  def gramHashes(s: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(s.getBytes)
    val n = toks.size
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    val digest = md5.get()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + k <= n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j))
        j += 1
      }
      digest.reset()
      out(i) = top60(digest.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit SimHash: per token h = first 60 bits of md5("99|" + token),
    * output bit j set iff strictly more tokens have bit j set than clear
    * (multiplicity counts). NULL when the document has no tokens — the
    * aggregation form simply had no row for such documents. */
  def simhash(s: UTF8String): java.lang.Long = {
    val toks = tokenize(s.getBytes)
    if (toks.isEmpty) return null
    val counts = new Array[Int](60)
    val digest = md5.get()
    var i = 0
    while (i < toks.size) {
      digest.reset()
      val h = top60(digest.digest(
        ("99|" + toks.get(i)).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) r |= 1L << j; j += 1 }
    java.lang.Long.valueOf(r)
  }

  /** Wide SimHash for scale-tuned banding: per token the FULL
    * md5("99|" + token) digest supplies up to 128 hash bits — word w of
    * the signature draws from digest bytes [8w, 8w+8) big-endian, so word
    * 0's bit source is the same digest prefix the 60-bit [[simhash]] uses
    * (alignment differs: this keeps all 64 bits, top60 drops the low
    * nibble — the two signatures are deliberately distinct families).
    * Output word w bit j is set iff strictly more tokens have source bit
    * (w,j) set than clear, multiplicity counted — the same majority vote
    * as [[simhash]] per bit. Returns `words` longs (1 or 2; md5 has only
    * 128 bits); NULL when the document has no tokens. */
  def simhashWide(s: UTF8String, words: Int): ArrayData = {
    val toks = tokenize(s.getBytes)
    if (toks.isEmpty) return null
    val counts = new Array[Int](words * 64)
    val digest = md5.get()
    var i = 0
    while (i < toks.size) {
      digest.reset()
      val d = digest.digest(
        ("99|" + toks.get(i)).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var w = 0
      while (w < words) {
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (d(8 * w + b) & 0xffL); b += 1 }
        var j = 0
        while (j < 64) {
          if (((v >>> j) & 1L) == 1L) counts(64 * w + j) += 1
          else counts(64 * w + j) -= 1
          j += 1
        }
        w += 1
      }
      i += 1
    }
    val out = new Array[Long](words)
    var w = 0
    while (w < words) {
      var r = 0L
      var j = 0
      while (j < 64) { if (counts(64 * w + j) > 0) r |= 1L << j; j += 1 }
      out(w) = r
      w += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature of a shingle array: the classic linear family
    * h_i = h1 + i*h2 with h1 = hex[1..15] and h2 = hex[16..23] of
    * md5(shingle), minimized per permutation. NULL for an empty array —
    * such documents had no postings and therefore no signature row. */
  def minhashSig(a: ArrayData, numPerm: Int): ArrayData = {
    val n = a.numElements()
    if (n == 0) return null
    val mins = Array.fill(numPerm)(Long.MaxValue)
    val digest = md5.get()
    var i = 0
    while (i < n) {
      digest.reset()
      val d = digest.digest(a.getUTF8String(i).getBytes)
      val h1 = top60(d)
      // hex chars 16..23 (1-based): low nibble of byte 7 through high
      // nibble of byte 11 — a 32-bit value, so i*h2 never overflows
      val h2 = ((d(7) & 0x0fL) << 28) | ((d(8) & 0xffL) << 20) |
        ((d(9) & 0xffL) << 12) | ((d(10) & 0xffL) << 4) |
        ((d(11) & 0xf0L) >>> 4)
      var p = 0
      while (p < numPerm) {
        val h = h1 + p * h2
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Per-document term frequencies over the shared tokenizer, as a map in
    * first-occurrence order — `explode` + `groupBy(doc, term)` computed
    * locally per row, removing that aggregation's shuffle entirely (term
    * counting is per-document; only corpus-level statistics need the
    * exchange). */
  def termCounts(s: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val toks = tokenize(s.getBytes)
    val counts = new java.util.LinkedHashMap[String, Long]
    var i = 0
    while (i < toks.size) {
      counts.merge(toks.get(i), 1L, (a, b) => a + b)
      i += 1
    }
    packMap(counts)
  }

  /** Per-document bigram frequencies ("w1 w2" → count) over the shared
    * tokenizer, first-occurrence order — the bigram-instance `explode` +
    * `groupBy(doc, w1, w2)` computed locally per row, removing that
    * aggregation's shuffle (bigram counting is per-document; only
    * corpus-level LM statistics need the exchange). */
  def bigramCounts(s: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val toks = tokenize(s.getBytes)
    val counts = new java.util.LinkedHashMap[String, Long]
    var i = 0
    while (i + 1 < toks.size) {
      counts.merge(toks.get(i) + " " + toks.get(i + 1), 1L, (a, b) => a + b)
      i += 1
    }
    packMap(counts)
  }

  /** Per-document top bigram — the (bigram, cnt) pair with the largest
    * count, ties to the byte-wise LARGEST bigram (the repetition scorer's
    * `max(struct(cnt, bigram))` / the oracle's `ORDER BY cnt DESC, bigram
    * DESC` convention; byte order == lexicographic on the [a-z ] bigram
    * alphabet) — counted and arg-maxed in one pass, so the repetition
    * query needs no explode, no aggregation, and no second kernel
    * evaluation. NULL when the document has fewer than two tokens (such
    * documents had no exploded rows in the aggregation form). */
  def topBigram(s: UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokenize(s.getBytes)
    if (toks.size < 2) return null
    val counts = new java.util.HashMap[String, Long]
    var i = 0
    while (i + 1 < toks.size) {
      counts.merge(toks.get(i) + " " + toks.get(i + 1), 1L, (a, b) => a + b)
      i += 1
    }
    var bestK: String = null
    var bestC = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestC || (c == bestC && e.getKey.compareTo(bestK) > 0)) {
        bestC = c
        bestK = e.getKey
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(bestK), bestC))
  }

  private def packMap(counts: java.util.LinkedHashMap[String, Long])
      : org.apache.spark.sql.catalyst.util.MapData = {
    val keys = new Array[AnyRef](counts.size)
    val vals = new Array[Long](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003): ASCII-lower
    * the text, hash every 8-byte gram (first 8 hex chars of md5 → long),
    * take each 4-gram window's minimum, return the distinct minima in
    * first-occurrence order. Empty array when the text is shorter than 11
    * bytes (no complete window). */
  def winnow(s: UTF8String): ArrayData = {
    // getBytes may return the row's backing array — clone before the
    // in-place lowercase below or the mutation corrupts the source column
    val b = s.getBytes.clone()
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= 'A' && c <= 'Z') b(i) = (c + 32).toByte
      i += 1
    }
    // Grams are 8 consecutive CODEPOINTS (the Schleimer character k-gram;
    // on ASCII codepoints == bytes, so this is bit-compatible with the old
    // byte-window form there). md5 input is the UTF-8 byte span of the
    // gram — exactly `md5(substring(t, i, 8))` in Spark and DuckDB, so
    // the oracle replays it with plain codepoint substring. A byte window
    // would split multi-byte sequences into grams no VARCHAR md5 can
    // express (DuckDB has no md5(BLOB)). Codepoint starts stream through
    // a 9-slot ring — one pass, no offsets array even on huge docs.
    val starts = new Array[Int](9) // ring: last ≤9 codepoint start offsets
    var nCp = 0 // codepoints seen so far
    val digest = md5.get()
    val hring = new Array[Long](4) // ring: last ≤4 gram hashes
    var nGram = 0
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var o = 0
    while (o <= b.length) {
      val isStart = o == b.length || (b(o) & 0xc0) != 0x80
      if (isStart) {
        // codepoint span [starts[(nCp-8) mod 9], o) = gram #(nCp-8)
        if (nCp >= 8) {
          val from = starts((nCp - 8) % 9)
          digest.reset()
          digest.update(b, from, o - from)
          val d = digest.digest()
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          hring(nGram % 4) = h
          nGram += 1
          if (nGram >= 4) {
            var m = hring(0)
            if (hring(1) < m) m = hring(1)
            if (hring(2) < m) m = hring(2)
            if (hring(3) < m) m = hring(3)
            seen.add(m)
          }
        }
        if (o < b.length) { starts(nCp % 9) = o; nCp += 1 }
      }
      o += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }
}

/** `graft_shingles(text)` → array<string>: distinct 3-word shingles. */
case class GraftShingles(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextHashKernels.shingles($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_shingle_hashes(text)` → array<long>: distinct 60-bit hashed
  * 3-word shingles — the compact posting keys. */
case class GraftShingleHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.shingleHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextHashKernels.shingleHashes($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_gram_hashes(text, k)` → array<long>: positional (non-distinct)
  * k-gram 60-bit hashes — the exact-substring dedup unit. */
case class GraftGramHashes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: org.apache.spark.sql.types.IntegerType)
          if right.foldable =>
        // eval() before the cast: a foldable NULL literal would unbox to
        // 0 and produce the misleading "got 0" message instead of naming
        // the null
        right.eval() match {
          case null => TypeCheckResult.TypeCheckFailure(
            "graft_gram_hashes k must not be NULL")
          case k: Int if k >= 1 && k <= 256 =>
            TypeCheckResult.TypeCheckSuccess
          case k => TypeCheckResult.TypeCheckFailure(
            s"graft_gram_hashes k must be in [1, 256], got $k")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_gram_hashes expects (string, foldable int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(input1: Any, input2: Any): Any =
    TextHashKernels.gramHashes(input1.asInstanceOf[UTF8String],
      input2.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, k) =>
      s"${ev.value} = graft.functions.TextHashKernels.gramHashes($x, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_simhash(text)` → long: 60-bit SimHash; NULL when no tokens. */
case class GraftSimhash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = graft.functions.TextHashKernels.simhash($x);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash_wide(text, words)` → array<long>: `words`×64-bit SimHash
  * (words must be a foldable literal 1 or 2 — md5 supplies 128 bits);
  * NULL when the document has no tokens. The scale-tuned signature behind
  * [[graft.queries.Dedup.simhashPairsWide]]. */
case class GraftSimhashWide(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: org.apache.spark.sql.types.IntegerType)
          if right.foldable =>
        val w = right.eval().asInstanceOf[Int]
        if (w >= 1 && w <= 2) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_simhash_wide words must be 1 or 2, got $w")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash_wide expects (string, foldable int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash_wide"

  override protected def nullSafeEval(input1: Any, input2: Any): Any =
    TextHashKernels.simhashWide(input1.asInstanceOf[UTF8String],
      input2.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, w) => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.TextHashKernels.simhashWide($x, $w);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_minhash_sig(shingles)` → array<long> of 16 permutation minima;
  * NULL for an empty shingle array. */
case class GraftMinhashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.minhashSig(input.asInstanceOf[ArrayData],
      GraftMinhashSig.NumPerm)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.TextHashKernels.minhashSig(
         |    $x, ${GraftMinhashSig.NumPerm});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftMinhashSig {
  /** 16 permutations, banded 4×4 by the LSH layer. */
  val NumPerm = 16
}

/** `graft_term_counts(text)` → map<string,long>: per-document term
  * frequencies over the shared tokenizer. */
case class GraftTermCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_term_counts expects string, got ${t.simpleString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType, LongType,
      valueContainsNull = false)
  override def prettyName: String = "graft_term_counts"

  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.termCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextHashKernels.termCounts($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_bigram_counts(text)` → map<string,long>: per-document bigram
  * ("w1 w2") frequencies over the shared tokenizer. */
case class GraftBigramCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_counts expects string, got ${t.simpleString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType, LongType,
      valueContainsNull = false)
  override def prettyName: String = "graft_bigram_counts"

  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.bigramCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextHashKernels.bigramCounts($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_top_bigram(text)` → struct<bigram:string,cnt:long>: the
  * most-frequent bigram (ties → byte-wise largest) with its count; NULL
  * for documents with fewer than two tokens. */
case class GraftTopBigram(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_top_bigram expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("bigram", StringType,
      nullable = false),
    org.apache.spark.sql.types.StructField("cnt", LongType,
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top_bigram"

  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.topBigram(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"""
      ${ev.value} = graft.functions.TextHashKernels.topBigram($x);
      ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_winnow(text)` → array<long>: distinct winnowing fingerprints. */
case class GraftWinnow(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextHashKernels.winnow($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
