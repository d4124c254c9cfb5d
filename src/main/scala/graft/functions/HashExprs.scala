package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-dedup and vector-similarity
  * hot paths (SURVEY.md §7.4 preference order: native Expression over
  * UDF). Spark's higher-order array functions (`aggregate`,
  * `transform`, `zip_with`) evaluate their lambda bodies interpreted —
  * fine once per row, ~30× too slow when the lambda runs per token or
  * per candidate pair. These expressions keep the math in compiled JVM
  * loops and inline into whole-stage codegen via `doGenCode`.
  *
  * All hashes are the polynomial char-fold mod 1e9+7 that the DuckDB
  * oracle mirrors with `list_reduce` — bit-identical across engines,
  * order-independent of partitioning.
  */
object HashOps {

  val M: Long = 1000000007L
  private val P: Long = 1000003L

  /** Fixed MONOTONE logarithmic bucketing of any long — bit-length
    * octave × 7 high mantissa bits, sign-reflected for negatives.
    * Strictly order-preserving (v1 ≤ v2 ⇒ bucket(v1) ≤ bucket(v2)),
    * range [−8192, 8191], needs NO min/max pre-pass — the bucketing
    * that lets exact quantile selection run in two passes instead of
    * three (stats + hist + select). Exactness of the bit-length is
    * load-bearing: a float `log2` misrounds near powers of two and
    * breaks monotonicity, silently corrupting rank arithmetic. */
  def logBucket(v: Long): Int =
    if (v >= 0) {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(v) // 0 for v=0
      val shift = if (bl > 7) bl - 7 else 0
      (bl << 7) | ((v >>> shift).toInt & 127)
    } else -logBucket(-(v + 1)) - 1

  /** acc = 7; acc = (acc*31 + codepoint) % M over the string's Unicode
    * code points — identical to `aggregate(split(s,''), 7, ...ascii)`
    * in Spark and `list_reduce(... ord ...)` in DuckDB. Empty input
    * follows Spark's `split('','') = ['']` convention (one fold step
    * with codepoint 0) so the compiled hash is a drop-in for the
    * interpreted spelling. */
  def charFold(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return 7L * 31 % M
    var acc = 7L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % M
      i += Character.charCount(cp)
    }
    acc
  }

  def charFoldArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = charFold(arr.getUTF8String(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Composed n-token shingle hashes over a token-hash array:
    * out(i) = fold of h(i..i+n-1) with acc = (acc*1000003 + h) % M —
    * the in-row spelling of the LEAD-window composition (no per-doc
    * sort, no shuffle). Stays < 2^63: acc < M, so acc*P + h < 1e15. */
  def shingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val m = math.max(0, len - n + 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = arr.getLong(i)
      var j = 1
      while (j < n) { acc = (acc * P + arr.getLong(i + j)) % M; j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Space-joined n-grams of a token array (bigram profile etc.). */
  def tokenNgrams(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val m = math.max(0, len - n + 1)
    val sep = UTF8String.fromString(" ")
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = arr.getUTF8String(i + j)
        if (j < n - 1) parts(2 * j + 1) = sep
        j += 1
      }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact int64 dot product of two equal-length BIGINT arrays.
    * Associative integer adds — result independent of evaluation
    * order; overflow bound documented at the call sites. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  private def isJavaSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Whitespace tokenization: non-empty segments between runs of Java
    * `\s` characters — exactly `filter(split(text, '\s+'), x -> x != '')`,
    * but one compiled pass instead of a regex split plus an interpreted
    * filter lambda (higher-order functions are CodegenFallback and
    * break whole-stage codegen for the whole projection). */
  def tokenize(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && isJavaSpace(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isJavaSpace(str.charAt(i))) i += 1
      if (i > start) out += UTF8String.fromString(str.substring(start, i))
    }
    new GenericArrayData(out.toArray)
  }

  /** BPE-ish subword proxy: Σ ceil(numChars(t) / 4) over the tokens —
    * the compiled form of `aggregate(tokens, 0L, acc + ceil(len/4.0))`
    * (integer (len+3)/4 equals ceil(len/4.0) for non-negative len). */
  def subwordCount(arr: ArrayData): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { acc += (arr.getUTF8String(i).numChars() + 3) / 4; i += 1 }
    acc
  }

  /** One BPE merge applied to a symbol array: replace every
    * non-overlapping adjacent (a, b) with the concatenation ab,
    * scanning LEFT-GREEDY (the standard BPE apply order — "aaa" under
    * merge (a,a) becomes ["aa","a"], never ["a","aa"]). */
  /** Final symbol count after applying a FULL pinned merge table
    * left-greedy, round by round — the fused t22/t27 encode. One
    * working array, in-place compaction per round, zero intermediate
    * ArrayData materializations: the callers only consume the encoded
    * LENGTH, so the encoded array itself never needs to exist (the
    * per-round [[bpeMergeStep]] fold allocated |merges| intermediate
    * arrays per document). Per-round semantics are bit-identical to
    * [[bpeMergeStep]]; `abs(r)` is the precomputed `ls(r)+rs(r)`
    * concat so no merge output is re-concatenated per occurrence. */
  def bpeEncodeLen(arr: ArrayData, ls: Array[UTF8String], rs: Array[UTF8String],
      abs: Array[UTF8String]): Long = {
    var n = arr.numElements()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < n) { buf(i) = arr.getUTF8String(i); i += 1 }
    var r = 0
    while (r < ls.length && n >= 2) {
      val a = ls(r); val b = rs(r); val ab = abs(r)
      var rd = 0
      var wr = 0
      while (rd < n) {
        if (rd + 1 < n && buf(rd).equals(a) && buf(rd + 1).equals(b)) {
          buf(wr) = ab
          rd += 2
        } else {
          buf(wr) = buf(rd)
          rd += 1
        }
        wr += 1
      }
      n = wr
      r += 1
    }
    n.toLong
  }

  def bpeMergeStep(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < n) {
      if (i + 1 < n && arr.getUTF8String(i).equals(a) &&
          arr.getUTF8String(i + 1).equals(b)) {
        out += UTF8String.concat(a, b)
        i += 2
      } else {
        out += arr.getUTF8String(i)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Flatten a token array to BPE-initial symbols: each token's code
    * points as single-character symbols, each token followed by ONE
    * `bound` sentinel symbol. The sentinel never appears in any merge
    * pair, so merges can never cross a word boundary — which lets the
    * whole DOCUMENT be one symbol array (no per-word explode, no
    * shuffle) while encoding each word independently, exactly like a
    * per-word tokenizer would. */
  def charSyms(arr: ArrayData, bound: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var t = 0
    while (t < n) {
      val str = arr.getUTF8String(t).toString
      var i = 0
      val len = str.length
      while (i < len) {
        val cp = str.codePointAt(i)
        val cc = Character.charCount(cp)
        out += UTF8String.fromString(str.substring(i, i + cc))
        i += cc
      }
      out += bound
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Luhn checksum over an all-digit string: double every second digit
    * from the right (subtracting 9 when the double exceeds 9); valid
    * iff the sum is ≡ 0 (mod 10). Non-digit input returns false. */
  def luhnValid(s: UTF8String): Boolean = {
    val str = s.toString
    val n = str.length
    if (n == 0) return false
    var sum = 0
    var i = n - 1
    var second = false
    while (i >= 0) {
      val c = str.charAt(i)
      if (c < '0' || c > '9') return false
      var d = c - '0'
      if (second) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      second = !second
      i -= 1
    }
    sum % 10 == 0
  }

  /** Count of Luhn-valid candidates in a digit-run array — the
    * compiled per-document reducer for the PII audit (no explode, no
    * interpreted lambda per candidate). */
  def luhnValidCount(arr: ArrayData): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { if (luhnValid(arr.getUTF8String(i))) acc += 1; i += 1 }
    acc
  }

  /** Count of tokens contained in a fixed word set (stopword ratio). */
  def countIn(arr: ArrayData, words: Array[UTF8String]): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var j = 0
      var hit = false
      while (!hit && j < words.length) { hit = words(j).equals(t); j += 1 }
      if (hit) acc += 1
      i += 1
    }
    acc
  }

  /** Count of tokens containing at least one ASCII letter — the
    * Gopher "words with an alphabetic character" numerator (t33), one
    * compiled per-document pass. */
  def alphaTokenCount(arr: ArrayData): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var j = 0
      var hit = false
      val len = s.length
      while (!hit && j < len) {
        val c = s.charAt(j)
        hit = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        j += 1
      }
      if (hit) acc += 1
      i += 1
    }
    acc
  }

  /** Line-shape stats of a string array (one document's lines),
    * skipping empty elements: [total, nBulletStart, nEllipsisEnd]
    * where a bullet line starts with `- ` or `* ` (the ASCII bullet
    * spellings — an engine constant) and an ellipsis line ends with
    * `...`. The Gopher bullet-line / ellipsis-line fraction
    * numerators (t33), one compiled per-document pass. */
  def lineShapeStats(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var total = 0L
    var bullet = 0L
    var ell = 0L
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      if (s.nonEmpty) {
        total += 1
        if (s.startsWith("- ") || s.startsWith("* ")) bullet += 1
        if (s.endsWith("...")) ell += 1
      }
      i += 1
    }
    new GenericArrayData(Array[Long](total, bullet, ell))
  }

  /** C4 line-retention filter (Raffel et al. 2020 §2.2) over one
    * document's lines, one compiled pass (t34): keep a line only when
    * it is non-blank, does not mention `javascript`
    * (case-insensitive — C4 drops any line with the word), has at
    * least `minWords` whitespace-separated words, and its last
    * non-whitespace character is a terminal punctuation mark — `.`,
    * `!`, `?`, or a closing `"` (C4's published set). Kept lines are
    * returned verbatim, in order, so the caller rebuilds the document
    * with one `array_join`. */
  def c4KeepLines(arr: ArrayData, minWords: Int): ArrayData = {
    val n = arr.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var e = s.length - 1
      while (e >= 0 && isJavaSpace(s.charAt(e))) e -= 1
      val last = if (e >= 0) s.charAt(e) else ' '
      if (last == '.' || last == '!' || last == '?' || last == '"') {
        var w = 0
        var j = 0
        while (j < s.length && w < minWords) {
          while (j < s.length && isJavaSpace(s.charAt(j))) j += 1
          if (j < s.length) {
            w += 1
            while (j < s.length && !isJavaSpace(s.charAt(j))) j += 1
          }
        }
        if (w >= minWords && !s.toLowerCase.contains("javascript"))
          out += UTF8String.fromString(s)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** One-pass window-dedup keep (c12 at span grain n=3, d16 at token
    * grain n=K): fold each unit, hash every n-unit window exactly as
    * `shingle_hashes(char_fold_array(units), n)` does, probe the
    * broadcast duplicated-window set (sorted hashes + aligned keeper
    * doc/position arrays) by binary search, and return the units NOT
    * covered by a losing occurrence. One compiled pass per document —
    * no HOF lambdas, no per-unit sequence allocation. Keeper positions
    * are 0-based window starts, matching `posexplode`. */
  def spanDedupKeep(
      lines: ArrayData,
      dupS: ArrayData,
      dupKd: ArrayData,
      dupKi: ArrayData,
      docId: Long,
      n: Int): ArrayData = {
    val total = lines.numElements()
    val folds = new Array[Long](total)
    var i = 0
    while (i < total) {
      folds(i) = charFold(lines.getUTF8String(i))
      i += 1
    }
    val m = math.max(0, total - n + 1)
    val loser = new Array[Boolean](m)
    i = 0
    while (i < m) {
      var acc = folds(i)
      var j = 1
      while (j < n) {
        acc = (acc * P + folds(i + j)) % M
        j += 1
      }
      val pos = sortedPosition(dupS, acc)
      if (pos > 0) {
        val p = (pos - 1).toInt
        loser(i) = !(dupKd.getLong(p) == docId && dupKi.getLong(p) == i)
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var j = 0
    while (j < total) {
      var covered = false
      var k = math.max(0, j - n + 1)
      val kMax = math.min(j, m - 1)
      while (!covered && k <= kMax) {
        covered = loser(k)
        k += 1
      }
      if (!covered) out += UTF8String.fromString(lines.getUTF8String(j).toString)
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** 1-based position of `key` in an ascending-sorted long array via
    * binary search, 0 when absent — the c12 broadcast dup-set probe
    * ([[graft.operators.CorpusPipeline.spanDedupRebuild]]). */
  def sortedPosition(arr: ArrayData, key: Long): Long = {
    var lo = 0
    var hi = arr.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = arr.getLong(mid)
      if (v == key) return mid + 1L
      else if (v < key) lo = mid + 1
      else hi = mid - 1
    }
    0L
  }

  /** Weighted membership sum over a token array: Σ weight(token) for
    * tokens present in the fixed term list (0 for the rest) — the
    * per-document linear-classifier score (t23's fastText-style
    * surface) as one compiled reducer, so a per-domain quality rollup
    * stays a pure two-level aggregation with the score riding the scan
    * projection. Linear probe over the (small, fixed) weight table per
    * token — the relational broadcast-join spelling stays the right
    * shape for million-term models. */
  def scoreIn(arr: ArrayData, words: Array[UTF8String], wts: Array[Long]): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var j = 0
      var done = false
      while (!done && j < words.length) {
        if (words(j).equals(t)) { acc += wts(j); done = true }
        j += 1
      }
      i += 1
    }
    acc
  }

  /** Winnowing (MOSS-style) fingerprint selection: the minimum of each
    * sliding window of `w` consecutive shingle hashes. Output length is
    * `max(0, n - w + 1)`; duplicate selections are kept (callers
    * `distinct` after exploding). Monotonic-deque implementation — one
    * O(n) compiled pass, vs an interpreted `array_min(slice(...))` per
    * window. Identical to the relational window-frame MIN the oracle
    * runs. */
  def winnow(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    val m = math.max(0, n - w + 1)
    val out = new Array[Long](m)
    val deque = new Array[Int](n + 1) // indices, front=min
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = arr.getLong(deque(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane LSH bucket of a quantized vector: bit j of the
    * result is the sign of the projection onto pseudo-random plane j,
    * with plane weights `((j*dims + d) * 2654435761) % 97 - 48` (Knuth
    * multiplicative hash → small signed weight) — the compiled form of
    * the nested aggregate/transform spelling, bit-identical for the
    * oracle's 64-dim planes. */
  def hyperplaneBucket(arr: ArrayData, nPlanes: Int): Long = {
    val dims = arr.numElements()
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var acc = 0L
      var d = 0
      while (d < dims) {
        acc += arr.getLong(d) * ((j * dims + d) * 2654435761L % 97 - 48)
        d += 1
      }
      if (acc > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  /** Top n-gram per gram size (n = 2/3/4) of a token array — the
    * compiled per-document reducer behind t31 (Gopher top-n-gram
    * repetition). The top-gram share is a PER-DOCUMENT statistic, so
    * nothing about it needs a shuffle: one hash map over the doc's
    * grams per gram size, with a running argmax whose tie-break is
    * exactly `max(struct(cnt, gram))` — larger count wins, then the
    * binary-larger gram string (UTF8String.compareTo == Spark's
    * StringType ordering == DuckDB's default binary collation). The
    * running argmax is exact: counts only grow, so when a gram reaches
    * its final count it is compared against a best whose count is ≤
    * the true max, and later ties re-compare on the gram string.
    * Returns one (n, gram, cnt) struct per gram size that has at
    * least one gram (docs shorter than n tokens skip that n, matching
    * the empty `generate_series` in the oracle). Replaces the former
    * explode→count→argmax spelling whose two global exchanges carried
    * ~3× the corpus token volume. */
  def topGrams(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val sep = UTF8String.fromString(" ")
    var n = 2
    while (n <= 4) {
      val m = len - n + 1
      if (m > 0) {
        val counts = new java.util.HashMap[UTF8String, java.lang.Long]()
        var best: UTF8String = null
        var bestCnt = 0L
        var i = 0
        while (i < m) {
          val parts = new Array[UTF8String](2 * n - 1)
          var j = 0
          while (j < n) {
            parts(2 * j) = arr.getUTF8String(i + j)
            if (j < n - 1) parts(2 * j + 1) = sep
            j += 1
          }
          val gram = UTF8String.concat(parts: _*)
          val prev = counts.get(gram)
          val c = if (prev == null) 1L else prev + 1L
          counts.put(gram, c)
          if (c > bestCnt || (c == bestCnt && gram.compareTo(best) > 0)) {
            best = gram
            bestCnt = c
          }
          i += 1
        }
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](n, best, bestCnt))
      }
      n += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Duplicated n-gram character coverage for n = 5..10 — the Gopher
    * "duplicate n-gram char fraction" numerators (Rae et al. §A1.1
    * rows 4–9), one compiled per-document pass per gram size: for each
    * n, Σ over grams occurring ≥ 2 times of cnt·len(gram) — ALL
    * occurrences of any duplicated n-gram count, not just the top one
    * (t31's signal) and not just the repeats. Returns the six sums as
    * an array indexed n−5. Like [[topGrams]], a per-doc statistic that
    * never needs a shuffle. */
  /** Key = an n-token slice of a shared token array, compared by
    * token-sequence equality — the gram identity [[dupGramChars]]
    * needs WITHOUT concatenating a gram string per position (tokens
    * contain no whitespace, so the former space-joined concat key was
    * injective in the slice; this is the same identity minus the
    * per-position byte copy). hashCode precomputed once. */
  private final class GramSlice(
      val toks: Array[UTF8String], val start: Int, val n: Int,
      override val hashCode: Int) {
    override def equals(o: Any): Boolean = {
      val that = o.asInstanceOf[GramSlice]
      if (that.n != n) return false
      var j = 0
      while (j < n) {
        if (!toks(start + j).equals(that.toks(that.start + j))) return false
        j += 1
      }
      true
    }
  }

  def dupGramChars(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    val sums = new Array[Long](6)
    // one pass of shared per-doc state: token refs, per-token
    // hashCodes, prefix char counts (gram chars = token chars +
    // (n−1) separators of the former concat spelling)
    val toks = new Array[UTF8String](len)
    val th = new Array[Int](len)
    val pre = new Array[Long](len + 1)
    var t = 0
    while (t < len) {
      val s = arr.getUTF8String(t)
      toks(t) = s
      th(t) = s.hashCode
      pre(t + 1) = pre(t) + s.numChars()
      t += 1
    }
    var n = 5
    while (n <= 10) {
      val m = len - n + 1
      if (m > 0) {
        val counts = new java.util.HashMap[GramSlice, java.lang.Long]()
        var i = 0
        while (i < m) {
          var h = 1
          var j = 0
          while (j < n) { h = h * 31 + th(i + j); j += 1 }
          val gram = new GramSlice(toks, i, n, h)
          val prev = counts.get(gram)
          counts.put(gram, if (prev == null) 1L else prev + 1L)
          i += 1
        }
        var acc = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c: Long = e.getValue
          if (c >= 2L) {
            val g = e.getKey
            acc += c * (pre(g.start + g.n) - pre(g.start) + (g.n - 1))
          }
        }
        sums(n - 5) = acc
      }
      n += 1
    }
    new GenericArrayData(sums)
  }

  /** Duplicate-element stats of a string array (lines or paragraphs of
    * one document), skipping empty elements: returns
    * [total, dupCount, dupChars] where dupCount = Σ over elements
    * occurring ≥ 2 times of (cnt − 1) — occurrences BEYOND the first,
    * the published duplicate-line/paragraph fraction numerator — and
    * dupChars = Σ (cnt − 1)·len(elem). One compiled per-document
    * pass; chars are Unicode code-point counts (same as `length`). */
  def dupElemStats(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, java.lang.Long]()
    var total = 0L
    var i = 0
    while (i < n) {
      val e = arr.getUTF8String(i)
      if (e.numBytes() > 0) {
        total += 1
        val prev = counts.get(e)
        counts.put(e, if (prev == null) 1L else prev + 1L)
      }
      i += 1
    }
    var dupCnt = 0L
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c: Long = e.getValue
      if (c >= 2L) {
        dupCnt += c - 1
        dupChars += (c - 1) * e.getKey.numChars()
      }
    }
    new GenericArrayData(Array[Long](total, dupCnt, dupChars))
  }

  /** 16-bit SimHash of a token-hash array: bit b is set iff
    * Σ_tokens (bit(h,b)·2 − 1) > 0. Summing ±1 per occurrence equals
    * the grouped Σ_distinct w·(bit·2−1) formulation exactly (the
    * relational spelling the oracle uses) — no 16× explode, no
    * shuffle; one compiled pass per document. */
  def simhash16(arr: ArrayData): Long = {
    val counts = new Array[Long](16)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 16) { counts(b) += ((h >> b) & 1L) * 2 - 1; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** 64-bit SimHash — the scale variant of [[simhash16]]. The token
    * hash is only ~30 bits (mod 1e9+7), so bits beyond 15 can't come
    * from the hash directly; bit b's ±1 vote instead uses an
    * independent derived parity g_b(h) = ((h·(2b+3) + b·7919 + 1)
    * mod M) mod 2 — cheap integer arithmetic a SQL oracle replicates
    * exactly (no overflow: h < M ≈ 2^30, multiplier ≤ 129 → < 2^38).
    * Wider signatures exist for selectivity: with 16-bit pigeonhole
    * bands the expected band-bucket population at N docs is N/65536
    * per band vs N/16 for the 16-bit signature's nibbles — the
    * candidate join stays near-linear at corpus scale. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Long](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // SQL-exposed for arbitrary ARRAY<BIGINT>: fold the hash into
      // [0, M) first so full-width or negative inputs (e.g. xxhash64
      // output) don't overflow h·(2b+3) or hit Java's negative `%`
      // (& 1 of a negative remainder diverges from the documented
      // parity). For the char-fold path (already in [0, M)) this is
      // the identity, so oracle parity is unchanged.
      val h = { val r = arr.getLong(i) % M; if (r < 0) r + M else r }
      var b = 0
      while (b < 64) {
        counts(b) += (((h * (2L * b + 3) + b * 7919L + 1) % M) & 1L) * 2 - 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}

/** `char_fold(s STRING) -> BIGINT` — document fingerprint hash. */
case class CharFold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_fold"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.charFold(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.charFold($c)")
  override protected def withNewChildInternal(newChild: Expression): CharFold =
    copy(child = newChild)
}

/** `char_fold_array(a ARRAY<STRING>) -> ARRAY<BIGINT>` — per-token hash. */
case class CharFoldArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_fold_array"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.charFoldArray(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.charFoldArray($c)")
  override protected def withNewChildInternal(newChild: Expression): CharFoldArray =
    copy(child = newChild)
}

/** `shingle_hashes(h ARRAY<BIGINT>, n) -> ARRAY<BIGINT>`. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.shingleHashes(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `token_ngrams(t ARRAY<STRING>, n) -> ARRAY<STRING>` (space-joined). */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_ngrams"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.tokenNgrams(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.tokenNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

/** `tokenize(s STRING) -> ARRAY<STRING>` — non-empty whitespace splits. */
case class Tokenize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.tokenize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.tokenize($c)")
  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** `subword_count(t ARRAY<STRING>) -> BIGINT` — Σ ceil(len/4). */
case class SubwordCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_count"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.subwordCount(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.subwordCount($c)")
  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}

/** `count_in(t ARRAY<STRING>, words) -> BIGINT` — membership count. */
case class CountIn(child: Expression, words: Seq[String]) extends UnaryExpression {
  private val wordSet: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray
  override def dataType: DataType = LongType
  override def prettyName: String = "count_in"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.countIn(input.asInstanceOf[ArrayData], wordSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("words", wordSet, "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.countIn($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): CountIn =
    copy(child = newChild)
}

/** `alpha_token_count(t ARRAY<STRING>) -> BIGINT` — tokens containing
  * an ASCII letter (see [[HashOps.alphaTokenCount]]); t33's
  * alpha-word numerator. */
case class AlphaTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "alpha_token_count"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"alpha_token_count takes ARRAY<STRING>, got ${dt.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    HashOps.alphaTokenCount(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.alphaTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): AlphaTokenCount =
    copy(child = newChild)
}

/** `line_shape_stats(a ARRAY<STRING>) -> ARRAY<BIGINT>` —
  * [total, bulletStart, ellipsisEnd] over non-empty lines (see
  * [[HashOps.lineShapeStats]]); t33's line-shape reducer. */
case class LineShapeStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "line_shape_stats"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"line_shape_stats takes ARRAY<STRING>, got ${dt.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    HashOps.lineShapeStats(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.lineShapeStats($c)")
  override protected def withNewChildInternal(newChild: Expression): LineShapeStats =
    copy(child = newChild)
}

/** `c4_keep_lines(a ARRAY<STRING>, minWords) -> ARRAY<STRING>` — the
  * C4 line-retention filter (see [[HashOps.c4KeepLines]]); t34's
  * rebuild reducer. */
case class C4KeepLines(child: Expression, minWords: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "c4_keep_lines"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"c4_keep_lines takes ARRAY<STRING>, got ${dt.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    HashOps.c4KeepLines(input.asInstanceOf[ArrayData], minWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.c4KeepLines($c, $minWords)")
  override protected def withNewChildInternal(newChild: Expression): C4KeepLines =
    copy(child = newChild)
}

/** `score_in(t ARRAY<STRING>, weights) -> BIGINT` — weighted term-
  * membership sum (see [[HashOps.scoreIn]]); the per-doc linear
  * quality score, compiled. */
case class ScoreIn(child: Expression, weights: Seq[(String, Long)])
  extends UnaryExpression {
  private val wordArr: Array[UTF8String] =
    weights.map(w => UTF8String.fromString(w._1)).toArray
  private val wtArr: Array[Long] = weights.map(_._2).toArray
  override def dataType: DataType = LongType
  override def prettyName: String = "score_in"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"score_in takes ARRAY<STRING>, got ${dt.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    HashOps.scoreIn(input.asInstanceOf[ArrayData], wordArr, wtArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("scoreWords", wordArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val tRef = ctx.addReferenceObj("scoreWts", wtArr, "long[]")
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.scoreIn($c, $wRef, $tRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): ScoreIn =
    copy(child = newChild)
}

/** `winnow(h ARRAY<BIGINT>, w) -> ARRAY<BIGINT>` — sliding-window mins. */
case class Winnow(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.winnow(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.winnow($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** `hyperplane_bucket(q ARRAY<BIGINT>, n) -> BIGINT` — LSH sign bucket. */
case class HyperplaneBucket(child: Expression, nPlanes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.hyperplaneBucket(input.asInstanceOf[ArrayData], nPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.hyperplaneBucket($c, $nPlanes)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** `simhash16(h ARRAY<BIGINT>) -> BIGINT` — 16-bit SimHash signature. */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.simhash16(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.simhash16($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** `simhash64(h ARRAY<BIGINT>) -> BIGINT` — 64-bit SimHash signature. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `dot_long(a ARRAY<BIGINT>, b ARRAY<BIGINT>) -> BIGINT`. */
/** `span_dedup_keep(units, dupS, dupKd, dupKi, doc_id; n) ->
  * ARRAY<STRING>` — the c12/d16 removal + rebuild as ONE compiled
  * per-doc pass (see [[HashOps.spanDedupKeep]]): re-derives the
  * n-unit window hashes from the units (identical chain to
  * `shingle_hashes(char_fold_array(...), n)`), probes the broadcast
  * dup arrays by binary search, and returns the surviving units. */
case class SpanDedupKeep(
    lines: Expression,
    dupS: Expression,
    dupKd: Expression,
    dupKi: Expression,
    docId: Expression,
    n: Int) extends QuinaryExpression {
  override def children: Seq[Expression] = Seq(lines, dupS, dupKd, dupKi, docId)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "span_dedup_keep"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (lines.dataType, dupS.dataType, dupKd.dataType, dupKi.dataType,
      docId.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _),
        ArrayType(LongType, _), ArrayType(LongType, _), LongType) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "span_dedup_keep takes (ARRAY<STRING>, ARRAY<BIGINT>, ARRAY<BIGINT>, " +
        s"ARRAY<BIGINT>, BIGINT), got (${children.map(_.dataType.sql).mkString(", ")})")
  }
  override protected def nullSafeEval(
      a: Any, b: Any, c: Any, d: Any, e: Any): Any =
    HashOps.spanDedupKeep(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData],
      e.asInstanceOf[Long], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d, e) =>
      s"${HashExprs.H}.spanDedupKeep($a, $b, $c, $d, $e, $n)")
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpanDedupKeep =
    copy(lines = newChildren(0), dupS = newChildren(1), dupKd = newChildren(2),
      dupKi = newChildren(3), docId = newChildren(4))
}

/** `sorted_position(a ARRAY<BIGINT> sorted ascending, key) -> BIGINT`
  * — 1-based position of `key` via binary search, 0 when absent (see
  * [[HashOps.sortedPosition]]); the broadcast dup-set probe (c12).
  * `array_position` is a linear scan — over a duplicated-span set
  * that grows with corpus boilerplate, the probe must be O(log n). */
case class SortedPosition(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_position"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashOps.sortedPosition(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${HashExprs.H}.sortedPosition($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedPosition =
    copy(left = newLeft, right = newRight)
}

case class DotLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${HashExprs.H}.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

/** `bpe_merge_step(syms, 'a', 'b') -> ARRAY<STRING>` — one BPE merge
  * applied left-greedy to a symbol array (see
  * [[HashOps.bpeMergeStep]]); the per-round state rewrite of
  * [[graft.operators.Bpe.train]], compiled so the whole training loop
  * stays inside whole-stage codegen. */
case class BpeMergeStep(child: Expression, a: String, b: String)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_step"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_merge_step takes ARRAY<STRING>, got ${dt.sql}")
    }

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)

  override protected def nullSafeEval(input: Any): Any =
    HashOps.bpeMergeStep(input.asInstanceOf[ArrayData], ua, ub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeLeft", ua, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("bpeRight", ub, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.bpeMergeStep($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeStep =
    copy(child = newChild)
}

/** `bpe_encode_len(syms; merges) -> BIGINT` — the full pinned merge
  * table applied left-greedy round by round, returning only the FINAL
  * symbol count (see [[HashOps.bpeEncodeLen]]). The fused spelling of
  * `size(foldLeft(bpe_merge_step))` for callers (t22/t27) that consume
  * nothing but the encoded length: one working array per document
  * instead of |merges| intermediate ArrayData allocations. */
case class BpeEncodeLen(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_encode_len"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_encode_len takes ARRAY<STRING>, got ${dt.sql}")
    }

  @transient private lazy val ls: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val rs: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient private lazy val abs: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1 + m._2)).toArray

  override protected def nullSafeEval(input: Any): Any =
    HashOps.bpeEncodeLen(input.asInstanceOf[ArrayData], ls, rs, abs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = s"${classOf[UTF8String].getName}[]"
    val lsRef = ctx.addReferenceObj("bpeLs", ls, cls)
    val rsRef = ctx.addReferenceObj("bpeRs", rs, cls)
    val absRef = ctx.addReferenceObj("bpeAbs", abs, cls)
    defineCodeGen(ctx, ev,
      c => s"${HashExprs.H}.bpeEncodeLen($c, $lsRef, $rsRef, $absRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeLen =
    copy(child = newChild)
}

/** `char_syms(tokens, bound) -> ARRAY<STRING>` — document-level
  * BPE-initial symbol array (see [[HashOps.charSyms]]); the front end
  * of the tokenizer-apply pipeline (t22): one compiled pass instead of
  * a nested interpreted `transform(.., w -> transform(..))` flatten. */
case class CharSyms(child: Expression, bound: String) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_syms"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_syms takes ARRAY<STRING>, got ${dt.sql}")
    }
  @transient private lazy val ub = UTF8String.fromString(bound)
  override protected def nullSafeEval(input: Any): Any =
    HashOps.charSyms(input.asInstanceOf[ArrayData], ub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("charSymsBound", ub, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.charSyms($c, $bRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): CharSyms =
    copy(child = newChild)
}

/** `luhn_valid_count(cands ARRAY<STRING>) -> BIGINT` — Luhn-valid
  * candidate count (see [[HashOps.luhnValidCount]]); the per-document
  * PII-audit reducer, compiled. */
case class LuhnValidCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "luhn_valid_count"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"luhn_valid_count takes ARRAY<STRING>, got ${dt.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    HashOps.luhnValidCount(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.luhnValidCount($c)")
  override protected def withNewChildInternal(newChild: Expression): LuhnValidCount =
    copy(child = newChild)
}

/** `top_grams(t ARRAY<STRING>) -> ARRAY<STRUCT<n INT, gram STRING,
  * cnt BIGINT>>` — per-document top n-gram for n = 2/3/4 (see
  * [[HashOps.topGrams]]); t31's reducer. `inline` the result for the
  * (doc, n) output grain — a 3-element Generate, never a gram
  * explode. */
case class TopGrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_grams"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_grams takes ARRAY<STRING>, got ${dt.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    HashOps.topGrams(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.topGrams($c)")
  override protected def withNewChildInternal(newChild: Expression): TopGrams =
    copy(child = newChild)
}

/** `dup_gram_chars(t ARRAY<STRING>) -> ARRAY<BIGINT>` — duplicated
  * n-gram char coverage for n = 5..10, indexed n−5 (see
  * [[HashOps.dupGramChars]]); t32's gram reducer. */
case class DupGramChars(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dup_gram_chars"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dup_gram_chars takes ARRAY<STRING>, got ${dt.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    HashOps.dupGramChars(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.dupGramChars($c)")
  override protected def withNewChildInternal(newChild: Expression): DupGramChars =
    copy(child = newChild)
}

/** `dup_elem_stats(a ARRAY<STRING>) -> ARRAY<BIGINT>` —
  * [total, dupCount, dupChars] over non-empty elements (see
  * [[HashOps.dupElemStats]]); t32's line/paragraph reducer. */
case class DupElemStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dup_elem_stats"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dup_elem_stats takes ARRAY<STRING>, got ${dt.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    HashOps.dupElemStats(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.dupElemStats($c)")
  override protected def withNewChildInternal(newChild: Expression): DupElemStats =
    copy(child = newChild)
}

/** `log_bucket(v BIGINT) -> INT` — fixed monotone log bucketing (see
  * [[HashOps.logBucket]]); powers the two-pass exact quantile
  * selection in `Ranks.groupQuantilesDisc`. */
case class LogBucket(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "log_bucket"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"log_bucket takes BIGINT/INT, got ${dt.sql}")
    }
  private lazy val asLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case _        => v => v.asInstanceOf[Int].toLong
  }
  override protected def nullSafeEval(input: Any): Any =
    HashOps.logBucket(asLong(input))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${HashExprs.H}.logBucket((long)($c))")
  override protected def withNewChildInternal(newChild: Expression): LogBucket =
    copy(child = newChild)
}

object HashExprs {

  /** Generated-Java reference to the HashOps singleton. */
  private[functions] val H: String =
    HashOps.getClass.getName.stripSuffix("$") + "$.MODULE$"

  def log_bucket(c: Column): Column = Bridge.column(LogBucket(Bridge.expression(c)))
  def bpe_merge_step(c: Column, a: String, b: String): Column =
    Bridge.column(BpeMergeStep(Bridge.expression(c), a, b))
  def bpe_encode_len(c: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeLen(Bridge.expression(c), merges))
  def char_syms(c: Column, bound: String): Column =
    Bridge.column(CharSyms(Bridge.expression(c), bound))
  def luhn_valid_count(c: Column): Column =
    Bridge.column(LuhnValidCount(Bridge.expression(c)))
  def top_grams(c: Column): Column = Bridge.column(TopGrams(Bridge.expression(c)))
  def dup_gram_chars(c: Column): Column =
    Bridge.column(DupGramChars(Bridge.expression(c)))
  def dup_elem_stats(c: Column): Column =
    Bridge.column(DupElemStats(Bridge.expression(c)))

  def char_fold(c: Column): Column = Bridge.column(CharFold(Bridge.expression(c)))
  def tokenize(c: Column): Column = Bridge.column(Tokenize(Bridge.expression(c)))
  def char_fold_array(c: Column): Column = Bridge.column(CharFoldArray(Bridge.expression(c)))
  def shingle_hashes(c: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), n))
  def token_ngrams(c: Column, n: Int): Column =
    Bridge.column(TokenNgrams(Bridge.expression(c), n))
  def simhash16(c: Column): Column = Bridge.column(SimHash16(Bridge.expression(c)))
  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))
  def winnow(c: Column, w: Int): Column = Bridge.column(Winnow(Bridge.expression(c), w))
  def subword_count(c: Column): Column = Bridge.column(SubwordCount(Bridge.expression(c)))
  def count_in(c: Column, words: Seq[String]): Column =
    Bridge.column(CountIn(Bridge.expression(c), words))
  def score_in(c: Column, weights: Seq[(String, Long)]): Column =
    Bridge.column(ScoreIn(Bridge.expression(c), weights))
  def alpha_token_count(c: Column): Column =
    Bridge.column(AlphaTokenCount(Bridge.expression(c)))
  def line_shape_stats(c: Column): Column =
    Bridge.column(LineShapeStats(Bridge.expression(c)))
  def c4_keep_lines(c: Column, minWords: Int): Column =
    Bridge.column(C4KeepLines(Bridge.expression(c), minWords))
  def sorted_position(a: Column, key: Column): Column =
    Bridge.column(SortedPosition(Bridge.expression(a), Bridge.expression(key)))
  def span_dedup_keep(lines: Column, dupS: Column, dupKd: Column,
      dupKi: Column, docId: Column, n: Int = 3): Column =
    Bridge.column(SpanDedupKeep(Bridge.expression(lines),
      Bridge.expression(dupS), Bridge.expression(dupKd),
      Bridge.expression(dupKi), Bridge.expression(docId), n))
  def hyperplane_bucket(c: Column, nPlanes: Int): Column =
    Bridge.column(HyperplaneBucket(Bridge.expression(c), nPlanes))
  def dot_long(a: Column, b: Column): Column =
    Bridge.column(DotLong(Bridge.expression(a), Bridge.expression(b)))

  /** Register SQL names in this session (integer literal second args). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("char_fold", es => CharFold(es.head), "built-in")
    reg.createOrReplaceTempFunction("char_fold_array", es => CharFoldArray(es.head), "built-in")
    reg.createOrReplaceTempFunction("dot_long", es => DotLong(es(0), es(1)), "built-in")
  }
}
