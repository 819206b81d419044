package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct char-n-gram hash set (reference analog: the survey's
  * n-gram Jaccard dedup family). Static helper so generated code can call
  * it directly. */
object ShingleMath {
  /** Per-thread gram→hash memo. The char-n-gram domain is charset^n-
    * bounded and tiny in practice (1,891 distinct 3-grams across the
    * whole sf1 corpus), so md5 runs ~once per distinct gram per thread
    * instead of once per position. Capped: past 1<<17 entries new grams
    * hash directly (adversarial charsets degrade to the uncached cost,
    * never to unbounded memory). */
  private val CACHE_CAP = 1 << 17
  // outer key = (mod, fast): the memo'd value depends on the hash config,
  // and one JVM can evaluate both profiles (the parity spec does)
  private val tlCache: ThreadLocal[java.util.HashMap[
      (Long, Boolean), java.util.HashMap[UTF8String, java.lang.Long]]] =
    ThreadLocal.withInitial(() => new java.util.HashMap())

  private[expressions] def cacheFor(mod: Long, fast: Boolean) =
    tlCache.get().computeIfAbsent((mod, fast),
      _ => new java.util.HashMap[UTF8String, java.lang.Long]())

  private[expressions] def rawHash(gram: UTF8String, mod: Long, fast: Boolean): Long =
    if (fast) XxHash64Function.hash(gram, StringType, 42L) % mod
    else HashMath.md5Long60(gram) % mod

  /** Sorted distinct hashes of the char n-grams of `s`:
    * value-identical to
    * `sort_array(collect_set(md5Long60(substr(s, i, n)) % mod))` over
    * i ∈ [1, len-n+1] (or xxhash64 in the fast profile), but one O(len)
    * walk — the composed explode+substr form re-scanned the string per
    * position (O(len²)) and ran one md5 per POSITION. */
  def shingleSet(s: UTF8String, n: Int, mod: Long, fast: Boolean): ArrayData = {
    val b = s.getBytes
    val nb = b.length
    // char-start byte offsets, one walk (CdcMath pattern)
    val offs = new Array[Int](nb + 1)
    var m = 0
    var i = 0
    while (i < nb) {
      if ((b(i) & 0xc0) != 0x80) { offs(m) = i; m += 1 }
      i += 1
    }
    offs(m) = nb // sentinel: end of the last char
    val cnt = m - n + 1
    if (cnt <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val cache = cacheFor(mod, fast)
    val hs = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      val from = offs(i)
      val len = offs(i + n) - from
      // zero-copy view for the lookup; bytes are copied only on a miss
      val view = UTF8String.fromBytes(b, from, len)
      val cached = cache.get(view)
      if (cached ne null) hs(i) = cached.longValue()
      else {
        val owned = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(b, from, from + len))
        val h = rawHash(owned, mod, fast)
        if (cache.size < CACHE_CAP) cache.put(owned, java.lang.Long.valueOf(h))
        hs(i) = h
      }
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted run
    var w = 1
    i = 1
    while (i < cnt) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }
}

object WordShingleMath {
  /** The word-n-gram domain is NOT charset^n-bounded like char grams —
    * on a real corpus it is effectively unbounded, so the char path's
    * grow-only HashMap memo would retain ~10+ MB of owned gram keys per
    * executor thread for the JVM lifetime and, once capped, keep paying
    * the lookup on a collapsed hit rate (r10 advice). The word path
    * instead uses a fixed-size DIRECT-MAPPED cache: 2^15 slots,
    * overwrite on collision. Memory is strictly bounded (slot count ×
    * gram size), hot templated grams stay resident, and an adversarial
    * stream degrades to one equality check over the raw-hash cost —
    * never to unbounded growth. */
  private val SLOT_BITS = 15
  private val SLOTS = 1 << SLOT_BITS
  private final class DirectMap {
    val keys = new Array[UTF8String](SLOTS)
    val mods = new Array[Long](SLOTS)
    val fasts = new Array[Boolean](SLOTS)
    val vals = new Array[Long](SLOTS)
  }
  private val tlMap: ThreadLocal[DirectMap] =
    ThreadLocal.withInitial(() => new DirectMap)

  /** Cached hash of an OWNED gram (concatWs output is a fresh buffer). */
  private def hashWordGram(gram: UTF8String, mod: Long, fast: Boolean): Long = {
    val m = tlMap.get()
    // Fibonacci spread of the JVM hashCode into the slot index
    val idx = (gram.hashCode() * 0x9e3779b9) >>> (32 - SLOT_BITS)
    val k = m.keys(idx)
    if ((k ne null) && m.mods(idx) == mod && m.fasts(idx) == fast &&
        k.equals(gram)) {
      m.vals(idx)
    } else {
      val h = ShingleMath.rawHash(gram, mod, fast)
      m.keys(idx) = gram
      m.mods(idx) = mod
      m.fasts(idx) = fast
      m.vals(idx) = h
      h
    }
  }

  /** Sorted distinct hashes of the space-joined word n-grams of `w`:
    * value-identical to
    * `sort_array(collect_set(md5Long60(concat_ws(' ', w[i..i+n))) % mod))`
    * (or xxhash64 in the fast profile) over i ∈ [0, size-n]. */
  def wordShingleSet(w: ArrayData, n: Int, mod: Long, fast: Boolean): ArrayData = {
    val m = w.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val sep = UTF8String.fromString(" ")
    val hs = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = w.getUTF8String(i + j); j += 1 }
      hs(i) = hashWordGram(UTF8String.concatWs(sep, parts: _*), mod, fast)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var wp = 1
    i = 1
    while (i < cnt) {
      if (hs(i) != hs(wp - 1)) { hs(wp) = hs(i); wp += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, wp))
  }
}

/** Static minhash-from-set helper (callable from generated code). */
object MinhashMath {
  /** sig_j = min over x∈sh of (x·A_j + B_j) % M31 — the same universal
    * family as Dedup.minhashAggs (min over the multiset equals min over
    * the set), one tight loop per doc instead of nHashes aggregate
    * passes over exploded rows. */
  def minhashFromSet(sh: ArrayData, nHashes: Int): ArrayData = {
    val m31 = 2147483647L
    val n = sh.numElements()
    // empty shingle set → empty signature, NOT nHashes Long.MaxValue
    // sentinels: with the sentinel every empty doc shared one signature
    // and would band-collide with every other empty doc in LSH (r10
    // advice). The composed collect_set path emits NO row for an empty
    // doc, so there is no signature to be identical to; an empty array
    // keeps element_at-style band extraction null (dropped by equi-
    // joins) for any future unguarded caller. Current callers pre-filter
    // (size >= shingle length), so this is a latent-contract fix.
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val out = new Array[Long](nHashes)
    var j = 0
    while (j < nHashes) {
      val a = 1000003L + j * 7919L
      val b = 12345L + j * 104729L
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (sh.getLong(i) * a + b) % m31
        if (v < mn) mn = v
        i += 1
      }
      out(j) = mn
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native distinct-shingle-set builder: string → sorted array<long> of
  * per-char-n-gram hashes in one pass. Value-identical to the composed
  * explode(sequence)/substr/md5/collect_set/sort_array pipeline on any
  * input (ShingleSetSpec asserts this on the real documents table and on
  * adversarial unicode), O(len) instead of O(len²) per row and ~one md5
  * per distinct gram instead of per position. `fast` is baked in at plan
  * construction from the session hash profile, like every PortableHash
  * call site. */
case class ShingleSet(child: Expression, n: Int, mod: Long, fast: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override protected def nullSafeEval(s: Any): Any =
    ShingleMath.shingleSet(s.asInstanceOf[UTF8String], n, mod, fast)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.expressions.ShingleMath.shingleSet($s, $n, ${mod}L, $fast)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native distinct word-n-gram hash set: array<string> of words → sorted
  * array<long> of space-joined-n-gram hashes, one tight loop per row
  * instead of explode + concat_ws + md5-per-position + collect_set
  * (WordShingleSetSpec asserts value-identity with the composed form). */
case class WordShingleSet(child: Expression, n: Int, mod: Long, fast: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_shingle_set"

  override protected def nullSafeEval(w: Any): Any =
    WordShingleMath.wordShingleSet(w.asInstanceOf[ArrayData], n, mod, fast)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      w => s"graft.expressions.WordShingleMath.wordShingleSet($w, $n, ${mod}L, $fast)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native minhash signature from an already-distinct base-hash set:
  * array<long> → array<long> of nHashes mins of the (x·A_j + B_j) % M31
  * universal family — value-identical to Dedup.minhashAggs over the
  * exploded multiset (min over multiset == min over set). */
case class MinhashFromSet(child: Expression, nHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_from_set"

  override protected def nullSafeEval(sh: Any): Any =
    MinhashMath.minhashFromSet(sh.asInstanceOf[ArrayData], nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      sh => s"graft.expressions.MinhashMath.minhashFromSet($sh, $nHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
