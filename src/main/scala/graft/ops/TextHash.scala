package graft.ops

/** Pure per-document text-hashing kernels for the dedup family.
  *
  * Round-1 lesson (VERDICT.md): expressing MinHash as k unrolled
  * higher-order-function Columns re-evaluates the tokenize/shingle
  * subtree per element (Catalyst does not CSE across lambda
  * boundaries) and emits multi-MiB task binaries — ~0.3 s/row. The
  * scale-correct shape is a single typed transform that tokenizes
  * ONCE per document and loops the k seeds in plain JIT'd Scala:
  * O(tokens + shingles×k) with zero codegen risk. These kernels are
  * that inner loop; DedupOps wires them into one mapPartitions.
  *
  * All hashes are deterministic pure functions of the text — no RNG,
  * no per-partition state — so signatures are reproducible across
  * partitionings and cluster sizes.
  */
object TextHash {

  /** SplitMix64 finalizer — strong 64-bit avalanche mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over a char range — allocation-free token hash. */
  @inline def fnv1a64(s: String, from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** Lowercased word tokens: runs of letters/digits, everything else is a
    * separator. Single pass, no regex (the hot path at 100 TB). */
  def tokens(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && !Character.isLetterOrDigit(text.charAt(i))) i += 1
      val start = i
      while (i < n && Character.isLetterOrDigit(text.charAt(i))) i += 1
      if (i > start) out += text.substring(start, i).toLowerCase
    }
    out.toArray
  }

  /** 64-bit hashes of each token (lowercased), one pass, no substring
    * allocation: hash chars directly with a lowercase fold. */
  def tokenHashes(text: String): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && !Character.isLetterOrDigit(text.charAt(i))) i += 1
      if (i < n) {
        var h = 0xCBF29CE484222325L
        while (i < n && Character.isLetterOrDigit(text.charAt(i))) {
          h ^= Character.toLowerCase(text.charAt(i)).toLong
          h *= 0x100000001B3L
          i += 1
        }
        out += h
      }
    }
    out.result()
  }

  /** Distinct 64-bit hashes of word `w`-gram shingles. A shingle hash
    * combines the `w` token hashes position-sensitively. Documents with
    * fewer than `w` tokens get one shingle over all their tokens. */
  def shingleHashes(th: Array[Long], w: Int): Array[Long] = {
    if (th.isEmpty) return Array.empty
    val n = math.max(th.length - (w - 1), 1)
    val set = new java.util.HashSet[Long](n * 2)
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    while (i < n) {
      var h = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < w && i + j < th.length) {
        h = mix64(h ^ (th(i + j) * (j + 1)))
        j += 1
      }
      if (set.add(h)) out += h
      i += 1
    }
    out.result()
  }

  /** Fixed seed stream for the k minhash permutations. */
  @inline private def seed(i: Int): Long = mix64(0xA24BAED4963EE407L + i * 0x9FB21C651E98DF25L)

  /** k-minhash signature over shingle hashes: sig(i) = min over shingles
    * of mix64(shingle ^ seed_i). O(shingles × k), branch-light. */
  def minhash(shingles: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val sh = shingles(s)
      var i = 0
      while (i < k) {
        val h = mix64(sh ^ seed(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** 64-bit SimHash over token hashes: each token votes ±1 on each bit of
    * its 64-bit hash; the result's bit b is 1 iff the vote sum is > 0.
    * (Round 1 used 16 bits with 4-bit bands — 16 distinct keys per band
    * made the band join near-cartesian; 64 bits with 16-bit bands keeps
    * bucket cardinality ~2^16 per band.) */
  def simhash64(th: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Exact Jaccard between two distinct-hash sets (sorted not required). */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val set = new java.util.HashSet[Long](a.length * 2)
    var i = 0
    while (i < a.length) { set.add(a(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < b.length) { if (set.contains(b(j))) inter += 1; j += 1 }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}
