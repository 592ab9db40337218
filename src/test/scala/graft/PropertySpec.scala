package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.GraftHash
import graft.operators.Multimodal

/** Property-based tests for the pure kernels behind the custom
  * Catalyst expressions and byte parsers — randomized inputs against
  * straightforward reference implementations. No SparkSession: these
  * exercise exactly the code that generated queries call per row.
  */
object PropertySpec extends Properties("graft.kernels") {
  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val words: Gen[List[String]] = Gen.nonEmptyListOf(word)
  private val ws: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(' ', '\t', '\n')).map(_.mkString)

  private def refGrams(w: List[String], n: Int): List[String] =
    if (w.length < n) List(w.mkString(" "))
    else w.sliding(n).map(_.mkString(" ")).toList

  private def gramsOf(text: String, n: Int): List[String] = {
    val a = GraftHash.shingleStrings(UTF8String.fromString(text), n)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString).toList
  }

  property("shingleStrings == sliding-window reference, any separators") =
    forAll(words, Gen.choose(1, 5), ws, Gen.choose(0, 3), Gen.choose(0, 3)) {
      (w, n, sep, lead, trail) =>
        // single-space text and messy-whitespace text both normalize to
        // the same grams; leading/trailing SPACES are trimmed
        val clean = w.mkString(" ")
        val messy = (" " * lead) + w.mkString(sep) + (" " * trail)
        gramsOf(clean, n) == refGrams(w, n) && gramsOf(messy, n) == refGrams(w, n)
    }

  property("shingleStrings gram count and width") =
    forAll(words, Gen.choose(1, 5)) { (w, n) =>
      val g = gramsOf(w.mkString(" "), n)
      g.length == math.max(w.length - n + 1, 1) &&
        (w.length < n || g.forall(_.split(" ").length == n))
    }

  property("shingleHashes is sorted and distinct") =
    forAll(words, Gen.choose(1, 4)) { (w, n) =>
      val a = GraftHash.shingleHashes(UTF8String.fromString(w.mkString(" ")), n)
      val hs = (0 until a.numElements()).map(a.getLong)
      hs == hs.sorted && hs.distinct.length == hs.length
    }

  property("sortedIntersectCount == set intersection size") =
    forAll(Gen.listOf(Gen.choose(-50L, 50L)), Gen.listOf(Gen.choose(-50L, 50L))) {
      (a, b) =>
        val sa = a.distinct.sorted; val sb = b.distinct.sorted
        def arr(xs: List[Long]): ArrayData = new GenericArrayData(xs.toArray)
        GraftHash.sortedIntersectCount(arr(sa), arr(sb)) ==
          sa.toSet.intersect(sb.toSet).size
    }

  property("hyperplaneSig: deterministic, bounded by 2^bits") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-1f, 1f)), Gen.choose(1, 16),
        Gen.choose(0, 7)) { (v, bits, table) =>
      val arr = new GenericArrayData(v.toArray)
      val s1 = GraftHash.hyperplaneSig(arr, bits, table)
      val s2 = GraftHash.hyperplaneSig(new GenericArrayData(v.toArray), bits, table)
      s1 == s2 && s1 >= 0 && s1 < (1L << bits)
    }

  property("kmvOverlap is exact below capacity, for any two sets") =
    forAll(Gen.listOf(Gen.choose(-40L, 40L)), Gen.listOf(Gen.choose(-40L, 40L))) {
      (a, b) =>
        val sa = a.distinct.sorted; val sb = b.distinct.sorted
        def arr(xs: List[Long]) = new GenericArrayData(xs.toArray)
        // capacity 256 > |union| always here -> exact regime
        val r = GraftHash.kmvOverlap(arr(sa), arr(sb), 256)
        val inter = sa.toSet.intersect(sb.toSet).size
        val union = sa.toSet.union(sb.toSet).size
        val jacOk =
          if (union == 0) r.getDouble(0) == 0.0
          else r.getDouble(0) == inter.toDouble / union.toDouble
        jacOk && r.getDouble(1) == inter.toDouble && r.getDouble(2) == union.toDouble
    }

  private def be32(v: Long) =
    Seq((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff).map(_.toInt)
  private def be16(v: Int) = Seq((v >> 8) & 0xff, v & 0xff)
  private def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
  private def le32(v: Long) = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
    (v >> 24) & 0xff).map(_.toInt)

  property("PNG dimension roundtrip") =
    forAll(Gen.choose(1L, 1000000L), Gen.choose(1L, 1000000L)) { (wd, ht) =>
      val png = (Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a) ++
        be32(13) ++ "IHDR".map(_.toInt) ++ be32(wd) ++ be32(ht))
        .map(_.toByte).toArray
      Multimodal.imageDimensions(png).contains(("png", wd.toInt, ht.toInt))
    }

  property("JPEG SOF dimension roundtrip through skip markers") =
    forAll(Gen.choose(1, 65535), Gen.choose(1, 65535), Gen.choose(0, 64)) {
      (wd, ht, pad) =>
        // SOI, APP0 with `pad` payload bytes, then SOF0
        val jpg = (Seq(0xff, 0xd8, 0xff, 0xe0) ++ be16(pad + 2) ++
          Seq.fill(pad)(0x55) ++
          Seq(0xff, 0xc0, 0x00, 0x0b, 0x08) ++ be16(ht) ++ be16(wd) ++
          Seq(0x03, 0, 0, 0)).map(_.toByte).toArray
        Multimodal.imageDimensions(jpg).contains(("jpg", wd, ht))
    }

  property("WAVE metadata roundtrip") =
    forAll(Gen.choose(1, 8), Gen.oneOf(8000, 16000, 22050, 44100, 48000),
        Gen.oneOf(8, 16, 24, 32), Gen.choose(1L, 1000000L)) {
      (ch, rate, bits, frames) =>
        val dataLen = frames * ch * (bits / 8)
        val wav = ("RIFF".map(_.toInt) ++ le32(36 + dataLen) ++
          "WAVE".map(_.toInt) ++ "fmt ".map(_.toInt) ++ le32(16) ++
          le16(1) ++ le16(ch) ++ le32(rate.toLong) ++
          le32(rate.toLong * ch * (bits / 8)) ++ le16(ch * bits / 8) ++
          le16(bits) ++ "data".map(_.toInt) ++ le32(dataLen))
          .map(_.toByte).toArray
        Multimodal.audioMetadata(wav).contains(Multimodal.AudioMeta(
          1, ch, rate, bits, dataLen * 8000L / (ch.toLong * bits * rate)))
    }

  property("garbage is never parsed as media (and never throws)") =
    forAll(Gen.listOf(Gen.choose(0, 255))) { raw =>
      val bytes = raw.map(_.toByte).toArray
      // byte strings that don't start with a known signature must parse
      // to None; ones that do must at least not throw
      val startsSig = bytes.length >= 2 &&
        ((bytes(0) & 0xff) == 0x89 || (bytes(0) & 0xff) == 0xff ||
          bytes(0) == 'R'.toByte)
      val img = Multimodal.imageDimensions(bytes)
      val aud = Multimodal.audioMetadata(bytes)
      startsSig || (img.isEmpty && aud.isEmpty)
    }

  // ---- MinHash-LSH band derivation ----------------------------------

  property("minhashBandsFor: meets the bound, minimal, monotone") =
    forAll(Gen.choose(0.2, 0.95), Gen.choose(1, 8),
        Gen.oneOf(0.1, 0.05, 0.01, 0.001)) { (t, r, eps) =>
      val b = graft.operators.Dedup.minhashBandsFor(t, r, eps)
      def collide(bands: Int) = 1.0 - math.pow(1.0 - math.pow(t, r), bands)
      // the bound holds AT the threshold and is not over-provisioned
      val bound = collide(b) >= 1.0 - eps &&
        (b == 1 || collide(b - 1) < 1.0 - eps)
      // collision probability is monotone in j: any pair ABOVE the
      // threshold beats the bound too
      val above = collide(b) <= 1.0 - math.pow(1.0 - math.pow(
        math.min(t + 0.04, 0.99), r), b) + 1e-12
      // a stricter eps never needs fewer bands
      val mono = graft.operators.Dedup.minhashBandsFor(t, r, eps / 10) >= b
      bound && above && mono
    }

  property("pcmStats == per-sample reference on random PCM") =
    forAll(Gen.listOf(Gen.choose(-32768, 32767)), Gen.choose(1, 2)) {
      (samples, ch) =>
        val pcm = samples.flatMap(s => le16(s & 0xffff))
        val wav = ("RIFF".map(_.toInt) ++ le32(36L + pcm.size) ++
          "WAVE".map(_.toInt) ++ "fmt ".map(_.toInt) ++ le32(16) ++
          le16(1) ++ le16(ch) ++ le32(8000L) ++
          le32(8000L * ch * 2) ++ le16(ch * 2) ++ le16(16) ++
          "data".map(_.toInt) ++ le32(pcm.size.toLong) ++ pcm)
          .map(_.toByte).toArray
        Multimodal.pcmStats(wav).contains(Multimodal.PcmStats(
          samples.length,
          samples.map(_.toLong).sum,
          if (samples.isEmpty) 0 else samples.map(math.abs).max))
    }

  // ---- Misra-Gries heavy hitters ------------------------------------

  private def mgRun(tokens: Seq[String], capacity: Int):
      java.util.HashMap[String, Long] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    val agg = graft.functions.HeavyHitters(
      BoundReference(0, StringType, nullable = true), capacity, capacity)
    val buf = agg.createAggregationBuffer()
    tokens.foreach(t =>
      agg.update(buf, InternalRow(UTF8String.fromString(t))))
    buf
  }

  private def mgMerge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long], capacity: Int) = {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    graft.functions.HeavyHitters(
      BoundReference(0, StringType, nullable = true), capacity, capacity)
      .merge(a, b)
  }

  private val tokenStream: Gen[List[String]] =
    Gen.listOf(Gen.choose(0, 40).map(i => s"t$i"))

  property("Misra-Gries: MG bound, guaranteed recall, serde round-trip") =
    forAll(tokenStream, Gen.choose(1, 12)) { (toks, cap) =>
      val buf = mgRun(toks, cap)
      val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toDouble
      var ok = buf.size <= cap
      buf.forEach { (k, c) =>
        val t = truth(k)
        ok &&= c <= t && t - c <= n / (cap + 1)
      }
      // every item above the MG frequency threshold must be present
      truth.foreach { case (k, t) =>
        if (t > n / (cap + 1)) ok &&= buf.containsKey(k)
      }
      // serialization round-trips the counter set exactly
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      import org.apache.spark.sql.types.StringType
      val agg = graft.functions.HeavyHitters(
        BoundReference(0, StringType, nullable = true), cap, cap)
      ok && agg.deserialize(agg.serialize(buf)) == buf
    }

  property("string bounds: prefix is a lower bound, truncUpper an upper bound") =
    forAll(Gen.nonEmptyListOf(Gen.asciiPrintableChar).map(_.mkString),
      Gen.choose(1, 8)) { (s, n) =>
      // the truncated manifest bounds must BRACKET the true value in
      // UTF-8 byte order — the whole pruning-superset argument
      val lo = s.substring(0, math.min(s.length, n))
      val hi = graft.sources.FileManifest.truncUpper(s, n)
      graft.sources.FileManifest.u8cmp(lo, s) <= 0 &&
        graft.sources.FileManifest.u8cmp(hi, s) >= 0
    }

  property("bloom words: every inserted value contained, empty bloom contains none") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-100000L, 100000L)),
      Gen.oneOf(64, 128, 512), Gen.choose(1, 4)) { (vs, m, k) =>
      // replicate buildBloomManifest's word fold in plain scala: the
      // no-false-negative contract is structural (every probe of every
      // member is set), whatever the (m, k) shape
      val words = new Array[Long](m / 64)
      vs.distinct.foreach { v =>
        (0 until k).foreach { i =>
          val p = graft.sources.FileManifest.bloomPos(i, v, m)
          words(p >> 6) |= 1L << (p & 63)
        }
      }
      val b = graft.sources.FileManifest.BloomStats("f", m, k, words)
      val empty = graft.sources.FileManifest.BloomStats("e", m, k,
        new Array[Long](m / 64))
      vs.forall(b.mightContain) && vs.forall(!empty.mightContain(_))
    }

  property("Misra-Gries merge keeps the bound over both halves") =
    forAll(tokenStream, tokenStream, Gen.choose(1, 12)) { (xs, ys, cap) =>
      val merged = mgMerge(mgRun(xs, cap), mgRun(ys, cap), cap)
      val all = xs ++ ys
      val truth = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = all.size.toDouble
      var ok = merged.size <= cap
      merged.forEach { (k, c) =>
        val t = truth(k)
        // merging two summaries with error n_i/(cap+1) each gives at
        // most n/(cap+1) combined underestimate (mergeable-summaries)
        ok &&= c <= t && t - c <= n / (cap + 1)
      }
      ok
    }
}
