package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode stub: histogram mass ~1, dimensions follow the formula") {
    val row = Multimodal.MediaRow(7L, "hello world".getBytes("UTF-8"), "src0")
    val f = Multimodal.decodeStub(row)
    assert(f.n_bytes == 11L)
    assert(f.width == 64 + 11 % 64 && f.height == 64)
    assert(math.abs(f.features.sum - 1.0) < 1e-9)
    assert(f.features.length == 16)
  }

  private def imageBytes(fmt: String, w: Int, h: Int)
      (paint: java.awt.image.BufferedImage => Unit): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    paint(im)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("real decode: a synthetic BMP reports raster dims and luminance histogram") {
    // 8x8 all-black → every pixel lands in luminance bin 0
    val black = imageBytes("bmp", 8, 8)(_ => ())
    val f = Multimodal.decode(Multimodal.MediaRow(1L, black, "s"))
    assert(f.width == 8 && f.height == 8)
    assert(f.n_bytes == black.length.toLong)
    assert(math.abs(f.features(0) - 1.0) < 1e-9 && f.features.drop(1).forall(_ == 0.0))
    // all-white PNG → top bin
    val white = imageBytes("png", 5, 3) { im =>
      (0 until 3).foreach(y => (0 until 5).foreach(x => im.setRGB(x, y, 0xFFFFFF)))
    }
    val g = Multimodal.decode(Multimodal.MediaRow(2L, white, "s"))
    assert(g.width == 5 && g.height == 3)
    assert(math.abs(g.features(15) - 1.0) < 1e-9)
  }

  test("non-image payloads fall back to the stub (oracle-reproducible path)") {
    def same(a: Multimodal.MediaFeatures, b: Multimodal.MediaFeatures) =
      a.media_id == b.media_id && a.width == b.width && a.height == b.height &&
        a.n_bytes == b.n_bytes && a.features.sameElements(b.features)
    val row = Multimodal.MediaRow(3L, "plain text payload".getBytes("UTF-8"), "s")
    assert(!Multimodal.looksLikeImage(row.content))
    assert(same(Multimodal.decode(row), Multimodal.decodeStub(row)))
    // a corrupt payload WITH an image magic number still falls back
    val corrupt = Multimodal.MediaRow(4L,
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1, 2, 3), "s")
    assert(Multimodal.looksLikeImage(corrupt.content))
    assert(same(Multimodal.decode(corrupt), Multimodal.decodeStub(corrupt)))
  }

  test("synthetic WAV decodes for real; text payloads take the audio stub") {
    import javax.sound.sampled._
    // 100 frames of 16-bit mono PCM at 22050 Hz, written through the
    // real encoder so the header is authentic
    val pcm = new Array[Byte](200)
    val fmt = new AudioFormat(22050f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 100L)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    assert(Multimodal.looksLikeWav(wav))
    val m = Multimodal.decodeWav(Multimodal.MediaRow(7L, wav, "s")).get
    assert(m.sample_rate == 22050L && m.channels == 1L && m.n_samples == 100L)
    // text payloads: stub metadata, a pure function of byte length
    val txt = "plain text payload".getBytes("UTF-8")
    assert(!Multimodal.looksLikeWav(txt))
    val st = Multimodal.audioStub(Multimodal.MediaRow(8L, txt, "s"))
    assert(st.n_bytes == txt.length &&
      st.sample_rate == 8000L + (txt.length % 8) * 1000L &&
      st.channels == 1L + txt.length % 2 && st.n_samples == txt.length)
  }

  private def gradientPng(w: Int, h: Int, invert: Boolean = false,
      tweak: Option[(Int, Int)] = None): Array[Byte] =
    imageBytes("png", w, h) { im =>
      for (y <- 0 until h; x <- 0 until w) {
        val base = (x * 255) / (w - 1)
        val v0 = if (invert) 255 - base else base
        val v = tweak match {
          case Some((tx, ty))
            if math.abs(x - tx) <= 1 && math.abs(y - ty) <= 1 =>
            math.min(255, v0 + 4)
          case _ => v0
        }
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }

  test("dHash: stable under re-encode + tiny touch-ups, far for reversed content") {
    val base = gradientPng(64, 48)
    val hBase = Multimodal.imageDHash(
      Multimodal.MediaRow(1L, base, "s")).get
    // deterministic: same payload, same hash
    assert(Multimodal.imageDHash(Multimodal.MediaRow(9L, base, "s")).get == hBase)
    // a 3x3 patch nudged by 4 luminance steps flips at most a bit or two
    val near = gradientPng(64, 48, tweak = Some((30, 20)))
    val hNear = Multimodal.imageDHash(Multimodal.MediaRow(2L, near, "s")).get
    assert(java.lang.Long.bitCount(hBase ^ hNear) <= 3,
      s"near-dup drifted ${java.lang.Long.bitCount(hBase ^ hNear)} bits")
    // reversed gradient: every left>right comparison flips
    val far = gradientPng(64, 48, invert = true)
    val hFar = Multimodal.imageDHash(Multimodal.MediaRow(3L, far, "s")).get
    assert(java.lang.Long.bitCount(hBase ^ hFar) > 32,
      s"distinct images too close: ${java.lang.Long.bitCount(hBase ^ hFar)}")
    // a text payload is not minted a perceptual hash
    assert(Multimodal.imageDHash(
      Multimodal.MediaRow(4L, "not an image".getBytes, "s")).isEmpty)
  }

  test("near-dup image pairs: banded join finds the touch-up, not the reversal") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, gradientPng(64, 48), "s"),
      Multimodal.MediaRow(2L, gradientPng(64, 48, tweak = Some((30, 20))), "s"),
      Multimodal.MediaRow(3L, gradientPng(64, 48, invert = true), "s"),
      Multimodal.MediaRow(4L, "text payload, dropped".getBytes, "s"))
    val hashes = Multimodal.imageHashes(spark.createDataset(rows))
    assert(hashes.count() == 3, "undecodable payloads must drop")
    val pairs = Multimodal.nearDupImagePairs(hashes, 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("band plan: population thresholds, pigeonhole coverage, exact 64-bit split") {
    // plan derivation is a pinned deterministic function of population
    assert(Multimodal.imageBandBlocks(500L) == 4)
    assert(Multimodal.imageBandBlocks(1L << 16) == 4)
    assert(Multimodal.imageBandBlocks((1L << 16) + 1) == 5)
    assert(Multimodal.imageBandBlocks(1L << 25) == 5)
    assert(Multimodal.imageBandBlocks((1L << 25) + 1) == 6)
    for (nb <- 4 to 6) {
      val plan = Multimodal.bandPlanFor(nb, 3)
      // blocks partition the 64 bits exactly
      assert(plan.blocks.map(_._2).sum == 64)
      assert(plan.blocks.map(_._1) ==
        plan.blocks.map(_._2).scanLeft(0)(_ + _).dropRight(1))
      // C(B, B-3) tables; each keys on B-3 distinct blocks
      def c(n: Int, k: Int) = (1 to k).map(i => (n - i + 1).toLong)
        .product / (1 to k).map(_.toLong).product
      assert(plan.tables.size.toLong == c(nb, nb - 3))
      assert(plan.tables.forall(t => t.size == nb - 3 && t.distinct.size == t.size))
      // key width grows with the plan: the collision-bounding property
      assert(plan.minKeyBits >= Seq(16, 25, 31)(nb - 4))
    }
    // minimal plan == the historic 4x16 banding
    assert(Multimodal.bandPlanFor(4, 3).blocks ==
      IndexedSeq((0, 16), (16, 16), (32, 16), (48, 16)))
  }

  test("band plan affects candidates only: pair set invariant across plans") {
    import spark.implicits._
    // corpus-derived hashes (real codec round-trip), paired under the
    // minimal and the next-size plan: the verify + distinct must make
    // the FINAL pair set identical — the property that lets the plan
    // scale with population without touching the oracle
    val pngs = Multimodal.mediaTable(spark, sf0001).mapPartitions(_.map(r =>
      Multimodal.MediaRow(r.media_id, Multimodal.toGrayPng(r.content), r.source)))
    val hashes = Multimodal.imageHashes(pngs).cache()
    try {
      val p4 = Multimodal.nearDupImagePairsPlanned(
        hashes, Multimodal.bandPlanFor(4, 3), 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val p5 = Multimodal.nearDupImagePairsPlanned(
        hashes, Multimodal.bandPlanFor(5, 3), 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(p4 == p5, s"plans disagree: ${p4.diff(p5)} vs ${p5.diff(p4)}")
      assert(p4.nonEmpty, "fixture should contain near-dup images")
    } finally { hashes.unpersist(); () }
  }

  test("banded collisions stay bounded at a 10x population under the derived plan") {
    import spark.implicits._
    // deterministic pseudo-random hash population (splitmix64): at
    // n = 50k the rule keeps 4 blocks (n < 2^16 fails -> wait, 50k < 65536
    // so 4 blocks hold); at n = 500k it moves to 5 blocks. In both
    // regimes the expected per-item FALSE-candidate count stays ~1 or
    // below - the boundedness the plan derivation exists to maintain.
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d4b06b19a1b1eaL
      z ^ (z >>> 31)
    }
    for (n <- Seq(50000L, 500000L)) {
      val plan = Multimodal.bandPlanFor(Multimodal.imageBandBlocks(n), 3)
      val hashes = spark.range(n).as[Long].map(z => mix(z)).toDF("dhash")
        .select(monotonically_increasing_id().as("media_id"), col("dhash"))
      // per-(band, key) group sizes -> total candidate pairs
      def comboKey(h: org.apache.spark.sql.Column, combo: Seq[Int]) =
        combo.foldLeft(lit(0L)) { (acc, bi) =>
          val (sh, wd) = plan.blocks(bi)
          shiftleft(acc, wd) +
            shiftrightunsigned(h, sh).bitwiseAND(lit((1L << wd) - 1))
        }
      val banded = hashes.select(col("dhash"),
        explode(array(plan.tables.zipWithIndex.map { case (combo, t) =>
          struct(lit(t).as("band"), comboKey(col("dhash"), combo).as("key"))
        }: _*)).as("bk"))
        .select(col("bk.band").as("band"), col("bk.key").as("key"))
      val pairs = banded.groupBy("band", "key").count()
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
        .head().getLong(0)
      info(s"n=$n blocks=${plan.blocks.size}: $pairs candidate pairs " +
        f"(${pairs.toDouble / n}%.2f per item)")
      assert(pairs <= 2 * n,
        s"plan for n=$n leaves ${pairs.toDouble / n} false candidates per item")
    }
  }

  test("feature extraction runs distributed, one row per media item") {
    val n = Tables.documents(spark, sf0001).count()
    val feats = Multimodal.extractFeatures(spark, sf0001)
    assert(feats.count() == n)
    // payload bytes never collected to the driver: result schema is
    // features-only (no content column)
    assert(!feats.schema.fieldNames.contains("content"))
  }

  /** Animated GIF written through the stock `javax.imageio` sequence
    * writer — the real multi-frame fixture. Gray frames with ≤ 256
    * distinct colors round-trip the palette losslessly, so decoded
    * luminance is exact. */
  private def animatedGif(levels: Seq[Int], w: Int = 8, h: Int = 6): Array[Byte] = {
    import javax.imageio._
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    levels.foreach { v =>
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      writer.writeToSequence(new IIOImage(im, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("animated GIF: scene cuts run over REAL decoded frames") {
    // three real frames: 100, 100, 200 gray — one cut at frame 2
    val gif = animatedGif(Seq(100, 100, 200))
    val row = Multimodal.MediaRow(11L, gif, "s")
    val cuts = Multimodal.sceneCutsGif(row).get
    assert(cuts.n_frames == 3L, s"frame count: $cuts")
    assert(cuts.n_cuts == 1L && cuts.first_cut_frame.contains(2L), s"got $cuts")
    // a flat animation: frames decode but no cut fires
    val flat = Multimodal.sceneCutsGif(
      Multimodal.MediaRow(12L, animatedGif(Seq(80, 80, 80, 80)), "s")).get
    assert(flat.n_frames == 4L && flat.n_cuts == 0L && flat.first_cut_frame.isEmpty)
    // the query-level router: GIF payloads take the real path, and the
    // stub would have seen byte-frames of the FILE, not decoded frames
    val viaQuery = Multimodal.sceneCutsGif(row).get
    val viaStub = Multimodal.sceneCutStub(row)
    assert(viaQuery.n_frames != viaStub.n_frames,
      "fixture too small to distinguish real decode from the stub")
    // undecodable fallback untouched: text bytes still stub
    val txt = Multimodal.MediaRow(13L, "definitely not a gif".getBytes, "s")
    assert(Multimodal.sceneCutsGif(txt).isEmpty)
    // truncated GIF bytes: magic matches, decode fails -> stub fallback
    assert(Multimodal.sceneCutsGif(
      Multimodal.MediaRow(14L, gif.take(20), "s")).isEmpty)
  }

  test("animated GIF: frame sampling keeps every 4th REAL frame, checksum exact") {
    // 6 real frames -> frames 0 and 4 kept (SampleEvery = 4)
    val levels = Seq(10, 20, 30, 40, 50, 60)
    val gif = animatedGif(levels)
    val sf = Multimodal.frameSampleGif(Multimodal.MediaRow(21L, gif, "s")).get
    assert(sf.n_frames == 6L && sf.n_sampled == 2L, s"got $sf")
    // expected checksum: md5 over the kept frames' row-major luminance
    // bytes (uniform gray v -> lum v at every pixel, 8x6 = 48 bytes)
    val expected = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      Array.fill(48)(10.toByte) ++ Array.fill(48)(50.toByte))
    assert(sf.checksum == expected, s"checksum mismatch: $sf")
    // non-GIF payloads keep the stub path
    assert(Multimodal.frameSampleGif(
      Multimodal.MediaRow(22L, "not a gif".getBytes, "s")).isEmpty)
  }

  test("scene cuts: cross-multiplied threshold fires on a mean jump, not drift") {
    import org.apache.spark.sql.functions._

import graft.ext.Multimodal
    // frame0 = 64×'a' (mean 97), frame1 = 64×'z' (mean 122): jump 25 > 8
    // -> cut; frame2 = 10×'a' tail vs frame1: jump 25 again -> 2nd cut
    val jumpy = Multimodal.sceneCutStub(Multimodal.MediaRow(1L,
      Array.fill(64)('a'.toByte) ++ Array.fill(64)('z'.toByte) ++
        Array.fill(10)('a'.toByte), "s"))
    assert(jumpy.n_frames == 3 && jumpy.n_cuts == 2 &&
      jumpy.first_cut_frame.contains(1L), s"got $jumpy")
    // uniform payload: zero cuts, null first-cut
    val flat = Multimodal.sceneCutStub(
      Multimodal.MediaRow(2L, Array.fill(200)('m'.toByte), "s"))
    assert(flat.n_cuts == 0 && flat.first_cut_frame.isEmpty)
    // a sub-threshold jump does NOT fire: means 100 vs 107 (diff 7 < 8)
    val mild = Multimodal.sceneCutStub(Multimodal.MediaRow(3L,
      Array.fill(64)(100.toByte) ++ Array.fill(64)(107.toByte), "s"))
    assert(mild.n_cuts == 0, s"got $mild")
    // corpus query: every media reported once, counts within frame bound
    val rows = Multimodal.sceneCuts(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(2) <= math.max(0L, r.getLong(1) - 1))
      if (r.getLong(2) == 0) assert(r.isNullAt(3))
    }
  }

  test("image clusters cover every media; pairs share a rep; others singleton") {
    val reps = Multimodal.imageClusters(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = Tables.documents(spark, sf0001).count()
    assert(reps.size.toLong == n, "clusters must cover every media item")
    val pairs = Multimodal.imageDedup(spark, sf0001)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain verified image pairs")
    pairs.foreach { case (a, b) =>
      assert(reps(a)._1 == reps(b)._1, s"pair ($a,$b) split across clusters")
    }
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    reps.filterNot(kv => paired(kv._1)).foreach { case (v, (rep, size)) =>
      assert(rep == v && size == 1L, s"non-paired media $v not a singleton")
    }
  }

  test("ImageIO's file-backed stream cache stays disabled") {
    // the default (true) turns every in-memory encode/decode into a
    // tmpdir temp-file round-trip — A/B'd 20× slower on the 5 M-doc
    // hash frame (Multimodal.scala's object initializer); any image
    // path loading the object must find the memory-cached setting
    Multimodal.decodeStub(Multimodal.MediaRow(0L, Array[Byte](1), "s"))
    assert(!javax.imageio.ImageIO.getUseCache,
      "ImageIO.useCache regressed to the file-backed default")
  }

  test("declared cut/sample faces agree with the codec-aware faces on a GIF-free corpus") {
    // the declared faces exclude GIF8-sniffing payloads (the oracle
    // gate); this corpus has none, so the two faces must be identical
    // row-for-row — a GIF8-prefixed generator change would shrink the
    // declared set on BOTH engines instead of silently diverging
    val declared = Multimodal.sceneCuts(spark, sf0001).collect().map(_.toSeq)
    val media = Multimodal.sceneCutsMedia(spark, sf0001).collect().map(_.toSeq)
    assert(declared.sameElements(media), "scene-cut faces diverge")
    val fsDecl = Multimodal.frameSample(spark, sf0001).collect().map(_.toSeq)
    val fsMedia = Multimodal.frameSampleMedia(spark, sf0001).collect().map(_.toSeq)
    assert(fsDecl.sameElements(fsMedia), "frame-sample faces diverge")
  }
}
