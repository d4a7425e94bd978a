package graft

import graft.operators.Multimodal

/** Multimodal pipeline: real container codecs (PPM / WAV PCM / Y4M)
  * over deterministically synthesized payloads — roundtrip, corrupt
  * input, frame sampling, and feature extraction. */
class MultimodalSpec extends SparkSpec {

  test("decode is a real parser: synthesize -> decode roundtrips every modality") {
    // kind comes from MAGIC bytes, dims/counts from headers, essence
    // from the data sections; 30 seeds cover all three modalities
    val all = (0 until 30).map(i =>
      Multimodal.decode(Multimodal.synthesize(s"text$i", s"source$i")))
    assert(all.map(_.kind).toSet == Set("image", "audio", "video"))
    all.foreach { d =>
      assert(d.data.nonEmpty)
      d.kind match {
        case "image" =>
          assert(d.width >= 8 && d.height >= 6)
          assert(d.data.length == d.width * d.height * 3)
        case "audio" =>
          assert(d.sampleRate == Multimodal.SampleRate)
          assert(d.nSamples >= 16 && d.data.length == d.nSamples * 2)
        case "video" =>
          assert(d.nFrames >= 2)
          assert(d.data.length == d.nFrames * d.width * d.height * 3)
      }
    }
  }

  test("PNG rung: a real compressed container roundtrips the formula pixels") {
    (0 until 10).foreach { i =>
      val text = s"png$i"
      val bytes = Multimodal.synthesizePng(text)
      // a REAL PNG: 8-byte signature and an IDAT chunk (the DEFLATE
      // stream) — this rung actually runs a compressed codec
      assert((bytes(0) & 0xff) == 0x89 &&
        new String(bytes.slice(1, 4), "US-ASCII") == "PNG")
      assert(new String(bytes, "ISO-8859-1").contains("IDAT"))
      val (w, h, rgb) = Multimodal.decodePng(bytes)
      assert(w == (Multimodal.hex32Jvm(text + "pw") % 24 + 8).toInt)
      assert(h == (Multimodal.hex32Jvm(text + "ph") % 18 + 6).toInt)
      // lossless: every decoded channel equals the generating formula
      val seed = Multimodal.hex32Jvm(text)
      assert(rgb.length == w * h * 3)
      rgb.zipWithIndex.foreach { case (b, j) =>
        assert((b & 0xff) == ((seed + j * Multimodal.ByteStep) % 256).toInt,
          s"pixel byte $j of $text")
      }
    }
  }

  test("JPEG rung: real container, SOF == decoded dims == formula dims, " +
      "decode deterministic, distortion bounded") {
    (0 until 12).foreach { i =>
      val text = s"jpeg$i"
      val bytes = Multimodal.synthesizeJpeg(text)
      // a REAL JPEG: SOI marker + JFIF segment
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      val fw = (Multimodal.hex32Jvm(text + "jw") % 24 + 8).toInt
      val fh = (Multimodal.hex32Jvm(text + "jh") % 18 + 6).toInt
      // two independent read paths agree with the generating formula
      val (sw, sh) = Multimodal.parseJpegSof(bytes)
      assert((sw, sh) == (fw, fh), s"SOF dims of $text")
      val (w, h, rgb) = Multimodal.decodeJpeg(bytes)
      assert((w, h) == (fw, fh), s"decoded dims of $text")
      assert(rgb.length == w * h * 3)
      // decode determinism (within one JDK): same bytes, same raster
      val (_, _, rgb2) = Multimodal.decodeJpeg(bytes)
      assert(java.util.Arrays.equals(rgb, rgb2), s"nondeterministic decode")
      // LOSSY, but bounded: mean |decoded - source gradient| measured
      // worst 14.7 across seeds at q=0.85; a channel-swapped decode
      // measures >=53 and garbage ~85, so 25 is loose enough for JDK
      // decoder revisions and still catches swaps/shifts/garbage
      val seed = Multimodal.hex32Jvm(text)
      var errSum = 0L
      var j = 0
      while (j < rgb.length) {
        val px = j / 3
        errSum += math.abs((rgb(j) & 0xff) -
          Multimodal.jpegEssence(seed, px % w, px / w, j % 3))
        j += 1
      }
      val meanErr = errSum.toDouble / rgb.length
      assert(meanErr < 25.0, s"$text: mean |err| $meanErr too high")
    }
  }

  test("sniffer dispatches JPEG payloads (SOI magic) to the JPEG path") {
    val bytes = Multimodal.synthesizeJpeg("sniffme")
    val d = Multimodal.decode(bytes)
    assert(d.kind == "image")
    assert(d.width == (Multimodal.hex32Jvm("sniffmejw") % 24 + 8))
    assert(d.height == (Multimodal.hex32Jvm("sniffmejh") % 18 + 6))
    assert(d.data.length == d.width * d.height * 3)
    intercept[IllegalArgumentException] {
      Multimodal.parseJpegSof("NOTAJPEG".getBytes("US-ASCII"))
    }
    // truncated stream fails the decoder, not silently passes
    intercept[IllegalArgumentException] {
      Multimodal.decodeJpeg(java.util.Arrays.copyOf(bytes, 8))
    }
  }

  test("parseJpegSof keeps the IllegalArgumentException contract on " +
      "malformed input (never ArrayIndexOutOfBounds)") {
    // trailing 0xFF fill: the FF-skip loop must not run off the end
    intercept[IllegalArgumentException] {
      Multimodal.parseJpegSof(
        Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff, 0xff).map(_.toByte))
    }
    // SOF marker present but its dim fields truncated
    intercept[IllegalArgumentException] {
      Multimodal.parseJpegSof(
        Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte))
    }
    // non-SOF segment whose 2-byte length field is cut mid-read
    intercept[IllegalArgumentException] {
      Multimodal.parseJpegSof(
        Array(0xff, 0xd8, 0xff, 0xe0, 0x00).map(_.toByte))
    }
    // a real payload truncated at EVERY prefix length either parses to
    // the true dims (prefix already contains the SOF) or throws the
    // documented IAE — any other exception (AIOOBE) fails the sweep
    val real = Multimodal.synthesizeJpeg("truncsweep")
    val full = Multimodal.parseJpegSof(real)
    (2 until real.length).foreach { n =>
      try {
        val d = Multimodal.parseJpegSof(java.util.Arrays.copyOf(real, n))
        assert(d == full, s"prefix $n parsed to wrong dims $d")
      } catch {
        case _: IllegalArgumentException => // the documented contract
      }
    }
  }

  test("JDK μ-law decode matches the hand G.711 expansion for all 256 " +
      "codes (the codec is a fixed table, pinned bit-for-bit)") {
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val dec = Multimodal.ulawDecode(codes)
    (0 until 256).foreach { i =>
      // ITU G.711 §4 expansion: invert, split sign/segment/mantissa,
      // reconstruct the interval midpoint ((2·mant+33)·2^seg − 33)·4
      val uval = ~i & 0xff
      val sign = uval & 0x80
      val seg = (uval >> 4) & 7
      val mant = uval & 0xf
      val mag = (((mant << 3) + 0x84) << seg) - 0x84
      val hand = if (sign != 0) -mag else mag
      val jdk = (((dec(2 * i) & 0xff) | (dec(2 * i + 1) << 8)).toShort).toInt
      assert(jdk == hand, s"code $i: JDK $jdk != G.711 $hand")
    }
  }

  test("μ-law roundtrip: error exactly bounded by the top-segment " +
      "half-step within the codebook range, idempotent modulo ±0") {
    // the FULL codebook range as one stream, not just fixture draws
    val n = 2 * Multimodal.UlawClip + 1
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = i - Multimodal.UlawClip
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val u = Multimodal.ulawEncode(pcm)
    assert(u.length == n, "1 byte per sample")
    val back = Multimodal.ulawDecode(u)
    var maxErr = 0
    (0 until n).foreach { i =>
      val a = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      val b = ((back(2 * i) & 0xff) | (back(2 * i + 1) << 8)).toShort.toInt
      maxErr = math.max(maxErr, math.abs(a - b))
    }
    // EXACT: the top segment's step is 1024, so the worst interior
    // error is 512 — and the sweep over every value attains it
    assert(maxErr == Multimodal.UlawMaxErr, s"max err $maxErr")
    // quantization idempotence: re-encoding the reconstruction levels
    // reproduces the codes, except −0 (0x7F) ≡ +0 (0xFF)
    val again = Multimodal.ulawEncode(back)
    (0 until n).foreach { i =>
      val same = u(i) == again(i) ||
        ((u(i) & 0x7f) == 0x7f && (again(i) & 0x7f) == 0x7f)
      assert(same, s"idempotence break at ${i - Multimodal.UlawClip}: " +
        s"${u(i) & 0xff} -> ${again(i) & 0xff}")
    }
  }

  test("μ-law container: sniffer dispatches RIFF fmt-7, facts match " +
      "the generating formulas, malformed containers fail loudly") {
    (0 until 8).foreach { i =>
      val text = s"ulaw$i"
      val bytes = Multimodal.synthesizeUlaw(text)
      val n = Multimodal.ulawSamples(text)
      assert(bytes.length == 58 + n + (n & 1), s"container size of $text")
      val d = Multimodal.decode(bytes)
      assert(d.kind == "audio")
      assert(d.nSamples == n.toLong, s"sample count of $text")
      assert(d.sampleRate == Multimodal.SampleRate.toLong)
      assert(d.data.length == n * 2, "decoded PCM16 stream")
      // decoded samples stay within the exact quantization bound of
      // the generating formula
      val seed = Multimodal.hex32Jvm(text)
      (0 until n).foreach { j =>
        val b = ((d.data(2 * j) & 0xff) | (d.data(2 * j + 1) << 8))
          .toShort.toInt
        val a = Multimodal.ulawEssence(seed, j)
        assert(math.abs(a - b) <= Multimodal.UlawMaxErr,
          s"$text sample $j: |$a - $b| > bound")
      }
    }
    // an unsupported format code still fails loudly (fmt 2 = ADPCM)
    val bad = Multimodal.synthesizeUlaw("badfmt")
    bad(20) = 2 // fmt code low byte inside the fmt chunk
    val e = intercept[IllegalArgumentException] {
      Multimodal.decode(bad)
    }
    assert(e.getMessage.contains("fmt"), e.getMessage)
    // a ULAW header claiming 16-bit samples is rejected
    val bad2 = Multimodal.synthesizeUlaw("badbits")
    bad2(34) = 16 // bits-per-sample low byte
    intercept[IllegalArgumentException] { Multimodal.decode(bad2) }
  }

  test("PNG decode fails loudly on a bad signature") {
    intercept[IllegalArgumentException] {
      Multimodal.decodePng("NOTAPNG..........".getBytes("US-ASCII"))
    }
  }

  test("decode fails loudly on corrupt containers, never flows bad media on") {
    val img = (0 until 30).map(i =>
        Multimodal.synthesize(s"text$i", s"source$i"))
      .find(b => b(0) == 'P' && b(1) == '6').get
    // truncated pixel data: length check must fire
    intercept[IllegalArgumentException] {
      Multimodal.decode(java.util.Arrays.copyOf(img, img.length - 1))
    }
    // unknown magic
    intercept[IllegalArgumentException] {
      Multimodal.decode("GIF89a....".getBytes("US-ASCII"))
    }
    // WAV with a lying RIFF length
    val wav = (0 until 30).map(i =>
        Multimodal.synthesize(s"text$i", s"source$i"))
      .find(b => b(0) == 'R').get
    val bad = wav.clone(); bad(4) = (bad(4) + 1).toByte
    intercept[IllegalArgumentException] { Multimodal.decode(bad) }
  }

  test("WAV chunk walk honors RIFF word alignment (odd-length chunk + pad byte)") {
    val wav = (0 until 30).map(i =>
        Multimodal.synthesize(s"text$i", s"source$i"))
      .find(b => b(0) == 'R').get
    val want = Multimodal.decode(wav)
    // splice an odd-length LIST chunk (3 bytes + 1 pad, as tagging tools
    // emit) between WAVE and fmt, and grow the RIFF size accordingly —
    // a walk that advances only `len` desynchronizes on the pad byte
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 'a', 'b', 'c', 0)
    val out = java.nio.ByteBuffer.allocate(wav.length + extra.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(wav, 0, 4).putInt(
      java.nio.ByteBuffer.wrap(wav, 4, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt + extra.length)
    out.put(wav, 8, 4).put(extra).put(wav, 12, wav.length - 12)
    val got = Multimodal.decode(out.array())
    assert(got.kind == "audio" && got.nSamples == want.nSamples)
    assert(java.util.Arrays.equals(got.data, want.data))
  }

  test("media metadata: parsed dims, durations, and a fit-within resize plan") {
    val rows = rowsOf(Multimodal.queries("media_meta")(spark, sfDir()))
    assert(rows.size == 500)
    rows.foreach { m =>
      val kind = m("kind").asInstanceOf[String]
      assert(Set("image", "audio", "video").contains(kind))
      assert(m("n_bytes").asInstanceOf[Long] > 0)
      assert(m("essence_sum").asInstanceOf[Long] > 0)
      if (kind == "audio") {
        assert(m("width") == null && m("out_width") == null)
        assert(m("n_samples").asInstanceOf[Long] >= 16)
        assert(m("duration_ms").asInstanceOf[Long] ==
          m("n_samples").asInstanceOf[Long] * 1000 / Multimodal.SampleRate)
      } else {
        val w = m("width").asInstanceOf[Long]
        val ow = m("out_width").asInstanceOf[Long]
        assert(ow <= Multimodal.FitPx && ow <= w)
        if (w <= Multimodal.FitPx) assert(ow == w) // no upscale
      }
      if (kind == "video")
        assert(m("n_frames").asInstanceOf[Long] >= 2)
    }
  }

  test("frame sampling keeps every 4th parsed frame within bounds") {
    val rows = rowsOf(Multimodal.queries("media_frames")(spark, sfDir()))
    assert(rows.nonEmpty)
    rows.groupBy(_("media_id")).foreach { case (_, frames) =>
      val n = frames.head("n_frames").asInstanceOf[Long]
      val idxs = frames.map(_("frame_idx").asInstanceOf[Long]).sorted
      assert(idxs.head == 0L)
      assert(idxs.forall(i => i < n && i % Multimodal.FrameStride == 0))
      assert(idxs.size == ((n + Multimodal.FrameStride - 1) /
        Multimodal.FrameStride))
    }
  }

  test("resize really resamples pixels: hand-computed checksum on a known image") {
    val meta = rowsOf(Multimodal.queries("media_meta")(spark, sfDir()))
      .filter(_("kind") == "image").map(m => m("media_id") -> m).toMap
    val rows = rowsOf(Multimodal.queries("media_resize")(spark, sfDir()))
    assert(rows.map(_("media_id")).toSet == meta.keySet)
    rows.foreach { r =>
      val m = meta(r("media_id"))
      // dims agree with the meta query's resize PLAN (shared formula)
      assert(r("out_width") == m("out_width").asInstanceOf[Any] &&
        r("out_height") == m("out_height").asInstanceOf[Any])
      val (w, h) = (m("width").asInstanceOf[Long], m("height").asInstanceOf[Long])
      val (ow, oh) = (r("out_width").asInstanceOf[Long],
        r("out_height").asInstanceOf[Long])
      assert(ow <= Multimodal.FitPx && ow <= w && oh <= h)
      // identity case: inside the fit box the checksum equals the
      // essence checksum (every pixel sampled once, same order)
      if (w <= Multimodal.FitPx)
        assert(r("resized_sum") == m("essence_sum"))
    }
    // at least one genuinely downscaled image exercises the sampler
    assert(rows.exists(r => r("out_width").asInstanceOf[Long] <
      meta(r("media_id"))("width").asInstanceOf[Long]))
  }

  test("audio decimation halves the stream and survives the byte-stride trap") {
    val meta = rowsOf(Multimodal.queries("media_meta")(spark, sfDir()))
      .filter(_("kind") == "audio").map(m => m("media_id") -> m).toMap
    val rows = rowsOf(Multimodal.queries("media_resample")(spark, sfDir()))
    assert(rows.map(_("media_id")).toSet == meta.keySet)
    rows.foreach { r =>
      val n = meta(r("media_id"))("n_samples").asInstanceOf[Long]
      assert(r("n_out") == (n + 1) / 2)
      assert(r("out_rate") == Multimodal.ResampleRate.toLong)
      assert(r("resampled_sum").asInstanceOf[Long] > 0L)
    }
  }

  test("feature extraction: normalized fixed-width histograms over decoded essence") {
    val rows = rowsOf(Multimodal.queries("media_features")(spark, sfDir()))
    assert(rows.size == 500)
    rows.foreach { m =>
      val f = (0 until Multimodal.FeatureBins)
        .map(i => m(s"f$i").asInstanceOf[Double])
      assert(math.abs(f.sum - 1.0) < 1e-9) // normalized over essence bytes
      assert(f.forall(v => v >= 0.0 && v <= 1.0))
    }
  }

  test("scene cuts: fixed threshold recovers planted boundaries, zero false cuts") {
    // the synthetic video is a real Y4M container with planted scenes
    val d = Multimodal.decode(Multimodal.synthesizeVideo("scene-demo"))
    assert(d.kind == "video" && d.nFrames >= 4)
    val rows = rowsOf(Multimodal.queries("media_scene_cuts")(spark, sfDir()))
    assert(rows.nonEmpty)
    var planted = 0L; var det = 0L; var fp = 0L; var within = 0L
    rows.foreach { r =>
      val f = r("frame_idx").asInstanceOf[Long]
      val cut = r("is_cut").asInstanceOf[Boolean]
      if (f % Multimodal.SceneLen == 0) { planted += 1; if (cut) det += 1 }
      else { within += 1; if (cut) fp += 1 }
    }
    assert(within > 0 && planted > 0)
    assert(fp == 0, s"$fp false cuts among $within within-scene frames")
    assert(det.toDouble / planted >= 0.85,
      s"recall ${det.toDouble / planted} ($det/$planted)")
  }

  test("media decode queries never shuffle pixels: only the pre-decode round-robin spread") {
    // scene cuts and audio features are partition-local decode passes.
    // The ONE allowed Exchange is the decode-parallelism spread of the
    // slim (id, text) projection BELOW the MapPartitions decode
    // (Multimodal.mediaDs round-robins a couple of parquet splits across
    // cores before the CPU-bound synth+decode); no Exchange may sit
    // ABOVE the decode — that would move payload/pixel bytes.
    Seq("media_scene_cuts", "media_audio_features").foreach { q =>
      val plan = Multimodal.queries(q)(spark, sfDir())
        .queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toVector
      val exLines = lines.filter(_.contains("Exchange"))
      assert(exLines.forall(_.contains("RoundRobinPartitioning")),
        s"$q has a non-round-robin Exchange (payload bytes keyed/moved):\n$plan")
      val firstDecode = lines.indexWhere(_.contains("MapPartitions"))
      val firstEx = lines.indexWhere(_.contains("Exchange"))
      assert(firstDecode >= 0, s"$q lost its decode MapPartitions:\n$plan")
      // executedPlan prints root-first: an ancestor (post-decode)
      // Exchange would print BEFORE the MapPartitions line
      assert(firstEx < 0 || firstEx > firstDecode,
        s"$q shuffles decoded bytes (Exchange above the decode):\n$plan")
    }
  }

  test("audio features: decode path equals the formula reference, one row per audio doc") {
    // formula reference: centered samples straight from the generating
    // bytes, no container round-trip
    def ref(text: String): Seq[Long] = {
      val seed = Multimodal.hex32Jvm(text)
      val n = (Multimodal.hex32Jvm(text + "s") % 256 + 16).toInt
      def e(i: Long) = ((seed + i * Multimodal.ByteStep) % 256).toInt
      val cs = (0 until n).map(k => e(2L * k) + 256 * e(2L * k + 1) - 32768)
      val energy = cs.map(c => c.toLong * c).sum
      val zc = cs.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
      val peak = cs.map(c => math.abs(c).toLong).max
      val corr = Multimodal.CorrPeriods.map(p =>
        cs.zipWithIndex.map { case (c, i) =>
          if (i % p < p / 2) c.toLong else -c.toLong }.sum)
      Seq(energy, zc.toLong, peak) ++ corr
    }
    // audio modality needs hex32(source) % 3 == 1
    val src = (0 until 20).map(i => s"as$i")
      .find(s => Multimodal.hex32Jvm(s) % 3 == 1).get
    (0 until 10).foreach { i =>
      val text = s"audio-doc-$i"
      val d = Multimodal.decode(Multimodal.synthesize(text, src))
      assert(d.kind == "audio")
      assert(Multimodal.audioFeaturesOf(d.data, d.nSamples.toInt) == ref(text),
        s"doc $i")
    }
    // query surface: one row per audio-modality document, schema pinned
    val meta = rowsOf(Multimodal.queries("media_meta")(spark, sfDir()))
      .filter(_("kind") == "audio").map(_("media_id")).toSet
    val rows = rowsOf(Multimodal.queries("media_audio_features")(spark, sfDir()))
    assert(rows.map(_("media_id")).toSet == meta)
    rows.foreach { r =>
      assert(r("energy").asInstanceOf[Long] > 0L)
      assert(r("peak_abs").asInstanceOf[Long] <= 32768L)
      assert(r("zero_crossings").asInstanceOf[Long] <
        r("n_samples").asInstanceOf[Long])
    }
  }

  test("video copy detection: every trimmed re-upload is caught, and every " +
    "flagged pair is explainable") {
    import spark.implicits._
    val dir = sfDir("sf0.001")
    val pairs = rowsOf(SparkEntry.queries("media_video_fp")(spark, dir))
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // planted trim pairs: (doc, doc + offset) for every 4th doc
    val trims = docs.map(_._1).filter(_ % Multimodal.VidTrimMod == 0)
      .map(id => (id, id + Multimodal.VidTrimOffset)).toSet
    val byPair = pairs.map(r => (r("vid_a").asInstanceOf[Long],
      r("vid_b").asInstanceOf[Long]) -> r).toMap
    trims.foreach { case (a, b) =>
      val r = byPair.getOrElse((a, b), fail(s"trim pair ($a,$b) missed"))
      assert(r("is_dup") === true)
      // the copy's frames are a subset of the original's
      assert(r("n_shared") === r("n_b"))
      // distinct fps: one fewer than the original, unless the dropped
      // frame's fingerprint also appears later in the clip (a legitimate
      // content-address collision — the copy then addresses the same set)
      val (na, nb) = (r("n_a").asInstanceOf[Long], r("n_b").asInstanceOf[Long])
      assert(nb === na - 1 || nb === na)
    }
    // every flagged pair is either planted (trim / identical text) or a
    // genuine content collision: the synthetic frame space is only 256
    // patterns per (w, h), so distinct texts CAN render byte-identical
    // frames — for those pairs, decode both clips and prove the shared
    // fingerprints really address byte-identical frames (the verdict is
    // then correct by the operator's own contract)
    val textOf = docs.toMap
    def orig(v: Long) =
      if (v >= Multimodal.VidTrimOffset) v - Multimodal.VidTrimOffset else v
    def frameBytes(vid: Long): Map[Long, Seq[Byte]] = {
      val d = Multimodal.decode(Multimodal.synthesizeVideo(textOf(orig(vid))))
      val fsz = (d.width * d.height * 3).toInt
      val from = if (vid >= Multimodal.VidTrimOffset) 1 else 0
      (from until d.nFrames.toInt).map { f =>
        val bytes = d.data.slice(f * fsz, (f + 1) * fsz).toSeq
        var s = 0L; var j = 0
        while (j < fsz) {
          s += (d.data(f * fsz + j) & 0xff).toLong *
            ((j % Multimodal.VidFpW) + 1)
          j += 1
        }
        s -> bytes
      }.toMap
    }
    pairs.filter(_("is_dup").asInstanceOf[Boolean]).foreach { r =>
      val (a, b) = (r("vid_a").asInstanceOf[Long],
        r("vid_b").asInstanceOf[Long])
      if (!trims.contains((a, b)) && textOf(orig(a)) != textOf(orig(b))) {
        val (fa, fb) = (frameBytes(a), frameBytes(b))
        val shared = fa.keySet.intersect(fb.keySet)
        assert(shared.size.toLong === r("n_shared"),
          s"pair ($a,$b): fingerprint overlap does not reproduce")
        shared.foreach { fp =>
          assert(fa(fp) == fb(fp),
            s"pair ($a,$b): fp $fp matches but frames differ (collision)")
        }
      }
    }
  }
}
