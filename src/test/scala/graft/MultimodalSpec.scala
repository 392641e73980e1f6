package graft

import graft.multimodal.MultimodalOps

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table assigns deterministic types and carries payload bytes") {
    val m = MultimodalOps.mediaTable(spark, sf)
    val byType = m.groupByKey(_.media_type).count().collect().toMap
    assert(byType.keySet == Set("image", "audio", "video"))
    assert(byType.values.sum == 500L)
    val r = m.filter(_.doc_id == 0L).head()
    assert(r.media_type == "image" && r.payload.length > 0)
  }

  test("decode pipeline is deterministic and preserves row count") {
    val m = MultimodalOps.mediaTable(spark, sf)
    val d1 = MultimodalOps.decodeAll(m).collect().sortBy(_.doc_id)
    val d2 = MultimodalOps.decodeAll(m).collect().sortBy(_.doc_id)
    assert(d1.length == 500)
    assert(d1.toSeq == d2.toSeq, "stub decode must be deterministic")
    assert(d1.forall(r => r.width >= 16 && r.height >= 16 && r.n_frames >= 1))
    assert(d1.filter(_.media_type != "video").forall(_.n_frames == 1))
  }

  test("resize planning preserves aspect ratio and fits the target box") {
    val m = MultimodalOps.mediaTable(spark, sf)
    val resized = MultimodalOps.resizeAll(m, tw = 224, th = 224).collect()
    assert(resized.length == 500)
    resized.foreach { r =>
      assert(r.out_w <= 224 && r.out_h <= 224 && r.out_w >= 1 && r.out_h >= 1)
      assert(r.out_w == 224 || r.out_h == 224, "one side must hit the target")
      // floor division can only shrink the scaled side: out/in ratios
      // must not invert the aspect ordering
      if (r.width >= r.height) assert(r.out_w >= r.out_h)
      else assert(r.out_h >= r.out_w)
    }
  }

  test("feature lanes sum the payload bytes exactly") {
    val m = MultimodalOps.mediaTable(spark, sf)
    val feats = MultimodalOps.extractFeatures(m).collect()
      .map(f => f.doc_id -> f).toMap
    val total = m.collect().map(r =>
      r.doc_id -> r.payload.map(_ & 0xff).map(_.toLong).sum).toMap
    assert(feats.size == 500)
    total.foreach { case (id, sum) =>
      val f = feats(id)
      assert(f.f0 + f.f1 + f.f2 + f.f3 + f.f4 + f.f5 + f.f6 + f.f7 == sum,
        s"doc $id: lane sums must partition the byte total")
    }
  }

  test("frame sampling emits every k-th frame for videos only") {
    val m = MultimodalOps.mediaTable(spark, sf)
    val frames = MultimodalOps.sampleFrames(m, everyK = 30).collect()
    val decoded = MultimodalOps.decodeAll(m).collect()
      .filter(_.media_type == "video").map(d => d.doc_id -> d.n_frames).toMap
    assert(frames.nonEmpty)
    assert(frames.forall(f => decoded.contains(f.doc_id)))
    val counts = frames.groupBy(_.doc_id).view.mapValues(_.length).toMap
    counts.foreach { case (id, n) =>
      val expected = (decoded(id) + 29) / 30
      assert(n == expected, s"doc $id: $n frames sampled, expected $expected")
    }
  }

  test("PNG lane carries REAL image bytes through a real decoder") {
    val png = MultimodalOps.pngTable(spark, sf).limit(20).collect()
    assert(png.nonEmpty)
    // genuine PNG container: magic bytes, not a stub hash
    png.foreach { r =>
      val magic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
      assert(r.payload.take(4).sameElements(magic),
        s"doc ${r.doc_id}: payload must start with the PNG magic")
      // full pixel decode (not just the header path) round-trips
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == 8 + (r.doc_id % 32).toInt)
      assert(img.getHeight == 8 + ((r.doc_id * 7) % 24).toInt)
      // spot-check a pixel: PNG is lossless, content must survive
      assert((img.getRGB(0, 0) & 0xffffff) == ((r.doc_id * 31) & 0xffffff))
    }
    // and the header-only partition decoder agrees with the encode dims
    val metas = MultimodalOps.decodePngMeta(MultimodalOps.pngTable(spark, sf))
      .collect()
    metas.foreach { m =>
      assert(m.png_w == 8 + (m.doc_id % 32).toInt &&
        m.png_h == 8 + ((m.doc_id * 7) % 24).toInt, s"bad meta: $m")
    }
  }

  test("dHash dedup: exact image copies collapse and survivors are " +
      "pairwise band-separated") {
    val docs = Tables.load(spark, sf, "documents").count()
    val hashes = MultimodalOps.dHashAll(
      MultimodalOps.dedupPngTable(spark, sf)).collect()
    assert(hashes.length == docs)
    // image identity is doc_id % 97: same k => byte-identical PNG =>
    // identical dHash (the real decode is deterministic)
    hashes.groupBy(_.doc_id % 97).foreach { case (k, g) =>
      assert(g.map(_.dhash).distinct.length == 1, s"k=$k hashes differ")
    }
    val survivors = MultimodalOps.imageDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every surviving doc is the FIRST (lowest id) of its image class
    // that no earlier near-dup removed — in particular, exact copies
    // collapsed: at most one survivor per k
    val byK = survivors.groupBy(_._1 % 97)
    assert(byK.values.forall(_.length == 1),
      "an exact image copy survived")
    assert(survivors.length < docs, "nothing was removed")
    // Hamming <= 3 implies at least one intact 16-bit band (3 flips
    // touch at most 3 of 4 bands), so any such pair MUST have been
    // caught: survivors are pairwise Hamming >= 4
    for {
      (ia, ha) <- survivors
      (ib, hb) <- survivors if ia < ib
    } assert(java.lang.Long.bitCount(ha ^ hb) > 3,
      s"$ia and $ib survived at Hamming ${java.lang.Long.bitCount(ha ^ hb)}")
    // dhash stays a positive 63-bit value (bit 63 dropped by design)
    assert(hashes.forall(_.dhash >= 0L))
  }
}
