package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class OpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog."),
    (2L, "The quick brown fox jumps over the lazy dog."), // exact dup of 1
    (3L, "The quick brown fox jumps over the lazy cat."), // near dup of 1
    (4L, "Der schnelle braune Fuchs springt und der Hund ist faul und das ist gut."),
    (5L, "Le renard brun et rapide saute et le chien est paresseux."),
    (6L, "completely unrelated text about spark dataframes and shuffles."),
    (7L, "  the   QUICK brown fox jumps over the lazy dog.  ") // fingerprint dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val d = Dedup.exact(docs, "doc_id", "text").collect()
    val dupGroup = d.find(_.getLong(2) == 2L)
    assert(dupGroup.exists(_.getLong(1) == 1L)) // keeper is min id
    assert(d.length == 6)
  }

  test("fingerprint catches case/whitespace variants") {
    val f = Dedup.fingerprint(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(f(1L) == f(7L))
    assert(f(1L) != f(3L))
  }

  test("winnowing fingerprints: edit-local, normalization-invariant") {
    val fps = Dedup.winnowingFingerprints(docs, "doc_id", "text")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    // identical and whitespace/case-variant texts → identical fingerprints
    assert(fps(1L) == fps(2L) && fps(1L) == fps(7L))
    // one-word edit (dog→cat) keeps most fingerprints
    val shared = (fps(1L) & fps(3L)).size.toDouble / fps(1L).size
    assert(shared > 0.5, s"local edit must preserve most fingerprints ($shared)")
    // unrelated text shares nothing
    assert((fps(1L) & fps(6L)).isEmpty)
  }

  test("winnowing rolling-hash mode upholds the same overlap guarantee") {
    // rolling=true swaps md5-hex grams for the O(n) polynomial rolling-hash
    // kernel; the winnowing GUARANTEE (shared substring ≥ k+window-1 chars ⇒
    // shared fingerprint) must hold identically, because both modes hash
    // the same k-gram positions and keep per-window minima
    val fps = Dedup.winnowingFingerprints(docs, "doc_id", "text", rolling = true)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // identical and whitespace/case-variant texts → identical fingerprints
    assert(fps(1L) == fps(2L) && fps(1L) == fps(7L))
    // one-word edit keeps most fingerprints (edit-locality)
    val shared = (fps(1L) & fps(3L)).size.toDouble / fps(1L).size
    assert(shared > 0.5, s"local edit must preserve most fingerprints ($shared)")
    // unrelated text shares nothing
    assert((fps(1L) & fps(6L)).isEmpty)
    // per-doc fingerprint counts are bounded by the window count, and the
    // rolling mode never produces MORE fingerprints than windows exist
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    fps.foreach { case (id, s) =>
      val n = texts(id).trim.toLowerCase.replaceAll("\\s+", " ").length
      assert(s.nonEmpty && s.size <= math.max(n - 8 + 1 - 3, 0), s"doc $id: ${s.size} fps")
    }
  }

  test("minhash near-dup pairs find the near duplicate") {
    val pairs = Dedup.minHashNearDupPairs(spark, docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("simhash hamming distance separates near-dups from unrelated") {
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L)) // identical text, identical simhash
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(3L)) < hamming(sh(1L), sh(6L)))
  }

  test("ngram jaccard pairs") {
    val pairs = Dedup.ngramJaccardPairs(spark, docs, "doc_id", "text", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
  }

  test("brute force cosine topk is exact and deterministic") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)), (3L, Seq(0.7f, 0.7f, 0.0f)),
      (4L, Seq(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs.filter($"vec_id" =!= 0), "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0), 2).collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 3L))
  }

  test("embedding LSH pairs include the close pair") {
    val vecs = (0 until 50).map { i =>
      val base = if (i % 2 == 0) Seq(1.0f, 0.0f, 0.3f, 0.1f) else Seq(0.0f, 1.0f, -0.4f, 0.2f)
      (i.toLong, base.map(_ + (i % 7) * 0.01f))
    }.toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingLshPairs(spark, vecs, "vec_id", "embedding")
      .filter($"cos" >= 0.99).collect()
    assert(pairs.nonEmpty)
    // all high-cos pairs connect same-parity ids (same base direction)
    assert(pairs.forall(r => (r.getLong(0) - r.getLong(1)) % 2 == 0))
  }

  test("embeddingLshPairs: supplied corpus size skips the sizing scan, output identical") {
    val vecs = (0 until 50).map { i =>
      val base = if (i % 2 == 0) Seq(1.0f, 0.0f, 0.3f, 0.1f) else Seq(0.0f, 1.0f, -0.4f, 0.2f)
      (i.toLong, base.map(_ + (i % 7) * 0.01f))
    }.toDF("vec_id", "embedding")
    val sc = spark.sparkContext
    val persistedBefore = sc.getPersistentRDDs.size
    def jobsDuring(group: String)(f: => org.apache.spark.sql.DataFrame): (Int, Set[(Long, Long, Double)]) = {
      sc.setJobGroup(group, group)
      val out = f // eager: the pair set materializes inside the call
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      sc.clearJobGroup()
      (sc.statusTracker.getJobIdsForGroup(group).length, out)
    }
    val (jobsCounted, a) = jobsDuring("lsh_counted") {
      Similarity.embeddingLshPairs(spark, vecs, "vec_id", "embedding")
    }
    val (jobsSupplied, b) = jobsDuring("lsh_supplied") {
      Similarity.embeddingLshPairs(spark, vecs, "vec_id", "embedding", corpusSize = Some(50L))
    }
    assert(a == b && a.nonEmpty)
    // the supplied-n path must not run the ids.count() sizing job
    assert(jobsSupplied < jobsCounted, s"supplied=$jobsSupplied counted=$jobsCounted")
    // the sketch cache must not leak: each call may leave ONE persisted RDD
    // (the eager checkpoint of the returned pair frame) — a leaked sk would
    // double that
    val delta = sc.getPersistentRDDs.size - persistedBefore
    assert(delta <= 2, s"leaked persisted RDDs: delta=$delta")
  }

  test("broadcast centroid path is bit-identical to the literal ivf_cells plan") {
    graft.functions.GraftFunctions.register(spark)
    val dim = 16
    val vecs = (0 until 300).map { i =>
      (i.toLong, Seq.tabulate(dim)(j => (((i * 31 + j * 7) % 19) - 9).toFloat / 9f))
    }.toDF("vec_id", "embedding")
    val centroids: Array[Seq[Double]] =
      Array.tabulate(64)(i => Seq.tabulate(dim)(j => (((i * 13 + j * 5) % 17) - 8) / 8.0))
    // expression-level parity: literal vs broadcast form, nProbe > 1
    val lit3 = vecs.select($"vec_id",
      org.apache.spark.sql.functions.call_function("ivf_cells",
        $"embedding", org.apache.spark.sql.functions.typedLit(centroids.toSeq),
        org.apache.spark.sql.functions.lit(3)).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val bc = spark.sparkContext.broadcast(
      new graft.functions.CentroidMatrix(centroids.map(_.toArray)))
    val fn = graft.functions.GraftFunctions.registerCentroidBcast(spark, bc, 3)
    val bc3 = vecs.select($"vec_id",
      org.apache.spark.sql.functions.call_function(fn, $"embedding").as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(lit3 == bc3)
    graft.functions.GraftFunctions.dropCentroidBcast(spark, fn)
    bc.destroy()
    // index-level parity: a forced-broadcast IvfIndex serves the same
    // assignment and top-k as the literal-path index
    val idxL = IvfIndex(centroids)
    val idxB = IvfIndex(centroids, bcastThreshold = 0)
    assert(idxL.assignCorpus(vecs, "vec_id", "embedding").collect().toSet ==
      idxB.assignCorpus(vecs, "vec_id", "embedding").collect().toSet)
    val queries = vecs.filter($"vec_id" < 5)
    val corpusL = idxL.assignCorpus(vecs.filter($"vec_id" >= 5), "vec_id", "embedding")
    def topk(idx: IvfIndex) =
      idx.batchTopK(queries, corpusL, "vec_id", "embedding", k = 3, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(topk(idxL) == topk(idxB))
    idxB.release()
  }

  test("ANN family on the forced-broadcast path matches the literal path exactly") {
    val dim = 12
    val emb = (0 until 200).map { i =>
      (i.toLong, Seq.tabulate(dim)(j => (((i * 17 + j * 3) % 23) - 11).toFloat / 11f))
    }.toDF("vec_id", "embedding")
    def centroidsAt(thr: Long) = Similarity.kMeansCentroids(spark,
      emb.select($"vec_id".as("id"), $"embedding".as("v")), k = 6, iters = 3,
      bcastThreshold = thr)
    // k-means: per-iteration broadcasts (destroyed in-loop) must not change
    // a single centroid coordinate
    assert(centroidsAt(Long.MaxValue).toSeq == centroidsAt(0L).toSeq)
    def batch(thr: Long) = Similarity.ivfBatchTopK(spark,
      emb.filter($"vec_id" < 5), emb.filter($"vec_id" >= 5),
      "vec_id", "embedding", k = 3, nCentroids = 6, nProbe = 6, bcastThreshold = thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch(Long.MaxValue) == batch(0L))
    // the registry must not accumulate per-broadcast entries: every bound
    // function is dropped once the plan is resolved (else each entry pins
    // its matrix broadcast for the session lifetime)
    val leaked = spark.sessionState.functionRegistry.listFunction()
      .map(_.funcName).filter(_.startsWith("ivf_cells_bcast_"))
    assert(leaked.isEmpty, s"leaked registry entries: $leaked")
  }

  test("IvfIndex serving cycle: fit -> save/load -> assign -> topK -> release leaves no registry entry") {
    val dim = 16
    val emb = (0 until 300).map { i =>
      (i.toLong, Seq.tabulate(dim)(j => (((i * 29 + j * 11) % 21) - 10).toFloat / 10f))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf_cycle").toString
    IvfIndex.fit(spark, emb.filter($"vec_id" >= 5), "vec_id", "embedding",
      nCentroids = 8, iters = 2, trainCap = 200).save(spark, s"$dir/index")
    // bcastThreshold = 0 forces the broadcast path the >= 2^20-double
    // production matrix takes (the threshold is only a size gate onto the
    // same code), so the release obligation is exercised for real
    val idx = IvfIndex.load(spark, s"$dir/index").copy(bcastThreshold = 0)
    val assigned = idx.assignCorpus(emb.filter($"vec_id" >= 5), "vec_id", "embedding")
    val out = idx.batchTopK(emb.filter($"vec_id" < 5), assigned,
      "vec_id", "embedding", k = 3, nProbe = 8).collect()
    assert(out.nonEmpty)
    idx.release()
    val leaked = spark.sessionState.functionRegistry.listFunction()
      .map(_.funcName).filter(_.startsWith("ivf_cells_bcast_"))
    assert(leaked.isEmpty, s"leaked registry entries after release(): $leaked")
  }

  test("language id heuristic") {
    graft.functions.GraftFunctions.register(spark)
    val out = docs.select($"doc_id", TextAnalysis.langId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(4L) == "de")
    assert(out(5L) == "fr")
  }

  test("quality features and token counts") {
    val q = TextAnalysis.qualityFeatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getAs[Int]("n_tokens") == 9)
    assert(q(1L).getAs[Double]("alpha_ratio") > 0.7)
    val tc = docs.select($"doc_id", TextAnalysis.tokenCount($"text").as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tc(1L) == 10) // 9 words + final period
  }

  test("multimodal frame-sampling plumbing over the real header decode") {
    val media = Multimodal.synthesizePayloads(docs, "doc_id", "text")
    import spark.implicits._
    val features = Multimodal.decodeHeaders(spark, media.as[Multimodal.MediaRow])
    val rows = features.collect()
    assert(rows.length == 7)
    assert(rows.forall(f => f.byte_len > 0 && f.width >= 16 && f.brightness > 0))
    // identical payloads → identical features
    val byId = rows.map(f => f.media_id -> f).toMap
    assert(byId(1L).checksum == byId(2L).checksum)
    val frames = Multimodal.sampleFrames(features, everyNth = 10)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx"))
    // deterministic: every video yields ceil(n_frames/10) sampled frames
    val vids = rows.filter(_.media_type == "video")
    assert(frames.count() == vids.map(v => (v.n_frames + 9) / 10).sum)
  }

  test("multimodal container headers decode exactly (real byte-level parse)") {
    val media = Multimodal.synthesizePayloads(docs, "doc_id", "text")
    val feats = Multimodal.decodeHeaders(spark, media.as[Multimodal.MediaRow])
      .collect().map(f => f.media_id -> f).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val (t, w, h, rate, ch, fr) = Multimodal.paramsFor(text)
      val f = feats(id)
      assert(f.media_type == t, s"sniffed type for $id must match the synthesized container")
      val bodyLen = text.getBytes("UTF-8").length
      t match {
        case "image" =>
          assert(f.width == w && f.height == h && f.n_frames == 1 && f.byte_len == 33 + bodyLen)
        case "audio" =>
          assert(f.width == rate && f.height == ch &&
            f.n_frames == bodyLen / (ch * 2) && f.byte_len == 44 + bodyLen)
        case _ =>
          assert(f.width == w && f.height == h && f.n_frames == fr && f.byte_len == 88 + bodyLen)
      }
      assert(f.brightness > 0)
    }
    // unknown container → the declared stub fallback, type sniffed as unknown
    val unk = Multimodal.decodeHeaders(spark,
      Seq(Multimodal.MediaRow(99L, "blob", Array[Byte](1, 2, 3))).toDS()).collect().head
    assert(unk.media_type == "unknown" && unk.byte_len == 3)
    // corrupt WAV chunk size (negative / huge) must terminate, not spin
    val corrupt = ("RIFF".getBytes("US-ASCII") ++ Array.fill(4)(0xff.toByte) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      Array.fill(4)(0xff.toByte) ++ Array.fill(28)(0.toByte))
    val c = Multimodal.decodeHeaders(spark,
      Seq(Multimodal.MediaRow(100L, "audio", corrupt)).toDS()).collect().head
    assert(c.media_type == "audio" && c.byte_len == corrupt.length)
  }

  test("corrupt/truncated containers decode without crashing the task") {
    import java.nio.{ByteBuffer, ByteOrder}
    def le32(v: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    // 1) truncated WAV whose data chunk DECLARES more bytes than the buffer
    //    holds: dataSize must not poison the bodyMean offset (negative index)
    val truncWav = "RIFF".getBytes("US-ASCII") ++ le32(1000) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      Array[Byte](1, 0, 1, 0) ++ le32(8000) ++ le32(16000) ++ Array[Byte](2, 0, 16, 0) ++
      "data".getBytes("US-ASCII") ++ le32(999999) ++ Array.fill(8)(7.toByte)
    val tw = Multimodal.decodeHeaders(spark,
      Seq(Multimodal.MediaRow(101L, "audio", truncWav)).toDS()).collect().head
    assert(tw.media_type == "audio" && tw.width == 8000 && tw.n_frames == 0)
    assert(tw.brightness >= 0.0)
    // 2) spec-conforming WAV with an ODD-sized chunk before data: the RIFF
    //    word-alignment pad byte must not desynchronize the walk
    val body = Array.fill(20)(9.toByte)
    val oddWav = "RIFF".getBytes("US-ASCII") ++ le32(0) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      Array[Byte](1, 0, 2, 0) ++ le32(16000) ++ le32(64000) ++ Array[Byte](4, 0, 16, 0) ++
      "LIST".getBytes("US-ASCII") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) ++ // 3 data + 1 pad
      "data".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val ow = Multimodal.decodeHeaders(spark,
      Seq(Multimodal.MediaRow(102L, "audio", oddWav)).toDS()).collect().head
    assert(ow.width == 16000 && ow.height == 2 && ow.n_frames == body.length / 4,
      s"odd-chunk pad byte desynchronized the walk: $ow")
    // 3) truncated AVI where the byte string 'avih' appears in the trailing
    //    body with < 48 bytes of buffer left: must not read past the end
    val evilAvi = "RIFF".getBytes("US-ASCII") ++ le32(0) ++
      "AVI ".getBytes("US-ASCII") ++ Array.fill(76)(0.toByte) ++
      "avih".getBytes("US-ASCII") ++ Array.fill(4)(1.toByte) // only 8 bytes after 'avih'
    assert(evilAvi.length >= 88) // sniffs as AVI
    val ea = Multimodal.decodeHeaders(spark,
      Seq(Multimodal.MediaRow(103L, "video", evilAvi)).toDS()).collect().head
    assert(ea.media_type == "video" && ea.width == 0 && ea.n_frames == 0)
  }

  test("ivf ann with k-means cells reaches recall >= 0.8 vs brute force") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 0.7 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Seq.tabulate(8)(j => math.sin(3 * 0.7 + j))
    val approx = Similarity.ivfTopK(spark, vecs, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall (approx=$approx exact=$exact)")
  }

  test("ivf batch k-nn: full probe exact vs crossTopK, partial probe recall >= 0.8") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 0.7 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 10)
    val corpus = vecs.filter($"vec_id" >= 10)
    val exact = Similarity.crossTopK(queries, corpus, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.ivfBatchTopK(spark, queries, corpus, "vec_id", "embedding",
        k = 5, nCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "full probe must equal the brute-force batch result")
    val partial = Similarity.ivfBatchTopK(spark, queries, corpus, "vec_id", "embedding",
        k = 5, nCentroids = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (partial & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"batch IVF recall $recall")
  }

  test("IvfIndex: sample-capped fit, save/load roundtrip, exact full probe") {
    val vecs = (0 until 1000).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 0.53 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 5)
    val corpus = vecs.filter($"vec_id" >= 5)
    // training touches only the 200 lowest-hash rows, never the full corpus
    val idx = IvfIndex.fit(spark, corpus, "vec_id", "embedding",
      nCentroids = 16, iters = 3, trainCap = 200)
    assert(idx.nCentroids == 16)
    val idx2 = IvfIndex.fit(spark, corpus, "vec_id", "embedding",
      nCentroids = 16, iters = 3, trainCap = 200)
    assert(idx.centroids.toSeq == idx2.centroids.toSeq, "fit must be deterministic")
    // save → load roundtrip is exact
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    idx.save(spark, s"$dir/index")
    val loaded = IvfIndex.load(spark, s"$dir/index")
    assert(loaded.centroids.toSeq == idx.centroids.toSeq)
    // full probe over the pre-assigned corpus is EXACT even though the
    // centroids were trained on a sample (probing every cell sees all rows)
    val assigned = loaded.assignCorpus(corpus, "vec_id", "embedding").localCheckpoint(true)
    assert(assigned.count() == 995 && assigned.columns.toSeq == Seq("id", "v", "cell"))
    val got = loaded.batchTopK(queries, assigned, "vec_id", "embedding",
        k = 4, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.crossTopK(queries, corpus, "vec_id", "embedding", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact, "index full probe must equal brute force")
    // partial probe stays useful on sample-trained centroids
    val partial = loaded.batchTopK(queries, assigned, "vec_id", "embedding",
        k = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (partial & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"sample-trained partial-probe recall $recall")
  }

  test("IvfIndex e2e at 256 cells: bucketed serving, partial probe recall >= 0.9, no corpus exchange") {
    // the full serving path at the prescribed cell count (r3 verdict item 7):
    // fit(sample) → save → load → assignCorpus → writeAssignedBucketed →
    // PARTIAL probe (nProbe = nCentroids/8) through the bucketed table
    val rnd = new scala.util.Random(1234)
    val centers = Array.fill(64)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 5000).map { i =>
      val c = centers(i % 64)
      (i.toLong, c.toSeq.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 10).localCheckpoint(true)
    val corpus = vecs.filter($"vec_id" >= 10).localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("ivf256").toString
    IvfIndex.fit(spark, corpus, "vec_id", "embedding",
      nCentroids = 256, iters = 3, trainCap = 2000).save(spark, s"$dir/index")
    val idx = IvfIndex.load(spark, s"$dir/index")
    assert(idx.nCentroids == 256)
    val tbl = "ops_ivf256_corpus"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + s"/$tbl"))
    IvfIndex.writeAssignedBucketed(
      idx.assignCorpus(corpus, "vec_id", "embedding"), tbl, buckets = 16)
    val out = idx.batchTopK(queries, spark.table(tbl), "vec_id", "embedding",
      k = 10, nProbe = 32)
    // serving-plan shape: the corpus comes straight off its buckets — no
    // Exchange between the bucketed scan and the cell join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"), s"expected bucketed scan:\n$plan")
    val exchangesOnCorpus = plan.linesIterator.zipWithIndex.exists { case (l, i) =>
      l.contains("Exchange") && plan.linesIterator.slice(i, i + 4).exists(_.contains(tbl))
    }
    assert(!exchangesOnCorpus, s"corpus side must not re-shuffle:\n$plan")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.crossTopK(queries, corpus, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"256-cell partial-probe (nProbe=32) recall $recall")
  }

  test("k-means centroids are deterministic and partition the corpus") {
    val data = (0 until 120).map { i =>
      (i.toString, Seq.tabulate(4)(j => math.cos(i * 1.3 + j)))
    }.toDF("id", "v")
    val a = Similarity.kMeansCentroids(spark, data, 8)
    val b = Similarity.kMeansCentroids(spark, data, 8)
    assert(a.toSeq == b.toSeq, "k-means must be reproducible across runs")
    assert(a.length == 8 && a.forall(_.length == 4))
    // iterated centroids must differ from the raw seeds (means moved)
    val seeds = Similarity.kMeansCentroids(spark, data, 8, iters = 0)
    assert(a.toSeq != seeds.toSeq)
  }

  test("IVF reaches large cell counts: nCentroids=256 stays exact at full probe") {
    // the round-2 literal-centroid formulation embedded k·dim literal NODES
    // in the plan — at k=256×16 dims Catalyst analysis already crawled; the
    // native kernel keeps the plan O(1) in k. Full probe must stay EXACT.
    val vecs = (0 until 2000).map { i =>
      (i.toLong, Seq.tabulate(16)(j => math.sin(i * 0.37 + j * 1.1).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 5)
    val corpus = vecs.filter($"vec_id" >= 5)
    val full = Similarity.ivfBatchTopK(spark, queries, corpus, "vec_id", "embedding",
        k = 3, nCentroids = 256, nProbe = 256, kmeansIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.crossTopK(queries, corpus, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "256-cell full probe must equal brute force")
    // single-query path at the same cell count
    val q = Seq.tabulate(16)(j => math.sin(7 * 0.37 + j * 1.1))
    val ivf = Similarity.ivfTopK(spark, corpus, "vec_id", "embedding", q, 10,
        nCentroids = 256, nProbe = 256, kmeansIters = 2)
      .collect().map(_.getLong(0)).toSeq
    val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf == bf, "256-cell full-probe single query must equal brute force")
  }
}
