package graft

import org.apache.spark.sql.functions._

import graft.operators.Pretrain

/** Properties behind the oracled pretraining-batch-prep queries: the
  * oracle proves the numbers, these prove the INVARIANTS a training
  * run relies on (full packs, permutation ranks, mixture targets).
  */
class PretrainSpec extends SparkSpecBase {

  test("sequence packing: every pack except the tail is exactly full, no token lost") {
    val packs = Pretrain.qPackSequences(tables, budget = 512L).collect()
    val lastPack = packs.map(_.getAs[Long]("pack_id")).max
    packs.foreach { r =>
      val (p, n) = (r.getAs[Long]("pack_id"), r.getAs[Long]("n_tokens"))
      if (p < lastPack) assert(n == 512L, s"pack $p has $n tokens")
      else assert(n > 0L && n <= 512L, s"tail pack has $n tokens")
    }
    // pack ids are contiguous from 0 and total tokens are conserved
    assert(packs.map(_.getAs[Long]("pack_id")).sorted.sameElements(0L to lastPack))
    val total = tables.documents
      .select(graft.functions.GraftFunctions.tokenCount(col("text")).cast("long").as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(packs.map(_.getAs[Long]("n_tokens")).sum == total)
  }

  test("BPE-id packing reproduces the concatenated token stream exactly") {
    val budget = 64L
    val (modelId, model) = graft.operators.TextAnalysis.corpusModel(tables)
    val seqs = Pretrain.packBpeIds(tables.documents, modelId, budget)
      .orderBy("seq_id").collect()
    // fullness: every non-tail sequence is exactly budget ids
    seqs.dropRight(1).foreach { r =>
      assert(r.getSeq[Int](r.fieldIndex("ids")).length == budget,
        s"seq ${r.getAs[Long]("seq_id")}")
    }
    assert(seqs.map(_.getAs[Long]("seq_id")).sameElements(seqs.indices.map(_.toLong)))
    // conservation + order: flattening the sequences reproduces the
    // per-document id streams concatenated in doc_id order
    val packed = seqs.flatMap((r => r.getSeq[Int](r.fieldIndex("ids"))))
    val expected = tables.documents.select("doc_id", "text")
      .orderBy("doc_id").collect()
      .flatMap(r => model.encodeIds(r.getAs[String]("text")))
    assert(packed.sameElements(expected))
    // every id is in-vocabulary or the reserved unk
    assert(packed.forall(id => id >= 0 && id <= model.unkId))
    // the digest contract query agrees with the raw table
    val digest = Pretrain.qPackBpe(tables, budget).orderBy("seq_id").collect()
    assert(digest.length == seqs.length)
    digest.zip(seqs).foreach { case (d, s) =>
      val ids = s.getSeq[Int](s.fieldIndex("ids"))
      assert(d.getAs[Int]("n_tokens") == ids.length)
      assert(d.getAs[Long]("id_sum") == ids.map(_.toLong).sum)
      assert(d.getAs[Int]("first_id") == ids.head)
      assert(d.getAs[Int]("last_id") == ids.last)
    }
  }

  test("packing splits a straddling document across adjacent packs") {
    // at least one pack boundary falls inside a document => some pack
    // counts a document whose tokens also land in the previous pack;
    // detectable as sum(n_docs) > distinct docs packed
    val packs = Pretrain.qPackSequences(tables, budget = 512L).collect()
    val nDocs = tables.documents
      .filter(graft.functions.GraftFunctions.tokenCount(col("text")) > 0).count()
    assert(packs.map(_.getAs[Long]("n_docs")).sum > nDocs)
  }

  test("shuffle order: ranks are a permutation and differ from doc_id order") {
    val buckets = Pretrain.qShuffleOrder(tables).collect()
    val n = buckets.map(_.getAs[Long]("n")).sum
    assert(n == tables.documents.count())
    assert(buckets.map(_.getAs[Long]("min_pos")).min == 0L)
    assert(buckets.map(_.getAs[Long]("max_pos")).max == n - 1)
    // bucket extents tile [0, n): permutation <=> count matches extent
    buckets.foreach { r =>
      assert(r.getAs[Long]("max_pos") - r.getAs[Long]("min_pos") + 1 == r.getAs[Long]("n"))
    }
    // the hash genuinely reorders: the first rank bucket is not just
    // the first `bucketWidth` doc_ids
    val first = buckets.minBy(_.getAs[Long]("rank_bucket"))
    val firstN = first.getAs[Long]("n")
    val identitySum = tables.documents.orderBy("doc_id").limit(firstN.toInt)
      .agg(sum("doc_id")).head().getLong(0)
    assert(first.getAs[Long]("sum_doc_ids") != identitySum)
  }

  test("chunking covers every token with the declared overlap, tails kept") {
    import org.apache.spark.sql.functions._
    val chunks = Pretrain.qChunkDocs(tables, window = 64, stride = 48).collect()
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    val nTok = tables.documents
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (doc, cs) =>
      val n = nTok(doc)
      val sorted = cs.sortBy(_.getAs[Int]("chunk_idx"))
      // indices are contiguous from 0 and stride-offsets tile [0, n)
      assert(sorted.map(_.getAs[Int]("chunk_idx")).sameElements(sorted.indices))
      sorted.foreach { c =>
        val (i, len) = (c.getAs[Int]("chunk_idx"), c.getAs[Int]("n_tokens"))
        assert(len == math.min(64, n - i * 48), s"doc $doc chunk $i: $len")
        assert(c.getAs[String]("chunk").nonEmpty)
      }
      // coverage: the last chunk reaches the final token
      val last = sorted.last
      assert(last.getAs[Int]("chunk_idx") * 48 + last.getAs[Int]("n_tokens") == n)
    }
  }

  test("distributed prefix sum matches a sequential scan on adversarial id layouts") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val scenarios: Seq[(String, Seq[Long])] = Seq(
      // sparse: million-row gaps — most blocks empty, offsets must skip them
      "sparse" -> Seq.fill(200)(math.abs(rnd.nextLong()) % 1000000000L),
      // clustered: everything inside one 256-id block (single roster row)
      "clustered" -> (0L until 200L).map(_ + 7L),
      // boundary-straddling: ids hugging block edges (255, 256, 511, 512...)
      "boundary" -> (1L to 50L).flatMap(i => Seq(i * 256 - 1, i * 256)),
      // singleton
      "one" -> Seq(12345L))
    scenarios.foreach { case (name, ids0) =>
      val ids = ids0.distinct
      val docs = ids.map(id => (id, (id % 97) + 1)).toDF("doc_id", "tokens")
      val got = graft.operators.Pretrain.withStart(docs)
        .select("doc_id", "start").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = ids.sorted.foldLeft((Map.empty[Long, Long], 0L)) {
        case ((m, acc), id) => (m + (id -> acc), acc + (id % 97) + 1)
      }._1
      assert(got == expect, s"scenario $name")
    }
  }

  test("packing matches an in-memory reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val budget = Seq(8L, 32L, 512L)(trial - 1)
      val docs = (0 until 500).map { _ =>
        (math.abs(rnd.nextLong()) % 100000L, rnd.nextInt(200).toLong)
      }.distinctBy(_._1)
      val got = Pretrain.packSequences(docs.toDF("doc_id", "tokens"), budget)
        .collect()
        .map(r => r.getAs[Long]("pack_id") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
      // sequential reference: walk docs in id order, spill across packs
      val expect = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      var pos = 0L
      docs.sortBy(_._1).foreach { case (_, tokens) =>
        if (tokens > 0) {
          var off = 0L
          while (off < tokens) {
            val pack = (pos + off) / budget
            val in = math.min(budget - (pos + off) % budget, tokens - off)
            val (d, t) = expect.getOrElse(pack, (0L, 0L))
            expect(pack) = (d + 1, t + in)
            off += in
          }
          pos += tokens
        }
      }
      assert(got == expect.toMap, s"trial $trial budget $budget")
    }
  }

  test("domain mix hits its target mixture where unconstrained") {
    val rows = Pretrain.qDomainMix(tables).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_lang"), r.getAs[Long]("n_sampled"), r.getAs[Double]("rate")))
      .toMap
    assert(rows.keySet == Pretrain.MixWeights.map(_._1).toSet)
    rows.foreach { case (lang, (nLang, nSampled, rate)) =>
      assert(nSampled <= nLang, s"$lang oversampled")
      assert(rate > 0.0 && rate <= 1.0)
    }
    // unconstrained languages (rate < 1) land near their target share:
    // the hashed mod-10000 gate admits ~rate of any id distribution
    val total = rows.values.map(_._1).sum
    Pretrain.MixWeights.foreach { case (lang, w) =>
      val (nLang, nSampled, rate) = rows(lang)
      if (rate < 1.0) {
        val achieved = nSampled.toDouble / (0.5 * total)
        assert(math.abs(achieved - w) < 0.05,
          s"$lang achieved $achieved vs target $w (n=$nLang)")
      }
    }
  }

  test("upsampling mixture replicates whole epochs and gates the fractional one") {
    val rows = Pretrain.qMixUpsample(tables).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("epoch"),
        r.getAs[Long]("n_docs")))
    val langCounts = tables.documents.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byEpoch = rs.map(r => r._2 -> r._3).toMap
      val epochs = byEpoch.keys.toSeq.sorted
      // epochs are contiguous from 1
      assert(epochs == (1L to epochs.max), s"$lang epochs $epochs")
      // a doc in epoch k+1 repeated through every earlier epoch, so
      // per-epoch counts never increase
      val counts = epochs.map(byEpoch)
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"$lang epoch counts increase: $counts")
      // an upsampled language (>= 2 epochs) replicates its WHOLE
      // corpus in every whole epoch
      if (epochs.max >= 2) assert(byEpoch(1L) == langCounts(lang),
        s"$lang whole epoch 1 has ${byEpoch(1L)} of ${langCounts(lang)}")
    }
    // the mixture genuinely mixes: at budgetFrac=2 the scarce-weighted
    // languages upsample (>1 epoch) while zh (weight .05) downsamples
    val maxEpoch = rows.groupBy(_._1).view.mapValues(_.map(_._2).max)
    assert(maxEpoch("en") >= 2)
    assert(maxEpoch("zh") == 1L && rows.collect {
      case ("zh", 1L, n) => n
    }.head < langCounts("zh"))
  }

  test("DSIR scores recover distribution match on a planted target") {
    // the driver corpus draws every language from ONE token
    // distribution, so plant the signal instead: "code" docs use a
    // disjoint-leaning vocabulary, "prose" docs another; the target
    // is a code subset, and prose docs padded with shared filler must
    // rank strictly below every code doc
    import spark.implicits._
    val code = Seq("def", "class", "return", "import", "val")
    val prose = Seq("once", "upon", "time", "story", "king")
    val shared = Seq("the", "of")
    def doc(id: Long, words: Seq[String], reps: Int) =
      (id, (Seq.fill(reps)(words).flatten ++ shared).mkString(" "))
    val docs = ((0L until 10L).map(i => doc(i, code, 3 + (i % 3).toInt)) ++
      (10L until 20L).map(i => doc(i, prose, 3 + (i % 3).toInt))).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      explode(org.apache.spark.sql.functions.split(col("text"), " ")).as("tok"))
    val target = Seq(0L, 1L, 2L, 3L).toDF("doc_id") // a code subset
    val scores = Pretrain.dsirScores(toks, target).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_q")).toMap
    val worstCode = (0L until 10L).map(scores).min
    val bestProse = (10L until 20L).map(scores).max
    assert(worstCode > bestProse,
      s"code floor $worstCode not above prose ceiling $bestProse")
  }

  test("DSIR contract query is deterministic, descending, and exactly k rows") {
    val rows = Pretrain.qDsirSelect(tables).collect()
    assert(rows.length == 25)
    val scores = rows.map(_.getAs[Long]("score_q"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not descending")
    val again = Pretrain.qDsirSelect(tables).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
