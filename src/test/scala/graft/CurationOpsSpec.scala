package graft

import graft.text.{Curate, TextAnalysis}

/** Semantic invariants of the corpus-curation extras: repetition quality
  * signals, deterministic mix sampling, and token-budget sequence packing
  * (each also hash-checked against its DuckDB twin by Verify).
  */
class CurationOpsSpec extends SparkSpec {

  test("chunk windows tile every document: stride segments reconstruct it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val chunks = TextAnalysis.chunkWindows(spark, sf)
    // chunk sizes bounded by the window, positive, ids = start/stride
    assert(chunks.filter($"n_chunk_tokens" < 1
      || $"n_chunk_tokens" > TextAnalysis.ChunkW
      || $"chunk_id" * TextAnalysis.ChunkS =!= $"start_tok").count() == 0)
    // taking the first `stride` tokens of each chunk in order reconstructs
    // the full document exactly (no token lost or duplicated by the overlap)
    val rebuilt = chunks
      .withColumn("head_toks",
        slice(split($"chunk_text", " "), 1, TextAnalysis.ChunkS))
      .groupBy($"doc_id")
      .agg(array_join(flatten(array_sort(collect_list(
        struct($"chunk_id", $"head_toks"))).getField("head_toks")), " ")
        .as("rebuilt"))
    val orig = graft.Tables.documents(spark, sf)
      .select($"doc_id", array_join(split(trim(lower($"text")), "\\s+"), " ")
        .as("orig"))
    assert(rebuilt.join(orig, "doc_id")
      .filter($"rebuilt" =!= $"orig").count() == 0)
  }

  test("top bigrams: at most 10 per language, counts descending within each") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t = TextAnalysis.topBigrams(spark, sf)
    assert(t.filter($"rk" < 1 || $"rk" > 10).count() == 0)
    assert(t.groupBy($"lang").count().filter($"count" > 10).count() == 0)
    // within a language, count never increases as rank grows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"rk")
    assert(t.withColumn("prev", lag($"n", 1).over(w))
      .filter($"prev".isNotNull && $"n" > $"prev").count() == 0)
  }

  test("quality gate: drops at least the decile, keeps only above-threshold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val g = TextAnalysis.qualityGate(spark, sf)
    val total = g.agg(sum($"n_docs")).head.getLong(0)
    val dropped = g.agg(sum($"n_dropped")).head.getLong(0)
    // the order statistic guarantees ≥ ceil(n/10) dropped (ties drop with it)
    assert(dropped >= (total + 9) / 10)
    // every kept doc sits strictly above the threshold
    assert(g.filter($"min_kept_chars".isNotNull &&
      $"min_kept_chars" <= $"p10_chars").count() == 0)
    // one corpus-wide threshold
    assert(g.select($"p10_chars").distinct().count() == 1)
  }

  test("budget mix: fills stay within quota and quotas within the budget") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Curate.budgetMix(spark, sf)
    // no source overfills its quota, ledger fractions are sane
    assert(rows.filter($"tokens_used" > $"quota"
      || $"utilization" < 0 || $"utilization" > 1).count() == 0)
    // floor-division allocation never exceeds the global budget
    val totalQuota = rows.agg(sum($"quota")).head.getLong(0)
    assert(totalQuota <= Curate.TokenBudget)
    // the greedy fill actually keeps something somewhere
    assert(rows.agg(sum($"n_kept")).head.getLong(0) > 0)
  }

  test("repetition ratios are well-formed fractions") {
    val rows = TextAnalysis.repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dup = r.getDouble(2)
      val top = r.getDouble(3)
      assert(dup >= 0.0 && dup < 1.0, s"dup_token_ratio out of range: $r")
      assert(top >= 0.0 && top <= 1.0, s"top_bigram_ratio out of range: $r")
    }
    // the signal discriminates: this small-vocab corpus has repeating docs
    assert(rows.exists(_.getDouble(2) > 0.0))
    assert(rows.exists(_.getDouble(3) > 0.0))
  }

  test("mix sampling: rates from the policy lattice, rate-1 strata keep everything") {
    val rows = Curate.sampleMix(spark, sf).collect()
    assert(rows.nonEmpty)
    val lattice = (1 to Curate.MixRateBuckets)
      .map(_.toDouble / Curate.MixRateBuckets).toSet
    rows.foreach { r =>
      val (target, nDocs, nSampled) =
        (r.getDouble(1), r.getLong(2), r.getLong(3))
      assert(lattice.contains(target), s"target_rate off-lattice: $r")
      assert(nSampled <= nDocs)
      // h32 < 2^32 always: a rate-1.0 stratum is a no-op filter
      if (target == 1.0) assert(nSampled == nDocs, s"rate-1 stratum dropped docs: $r")
    }
  }

  test("shard assignment: conserves the corpus and honors the serpentine balance bound") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"source",
        size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
    val out = Curate.shardAssign(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == docs.count(), "every doc lands in a shard")
    assert(out.map(_.getLong(0)).forall(s => s >= 0 && s < Curate.ShardK))
    // serpentine spread per source ≤ 2·(that source's largest doc); the
    // global spread is bounded by the sum of per-source bounds
    val bound = 2 * docs.groupBy($"source").agg(max($"n_tokens").as("m"))
      .agg(sum($"m")).head.getLong(0)
    val totals = out.map(_.getLong(2))
    assert(totals.max - totals.min <= bound,
      s"token spread ${totals.max - totals.min} exceeds serpentine bound $bound")
  }

  test("sequence packing: per-shard positions form an exact gapless prefix sum") {
    val rows = Curate.packSequences(spark, sf).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (shard, docs) =>
      // reconstruct each doc's stream position from (seq_id, seq_offset)
      val placed = docs.map { case (_, nTok, seqId, off, nSeqs) =>
        assert(off >= 0 && off < Curate.SeqBudget)
        assert(nSeqs >= 1)
        val start = seqId * Curate.SeqBudget + off
        // n_seqs is exactly the count of budget windows [start, start+nTok) touches
        val lastSeq = (start + nTok - 1) / Curate.SeqBudget
        assert(nSeqs == lastSeq - seqId + 1, s"shard $shard span miscount")
        (start, nTok.toLong)
      }.sortBy(_._1)
      // the shard's stream is gapless: doc k+1 starts where doc k ended
      placed.foldLeft(0L) { case (expected, (start, nTok)) =>
        assert(start == expected, s"shard $shard gap: doc at $start, expected $expected")
        start + nTok
      }
    }
  }

  test("k-fold hash assignment is stable under corpus growth") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the per-doc fold is a pure salted-hash function of the id, so adding
    // documents must never move an existing one: recompute the fold on a
    // half-corpus view and on the full corpus, compare on the intersection
    val fold = pmod(graft.functions.Md5Hash.h32(
      concat(lit("fold:"), $"doc_id".cast("string"))), lit(Curate.KFolds))
    val full = graft.Tables.documents(spark, sf)
      .select($"doc_id", fold.as("f_full"))
    val half = graft.Tables.documents(spark, sf)
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", fold.as("f_half"))
    val moved = full.join(half, "doc_id")
      .filter($"f_full" =!= $"f_half").count()
    assert(moved == 0L)
    // and every fold is actually populated at this corpus size
    val folds = full.select($"f_full").distinct().collect().map(_.getLong(0)).toSet
    assert(folds == (0L until Curate.KFolds.toLong).toSet)
  }
}
