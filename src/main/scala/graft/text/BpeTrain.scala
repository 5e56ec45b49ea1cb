package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING — the iterative merge loop [[BpePairs]] counts
  * one round of: starting from character symbols, [[Rounds]] times pick
  * the corpus-weighted most frequent adjacent symbol pair (count desc,
  * pair asc — total order) and substitute it throughout the vocabulary,
  * emitting the learned merge ledger with the corpus token count after
  * each merge — the actual artifact a tokenizer build publishes, plus the
  * compression curve that tells you when more merges stop paying.
  *
  * Substitution is plain space-bounded string `replace` (` a b ` → ` ab `)
  * — byte-identical semantics in the JVM and DuckDB (non-overlapping,
  * left-to-right, resume after the replacement). On a run of ≥4 identical
  * symbols this merges alternately rather than leftmost-greedily (the
  * consumed trailing separator blocks the immediately-adjacent match) —
  * a documented, deterministic BPE variant; both engines share it, and
  * natural-language corpora hit the case only in degenerate repeats.
  * Words are restricted to `^[a-z]{2,}$` so symbols never collide with
  * the separator or any metacharacter.
  *
  * The per-round argmax is a 1-row driver round-trip (the
  * [[graft.similarity.IvfIndex]] Lloyd pattern — bounded by [[Rounds]],
  * never by data); everything else
  * stays in-plan. Scale shape: the corpus collapses ONCE to the
  * word-frequency table (one shuffle, map-side partials); all [[Rounds]]
  * iterations then run over the vocabulary-sized table — at 100 TB the
  * merge loop costs the same as at 100 GB, only the initial word count
  * grows. Memoized per (app, dir) since the driver loop is eager.
  */
object BpeTrain {

  /** Merge rounds learned; unrolled identically in the DuckDB twin. */
  val Rounds = 5

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def bpeTrain(spark: SparkSession, dir: String): DataFrame =
    memo.computeIfAbsent(s"${spark.sparkContext.applicationId}:${graft.Memos.runTag}:$dir", _ => {
      import spark.implicits._
      // localCheckpoint makes the "corpus collapses ONCE" scale shape
      // REAL: the merge loop below runs 2 driver actions per round (argmax
      // + token count), and without materialization each action re-derived
      // the word table from the raw corpus — 2·Rounds corpus scans where
      // the algorithm needs one (r13 fresh profile: 3.0 s → the loop's
      // honest vocabulary-sized cost). Each round's substitution is also
      // re-checkpointed so lineage stays one replace deep.
      var words = Tables.documents(spark, dir)
        .select(explode(split(trim(lower($"text")), "\\s+")).as("w"))
        .filter($"w".rlike("^[a-z]{2,}$"))
        .groupBy($"w").agg(count(lit(1)).as("n"))
        // " l o w " — every symbol space-bounded on both sides
        .select(concat(lit(" "),
          regexp_replace($"w", "(.)", "$1 ")).as("sym"), $"n")
        .localCheckpoint(eager = false)
      val ledger = (1 to Rounds).map { r =>
        val toks = words.select($"n",
          split(trim($"sym"), " ").as("arr"))
        val best = toks
          .select($"n", explode(expr("sequence(1, size(arr) - 1)")).as("i"),
            $"arr")
          .select(expr("arr[i - 1]").as("l"), expr("arr[i]").as("rt"), $"n")
          .groupBy($"l", $"rt").agg(sum($"n").as("cnt"))
          .orderBy($"cnt".desc, $"l", $"rt")
          .limit(1)
          .collect()(0) // 1-row driver round-trip per round, bounded
        val (l, rt, cnt) = (best.getString(0), best.getString(1),
          best.getLong(2))
        // the same non-regex replace() both engines define identically;
        // symbols are [a-z]+ so the interpolated literal needs no quoting
        words = words.select(
          expr(s"replace(sym, ' $l $rt ', ' $l$rt ')").as("sym"), $"n")
          .localCheckpoint(eager = false)
        val tokensAfter = words
          .select(($"n" * (size(split(trim($"sym"), " ")))).as("t"))
          .agg(sum($"t")).as[Long].collect()(0)
        (r.toLong, l, rt, l + rt, cnt, tokensAfter)
      }
      spark.createDataFrame(ledger)
        .toDF("round", "left_sym", "right_sym", "merged", "n_occurrences",
          "corpus_tokens_after")
        .orderBy($"round")
    })

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_train" -> (bpeTrain _))

  private def roundSql(r: Int): String = {
    val prev = if (r == 1) "w0" else s"w${r - 1}"
    s"""p$r AS (
  SELECT arr[i]     AS l,
         arr[i + 1] AS rt,
         sum(n)::BIGINT AS cnt
  FROM (SELECT string_split(trim(sym), ' ') AS arr, n FROM $prev),
       LATERAL (SELECT unnest(range(1, len(arr))) AS i)
  GROUP BY 1, 2),
b$r AS (SELECT l, rt, cnt FROM p$r ORDER BY cnt DESC, l, rt LIMIT 1),
w$r AS (
  SELECT replace(sym, ' ' || b.l || ' ' || b.rt || ' ',
                      ' ' || b.l || b.rt || ' ') AS sym, n
  FROM $prev, b$r b),
t$r AS (
  SELECT sum(n * len(string_split(trim(sym), ' ')))::BIGINT AS toks
  FROM w$r)"""
  }

  val oracle: Map[String, String] = Map(
    "text_bpe_train" -> s"""WITH words AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents),
w0 AS (
  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS sym,
         count(*)::BIGINT AS n
  FROM words WHERE regexp_matches(w, '^[a-z]{2,}$$')
  GROUP BY 1),
${(1 to Rounds).map(roundSql).mkString(",\n")}
${(1 to Rounds).map(r =>
      s"""SELECT $r::BIGINT AS round, b.l AS left_sym, b.rt AS right_sym,
       b.l || b.rt AS merged, b.cnt AS n_occurrences,
       t.toks AS corpus_tokens_after
FROM b$r b, t$r t""").mkString("\nUNION ALL\n")}
ORDER BY round""")
}
