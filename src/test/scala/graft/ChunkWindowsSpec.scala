package graft

import graft.text.ChunkWindows
import org.apache.spark.sql.functions._

/** Window-chunking invariants: stride-regular starts, full token coverage
  * with only the last window short, and one keeper per dedup group.
  */
class ChunkWindowsSpec extends SparkSpec {
  import spark.implicits._

  test("windows are stride-regular and cover every token exactly") {
    val W = ChunkWindows.ChunkTokens
    val S = ChunkWindows.ChunkStride
    val chunks = ChunkWindows.chunkWindows(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", size(split(trim(lower($"text")), "\\s+")).as("n"))
    val bad = chunks.filter($"start_tok" =!= $"chunk_idx" * S).count()
    assert(bad === 0, "start_tok must be chunk_idx * stride")
    val per = chunks.groupBy($"doc_id")
      .agg(count(lit(1)).as("c"),
        max($"start_tok" + $"n_tokens").as("covered"),
        sum(($"n_tokens" =!= W).cast("long")).as("n_short"))
      .join(docs, "doc_id")
    // the last window reaches exactly the end of the doc; at most one
    // window (the last) runs short; chunk count matches the closed formula
    assert(per.filter($"covered" =!= $"n").count() === 0)
    assert(per.filter($"n_short" > 1).count() === 0)
    assert(per.filter($"c" =!=
      expr(s"CAST((greatest(n - $W, 0) + ${S - 1}) DIV $S AS INT) + 1"))
      .count() === 0)
  }

  test("chunk dedup: one keeper per hash group, group sizes consistent") {
    val d = ChunkWindows.chunkDedup(spark, sf)
    val groups = d.groupBy($"chunk_hash")
      .agg(count(lit(1)).as("n"), max($"n_group").as("ng"),
        sum($"keep".cast("long")).as("keepers"))
    assert(groups.filter($"n" =!= $"ng").count() === 0,
      "n_group must equal the actual group size")
    assert(groups.filter($"keepers" =!= 1).count() === 0,
      "exactly one keeper per group")
  }
}
