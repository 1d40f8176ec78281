package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: corpus-statistics training and map-only
  * application — the token-counting substrate of a training-data pipeline
  * when "tokens" must mean *model* tokens, not whitespace runs.
  *
  * The split of work follows how real tokenizer trainers scale: merge
  * selection needs only the WORD-FREQUENCY table, never the raw text, so
  * the distributed part is exactly the corpus-wide word count (one
  * explode + one aggregation — [[Mixture.vocabStats]] shape) capped to
  * the `maxVocab` most frequent words, and the iterative merge loop runs
  * on the driver over that bounded table (the classic in-memory
  * algorithm; its input is KBs once capped, independent of corpus size).
  * Applying the tokenizer is the reverse: the learned merge ranks are a
  * small broadcast value and tokenization is a pure per-row map over the
  * corpus — no shuffle, no state, linear in text length.
  *
  * Determinism: ties in pair frequency break lexicographically, word
  * counts are integers, and the training sample is the exact top-K by
  * (count, word) — same corpus ⇒ same merges, on any cluster layout.
  */
object Bpe {

  /** End-of-word sentinel: distinguishes "est</w>" (suffix) from "est"
    * (interior), exactly as in the original BPE formulation. Kept out of
    * the visible character alphabet by construction (tokens are
    * lower-cased \S+ runs, which cannot contain '␃'). */
  val Eow = "␃"

  final case class Merge(left: String, right: String, rank: Int)

  /** Train `nMerges` BPE merges from the corpus word-frequency table.
    *
    * Distributed part: word counts (integer-exact, shuffle on token);
    * driver part: the standard greedy pair-merge loop over the top
    * `maxVocab` (count, word) entries — bounded memory by construction.
    * Returns merges in rank order.
    */
  def train(docs: DataFrame, nMerges: Int, maxVocab: Int = 65536): Seq[Merge] = {
    val counts: Array[(String, Long)] = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // word → symbol sequence, starting from characters + end-of-word mark
    var words: Array[(Array[String], Long)] = counts.map { case (w, c) =>
      ((w.map(_.toString) :+ Eow).toArray, c)
    }
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    while (rank < nMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) rank = nMerges
      else {
        // max count; ties break on the lexicographically smallest pair
        val maxC = pairCounts.values.max
        val (bl, br) = pairCounts.collect { case (k, c) if c == maxC => k }
          .minBy(identity)
        merges += Merge(bl, br, rank)
        val joined = bl + br
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == bl && syms(i + 1) == br) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Tokenize one word with the learned merges (lowest-rank merge first —
    * the standard application order, NOT greedy-longest). */
  private def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = (word.map(_.toString) :+ Eow).toArray
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; at = i }
        i += 1
      }
      if (at < 0) done = true
      else {
        val out = new Array[String](syms.length - 1)
        var j = 0
        var k = 0
        while (j < syms.length) {
          if (j == at) { out(k) = syms(j) + syms(j + 1); j += 2 }
          else { out(k) = syms(j); j += 1 }
          k += 1
        }
        syms = out
      }
    }
    syms
  }

  /** Persist learned merges as a sorted text file (one `left right` pair
    * per line, rank = line number — the interchange format BPE tooling
    * has used since the original implementation). Train once at corpus
    * scale, load everywhere. */
  def saveMerges(merges: Seq[Merge], path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p,
      merges.sortBy(_.rank).map(m => s"${m.left} ${m.right}").mkString("\n"))
  }

  def loadMerges(path: String): Seq[Merge] = {
    val lines = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      .split("\n").toSeq.filter(_.nonEmpty)
    lines.zipWithIndex.map { case (l, i) =>
      val sp = l.lastIndexOf(' ')
      Merge(l.substring(0, sp), l.substring(sp + 1), i)
    }
  }

  /** Reserved id for symbols outside the vocabulary (characters unseen
    * at training time). Real vocab ids start at 1. */
  val UnkId = 0

  /** Stable token→id vocabulary from the merge table + the corpus
    * alphabet. Every symbol [[encodeWord]] can emit is either a single
    * character, a character with the end-of-word mark, the mark itself,
    * or a merge output — so the id space is: 0 reserved for unknown,
    * base symbols (alphabet ∪ alphabet+␃ ∪ {␃}, lexicographic) from 1,
    * then one id per merge in RANK order. Merge-token ids are therefore
    * stable under retraining with more merges (a longer merge list only
    * appends), which is what lets checkpointed id streams survive
    * tokenizer evolution. The alphabet probe is one tiny distinct over
    * exploded characters (bounded by the alphabet, not the corpus);
    * train once, persist with [[saveVocab]], load everywhere. */
  def vocab(docs: DataFrame, merges: Seq[Merge]): Seq[(String, Int)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Alphabet = distinct UTF-16 CODE UNITS, exactly the decomposition
    // encodeWord applies (w.map(_.toString)) — a code-POINT probe
    // (e.g. Spark's split(text, "")) would keep surrogate pairs whole
    // and every non-BMP character would then encode to UnkId despite
    // being seen at training. Word separators are regex \s (the ASCII
    // set tokenization splits on — Unicode isWhitespace is wider and
    // would wrongly drop in-word chars like NBSP from the alphabet).
    val wordChar = (c: Char) =>
      c != ' ' && c != '\t' && c != '\n' && c != '\u000B' && c != '\f' && c != '\r'
    val chars = docs
      .select(lower(col("text")).as("t")).as[String]
      .flatMap(t => t.iterator.filter(wordChar).map(_.toString))
      .distinct().collect()
    val base = (chars.flatMap(c => Seq(c, c + Eow)) :+ Eow).distinct.sorted
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var next = 1
    base.foreach { t => out += (t -> next); next += 1 }
    merges.sortBy(_.rank).foreach { m =>
      val t = m.left + m.right
      if (!out.contains(t)) { out += (t -> next); next += 1 }
    }
    out.toSeq
  }

  /** Persist the vocabulary as `token\tid` lines (tokens are \S+ runs
    * plus the ␃ mark — never contain a tab). */
  def saveVocab(vocab: Seq[(String, Int)], path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p,
      vocab.map { case (t, i) => s"$t\t$i" }.mkString("\n"))
  }

  def loadVocab(path: String): Seq[(String, Int)] =
    java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      .split("\n").toSeq.filter(_.nonEmpty).map { l =>
        val sp = l.lastIndexOf('\t')
        (l.substring(0, sp), l.substring(sp + 1).toInt)
      }

  /** Integer token-id stream: one row per (doc, position, token_id) —
    * what [[encode]] is for humans, this is for training pipelines: a
    * 100 TB token stream of int ids shuffles ~10× fewer bytes than the
    * string stream, and downstream packing/batching keys on fixed-width
    * columns. Same broadcast map-only shape (merge ranks + vocab map are
    * KBs); symbols outside the vocab map to [[UnkId]]. */
  def encodeIds(docs: DataFrame, merges: Seq[Merge],
                vocab: Seq[(String, Int)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bcR = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    val bcV = spark.sparkContext.broadcast(vocab.toMap)
    docs.select(col("doc_id"), lower(col("text")).as("t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val ranks = bcR.value
        val v = bcV.value
        var pos = -1
        t.split("\\s+").iterator.filter(_.nonEmpty).flatMap { w =>
          encodeWord(w, ranks).iterator.map { tok =>
            pos += 1; (id, pos, v.getOrElse(tok, UnkId))
          }
        }
      }
      .toDF("doc_id", "pos", "token_id")
  }

  /** Token stream: one row per (doc, position, token) — the substrate of
    * sequence packing and id-mapping downstream. Same broadcast-ranks
    * map-only shape as [[tokenize]]; the corpus never shuffles. */
  def encode(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    docs.select(col("doc_id"), lower(col("text")).as("t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val ranks = bc.value
        var pos = -1
        t.split("\\s+").iterator.filter(_.nonEmpty).flatMap { w =>
          encodeWord(w, ranks).iterator.map { tok => pos += 1; (id, pos, tok) }
        }
      }
      .toDF("doc_id", "pos", "token")
  }

  /** Map-only corpus tokenization: merge ranks broadcast, one pass over
    * the text, no shuffle. Emits (doc_id, n_bpe_tokens, n_ws_tokens,
    * round_trip_ok): the token ids themselves are `explode`-able from the
    * same encoder when a downstream stage wants them; the counts + the
    * decode-identity flag are the gate-checkable surface.
    *
    * `mapPartitions` is the honest vehicle here: BPE application is an
    * inherently iterative per-word object algorithm (rank-priority merge
    * scan), not expressible in Catalyst expressions without a UDF — and a
    * typed mapPartitions with one broadcast read per partition beats a
    * per-row UDF closure lookup.
    */
  def tokenize(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    docs.select(col("doc_id"), lower(col("text")).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        it.map { case (id, t) =>
          val ws = t.split("\\s+").filter(_.nonEmpty)
          var n = 0L
          var chars = 0L
          var ok = true
          ws.foreach { w =>
            val toks = encodeWord(w, ranks)
            n += toks.length
            chars += w.length
            ok &&= toks.mkString("") == w + Eow
          }
          (id, n, ws.length.toLong, chars, ok)
        }
      }
      .toDF("doc_id", "n_bpe_tokens", "n_ws_tokens", "n_word_chars",
        "round_trip_ok")
  }
}
