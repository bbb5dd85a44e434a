"""Iterative phrase-pair merging (word2phrase-style collocation
mining): repeatedly merge the corpus-wide most frequent adjacent token
pair into a single phrase token.

The canonical preprocessing step in the word2vec lineage (the
reference trains Word2Vec — `mllib/src/main/scala/text/Word2VecApplier.scala`
— on whitespace tokens; phrase merging is how `new york` becomes the
single token `new@@york` before training). It is also the word-level
skeleton of BPE tokenizer training: count adjacent pairs, merge the
argmax, repeat.

Design (both engines of the oracle gate replay it bit-for-bit):
- Everything stays in-plan — the per-iteration argmax is a 1-row
  ``orderBy(count desc, pair asc).limit(1)`` frame cross-joined onto
  the token stream, NOT a driver-side collect, so ``iterations``
  chains one growing lazy plan.
- Merges apply left-to-right without overlap. For a self-adjacent
  pair (w,w) inside a run of equal tokens, the classic convention is
  to merge greedily from the run's start — position parity inside the
  matched-run island decides (for w1 != w2, two adjacent positions
  can never both match, so islands are singletons and the parity rule
  keeps everything — one uniform code path).
- After each merge the row domain is re-compacted with a per-document
  row_number, which both engines compute identically.

Scale notes: per iteration — one pair-count aggregation (map-side
combined, shuffle carries (pair, count) rows), a TakeOrdered argmax,
and per-document windows over the token stream; no driver state, no
global window, no array materialization of the corpus. Cost is
O(iterations × corpus tokens); real tokenizer training runs a bounded
iteration count by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from demy_spark.functions.textstats import norm_tokens

__all__ = ["apply_merges", "bpe_encode", "bpe_train", "phrase_merges"]


def _merge_pass(cand: DataFrame, joiner: str, wdoc: Window) -> DataFrame:
    """One left-to-right non-overlapping merge application. ``cand``
    carries (_id_, _p_, _w_, _wn_, _w1_, _w2_) — the token stream with
    its lead token and the pair to merge (NULL pair = no-op round).
    Returns the re-compacted stream (_id_, _p_, _w_). Shared by the
    training loop (argmax pair) and ``apply_merges`` (given pair) so
    the two can never drift."""
    cand = cand.withColumn(
        "_m_",
        # isNotNull FIRST (false & NULL = false): the doc-final
        # token has a NULL lead, and a sentinel/no-op round has NULL
        # _w1_ — either would otherwise poison the keep/gone chain
        F.col("_w1_").isNotNull()
        & F.col("_wn_").isNotNull()
        & (F.col("_w_") == F.col("_w1_"))
        & (F.col("_wn_") == F.col("_w2_")),
    )
    # left-to-right non-overlap: inside each island of consecutive
    # matched positions, keep every other match starting from the
    # island head (only self-adjacent pairs form islands > 1)
    wm = Window.partitionBy("_id_", "_m_").orderBy("_p_")
    cand = cand.withColumn(
        "_isl_", F.when(F.col("_m_"), F.col("_p_") - F.row_number().over(wm))
    )
    wi = Window.partitionBy("_id_", "_isl_")
    cand = cand.withColumn(
        "_keep_",
        F.col("_m_") & (((F.col("_p_") - F.min("_p_").over(wi)) % 2) == 0),
    )
    # a position is dropped when the PREVIOUS position merged it
    cand = cand.withColumn("_gone_", F.lag("_keep_", 1, False).over(wdoc))
    emitted = cand.where(~F.col("_gone_")).select(
        "_id_",
        "_p_",
        F.when(
            F.col("_keep_"),
            F.concat_ws(joiner, F.col("_w_"), F.col("_wn_")),
        )
        .otherwise(F.col("_w_"))
        .alias("_w_"),
    )
    # re-compact positions so the next round's lead() sees adjacency
    # across the merge (row domain, same as the oracle)
    return emitted.select(
        "_id_",
        (F.row_number().over(wdoc) - 1).alias("_p_"),
        "_w_",
    )


def phrase_merges(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    iterations: int = 3,
    joiner: str = "@@",
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run ``iterations`` greedy pair merges over the corpus.

    Returns ``(merges, tokens)``:
    - ``merges`` — one row per iteration: (iteration, w1, w2,
      pair_count, tokens_after); ties on pair_count break to the
      lexicographically smallest (w1, w2). A round that finds no
      adjacent pair anywhere (pair-exhausted corpus) emits an
      all-NULL merge row and leaves the stream unchanged.
    - ``tokens`` — the final token stream (``id_col``, pos, token)
      with merged phrases joined by ``joiner``.

    Lineage per round is truncated with ``localCheckpoint`` by
    default — fast (executor-local blocks), but UNRECOVERABLE on
    executor loss: a lost executor fails the job instead of
    recomputing. Fine for short interactive runs; for long
    many-iteration production runs pass ``checkpoint_dir`` (an
    HDFS-compatible path) and each round uses a RELIABLE
    ``checkpoint`` instead — slower (one distributed write per
    round) but survives executor loss.

    NOTE: passing ``checkpoint_dir`` calls
    ``sparkContext.setCheckpointDir`` — a SESSION-GLOBAL mutation
    that persists after this call and redirects reliable checkpoints
    of any other operator in the same session. It cannot be
    save/restored here because the returned frames checkpoint LAZILY
    (the directory is read when they first materialize, which is
    after this function returns). Sessions that reliably checkpoint
    elsewhere should pass the same directory everywhere.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if checkpoint_dir is not None:
        docs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    t = docs.select(
        F.col(id_col).alias("_id_"),
        F.posexplode(norm_tokens(F.col(text_col))).alias("_p_", "_w_"),
    )
    merge_rows: list[DataFrame] = []
    wdoc = Window.partitionBy("_id_").orderBy("_p_")
    for it in range(1, iterations + 1):
        paired = t.withColumn("_wn_", F.lead("_w_").over(wdoc))
        counts = (
            paired.where(F.col("_wn_").isNotNull())
            .groupBy("_w_", "_wn_")
            .agg(F.count(F.lit(1)).alias("_cnt_"))
        )
        # the all-NULL sentinel guarantees best is ALWAYS one row: when
        # a round finds no adjacent pair at all (pair-exhausted corpus,
        # iterations set higher than the data supports) the sentinel
        # wins, matches nothing, and the round is a no-op — without it
        # the cross join with an EMPTY argmax frame would annihilate
        # the whole token stream
        sentinel = t.sparkSession.range(1).select(
            F.lit(None).cast("string").alias("_w1_"),
            F.lit(None).cast("string").alias("_w2_"),
            F.lit(None).cast("long").alias("_bcnt_"),
        )
        best = (
            counts.select(
                F.col("_w_").alias("_w1_"),
                F.col("_wn_").alias("_w2_"),
                F.col("_cnt_").alias("_bcnt_"),
            )
            .unionAll(sentinel)
            .orderBy(
                F.col("_bcnt_").desc_nulls_last(),
                F.col("_w1_").asc(),
                F.col("_w2_").asc(),
            )
            .limit(1)
        )
        # localCheckpoint truncates the per-round lineage — without it
        # the merges/tokens_after union branches re-execute every
        # earlier round's window chain once per branch (measured 2.5×
        # wall at 10× data), and the plan depth grows per iteration
        t = _merge_pass(paired.join(F.broadcast(best)), joiner, wdoc)
        t = (
            t.checkpoint(eager=False)
            if checkpoint_dir is not None
            else t.localCheckpoint(eager=False)
        )
        after = t.agg(F.count(F.lit(1)).alias("tokens_after"))
        merge_rows.append(
            best.crossJoin(after).select(
                F.lit(it).alias("iteration"),
                F.col("_w1_").alias("w1"),
                F.col("_w2_").alias("w2"),
                F.col("_bcnt_").alias("pair_count"),
                "tokens_after",
            )
        )
    merges = merge_rows[0]
    for m in merge_rows[1:]:
        merges = merges.unionAll(m)
    tokens = t.select(
        F.col("_id_").alias(id_col),
        F.col("_p_").alias("pos"),
        F.col("_w_").alias("token"),
    )
    return merges, tokens


def apply_merges(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    *,
    joiner: str = "@@",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Apply a LEARNED merge list to a corpus — the serving half of
    the word2phrase/BPE pair: ``phrase_merges`` trains the ranked
    pair list once on the big corpus; this applies it to any stream
    (new crawls, inference-time text) in rank order, one
    left-to-right non-overlapping pass per merge, exactly the
    tokenizer-apply convention. Merged tokens participate in later
    merges (("a","b") then ("a@@b","c") chains).

    Returns the rewritten token stream (``id_col``, pos, token).
    ``merges`` is driver-side but tokenizer-sized by contract (BPE
    vocabularies are 10k-100k pairs; each pair becomes two literals
    in the plan — for very long lists, batch the calls). Same
    per-round lineage-truncation contract as ``phrase_merges``
    (``checkpoint_dir`` for reliable checkpoints on long runs),
    including its documented SESSION-GLOBAL ``setCheckpointDir``
    side effect.
    """
    t = docs.select(
        F.col(id_col).alias("_id_"),
        F.posexplode(norm_tokens(F.col(text_col))).alias("_p_", "_w_"),
    )
    wdoc = Window.partitionBy("_id_").orderBy("_p_")
    t = _replay_merges(t, list(merges), joiner, wdoc, checkpoint_dir)
    return t.select(
        F.col("_id_").alias(id_col),
        F.col("_p_").alias("pos"),
        F.col("_w_").alias("token"),
    )


def _char_rows(df: DataFrame, end_of_word: str) -> DataFrame:
    """(_id_, _p_, _w_) rows: each word string (its own id) exploded to
    characters plus the end-of-word marker. Shared by train and the
    encode OOV replay so the split can never drift.

    The empty-pattern split is the ONLY Spark char split that is
    codepoint-correct: a lookahead split (`(?!^)`) advances by UTF-16
    code UNIT and shears astral chars (emoji, CJK extensions) into
    lone surrogates, silently diverging from DuckDB's
    `string_split(s, '')` — found by the char-split contract fuzz
    (`test_char_split_contract_fuzz`). Requires Spark >= 3.4: before
    SPARK-40194, split(s, '') also emitted a trailing empty element
    (the fuzz pins the running version's behavior)."""
    chars = F.concat(F.split(F.col("_id_"), ""), F.array(F.lit(end_of_word)))
    return df.select("_id_", F.posexplode(chars).alias("_p_", "_w_"))


def _replay_merges(
    t: DataFrame,
    merge_list: list[tuple[str, str]],
    joiner: str,
    wdoc: Window,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Apply a FROZEN merge list in rank order — one _merge_pass round
    per pair, lineage truncated per round (localCheckpoint, or a
    reliable checkpoint when ``checkpoint_dir`` is set —
    session-globally, see ``phrase_merges``). Shared by
    ``apply_merges`` (word level) and ``bpe_encode`` (char level)."""
    if checkpoint_dir is not None:
        t.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    for w1, w2 in merge_list:
        paired = t.withColumn("_wn_", F.lead("_w_").over(wdoc)).withColumns(
            {"_w1_": F.lit(w1), "_w2_": F.lit(w2)}
        )
        t = _merge_pass(paired, joiner, wdoc)
        t = (
            t.checkpoint(eager=False)
            if checkpoint_dir is not None
            else t.localCheckpoint(eager=False)
        )
    return t


def _assemble_symbols(t: DataFrame) -> DataFrame:
    """(_id_, symbols): position-ordered symbol arrays from the
    (_id_, _p_, _w_) row stream."""
    return t.groupBy("_id_").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_p_", "_w_"))),
            lambda s: s["_w_"],
        ).alias("symbols")
    )


def bpe_train(
    docs: DataFrame,
    text_col: str,
    *,
    merges: int = 8,
    end_of_word: str = "</w>",
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Char-level, frequency-weighted BPE training (Sennrich et al.
    2016) — the REAL tokenizer-training step (``phrase_merges`` is its
    word-level skeleton): words split into characters plus an
    end-of-word marker, and each round merges the adjacent symbol
    pair with the highest CORPUS frequency (word-type pair count
    weighted by word frequency; ties to the lexicographically
    smallest pair).

    Returns ``(merge_table, vocab_symbols)``:
    - ``merge_table`` — (rank, sym1, sym2, pair_freq): the frozen
      artifact a tokenizer ships; a pair-exhausted round emits an
      all-NULL row (same sentinel contract as ``phrase_merges``).
    - ``vocab_symbols`` — (word, freq, symbols array) after all
      merges: the encode table (broadcast-join it against a token
      stream to tokenize a corpus).

    Scale shape — the property that makes BPE trainable on a 100 TB
    corpus: the ONLY corpus-sized work is one token reduction to the
    (word, freq) vocabulary table; every training round then operates
    on vocabulary-sized frames (chars-per-word rows), reusing the
    exact ``_merge_pass`` machinery of the word-level trainer (merged
    symbols participate in later rounds; left-to-right non-overlap via
    parity islands — self-adjacent pairs like ('a','a') in 'aaa'
    merge greedily from the left, the reference BPE convention).
    Per-round lineage truncates with localCheckpoint, or a RELIABLE
    checkpoint when ``checkpoint_dir`` is set — real tokenizer runs
    are 10k-100k rounds, exactly the executor-loss exposure the
    word-level twins document. ``checkpoint_dir`` carries
    ``phrase_merges``'s documented SESSION-GLOBAL ``setCheckpointDir``
    side effect.
    """
    if merges < 1:
        raise ValueError(f"merges must be >= 1, got {merges}")
    if checkpoint_dir is not None:
        docs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    vocab = (
        docs.select(F.explode(norm_tokens(F.col(text_col))).alias("_id_"))
        .groupBy("_id_")
        .agg(F.count(F.lit(1)).alias("_freq_"))
    )
    # the word string is its own id: unique by construction, and the
    # per-word windows partition on it directly
    t = _char_rows(vocab, end_of_word).localCheckpoint(eager=False)
    freqs = vocab.persist()
    wdoc = Window.partitionBy("_id_").orderBy("_p_")
    merge_rows: list[DataFrame] = []
    for rank in range(1, merges + 1):
        paired = t.withColumn("_wn_", F.lead("_w_").over(wdoc))
        counts = (
            paired.where(F.col("_wn_").isNotNull())
            .join(freqs, "_id_")
            .groupBy("_w_", "_wn_")
            .agg(F.sum("_freq_").alias("_cnt_"))
        )
        sentinel = t.sparkSession.range(1).select(
            F.lit(None).cast("string").alias("_w1_"),
            F.lit(None).cast("string").alias("_w2_"),
            F.lit(None).cast("long").alias("_bcnt_"),
        )
        best = (
            counts.select(
                F.col("_w_").alias("_w1_"),
                F.col("_wn_").alias("_w2_"),
                F.col("_cnt_").alias("_bcnt_"),
            )
            .unionAll(sentinel)
            .orderBy(
                F.col("_bcnt_").desc_nulls_last(),
                F.col("_w1_").asc(),
                F.col("_w2_").asc(),
            )
            .limit(1)
        )
        t = _merge_pass(paired.join(F.broadcast(best)), "", wdoc)
        t = (
            t.checkpoint(eager=False)
            if checkpoint_dir is not None
            else t.localCheckpoint(eager=False)
        )
        merge_rows.append(
            best.select(
                F.lit(rank).alias("rank"),
                F.col("_w1_").alias("sym1"),
                F.col("_w2_").alias("sym2"),
                F.col("_bcnt_").alias("pair_freq"),
            )
        )
    merge_table = merge_rows[0]
    for m in merge_rows[1:]:
        merge_table = merge_table.unionAll(m)
    vocab_symbols = (
        _assemble_symbols(t)
        .join(freqs, "_id_")
        .select(
            F.col("_id_").alias("word"), F.col("_freq_").alias("freq"), "symbols"
        )
    )
    return merge_table, vocab_symbols


def bpe_encode(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab_symbols: DataFrame,
    merge_list: list[tuple[str, str]] | None = None,
    *,
    end_of_word: str = "</w>",
) -> DataFrame:
    """Tokenize a corpus with a TRAINED BPE model (``bpe_train``
    output): every word joins the broadcast ``vocab_symbols`` table —
    O(1) per occurrence, the production encode path — and
    out-of-vocabulary words fall back to replaying ``merge_list`` (the
    frozen merge table as (sym1, sym2) pairs in rank order) over their
    characters, exactly what a real BPE tokenizer does for unseen
    words. With ``merge_list=None`` OOV words stay as raw characters +
    marker.

    Returns (``id_col``, pos, word, symbols array<string>) — one row
    per word occurrence, positions from the norm_tokens stream.

    Scale shape: the vocab table is tokenizer-sized (bounded by the
    training corpus vocabulary) and broadcast; the corpus-sized
    joined frame is persisted because THREE branches consume it (hit
    branch, OOV-word discovery, OOV recovery join — the same
    multiple-consumer shape minhash_probe persists for); the OOV
    replay itself only ever sees word TYPES absent from the vocab (an
    anti-join-sized residue) exploded to characters and merged with
    the training ``_merge_pass`` rounds via the shared
    ``_replay_merges``. Everything stays lazy — no driver-side
    emptiness probe; an all-in-vocabulary corpus simply yields an
    empty OOV branch in the same plan.
    """
    words = docs.select(
        F.col(id_col).alias("_did_"),
        F.posexplode(norm_tokens(F.col(text_col))).alias("_p_", "_word_"),
    )
    vocab = F.broadcast(
        vocab_symbols.select(F.col("word").alias("_word_"), "symbols")
    )
    joined = words.join(vocab, "_word_", "left").persist()
    hit = joined.where(F.col("symbols").isNotNull())
    miss = joined.where(F.col("symbols").isNull()).select("_did_", "_p_", "_word_")
    out_cols = [
        F.col("_did_").alias(id_col),
        F.col("_p_").alias("pos"),
        F.col("_word_").alias("word"),
        "symbols",
    ]
    # OOV fallback: distinct unseen word TYPES, char-exploded, the
    # frozen merges replayed in rank order (shared _replay_merges)
    oov = miss.select(F.col("_word_").alias("_id_")).distinct()
    t = _char_rows(oov, end_of_word)
    wdoc = Window.partitionBy("_id_").orderBy("_p_")
    t = _replay_merges(t, merge_list or [], "", wdoc)
    oov_syms = _assemble_symbols(t)
    recovered = miss.join(
        F.broadcast(oov_syms.select(F.col("_id_").alias("_word_"), "symbols")),
        "_word_",
    )
    return hit.select(*out_cols).unionByName(recovered.select(*out_cols))
