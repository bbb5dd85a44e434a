"""Streaming near-duplicate gate: probe each micro-batch of incoming
documents against a static MinHash index.

The streaming twin of ``operators/dedup.minhash_probe`` (no reference
analog — its streaming surface is the hourly capture flush,
`twitter/Execute.scala:58-98`): the production "crawl firehose →
dedup gate → clean corpus" shape. The index frames are the
``minhash_index`` output read from parquet — static, signed once —
and every micro-batch pays only its own signature plus a band
equi-join, exactly the incremental-cost contract of the batch probe.

``foreachBatch`` is the right tool here, not a stream-stream join:
the probe pipeline contains windows and multi-stage aggregations that
Structured Streaming cannot run incrementally, but each micro-batch
is a finite frame the full batch operator handles verbatim — one
code path, zero semantic drift between the streaming gate and the
batch backfill.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from demy_spark.operators.dedup import minhash_probe

__all__ = [
    "streaming_fuzzy_lookup",
    "streaming_near_dup_probe",
    "streaming_quality_gate",
]


def streaming_near_dup_probe(
    docs_stream: DataFrame,
    index_bands: DataFrame,
    index_shingles: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    include_intra_batch: bool = False,
    on_batch: Callable[[DataFrame, int], None],
):
    """Start an availableNow stream that runs ``minhash_probe`` over
    every micro-batch and hands (pairs_df, epoch_id) to ``on_batch``
    (write to parquet, publish metrics, drop matched ids — caller's
    choice). Returns the started StreamingQuery; callers own
    ``awaitTermination``/``processAllAvailable``.

    With the default ``include_intra_batch=False``, two near-dup
    documents arriving in the SAME micro-batch both pass the gate
    (only batch-vs-index pairs are reported). Gate deployments should
    either set ``include_intra_batch=True`` (intra-batch pairs emit
    as (higher, lower) so keep-lowest-id admits one per clone group)
    or fold accepted docs back into the index between epochs.
    """

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = minhash_probe(
            index_bands,
            index_shingles,
            batch_df,
            text_col,
            id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            jaccard_threshold=jaccard_threshold,
            include_intra_batch=include_intra_batch,
        )
        on_batch(pairs, epoch_id)

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
    )


def streaming_fuzzy_lookup(
    probes_stream: DataFrame,
    index,
    query_col: str,
    *,
    on_batch: Callable[[DataFrame, int], None],
    **lookup_kwargs,
):
    """Streaming twin of the flagship ``operators/fuzzy_lookup``
    operator: probe each micro-batch of query rows against a
    PERSISTED ``FuzzyIndex`` (built once with ``FuzzyIndex(...)`` or
    reloaded with ``FuzzyIndex.load`` — the reference's
    reuseExistingIndex=true deployment, index/implicits.scala:125-183)
    and hand each batch's matches to ``on_batch``.

    Same ``foreachBatch`` rationale as ``streaming_near_dup_probe``:
    the lookup pipeline contains candidate-generation joins, a scoring
    aggregation and a per-query top-k window that Structured Streaming
    cannot run incrementally, but every micro-batch is a finite frame
    the batch operator handles verbatim — ONE code path, so the
    streaming gate and any batch backfill can never drift. Per-batch
    cost is the batch probe's incremental contract: the index frames
    are static (token equi-join against the denormalized
    ``scored_postings``), each epoch pays only its own rows'
    tokenization + candidate joins.

    ``lookup_kwargs`` pass through to ``fuzzy_lookup`` (strategy,
    min_score, top_k, filter_cols, ...). Returns the started
    StreamingQuery; callers own awaitTermination /
    processAllAvailable.
    """
    from demy_spark.operators.fuzzy_lookup import fuzzy_lookup

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        matches = fuzzy_lookup(
            batch_df,
            index.right,
            query_col,
            # no text_col: the right side's tokenization is baked into
            # the index's postings
            index=index,
            **lookup_kwargs,
        )
        on_batch(matches, epoch_id)

    return (
        probes_stream.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
    )


def streaming_quality_gate(
    docs_stream: DataFrame,
    text_col: str,
    host_col: str,
    blocklist: DataFrame,
    *,
    rules: tuple[str, ...] | None = None,
    on_batch: Callable[[DataFrame, int], None],
    **c4_kwargs,
):
    """Streaming twin of the ingest curation gate: every micro-batch
    of crawled documents runs the BATCH operators verbatim — C4
    line-level cleanup (``textstats.c4_rules``, the q133 semantics)
    and the registered-domain blocklist join
    (``domains.blocklist_gate``, the q137 semantics) — and hands the
    gated frame to ``on_batch``. One code path with batch backfills,
    zero semantic drift; the crawl-spool → gate → clean-corpus shape
    the crawler's readStream handoff exists for.

    Output columns: the input's plus ``reg_domain``, ``category``,
    ``domain_keep`` (blocklist verdict), ``text_clean`` +
    ``quality_keep`` (C4 verdict) and combined ``keep``. The PSL rule
    dict rides in the UDF closure and the blocklist broadcasts — the
    per-batch plan is shuffle-free, so gate latency is scan-bound.
    """
    from pyspark.sql import functions as F

    from demy_spark.functions.domains import PSL_SAMPLE_RULES, blocklist_gate
    from demy_spark.functions.textstats import c4_rules

    rule_set = PSL_SAMPLE_RULES if rules is None else rules
    # resolve the auto strategy ONCE at stream setup — the blocklist
    # is fixed for the stream's lifetime, and the per-batch plan must
    # stay free of the dispatch count job (r10: blocklist_gate
    # defaults to strategy="auto"); the rule lives in ONE place
    from demy_spark.functions.domains import resolve_blocklist_strategy

    gate_strategy = resolve_blocklist_strategy(blocklist)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        gated = blocklist_gate(
            batch_df, host_col, blocklist, rules=rule_set,
            strategy=gate_strategy,
        ).withColumnRenamed("keep", "domain_keep")
        c4 = c4_rules(F.col(text_col), **c4_kwargs)
        out = (
            gated.withColumn("_c4_", c4)
            .withColumn("text_clean", F.col("_c4_.text_clean"))
            .withColumn("quality_keep", F.col("_c4_.keep"))
            .withColumn(
                "keep", F.col("domain_keep") & F.col("_c4_.keep")
            )
            .drop("_c4_")
        )
        on_batch(out, epoch_id)

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
    )
