"""Streaming ingest gates: the daily-ingest dedup operators applied to
a document STREAM against a maintained corpus.

The reference's streaming surface is fixed-window aggregation
(``/root/reference/PythonKafkaSink/main.py:79-96``); these extend the
same micro-batch machinery to the LLM-pipeline admission shape: each
arriving batch of documents is scored against the accumulated corpus
index and admitted/rejected, with admitted documents folding into the
maintained index. Five gates, each the streaming twin of an
oracle-checked batch operator: Jaccard near-dup
(``incremental_near_dup``), component maintenance
(``incremental_connected_components``), winnowing fingerprints
(``winnow_fingerprints`` — fuzzy MOSS overlap), CDC chunk ratio
(``cdc_chunks``), and exact-substring contamination
(``gram_position_classes`` — any verbatim min_len-char overlap).

Design: ``foreachBatch`` per-batch composition, NOT a stateful
streaming operator. The corpus/labels are maintained TABLES (persisted
between batches and between runs — exactly what a 100 TB pipeline
does), so the right state store is the table itself; engine state
(``applyInPandasWithState``) would duplicate it into the checkpoint
and cap it at executor memory. Each micro-batch runs the already
oracle-checked batch operator, so streaming results are
batch-equivalent by construction (pinned by replay tests): a doc's
admission decision depends only on (doc, corpus), never on its batch
siblings, so any micro-batch split yields identical output.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    connected_components,
    incremental_connected_components,
    incremental_near_dup,
)


def _guard_index_restart(
    incoming: DataFrame, checkpoint: str, initial, what: str
) -> None:
    """Refuse to resume a gate stream with an EMPTY maintained index.

    The maintained index (fingerprints / chunk hashes / labels) lives
    OUTSIDE the checkpoint — the checkpoint carries only source
    offsets. Restarting against an existing checkpoint without
    passing the persisted index back in would silently resume from
    the stored offsets with a blank index, so previously-admitted
    duplicates re-admit (round-9 ADVICE: the contract was documented
    and test-pinned, but nothing guarded the misuse at runtime).
    Raises unless the caller either supplies the initial index or the
    checkpoint is fresh (no committed offsets yet). A deliberate
    blank-index resume can pass an EMPTY DataFrame — explicit, not
    accidental.
    """
    if initial is not None:
        return
    spark = incoming.sparkSession
    try:
        jvm = spark._jvm
        jconf = spark._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(checkpoint + "/offsets")
        fs = path.getFileSystem(jconf)
        has_offsets = fs.exists(path) and len(fs.listStatus(path)) > 0
    except Exception:
        return  # FS probe unavailable — keep the documented contract
    if has_offsets:
        raise ValueError(
            f"checkpoint {checkpoint!r} already has committed offsets "
            f"but {what} is None: resuming would probe an EMPTY index "
            "and re-admit previously-admitted duplicates. Pass the "
            f"persisted index as {what} (an empty DataFrame to "
            "deliberately reset it), or use a fresh checkpoint dir."
        )


def near_dup_admission_stream(
    incoming: DataFrame,
    corpus: DataFrame,
    checkpoint: str,
    on_batch: Callable[[DataFrame, int], None],
    threshold: float = 0.5,
    trigger: dict | None = None,
):
    """Start a streaming admission gate: for every micro-batch of
    ``incoming`` documents, emit (doc_id, matched_doc, jaccard) for
    each doc with a corpus near-dup at/above ``threshold`` via
    ``on_batch(decisions_df, batch_id)``.

    ``corpus`` is the maintained batch frame (shingled/bucketed once
    per batch here; persist it upstream to amortize across batches —
    the memoized ``shared_pair_graph`` posture).
    """
    trigger = trigger or {"availableNow": True}

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        decisions = incremental_near_dup(
            corpus, batch_df, threshold=threshold
        )
        on_batch(decisions, batch_id)

    return (
        incoming.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )


def embedding_admission_stream(
    incoming: DataFrame,
    corpus: DataFrame,
    checkpoint: str,
    on_batch: Callable[[DataFrame, int], None],
    threshold: float = 0.45,
    trigger: dict | None = None,
):
    """Streaming EMBEDDING admission gate (round-13 — the semantic
    twin of ``near_dup_admission_stream``): each arriving batch of
    (vec_id, embedding) rows is probed against the maintained corpus
    via the reproducible int8 integer-plane LSH and exact unit-dot
    verification; ``on_batch`` receives (vec_id, matched_vec, cosine)
    for every incoming vector with a corpus match at/above
    ``threshold``. A decision depends only on (vector, corpus), so
    any micro-batch split yields identical output (replay-pinned).

    ``corpus`` is the maintained frame; at scale persist its hashed
    (vec_id, table_id, bucket) index next to the embeddings — the
    integer planes guarantee the index stays valid across sessions
    and engines (the reason this gate does NOT use gaussian planes).
    """
    trigger = trigger or {"availableNow": True}

    from ..operators.similarity import incremental_embedding_near_dup

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        decisions = incremental_embedding_near_dup(
            corpus, batch_df, threshold=threshold
        )
        on_batch(decisions, batch_id)

    return (
        incoming.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )


def component_maintenance_stream(
    edge_stream: DataFrame,
    checkpoint: str,
    on_update: Callable[[DataFrame, int], None] | None = None,
    a: str = "doc_a",
    b: str = "doc_b",
    initial_labels: DataFrame | None = None,
    trigger: dict | None = None,
):
    """Maintain a connected-components labeling over a STREAM of new
    near-dup edges: each micro-batch folds into the labeling via
    ``incremental_connected_components`` (collapsed-graph CC, bounded
    by touched classes + batch), and the updated full labeling is
    handed to ``on_update``.

    The labeling is the pipeline's maintained table: here it lives as
    an eagerly local-checkpointed frame swapped per batch (bounded by
    node count, lineage truncated so batch N's plan never contains
    batches 1..N-1); a production deployment writes it to a real
    table/Delta target in ``on_update`` and passes it back as
    ``initial_labels`` on restart — the checkpoint dir only carries
    source offsets, never the labeling, so state size is independent
    of the streaming engine. Batch-equivalence (any edge-batch split
    ends at full-graph CC) is the property the incremental operator
    already pins; the replay test re-pins it end-to-end.
    """
    _guard_index_restart(
        edge_stream, checkpoint, initial_labels, "initial_labels"
    )
    trigger = trigger or {"availableNow": True}
    state: dict = {"labels": initial_labels}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        edges = batch_df.select(a, b)
        if state["labels"] is None:
            labels = connected_components(edges, a=a, b=b)
        else:
            labels = incremental_connected_components(
                state["labels"], edges, a=a, b=b
            )
        labels = labels.localCheckpoint(eager=True)
        state["labels"] = labels
        if on_update is not None:
            on_update(labels, batch_id)

    query = (
        edge_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
    return query, state


def knn_forget_stream(
    forget_stream: DataFrame,
    graph: DataFrame,
    corpus: DataFrame,
    checkpoint: str,
    on_update: Callable[[DataFrame, int], None] | None = None,
    k: int = 5,
    n_bits: int | None = None,
    n_tables: int = 8,
    seed: int = 42,
    dim: int = 64,
    trigger: dict | None = None,
):
    """Propagate a STREAM of deletion requests into a maintained
    NN-Descent k-NN graph (round-13 verdict #8 — closes the index
    lifecycle in streaming: build → ``nndescent_merge_batch`` on
    ingest → THIS on forget): each micro-batch of (vec_id) deletions
    folds into the graph via ``nndescent_forget_compact`` and shrinks
    the maintained corpus, and the updated (graph, corpus) pair is
    handed to ``on_update``.

    Same maintained-table posture as ``component_maintenance_stream``:
    graph and corpus live as eagerly local-checkpointed frames swapped
    per batch (lineage truncated so batch N's plan never contains
    batches 1..N-1); a production deployment writes both to real
    tables in ``on_update`` and passes them back on restart — the
    checkpoint dir carries only source offsets, never the index.

    ``n_bits`` is resolved ONCE against the initial corpus and pinned
    for every batch: the repair stage must re-hash with the graph's
    BUILD-TIME planes (the ``nndescent_forget_compact`` contract), and
    a shrinking corpus must not silently re-derive a smaller table.

    Batch-split invariance (replay-pinned): compaction equals
    rebuild-after-delete for init-tier graphs, so folding deletions
    one batch at a time ends at the same graph as one compaction over
    the union — any micro-batch split is equivalent.
    """
    from ..operators.similarity import _auto_bits, nndescent_forget_compact

    trigger = trigger or {"availableNow": True}
    bits = _auto_bits(corpus, n_bits)
    state: dict = {"graph": graph, "corpus": corpus}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fids = batch_df.select(
            F.col(batch_df.columns[0]).alias("fid")
        ).distinct()
        new_graph = nndescent_forget_compact(
            state["graph"],
            state["corpus"],
            fids,
            k=k,
            n_bits=bits,
            n_tables=n_tables,
            seed=seed,
            dim=dim,
        ).localCheckpoint(eager=True)
        new_corpus = state["corpus"].join(
            F.broadcast(fids),
            state["corpus"]["vec_id"] == F.col("fid"),
            "left_anti",
        ).localCheckpoint(eager=True)
        state["graph"] = new_graph
        state["corpus"] = new_corpus
        if on_update is not None:
            on_update(new_graph, batch_id)

    query = (
        forget_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
    return query, state


def winnowing_admission_stream(
    incoming: DataFrame,
    checkpoint: str,
    on_batch: Callable[[DataFrame, int], None],
    initial_fps: DataFrame | None = None,
    min_shared: int = 3,
    max_df: int = 20,
    trigger: dict | None = None,
):
    """Streaming winnowing-fingerprint admission gate — the streaming
    twin of ``dedup_winnowing_pairs``: each micro-batch of documents
    is fingerprinted (``operators.dedup.winnow_fingerprints``, the
    SAME selection the batch query runs) and probed against the
    maintained corpus fingerprint index; a doc matching any corpus
    doc on >= ``min_shared`` fingerprints is rejected, the rest are
    admitted and their fingerprints fold into the index.

    Emits per incoming doc via ``on_batch``: (doc_id, matched_doc,
    shared_fps, admitted) with the best match (max shared, min
    matched_doc id — deterministic) or NULLs when admitted.

    Scale shape: the probe is an equi-join on fingerprint hash with
    the corpus-side document-frequency gate (fingerprints in >
    ``max_df`` corpus docs are stopword grams, dropped before the
    join) — so every bucket is bounded and the join is skew-proof,
    identical to the batch query's candidate generation. The index is
    the pipeline's maintained TABLE: here an eagerly
    lineage-truncated frame swapped per batch (batch N's plan never
    contains batches 1..N-1); production writes it to a real
    table/Delta target in ``on_batch`` and passes it back as
    ``initial_fps`` on restart — the checkpoint dir carries only
    source offsets. Admission is sequential by construction (a doc's
    decision depends on what was admitted before it), matching the
    batch-fold replay the test pins.

    Per-batch cost note: the df-gate re-aggregates the index here
    (O(index) per batch — fine for the frame-swap posture, whose
    index rewrite is already O(index)); a table-backed deployment
    instead maintains an (h, df) aggregate incrementally (MERGE INTO
    keyed on h, +1 per admitted fingerprint) so each batch touches
    only its own keys.
    """
    from ..operators.dedup import winnow_fingerprints

    _guard_index_restart(incoming, checkpoint, initial_fps, "initial_fps")
    trigger = trigger or {"availableNow": True}
    state: dict = {"fps": initial_fps}

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        ids = batch_df.select("doc_id").distinct()
        bfps = winnow_fingerprints(batch_df).localCheckpoint(eager=True)
        corpus = state["fps"]
        if corpus is None:
            matches = None
        else:
            keep = (
                corpus.groupBy("h")
                .agg(F.countDistinct("doc_id").alias("df"))
                .filter(F.col("df") <= max_df)
                .select("h")
            )
            gated = corpus.join(keep, "h")
            matches = (
                bfps.alias("b")
                .join(gated.alias("c"), "h")
                .groupBy(
                    F.col("b.doc_id").alias("doc_id"),
                    F.col("c.doc_id").alias("matched_doc"),
                )
                .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
                .filter(F.col("shared_fps") >= min_shared)
            )
        if matches is None:
            decisions = ids.select(
                "doc_id",
                F.lit(None).cast("long").alias("matched_doc"),
                F.lit(None).cast("long").alias("shared_fps"),
                F.lit(True).alias("admitted"),
            )
        else:
            best = matches.groupBy("doc_id").agg(
                F.max_by(
                    F.struct("matched_doc", "shared_fps"),
                    F.struct(
                        F.col("shared_fps"),
                        (-F.col("matched_doc")).alias("neg"),
                    ),
                ).alias("m")
            )
            decisions = ids.join(best, "doc_id", "left").select(
                "doc_id",
                F.col("m.matched_doc").alias("matched_doc"),
                F.col("m.shared_fps").alias("shared_fps"),
                F.col("m").isNull().alias("admitted"),
            )
        decisions = decisions.localCheckpoint(eager=True)
        on_batch(decisions, batch_id)
        admitted_fps = bfps.join(
            decisions.filter("admitted").select("doc_id"), "doc_id"
        )
        new_index = (
            admitted_fps
            if state["fps"] is None
            else state["fps"].unionByName(admitted_fps)
        )
        state["fps"] = new_index.localCheckpoint(eager=True)

    query = (
        incoming.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
    return query, state


def cdc_chunk_dedup_stream(
    incoming: DataFrame,
    checkpoint: str,
    on_batch: Callable[[DataFrame, int], None],
    initial_chunks: DataFrame | None = None,
    max_dup_ratio: float = 0.5,
    min_chunk_len: int = 16,
    trigger: dict | None = None,
):
    """Streaming content-defined-chunk dedup gate — the streaming
    twin of ``text_cdc_duplicate_chunks``: each micro-batch is CDC-
    chunked (``operators.dedup.cdc_chunks``, the same anchoring), a
    doc's qualifying chunks (len >= ``min_chunk_len``) are probed
    against the maintained chunk-hash index, and the doc is admitted
    iff its duplicated-chunk ratio is <= ``max_dup_ratio`` (docs with
    no qualifying chunks admit at ratio 0.0 — nothing to dedup on).
    Admitted docs' qualifying chunk hashes fold into the index.

    Emits per incoming doc: (doc_id, n_chunks, n_dup, dup_ratio,
    admitted). Probe is an equi-join on chunk_md5 against the
    distinct index; the index is the maintained-table posture of
    ``winnowing_admission_stream`` (lineage-truncated swap locally,
    real table in production via ``initial_chunks``).
    """
    from ..operators.dedup import cdc_chunks

    _guard_index_restart(incoming, checkpoint, initial_chunks, "initial_chunks")
    trigger = trigger or {"availableNow": True}
    state: dict = {"chunks": initial_chunks}

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        ids = batch_df.select("doc_id").distinct()
        ch = (
            cdc_chunks(batch_df)
            .filter(F.col("clen") >= min_chunk_len)
            .select("doc_id", "chunk_md5")
            .localCheckpoint(eager=True)
        )
        index = state["chunks"]
        if index is None:
            per_doc = ch.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_chunks"),
                F.lit(0).cast("long").alias("n_dup"),
            )
        else:
            hit = ch.join(
                index.select("chunk_md5").distinct(),
                "chunk_md5",
                "left_semi",
            ).groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_dup")
            )
            per_doc = (
                ch.groupBy("doc_id")
                .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"))
                .join(hit, "doc_id", "left")
                .withColumn("n_dup", F.coalesce("n_dup", F.lit(0)))
            )
        decisions = (
            ids.join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
                F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
                F.round(
                    F.when(
                        F.coalesce("n_chunks", F.lit(0)) == 0, F.lit(0.0)
                    ).otherwise(
                        F.coalesce("n_dup", F.lit(0)).cast("double")
                        / F.col("n_chunks")
                    ),
                    6,
                ).alias("dup_ratio"),
            )
            .withColumn(
                "admitted", F.col("dup_ratio") <= F.lit(max_dup_ratio)
            )
            .localCheckpoint(eager=True)
        )
        on_batch(decisions, batch_id)
        adm = ch.join(
            decisions.filter("admitted").select("doc_id"), "doc_id"
        )
        new_index = (
            adm if state["chunks"] is None else state["chunks"].unionByName(adm)
        )
        state["chunks"] = new_index.localCheckpoint(eager=True)

    query = (
        incoming.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
    return query, state


def substring_contamination_stream(
    incoming: DataFrame,
    checkpoint: str,
    on_batch: Callable[[DataFrame, int], None],
    initial_index: DataFrame | None = None,
    min_len: int = 40,
    trigger: dict | None = None,
):
    """Streaming exact-substring contamination gate — the admission
    twin of ``dedup_suffix_duplicate_spans`` at the same character
    grain: a document is REJECTED iff it shares any ``min_len``-char
    verbatim substring with the maintained index; admitted documents'
    gram classes fold in. Seed ``initial_index`` with a PROTECTED
    corpus's gram classes (``operators.dedup.gram_position_classes``
    over the eval benchmarks, ``select h1, h2``) and this is streaming
    benchmark decontamination: training ingest never admits a verbatim
    leak — the exact tier next to the fuzzy winnowing gate and the
    chunk-ratio CDC gate.

    Emits per incoming doc via ``on_batch``: (doc_id, n_spans,
    max_span_len, admitted) — hit positions merged to maximal runs
    (``n_spans`` islands; ``max_span_len`` chars, >= ``min_len`` when
    any hit), zeros when clean. Decisions depend only on (doc, index
    at batch start), never on batch siblings — any micro-batch split
    replays identically (pinned vs a pure-Python sequential fold).

    Scale shape: the probe is a left-semi equi-join on the 16-byte
    class id (batch positions x index — skew-proof, never a cartesian);
    the per-doc island merge windows only over HIT positions. The
    index is the maintained-TABLE posture of the sibling gates
    (lineage-truncated swap locally; production MERGEs the distinct
    (h1, h2) keys into a real table and passes it back on restart —
    the checkpoint dir carries only source offsets, enforced by the
    same restart guard).
    """
    from pyspark.sql import Window

    from ..operators.dedup import gram_position_classes

    _guard_index_restart(
        incoming, checkpoint, initial_index, "initial_index"
    )
    trigger = trigger or {"availableNow": True}
    state: dict = {"index": initial_index}
    T = int(min_len)

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        ids = batch_df.select("doc_id").distinct()
        g = gram_position_classes(
            batch_df, min_len=T
        ).localCheckpoint(eager=True)
        index = state["index"]
        if index is None:
            per_doc = None
        else:
            hits = g.join(index, ["h1", "h2"], "left_semi")
            w = Window.partitionBy("doc_id").orderBy("p")
            isl = hits.withColumn(
                "grp", F.col("p") - F.row_number().over(w)
            )
            runs = isl.groupBy("doc_id", "grp").agg(
                (F.max("p") - F.min("p") + T).alias("span_len")
            )
            per_doc = runs.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_spans"),
                F.max("span_len").cast("long").alias("max_span_len"),
            )
        if per_doc is None:
            decisions = ids.select(
                "doc_id",
                F.lit(0).cast("long").alias("n_spans"),
                F.lit(0).cast("long").alias("max_span_len"),
                F.lit(True).alias("admitted"),
            )
        else:
            decisions = ids.join(per_doc, "doc_id", "left").select(
                "doc_id",
                F.coalesce("n_spans", F.lit(0))
                .cast("long")
                .alias("n_spans"),
                F.coalesce("max_span_len", F.lit(0))
                .cast("long")
                .alias("max_span_len"),
                F.col("n_spans").isNull().alias("admitted"),
            )
        decisions = decisions.localCheckpoint(eager=True)
        on_batch(decisions, batch_id)
        adm = (
            g.join(
                decisions.filter("admitted").select("doc_id"), "doc_id"
            )
            .select("h1", "h2")
            .distinct()
        )
        new_index = (
            adm
            if state["index"] is None
            else state["index"].unionByName(adm).distinct()
        )
        state["index"] = new_index.localCheckpoint(eager=True)

    query = (
        incoming.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
    return query, state
