"""Streaming ingest gates: the daily-ingest dedup operators applied to
a document STREAM against a maintained corpus.

The reference's streaming surface is fixed-window aggregation
(``/root/reference/PythonKafkaSink/main.py:79-96``); these extend the
same micro-batch machinery to the LLM-pipeline admission shape: each
arriving batch of documents is scored against the accumulated corpus
(near-dup probe) and its component labeling is folded into the
maintained labels table — the streaming twins of
``operators/dedup.py::incremental_near_dup`` and
``incremental_connected_components``.

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

from ..operators.dedup import (
    connected_components,
    incremental_connected_components,
    incremental_near_dup,
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
