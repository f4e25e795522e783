"""Continuous KG ingestion: Structured Streaming micro-batches applied as
chained incremental snapshots.

``readStream`` over the transcript landing directory → ``foreachBatch`` →
``IncrementalPipeline`` — each micro-batch becomes one incremental
snapshot whose parent is the previous batch's snapshot, so the warehouse
always holds a consistent, queryable KG (resolve any table with
``plans.incremental.full_view``) and the whole history of snapshots.

Contracts and guarantees:

- **Conversation atomicity**: a micro-batch must carry whole
  conversations. The file streaming source assigns FILES to batches, so
  an upstream writer that lands one parquet file per completed
  conversation set satisfies this for free (same contract Kafka ingestion
  would satisfy with per-conversation tombstones). Turn rows of one
  conversation split across two batches would register the conversation
  twice; the later batch REPLACES the earlier one (re-delivery
  supersedes) rather than merging partial turns.
- **Restart safety / exactly-once**: foreachBatch can replay a batch id
  after a crash. Snapshot ids are derived from the batch id, and
  ``IncrementalPipeline.run`` skips committed stages, so a replay
  finishes the interrupted snapshot instead of duplicating it. On
  restart the chain tip is recovered from the snapshot metadata
  (``latest_snapshot``), not from driver memory.
- **Scale**: each batch pays O(batch) work plus the vocabulary-scale
  registry merge and the O(new-edges) incremental CC
  (plans/incremental.py); with ``rescan="none"`` (the streaming default)
  no history is read — historical mentions of newly-registered people
  appear at the next compaction run, the standard bounded-staleness
  trade for continuous ingestion. ``rescan="exact"`` is available when
  the landing rate affords a history read per batch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from ..plans.incremental import IncrementalPipeline, _meta_path


def latest_snapshot(warehouse: str, base: str) -> str:
    """The tip of the incremental chain rooted at ``base`` — the snapshot
    no other snapshot names as parent. O(#snapshots) driver-side JSON
    reads (snapshot metadata is tiny and local)."""
    inc_dir = os.path.join(warehouse, "_incremental")
    parents: dict[str, str] = {}
    if os.path.isdir(inc_dir):
        for name in os.listdir(inc_dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(inc_dir, name), encoding="utf-8") as f:
                parents[name[: -len(".json")]] = json.load(f)["parent"]
    tip = base
    children: dict[str, str] = {}
    for s, p in parents.items():
        if p in children:
            # two snapshots chained on one parent = a forked history; the
            # dict comprehension this replaced kept an ARBITRARY child
            # (listdir order), so successive restarts could resolve
            # different tips and full_view would silently drop the other
            # branch's conversations. Ambiguity must stop ingestion.
            raise ValueError(
                f"branched snapshot chain: {children[p]!r} and {s!r} both "
                f"have parent {p!r}; expire one branch with "
                "plans.incremental.expire_branch(warehouse, snapshot_id) "
                "(tip-first), or compact, before resuming ingestion"
            )
        children[p] = s
    seen = {tip}
    while tip in children:
        tip = children[tip]
        if tip in seen:  # corrupted metadata must not hang ingestion
            raise ValueError(f"snapshot parent cycle at {tip!r}")
        seen.add(tip)
    return tip


class IncrementalIngest:
    """foreachBatch callable — apply each micro-batch as an incremental
    snapshot ``{prefix}{batch_id}`` chained on the current tip."""

    def __init__(
        self,
        warehouse: str,
        base_snapshot: str,
        prefix: str = "b",
        rescan: str = "none",
        user_dict=None,
        lexicons=None,
        max_conv_turns: int | None = None,
    ) -> None:
        """``lexicons``: the gazetteers.Lexicons the BASE snapshot was
        built with — IncrementalPipeline requires the delta's lexicons to
        match the base's (plans/incremental.py), so an ingest over a
        custom-gazetteer base must thread them here or every micro-batch
        silently extracts under the default vocabulary. ``max_conv_turns``:
        the per-conversation turn cap (plans/pipeline.py) applied to each
        micro-batch — the stream-side guard against an adversarially long
        conversation OOMing the per-conv kernels."""
        self.warehouse = warehouse
        self.base = base_snapshot
        self.prefix = prefix
        self.rescan = rescan
        self.user_dict = user_dict
        self.lexicons = lexicons
        self.max_conv_turns = max_conv_turns

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sid = f"{self.prefix}{batch_id}"
        # replay of a committed batch: parent already recorded — reuse it
        # so the chain is identical across restarts
        meta = _meta_path(self.warehouse, sid)
        if os.path.exists(meta):
            with open(meta, encoding="utf-8") as f:
                parent = json.load(f)["parent"]
        else:
            parent = latest_snapshot(self.warehouse, self.base)
        IncrementalPipeline(
            batch_df.sparkSession,
            self.warehouse,
            base_snapshot=parent,
            snapshot_id=sid,
            user_dict=self.user_dict,
            lexicons=self.lexicons,
            max_conv_turns=self.max_conv_turns,
        ).run(batch_df, rescan=self.rescan)


def ingest_stream(
    stream: DataFrame,
    warehouse: str,
    base_snapshot: str,
    checkpoint_dir: str,
    prefix: str = "b",
    rescan: str = "none",
    available_now: bool = True,
    user_dict=None,
    lexicons=None,
    max_conv_turns: int | None = None,
):
    """Wire a transcript stream into the incremental pipeline. Returns the
    StreamingQuery; with ``available_now`` the query drains the source
    then stops (the batch-replay-friendly trigger for tests and catch-up
    runs). ``lexicons``/``max_conv_turns`` thread through to each batch's
    IncrementalPipeline (see IncrementalIngest)."""
    writer = stream.writeStream.foreachBatch(
        IncrementalIngest(
            warehouse,
            base_snapshot,
            prefix=prefix,
            rescan=rescan,
            user_dict=user_dict,
            lexicons=lexicons,
            max_conv_turns=max_conv_turns,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
