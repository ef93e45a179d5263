"""Streaming maintenance of mergeable aggregate state.

The streaming twin of ``operators/aggstate.py``: each micro-batch
folds into the persisted rollup as ``state ⊕ state(batch)`` — history
is never re-read, which is the whole point of algebraic states (the
batch form proves ⊕ ≡ full recompute; this module only has to deliver
each batch's ⊕ exactly once).

Exactly-once effect under replay: Structured Streaming delivers each
micro-batch AT LEAST once into ``foreachBatch``, so the sink must be
idempotent per ``batch_id``. States are additive (⊕ twice ≠ ⊕ once),
so keyed-merge idempotency (the bronze sink's trick) doesn't apply;
instead every applied batch commits a full state snapshot under
``v<batch_id>/`` and flips a one-line ``_LATEST`` pointer — the same
manifest-pointer commit the versioned tables use. A replayed batch
sees its version directory already present and skips; a crash between
snapshot write and pointer flip leaves the old pointer valid (readers
never see a partial state) and the replay completes the flip.
Batch-id identity only holds within one checkpoint lineage, so the
state directory is bound to its checkpoint (``_CHECKPOINT`` marker,
loud refusal on mismatch — see ``stream_aggregate_state``).
Single-writer contract per SCALE.md.

Scale: the per-batch merge reads |keys| state rows + the batch, never
history; snapshot cost is the state table size (keys, not events).
Compaction of old ``v*/`` dirs is the retention job's concern
(``versioned.vacuum_versions`` is the model).

Pointer and marker IO goes through the Hadoop FileSystem API
(``fsutil``, VERDICT r7 Next #3), resolved from the state path's
scheme — so the same sink code holds when the state/checkpoint
location is ``file:``, HDFS, or an object store. The pointer flip is
``FileContext.rename(OVERWRITE)`` — atomic on POSIX and HDFS; object
stores without atomic rename keep the manifest-CAS caveat noted in
``operators/versioned.py``. The state/merge contract is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import fsutil

from ..operators.aggstate import (
    aggregate_state,
    histogram_state,
    merge_aggregate_states,
    merge_histogram_states,
)

_POINTER = "_LATEST"


def bind_checkpoint(out_path: str, checkpoint: str) -> None:
    """Bind a batch-id-keyed output directory to its checkpoint
    lineage: batch ids only identify batch *contents* within one
    checkpoint, so replaying a different checkpoint into the same
    output would alias batch ids (silently dropping or staling data).
    First caller records the checkpoint path in ``_CHECKPOINT``; a
    mismatch later raises. Shared by the state sink and the drift
    monitor — after checkpoint loss, rebuild into a fresh directory
    (Structured Streaming's own sink contract)."""
    marker = fsutil.join(out_path, "_CHECKPOINT")
    # scheme-carrying checkpoints are already absolute identities;
    # only bare local paths need abspath normalization
    bound = checkpoint if "://" in checkpoint else os.path.abspath(checkpoint)
    if fsutil.exists(marker):
        prior = fsutil.read_text(marker).strip()
        if prior != bound:
            raise RuntimeError(
                f"output at {out_path} is bound to checkpoint {prior}; "
                f"running it with {bound} would alias batch ids across "
                "checkpoint lineages — rebuild into a fresh directory "
                "instead"
            )
    else:
        fsutil.write_text_atomic(marker, bound)


def _latest_version(state_path: str) -> int | None:
    p = fsutil.join(state_path, _POINTER)
    if not fsutil.exists(p):
        return None
    return int(fsutil.read_text(p).strip())


def read_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """Current committed state snapshot, or None before the first
    commit. Readers resolve one pointer — never a partial write."""
    v = _latest_version(state_path)
    if v is None:
        return None
    return spark.read.parquet(fsutil.join(state_path, f"v{v}"))


def _apply_state_batch(
    batch: DataFrame,
    batch_id: int,
    state_path: str,
    build,
    merge,
) -> None:
    """Fold one delivered micro-batch into a pointer-committed state
    snapshot — idempotent per ``batch_id`` (skip-if-committed +
    monotone pointer roll-forward). Generic over the state algebra:
    ``build(batch) -> state`` and ``merge(prev, new) -> state`` supply
    the ⊕; the commit protocol (version dir + _SUCCESS + _LATEST
    pointer) is shared by every mergeable state this engine persists
    (decimal/HLL rollups, fixed-bin histograms). Factored out of the
    sinks so crash/replay paths are unit-testable."""
    spark = batch.sparkSession
    vdir = fsutil.join(state_path, f"v{batch_id}")
    # a committed pointer at or past this batch id proves the batch is
    # already folded into the state — the authoritative replay check.
    # (Relying on _SUCCESS alone is not enough: with a committer that
    # skips the marker, or a cleanup tool that deleted it, a replay
    # after the pointer flip would recompute with prev = the
    # already-merged v<batch_id> snapshot and double-count the batch.)
    cur = _latest_version(state_path)
    if cur is not None and cur >= batch_id:
        return
    # a complete snapshot carries _SUCCESS; a dir without it is a
    # crashed partial write — recompute (mode=overwrite replaces it)
    if not fsutil.exists(fsutil.join(vdir, "_SUCCESS"), spark):
        new = build(batch)
        prev = read_state(spark, state_path)
        merged = new if prev is None else merge(prev, new)
        merged.write.mode("overwrite").parquet(vdir)
    # monotone pointer flip (FileContext rename-OVERWRITE — the commit)
    # — also completes a crash that died between snapshot write and
    # flip (replay rolls it forward). Re-read the pointer: the merge
    # above may have taken time and the skip-if-committed contract
    # keys off the committed value.
    cur = _latest_version(state_path)
    if cur is None or cur < batch_id:
        fsutil.write_text_atomic(
            fsutil.join(state_path, _POINTER), str(batch_id), spark
        )


def _apply_batch(
    batch: DataFrame,
    batch_id: int,
    state_path: str,
    keys: list[str],
    value_col: str,
    distinct_col: str | None = None,
) -> None:
    """Decimal/HLL rollup fold (the original sink body) — kept as the
    named unit-test surface; delegates to the generic core."""
    _apply_state_batch(
        batch,
        batch_id,
        state_path,
        lambda b: aggregate_state(b, keys, value_col, distinct_col),
        lambda prev, new: merge_aggregate_states([prev, new], keys),
    )


def _apply_histogram_batch(
    batch: DataFrame,
    batch_id: int,
    state_path: str,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> None:
    """Histogram fold: same commit protocol, histogram ⊕."""
    _apply_state_batch(
        batch,
        batch_id,
        state_path,
        lambda b: histogram_state(b, keys, value_col, lo, hi, n_bins),
        lambda prev, new: merge_histogram_states([prev, new], keys),
    )


def stream_aggregate_state(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    keys: list[str],
    value_col: str,
    distinct_col: str | None = None,
):
    """Maintain the rollup state from a streaming DataFrame; returns
    the started query (``availableNow`` trigger — drain-and-stop, the
    batch-friendly mode the other sinks use).

    A state directory is BOUND to its checkpoint: batch ids only
    identify batch *contents* within one checkpoint lineage, so
    replaying into existing state from a different checkpoint would
    alias old snapshots to new batch compositions and silently drop
    whatever the renumbered batches now contain. The first run records
    the checkpoint path in ``_CHECKPOINT``; a later run with a
    different one refuses loudly — after checkpoint loss, rebuild the
    state from scratch (the same contract Structured Streaming itself
    imposes on its sinks)."""
    bind_checkpoint(state_path, checkpoint)

    def sink(batch: DataFrame, batch_id: int) -> None:
        _apply_batch(batch, batch_id, state_path, keys, value_col, distinct_col)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_histogram_state(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
):
    """Streaming percentile monitor state (VERDICT r6 Next #7): each
    micro-batch folds its fixed-bin histogram into the persisted state
    — ``state ⊕ histogram_state(batch)`` — under the same
    committed-pointer replay guard as ``stream_aggregate_state``
    (version snapshot + _SUCCESS + monotone _LATEST flip; checkpoint
    binding; at-least-once delivery made effect-idempotent per
    batch_id). ``histogram_percentile`` over ``read_state`` then gives
    a continuously maintained p50/p90/p99 whose estimate is PROVABLY
    identical to a single pass over the union of all batches (the
    batch-side oracle: estimate(merge(a,b)) == estimate(build(a∪b))).
    The (lo, hi, n_bins) spec must stay constant across the state's
    lifetime — ``merge_histogram_states`` refuses a mismatched bin
    count loudly."""
    bind_checkpoint(state_path, checkpoint)

    def sink(batch: DataFrame, batch_id: int) -> None:
        _apply_histogram_batch(
            batch, batch_id, state_path, keys, value_col, lo, hi, n_bins
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_cms_state(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    col: str,
    depth: int = 4,
    width: int = 1024,
):
    """Streaming frequency-sketch maintenance — the third mergeable
    state behind the shared commit protocol (decimal/HLL rollup,
    histogram, now Count-Min): each micro-batch's sketch folds in by
    cell-wise addition, so the persisted ≤ depth·width rows always
    equal the sketch of EVERYTHING ingested (merge-of-batches ≡
    build-of-union exactly — CMS cells are plain counts) while the
    stream itself holds no item-level state. Probe the committed
    snapshot with ``heavy.cms_probe``. The (depth, width) spec must
    stay constant across the state's lifetime (the caller owns it; a
    mismatched width would silently alias cells — same contract as
    ``merge_cms_states``)."""
    from ..operators.heavy import cms_state, merge_cms_states

    bind_checkpoint(state_path, checkpoint)

    def sink(batch: DataFrame, batch_id: int) -> None:
        _apply_state_batch(
            batch,
            batch_id,
            state_path,
            lambda b: cms_state(b, col, depth, width),
            lambda prev, new: merge_cms_states([prev, new]),
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_mg_state(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    col: str,
    k: int = 100,
):
    """Streaming approximate heavy hitters — the FIFTH mergeable state
    behind the shared commit protocol (decimal/HLL rollup, histogram,
    Count-Min, Bloom, now Misra-Gries): each micro-batch's ≤ k−1
    counter rows fold in by pointwise addition + the Agarwal-et-al.
    compress, so the committed state always satisfies
    ``cnt ≤ true ≤ cnt + n/k`` over EVERYTHING ingested while holding
    ≤ k rows — the bounded-memory "what are the heavy keys so far"
    structure (the CMS state answers point queries; this one
    enumerates the heavy set without knowing the keys in advance).
    Probe the committed snapshot with ``heavy.mg_probe``.

    One contract difference from the other four states, documented
    rather than hidden: MG summaries are ORDER-DEPENDENT, so the
    streamed state is a VALID summary of the union, not bit-identical
    to a one-pass batch build — the replay guard still makes effects
    exactly-once per batch_id (the committed snapshot is what it is;
    a replay never re-folds it). ``k`` must stay constant across the
    state's lifetime (caller owns it — the CMS/Bloom spec contract)."""
    from ..operators.heavy import merge_mg_summaries, mg_summary

    bind_checkpoint(state_path, checkpoint)

    def sink(batch: DataFrame, batch_id: int) -> None:
        _apply_state_batch(
            batch,
            batch_id,
            state_path,
            lambda b: mg_summary(b, col, k),
            lambda prev, new: merge_mg_summaries([prev, new], k),
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_minhash_state(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    keys: list[str],
    col: str,
    n_hashes: int = 16,
):
    """Streaming per-key MinHash signatures — the SIXTH mergeable state
    behind the shared commit protocol (decimal/HLL rollup, histogram,
    Count-Min, Bloom, Misra-Gries, now MinHash): each micro-batch's
    signature rows fold in by component-wise min, so the committed
    ≤ n_hashes-rows-per-key state always equals the signature of
    EVERYTHING ingested, cell for cell (min is idempotent AND orderless
    — merge-of-batches ≡ build-of-union exactly, the CMS-strength
    contract, and replays of an already-folded batch are no-ops even
    WITHOUT the guard; the guard still makes the version history
    exactly-once). Answers the set-overlap question the other five
    can't: estimated Jaccard BETWEEN keys' item sets over the whole
    stream history, via ``heavy.minhash_state_jaccard`` on the
    committed snapshot. The hash family / n_hashes must stay constant
    across the state's lifetime (caller owns it — the CMS/Bloom spec
    contract)."""
    from ..operators.heavy import merge_minhash_states, minhash_state

    bind_checkpoint(state_path, checkpoint)

    def sink(batch: DataFrame, batch_id: int) -> None:
        _apply_state_batch(
            batch,
            batch_id,
            state_path,
            lambda b: minhash_state(b, keys, col, n_hashes),
            lambda prev, new: merge_minhash_states([prev, new], keys),
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def vacuum_state(state_path: str, keep_last: int = 2) -> list[str]:
    """Retention sweep for committed snapshots: delete ``v*`` dirs
    older than the newest ``keep_last`` versions (the pointer target
    is always kept; versions at or above the pointer are never touched
    — an in-flight writer may be staging the next one). Returns the
    removed directories. The streaming-state analog of
    ``versioned.vacuum_versions``; single-writer contract applies."""
    import re

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    cur = _latest_version(state_path)
    if cur is None:
        return []
    versions = sorted(
        int(m.group(1))
        for d in fsutil.list_names(state_path)
        if (m := re.fullmatch(r"v(\d+)", d))
    )
    # retention counts COMMITTED versions only: a staged dir above the
    # pointer (crash between snapshot write and flip) must not displace
    # a committed rollback snapshot from the keep window
    committed = [v for v in versions if v <= cur]
    keep = set(committed[-keep_last:]) | {cur}
    removed = []
    for v in versions:
        if v not in keep and v < cur:
            path = fsutil.join(state_path, f"v{v}")
            fsutil.delete(path, recursive=True)
            removed.append(path)
    return removed


def stream_bloom_state(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str,
    m: int = 1 << 16,
    k: int = 4,
):
    """Streaming seen-key Bloom filter — the FOURTH mergeable state
    behind the shared commit protocol (decimal/HLL rollup, histogram,
    Count-Min, now set membership): each micro-batch's bit set folds
    in by union-distinct (Bloom OR is exactly set union of positions),
    so the committed ≤ m rows always equal ``bloom_build`` over
    EVERYTHING ingested while the stream holds no key-level state —
    the bounded-memory "have we ever seen this key" structure an
    ingest pipeline probes before expensive work (no false negatives;
    false-positive rate set by m/k as in the batch operator). Probe
    the committed snapshot with ``bloom.bloom_probe``. The (m, k)
    spec must stay constant across the state's lifetime — a mismatch
    probes different positions and silently admits/rejects wrongly
    (the caller owns it, the ``stream_cms_state`` contract)."""
    from ..operators.bloom import bloom_build

    bind_checkpoint(state_path, checkpoint)

    def sink(batch: DataFrame, batch_id: int) -> None:
        _apply_state_batch(
            batch,
            batch_id,
            state_path,
            lambda b: bloom_build(b, key_col, m, k),
            lambda prev, new: prev.unionByName(new).distinct(),
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
