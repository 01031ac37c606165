"""The `bolson stream` analog — Structured Streaming end to end.

Reference trace (stream.cpp:121-188): TCP line-framed JSON source ->
parse -> seq -> resize -> serialize -> publish; runs until the source
ends; main thread drains until received == published.

Spark mapping:
- source: any line-framed streaming DataFrame with a single string
  column (``readStream.format("socket")`` for the TCP analog,
  ``format("text")`` for replayable tests, Kafka in production);
- convert: the same batch operators applied inside ``foreachBatch`` —
  per micro-batch parse (strict), arrival-order seq with a
  driver-maintained base offset (replay-stable: a replayed batch
  resolves to its original base and renumbers identically), rebatch,
  IPC-serialize;
- sink: IpcFileSink (schema handshake on start, append per batch);
- drain: ``trigger(availableNow=True)`` + ``awaitTermination`` ==
  "process everything the source has, then stop" — the
  ``jsons_received == publish_count`` spin-loop without the spin.

Ordering at scale: a single socket gives a total arrival order (the
reference's world, stream.cpp:70 "TCP clients: 1"). With a partitioned
source (Kafka), seq is per-partition contiguous + a batch base — the
documented semantics of §1.4 (consumers re-sort by seq).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bolson_spark import MAX_IPC_SIZE, MAX_ROWS_DEFAULT
from bolson_spark.operators.parse import parse_json, parse_json_arrow
from bolson_spark.operators.seq import add_seq, add_seq_scalable
from bolson_spark.operators.serialize import serialize_ipc
from bolson_spark.schemas import spark_to_arrow_schema
from bolson_spark.streaming.sink import PublishSink

# Micro-batches past this row count number through add_seq_scalable
# (3 bucket-parallel passes) instead of add_seq's single-reducer
# global window — the two are parity-tested equal, and a 10M-row
# batch must not serialize its numbering through one executor core.
SEQ_SCALABLE_ROWS = 2_000_000


def _read_seq_base(
    base_file: str | None,
) -> tuple[str | None, int, int, int]:
    """Read the persisted seq-base record: (run_id, last_batch_id,
    base_of_last_batch, n_of_last_batch). v3 records carry the
    checkpoint-lineage run id; v2 records predate it and map to
    run_id=None (legacy wildcard — matches any lineage; streams bind
    it to their lineage the moment they read one, see _upgraded_rec).
    v1 files stored only the ALREADY ADVANCED base —
    mapped to (None, -1, base, 0) so the next batch starts exactly
    there."""
    import os

    if not base_file or not os.path.exists(base_file):
        return (None, -1, 0, 0)
    with open(base_file) as f:
        txt = f.read().strip()
    parts = txt.split()
    if len(parts) == 5 and parts[0] == "v3":
        return (parts[1], int(parts[2]), int(parts[3]), int(parts[4]))
    if len(parts) == 4 and parts[0] == "v2":
        return (None, int(parts[1]), int(parts[2]), int(parts[3]))
    return (None, -1, int(txt or 0), 0)


def _lineage_checked_rec(
    rec: tuple[str | None, int, int, int],
    checkpoint_dir: str | None,
) -> tuple[str | None, int, int, int]:
    """Validate a freshly-read seq-base record against the checkpoint's
    OWN offsets log at stream start. The run-id guard in
    _resolve_seq_base cannot catch the realistic reset (deleting
    offsets/ + commits/ to force reprocessing leaves the sidecar
    bolson_run_id AND bolson_seq_base behind, so the ids still match),
    but the offsets log can: a batch id only legitimately replays if
    its offsets entry exists. If the record's batch id is ABOVE the
    offsets horizon, no incarnation of THIS lineage ever planned that
    batch — the record is a survivor from before a wipe, and the new
    batch ids (restarting at 0) may collide with it. Coerce it to
    pure-advance form (batch -1, base already summed) so the total
    sequence continues past everything published, never overlapping.
    A crash-before-commit replay keeps its record untouched: its
    offsets entry exists, so horizon >= last_bid."""
    run, last_bid, last_base, last_n = rec
    if checkpoint_dir is None or last_bid < 0:
        return rec
    from bolson_spark.streaming.util import offsets_horizon

    if offsets_horizon(checkpoint_dir) < last_bid:
        return (run, -1, last_base + last_n, 0)
    return rec


def _resolve_seq_base(
    rec: tuple[str | None, int, int, int],
    batch_id: int,
    run_id: str | None = None,
) -> int:
    """The replay-stable base rule: a REPLAYED batch (same batch id,
    SAME checkpoint lineage) reuses its original base, so its rows are
    renumbered IDENTICALLY — a replay then produces byte-identical
    messages (duplicates a seq-keyed consumer can drop), never the
    silently shifted sequence range that advancing the base before the
    epoch commit used to produce. Any newer batch starts after the
    last batch's rows.

    The lineage guard: batch ids are only comparable WITHIN one
    checkpoint lineage. If the record's run id differs from the
    current lineage's (a seq-base file surviving into a different /
    reset checkpoint), a first batch whose id collides with the stored
    one is a DIFFERENT payload — reusing the base would publish
    overlapping seq ranges for different data, so a mismatch always
    ADVANCES. A None on either side (legacy v2 record, or a
    checkpoint-less run) keeps the old same-id-reuses behavior."""
    rec_run, last_bid, last_base, last_n = rec
    lineage_match = rec_run is None or run_id is None or rec_run == run_id
    if lineage_match and batch_id == last_bid:
        return last_base
    return last_base + last_n


def _upgraded_rec(
    base_file: str | None,
    rec: tuple[str | None, int, int, int],
    run_id: str | None,
) -> tuple[str | None, int, int, int]:
    """UPGRADE-ON-SIGHT for legacy v2 seq-base records (r8 VERDICT #7):
    a v2 record has no run id, so its lineage wildcard (matches any
    run) preserves exactly the reuse hole the v3 guard closes — for as
    long as the record survives. The first time a stream reads one
    that has PASSED the offsets-horizon validation (its batch id is
    provably within THIS checkpoint's planned batches — the caller
    runs _lineage_checked_rec first), bind it to the current lineage
    by rewriting it as v3 immediately: from then on a foreign-lineage
    batch-id collision ADVANCES instead of reusing. Records already
    coerced to pure-advance form (batch -1) carry no reusable batch id
    — nothing to bind."""
    rec_run, last_bid, last_base, last_n = rec
    if (
        base_file
        and run_id is not None
        and rec_run is None
        and last_bid >= 0
    ):
        _write_seq_base(base_file, run_id, last_bid, last_base, last_n)
        return (run_id, last_bid, last_base, last_n)
    return rec


def _write_seq_base(
    base_file: str, run_id: str, batch_id: int, base: int, n: int
) -> None:
    """Atomic (write-tmp + os.replace) so a crash mid-write cannot
    leave a truncated record. Written BEFORE the publish: a replay
    recomputes the identical record, so early persistence is safe and
    both crash windows (before/after publish) renumber identically."""
    import os

    tmp = base_file + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"v3 {run_id} {batch_id} {base} {n}")
    os.replace(tmp, base_file)


@dataclass
class StreamMetrics:
    """M1 analog (convert/metrics.h:26-56): counts reduced across
    micro-batches on the driver."""

    num_jsons: int = 0
    json_bytes: int = 0
    num_ipc: int = 0
    ipc_bytes: int = 0
    num_quarantined: int = 0
    batches: list[int] = field(default_factory=list)


def run_stream_convert(
    raw: DataFrame,
    schema: T.StructType,
    sink: PublishSink,
    json_col: str = "value",
    *,
    max_rows: int = MAX_ROWS_DEFAULT,
    max_ipc_size: int = MAX_IPC_SIZE,
    strict: bool = True,
    parser: str = "catalyst",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    latency=None,
    on_error: str = "fail",
    quarantine_dir: str | None = None,
):
    """Start the convert stream; returns (query, metrics).

    ``parser`` selects the physical parse implementation per micro-batch
    ("catalyst" = from_json + guard, "arrow" = single-pass Arrow C++
    TableReader — see operators.pipeline.convert for the tradeoff).

    ``on_error`` selects the failure posture: ``"fail"`` reproduces the
    reference's hard error on the first bad document
    (parse/arrow.cpp:87); ``"quarantine"`` routes bad documents (with
    their raw bytes + reason) to ``quarantine_dir`` as append-only
    parquet and keeps the stream alive — the 100 TB ingest posture.
    Quarantined rows are excluded from the sequence numbering, so
    published seqs stay contiguous over CLEAN documents.

    The sequence base is maintained per epoch: batch N's seqs start at
    the total row count of batches < N, persisted as a
    (batch_id, base, n) record next to the checkpoint. The record is
    REPLAY-STABLE: a replayed batch resolves to its original base and
    renumbers identically, so a crash in any window around the publish
    re-emits byte-identical messages — duplicates a seq-keyed consumer
    drops — never a silently shifted seq range. (True exactly-once
    additionally needs an idempotent sink; the append-only file sink
    documents at-least-once with stable payloads.) The handshake runs
    once at start (K2).
    """
    # bolson_seq is prepended at field index 0 (parse/arrow.cpp:155)
    out_fields = ["bolson_seq"] + [f.name for f in schema.fields]
    arrow_schema = spark_to_arrow_schema(
        T.StructType(
            [T.StructField("bolson_seq", T.LongType(), False)] + schema.fields
        )
    )
    if parser not in ("catalyst", "arrow"):
        raise ValueError(f"unknown parser {parser!r}")
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"unknown on_error {on_error!r}")
    if on_error == "quarantine" and parser != "catalyst":
        # routing is built on the catalyst PERMISSIVE corrupt-record
        # path; silently swapping parse semantics under --parser arrow
        # would defeat the dual-execution twins, so reject the combo
        raise ValueError(
            "on_error='quarantine' requires parser='catalyst' "
            "(the Arrow reader has no per-row corrupt-record routing)"
        )
    if on_error == "quarantine" and not quarantine_dir:
        # preserving the raw bad documents IS the point of the mode —
        # silently discarding them would be worse than failing
        raise ValueError(
            "on_error='quarantine' requires quarantine_dir (the "
            "dead-letter evidence sink)"
        )
    import os

    if (
        on_error == "quarantine"
        and os.path.isdir(quarantine_dir)
        and any(
            not e.startswith(("run=", "_", "."))
            for e in os.listdir(quarantine_dir)
        )
    ):
        # pre-run-namespacing quarantine dirs held bare files at the
        # root; writing run=/batch= partitions next to them makes the
        # evidence table unreadable as one parquet dataset
        raise RuntimeError(
            f"{quarantine_dir} contains non-partitioned legacy entries; "
            "move them under a run=legacy/batch=0/ subdirectory before "
            "resuming (mixed layouts are unreadable as one table)"
        )
    parse_fn = parse_json if parser == "catalyst" else parse_json_arrow
    sink.handshake(arrow_schema)
    metrics = StreamMetrics()
    # Sequence base: the reference's seq counter is process-lifetime
    # (restarts from 0 with the process). For an exactly-once sink we do
    # better: persist the base next to the checkpoint so a restarted
    # query continues the global sequence instead of overlapping it.
    # foreachBatch bodies run serially on the driver, so plain file I/O
    # is race-free.
    base_file = (
        os.path.join(checkpoint_dir, "bolson_seq_base") if checkpoint_dir else None
    )
    # One run id per checkpoint lineage (minted-or-read), shared by the
    # quarantine partitions AND the seq-base record: same-checkpoint
    # replays overwrite their own (run, batch) partition idempotently /
    # reuse their original seq base, while a fresh checkpoint's batch 0
    # cannot clobber a prior run's batch-0 dead-letter evidence — nor
    # silently reuse a surviving seq-base record from a different
    # lineage (see _resolve_seq_base's lineage guard).
    from bolson_spark.streaming.util import run_id_for_checkpoint

    run_id = run_id_for_checkpoint(checkpoint_dir, "bolson_run_id")
    quarantine_run = run_id
    # (run_id, last_batch_id, base, n) — see _resolve_seq_base for the
    # replay-stable numbering rule this record enables; the record is
    # lineage-validated against the checkpoint's offsets log at start
    # (see _lineage_checked_rec: an offsets/commits wipe restarts
    # batch ids while this sidecar file survives)
    state = {
        "rec": _upgraded_rec(
            base_file,
            _lineage_checked_rec(_read_seq_base(base_file), checkpoint_dir),
            run_id,
        )
    }

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import time as _time

        received_ts = _time.time()
        batch_df = batch_df.cache()
        routed = None
        parsed_cached = None
        try:
            # one job for both micro-batch stats (count + input bytes)
            sizes = batch_df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.octet_length(json_col)).alias("b"),
            ).first()
            n, jb = sizes["n"], sizes["b"]
            if n == 0:
                return
            # arrival order inside the micro-batch: the source's own
            # row order per partition; a single-partition source (socket)
            # gives the reference's total order. We materialize it with a
            # monotonic local id, then number globally from the base.
            nq = 0
            if on_error == "quarantine":
                from bolson_spark.operators.parse import (
                    parse_json_quarantine,
                )

                routed = parse_json_quarantine(
                    batch_df, schema, json_col
                ).cache()
                bad = routed.where(
                    F.col("quarantine_reason").isNotNull()
                )
                bad_stats = bad.select(
                    F.count(F.lit(1)).alias("nq"),
                    F.sum(F.octet_length("raw")).alias("bq"),
                ).first()
                nq, bq = bad_stats["nq"], bad_stats["bq"] or 0
                if nq and quarantine_dir:
                    # (run, batch)-keyed dynamic partition overwrite,
                    # not a blind append: a foreachBatch replay rewrites
                    # its own partition instead of duplicating rows, and
                    # a fresh-checkpoint restart cannot clobber a prior
                    # run's evidence
                    (
                        bad.select(
                            "raw",
                            F.col("quarantine_reason").alias("reason"),
                        )
                        .withColumn("run", F.lit(quarantine_run))
                        .withColumn("batch", F.lit(batch_id))
                        .write.mode("overwrite")
                        .partitionBy("run", "batch")
                        .option("partitionOverwriteMode", "dynamic")
                        .parquet(quarantine_dir)
                    )
                parsed = routed.where(
                    F.col("quarantine_reason").isNull()
                ).select(*[f.name for f in schema.fields])
                # keep per-doc metrics consistent: num_jsons AND
                # json_bytes both count only the converted (clean) docs
                n -= nq
                jb = (jb or 0) - bq
                if n == 0:
                    # nothing left to publish: the batch is complete
                    # once the (idempotent) quarantine write landed, so
                    # counting here cannot be replayed-and-recounted
                    metrics.num_quarantined += nq
                    return  # finally unpersists routed + batch_df
            else:
                parsed = parse_fn(batch_df, schema, json_col, strict=strict)
            # replay-stable base: a replayed batch id reuses its
            # original base (identical renumbering -> byte-identical
            # republished messages); persisted BEFORE the publish
            base = _resolve_seq_base(state["rec"], batch_id, run_id)
            staged = latency is not None
            # The arrow parser cannot column-prune through mapInArrow,
            # so add_seq_scalable's extra passes (min/max + per-bucket
            # counts) would re-execute the FULL parse ~2 more times per
            # large micro-batch — cache the parsed frame whenever the
            # scalable path will consume it repeatedly. (The catalyst
            # parser prunes to the key column, so its extra passes are
            # cheap key-only scans — seq.py's docstring rationale —
            # and staged latency runs cache for the timestamps anyway.)
            if staged or (parser == "arrow" and n >= SEQ_SCALABLE_ROWS):
                parsed = parsed.cache()
                parsed_cached = parsed
            with_order = parsed.withColumn("_arrival", F.monotonically_increasing_id())
            seq_impl = add_seq if n < SEQ_SCALABLE_ROWS else add_seq_scalable
            seqd = seq_impl(with_order, "_arrival", start=base).drop("_arrival")
            # Distribute contiguous seq blocks arithmetically: block =
            # floor((seq-base)/block_rows) with block_rows a multiple of
            # max_rows. Unlike repartitionByRange this needs NO
            # per-batch range-sampling job — the boundaries are known
            # because seqs are [base, base+n). Hash collisions CAN put
            # several blocks in one partition; serialize_ipc slices
            # within contiguous seq runs (operators/serialize.py), so
            # every published message still covers a contiguous range.
            block_rows = max_rows * 4
            n_parts = max(1, n // block_rows)
            block = F.floor(
                (F.col("bolson_seq") - F.lit(base)) / block_rows
            )
            # When latency tracking is on, materialize each stage so the
            # six reference time points (latency.h:30-47) are observable;
            # otherwise keep parse/resize/serialize fused in one job
            # (that fusion IS the optimization — see metrics.py).
            if staged:
                parsed.count()
                parsed_ts = _time.time()
            ordered = (
                seqd.select(*out_fields, block.alias("_block"))
                .repartition(n_parts, F.col("_block"))
                .sortWithinPartitions("bolson_seq")
                .drop("_block")
            )
            if staged:
                ordered = ordered.cache()
                ordered.count()
                resized_ts = _time.time()
            ser = serialize_ipc(
                ordered, max_rows=max_rows, max_ipc_size=max_ipc_size
            ).cache()
            agg = ser.select(
                F.count(F.lit(1)).alias("m"), F.sum("ipc_bytes").alias("ib")
            ).first()
            serialized_ts = _time.time()
            # persist the (batch_id, base, n) record BEFORE publishing:
            # a replay recomputes the identical record, so whichever
            # side of the publish a crash lands on, the replayed batch
            # renumbers identically (see _resolve_seq_base)
            if base_file:
                _write_seq_base(base_file, run_id, batch_id, base, n)
            state["rec"] = (run_id, batch_id, base, n)
            popped_ts = _time.time()  # handoff to the publisher (queue pop)
            sink.write(ser)
            published_ts = _time.time()
            ser.unpersist()
            if staged:
                ordered.unpersist()
                latency.stamp(
                    base,
                    base + n - 1,
                    received_ts,
                    parsed_ts,
                    resized_ts,
                    serialized_ts,
                    popped_ts,
                    published_ts,
                )
            # All counters update only after a successful publish: if
            # sink.write raises and Spark replays the micro-batch,
            # counting nq earlier would double-count quarantined docs
            # while num_jsons/num_ipc counted the batch once — the
            # counters would silently drift apart on every retry.
            metrics.num_quarantined += nq
            metrics.num_jsons += n
            metrics.json_bytes += jb or 0
            metrics.num_ipc += agg["m"]
            metrics.ipc_bytes += agg["ib"] or 0
            metrics.batches.append(n)
        finally:
            # unpersist in finally: an exception mid-batch (e.g. a
            # transient sink failure followed by a streaming retry)
            # must not leak a cached copy of the micro-batch per attempt
            if routed is not None:
                routed.unpersist()
            if parsed_cached is not None:
                parsed_cached.unpersist()
            batch_df.unpersist()

    writer = raw.writeStream.foreachBatch(process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query, metrics
