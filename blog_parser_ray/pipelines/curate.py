"""End-to-end LLM training-data curation pipeline (task extension set,
composed from the operator library):

    documents ──lang-ID filter──quality filter──exact dedup──near-dup
    apply──mixture sample──stratified split──tokenize──pack

Every stage is one of the already-tested operators; this module only
composes them, Ray-Data-first: each filter is a map_batches that computes
the stage's feature ON the batch and filters in place (no join back), the
dedups use the plan-selected machinery in functions/dedup.py, and packing
runs per batch. Intermediates are materialized ONLY because the funnel
reports per-stage counts — a production run at 100 TB would chain the
stages lazily end-to-end and skip the counts (each count is otherwise a
re-execution); the composition itself adds no driver state beyond the
dedup machinery's documented broadcasts.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def lang_keep_batch(batch: pa.Table, *, lang: str) -> pa.Table:
    """Keep rows whose heuristic language ID equals ``lang`` (stage 1)."""
    from ..functions.text import lang_id_batch

    preds = lang_id_batch(batch)["lang_pred"]
    if isinstance(preds, pa.ChunkedArray):
        preds = preds.combine_chunks()
    return batch.filter(pc.equal(preds, lang))


def quality_keep_batch(batch: pa.Table, *, min_quality: float) -> pa.Table:
    """Keep rows with quality score >= ``min_quality`` (stage 2)."""
    from ..functions.text import quality_score_batch

    q = quality_score_batch(batch)["quality"]
    if isinstance(q, pa.ChunkedArray):
        q = q.combine_chunks()
    return batch.filter(pc.greater_equal(q, min_quality))


def curate_corpus(ds: rd.Dataset, *, lang: str | None = "en",
                  min_quality: float = 0.35,
                  near_dup_threshold: float = 0.5,
                  near_dup_method: str = "minhash",
                  mixture: dict[str, float] | None = None,
                  max_len: int = 512,
                  with_funnel: bool = True):
    """Run the curation chain over a (doc_id, source, text) Dataset.

    Returns (packed examples Dataset, funnel rows) — funnel is a list of
    (stage, rows, wall_sec) triples when ``with_funnel`` (each stage
    materialized to count it; the wall is that stage's incremental work). With ``with_funnel=False`` only the pre-near-dup corpus is
    materialized (the near-dup verify + pair apply consume it more than
    once; without that one materialize the filter chain would re-execute
    ~3x) — the near-dup candidate generation is eager by nature (LSH
    bucket counts drive its plan selection), but the verified pairs now
    flow to ``apply_pair_dedup`` as a Dataset, never through the driver.
    """
    from ..functions.dedup import (apply_pair_dedup, exact_dedup,
                                   minhash_dedup_pairs_ds)
    from ..functions.packing import (mixture_sample, pack_sequences_batch,
                                     stratified_split)
    from ..synth import tokenize_documents

    import time

    funnel: list[tuple[str, int, float]] = []

    def note(stage: str, d: rd.Dataset) -> rd.Dataset:
        if with_funnel:
            t0 = time.monotonic()
            d = d.materialize()
            n = d.count()
            # wall = this stage's INCREMENTAL work: the previous note
            # materialized its input, so only the new operators execute here
            funnel.append((stage, n, round(time.monotonic() - t0, 3)))
        return d

    ds = note("input", ds)

    if lang is not None:
        ds = note("lang", ds.map_batches(lang_keep_batch,
                                         batch_format="pyarrow",
                                         fn_kwargs={"lang": lang}))

    ds = note("quality", ds.map_batches(
        quality_keep_batch, batch_format="pyarrow",
        fn_kwargs={"min_quality": min_quality}))

    if not with_funnel:
        # exact_dedup consumes its input TWICE (winner pass + filter pass),
        # so without this materialize the lang/quality filter chain — the
        # most expensive map stages — executes twice in production mode
        # (the funnel path materializes per stage anyway)
        ds = ds.materialize()
    ds = exact_dedup(ds, "text", "doc_id")
    if not with_funnel:
        ds = ds.materialize()  # consumed ≥3x by the near-dup stage
    ds = note("exact_dedup", ds)

    # verified pairs stay a DATASET end-to-end (r3 verdict #1): at 100 TB
    # the verified pair list is itself cluster-sized, so it feeds
    # apply_pair_dedup's plan-selected Dataset path (driver union-find only
    # below its pairs_driver_limit, distributed components beyond) without
    # ever gathering pair payloads to the driver here
    t0 = time.monotonic()
    if near_dup_method == "exact":
        # exact-complete AllPairs prefix-filtering path (no LSH false
        # negatives) — the guarantee costs a DF pass + prefix shuffle;
        # minhash stays the default for recall-tolerant curation
        from ..functions.dedup import jaccard_join_exact

        pairs_ds = jaccard_join_exact(
            ds, id_col="doc_id", text_col="text",
            tau_e4=int(round(near_dup_threshold * 10000))).map_batches(
            lambda b: b.select(["a", "b"]), batch_format="pyarrow")
    elif near_dup_method == "minhash":
        pairs_ds = minhash_dedup_pairs_ds(ds, threshold=near_dup_threshold)
    else:
        raise ValueError(f"unknown near_dup_method: {near_dup_method!r}")
    if with_funnel:
        # pairs generation is eager (LSH bucket counts drive plan selection)
        # and would otherwise be invisible in the per-stage attribution
        funnel.append(("near_dup_pairs", pairs_ds.count(),
                       round(time.monotonic() - t0, 3)))
    ds = apply_pair_dedup(ds, pairs_ds, key_col="doc_id")
    ds = note("near_dedup", ds)

    if mixture:
        ds = note("mixture", mixture_sample(ds, mixture))

    # stratified_split is a pure row-preserving map — its count can never
    # differ from the previous stage, so no materialize for the funnel
    ds = stratified_split(ds)
    if with_funnel:
        funnel.append(("split", funnel[-1][1], 0.0))

    def tokenize(batch: pa.Table) -> pa.Table:
        t = tokenize_documents(batch.select(["doc_id", "source", "text"]))
        return t.append_column("split", batch["split"])

    tokenized = ds.map_batches(tokenize, batch_format="pyarrow")

    def fit(batch: pa.Table) -> pa.Table:
        # pack_sequences_batch REFUSES oversized rows by contract; the
        # curation policy here is to DROP documents longer than max_len
        return batch.filter(pc.less_equal(batch["n_tok"], max_len))

    tokenized = note("fit_max_len",
                     tokenized.map_batches(fit, batch_format="pyarrow"))

    def pack(batch: pa.Table) -> pa.Table:
        # pack PER SPLIT so no packed example ever mixes train/val/test
        # sequences (the whole point of the split); batches are packed
        # split-group by split-group, split carried on the output
        out = []
        splits = batch["split"]
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        for sv in pc.unique(splits).to_pylist():
            sub = batch.filter(pc.equal(splits, sv)).select(
                ["doc_id", "tokens", "n_tok", "source"])
            p = pack_sequences_batch(sub, max_len=max_len)
            out.append(p.append_column(
                "split", pa.array([sv] * p.num_rows, type=pa.string())))
        return pa.concat_tables(out) if out else pack_sequences_batch(
            batch.select(["doc_id", "tokens", "n_tok", "source"]),
            max_len=max_len).append_column(
            "split", pa.array([], type=pa.string()))

    # fixed batch_size: pack boundaries are batch boundaries (batch-local
    # packing), so a pinned size keeps the example count reproducible for
    # a given row order; the count still legitimately varies with block
    # layout at scale — only the SEQUENCE membership is invariant
    packed = note("packed", tokenized.map_batches(
        pack, batch_format="pyarrow", batch_size=1024))
    return packed, funnel
