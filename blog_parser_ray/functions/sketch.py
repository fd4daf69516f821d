"""Mergeable sketches (SURVEY.md §2.5 A5): HyperLogLog approximate distinct.

The 10¹²-scale path for count-distinct: each block emits ONE fixed-size
register array (2^p bytes); registers merge by elementwise max — associative
and commutative, so the shuffle moves kilobytes regardless of input size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..hashing import stable_hash_ints, stable_hash_strings


def _registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """HLL registers (size 2^p) from uint64 hashes."""
    m = 1 << p
    buckets = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = (hashes << np.uint64(p)) | np.uint64((1 << p) - 1)
    # rho = leading zeros of `rest` + 1, capped at 64-p+1
    lz = np.zeros(len(hashes), dtype=np.int64)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        x[mask] = x[mask] << np.uint64(shift)
    rho = lz + 1
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, buckets, rho.astype(np.int8))
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12,
                    fan_in: int = 64) -> float:
    """HLL count-distinct: per-block partial registers → TWO-LEVEL
    distributed elementwise-max merge (blocks hash into ``fan_in``
    intermediate groups, each reduced in the cluster; the final level
    merges ≤ fan_in blobs). The driver receives one 2^p-byte register
    array no matter the corpus size — at 10⁶ blocks the old driver-side
    loop would have pulled 4 GB through the driver serially; the tree
    keeps every transfer ≤ fan_in × 2^p bytes."""
    import pandas as pd

    from .util import arrow_out

    blk = [0]

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_integer(c.type):
            h = stable_hash_ints(c.to_numpy())
        else:
            h = stable_hash_strings(c)
        blk[0] += 1  # per-process counter: only spreads blobs across
        #              groups, correctness needs no global coordination
        return pa.table({
            "_g": pa.array([blk[0] % fan_in], type=pa.int64()),
            "regs": pa.array([_registers(h, p).tobytes()],
                             type=pa.binary())})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        m = np.frombuffer(g["regs"].iloc[0], dtype=np.int8)
        for blob in g["regs"].iloc[1:]:
            m = np.maximum(m, np.frombuffer(blob, dtype=np.int8))
        return pd.DataFrame({"regs": [m.tobytes()]})

    level1 = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_g").map_groups(arrow_out(merge_group),
                                        batch_format="pandas"))
    merged = np.zeros(1 << p, dtype=np.int8)
    for blob in level1.to_pandas()["regs"]:
        merged = np.maximum(merged, np.frombuffer(blob, dtype=np.int8))
    return _estimate(merged)


def approx_quantiles(ds: rd.Dataset, val_col: str, key_col: str,
                     qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
                     k: int = 20_000) -> dict[float, float]:
    """Approximate quantiles via a DETERMINISTIC mergeable min-k sample.

    Tag every row with ``stable_hash(hash(key) ^ value_bits)`` — a uniform
    64-bit draw that is identical on every run, cluster size, and input
    order — and keep the global k smallest tags: a uniform k-row sample
    whose empirical quantiles estimate the true ones with error
    O(1/sqrt(k)) (k=20k → ~±0.7% rank error). Mixing the VALUE bits into
    the tag makes tag ties carry identical values (up to hash collision),
    so duplicate keys cannot make the boundary cut — and therefore the
    ESTIMATE — depend on block layout. The 10^12-scale plan: per-block
    top-k combiner (argpartition, no sort of the block) → one thin
    (tag, value) shuffle of ≤ k*blocks rows → global sort+limit — the
    only full-corpus pass is the tag scan.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if pa.types.is_integer(keys.type):
            tags = stable_hash_ints(keys.to_numpy())
        else:
            tags = stable_hash_strings(keys)
        vals = batch[val_col]
        vcol = vals.combine_chunks() if isinstance(
            vals, pa.ChunkedArray) else vals
        vnp = vcol.to_numpy(zero_copy_only=False).astype(np.float64)
        # nulls surface as NaN here; untreated they'd draw valid uniform
        # tags, enter the min-k sample and sort to the TOP, silently
        # corrupting upper-quantile estimates — drop them (SQL quantile
        # semantics: NULLs are ignored), mirroring lang_id's null policy
        ok = ~np.isnan(vnp)
        if not ok.all():
            tags, vnp = tags[ok], vnp[ok]
            vals = vcol.filter(pa.array(ok))
        vbits = vnp.view(np.uint64)
        with np.errstate(over="ignore"):
            tags = stable_hash_ints(tags ^ vbits)
        if len(tags) > k:
            idx = np.argpartition(tags, k)[:k]
            tags = tags[idx]
            vals = pc.take(vals, pa.array(idx))
        # order-preserving uint64→int64: flip the sign bit and reinterpret
        # (an arithmetic `- 2**63` would promote to float64 — 53-bit
        # precision ⇒ tag ties ⇒ layout-dependent samples)
        biased = (tags ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table({"_tag": pa.array(biased), "_val": vals})

    sample = (ds.map_batches(partial, batch_format="pyarrow")
              .sort("_tag").limit(k).to_pandas())
    v = np.sort(sample["_val"].to_numpy().astype(np.float64))
    n = len(v)
    if n == 0:
        return {q: float("nan") for q in qs}
    return {q: float(v[min(int(q * n), n - 1)]) for q in qs}


def approx_distinct_grouped(ds: rd.Dataset, col: str, by: str,
                            p: int = 12) -> rd.Dataset:
    """Grouped HLL count-distinct, fully distributed: each block emits ONE
    2^p-byte register blob per group present in the block (dictionary
    codes + one 2-D ``np.maximum.at`` — no per-group Python), the merge is
    a ``groupby(by).map_groups`` elementwise max over blobs, and the
    estimate is computed inside the group task. Shuffle volume =
    groups × blocks × 2^p bytes — independent of row count, the
    10¹²-row shape. Returns a Dataset of (by, approx_distinct: float64).
    """
    import pandas as pd
    import pyarrow.compute as pc

    from .util import arrow_out

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[by]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if g.null_count:
            # a null dictionary code would silently alias another group's
            # registers after the int cast — refuse loudly (mirrors
            # lang_id's null policy; pre-filter nulls to opt out)
            raise ValueError(
                f"approx_distinct_grouped: null values in group column "
                f"{by!r}")
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_integer(c.type):
            h = stable_hash_ints(c.to_numpy())
        else:
            h = stable_hash_strings(c)
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        buckets = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        lz = np.zeros(len(h), dtype=np.int64)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        regs = np.zeros((k, m), dtype=np.int8)
        np.maximum.at(regs, (codes, buckets), (lz + 1).astype(np.int8))
        return pa.table({
            by: enc.dictionary,
            "regs": pa.array([regs[i].tobytes() for i in range(k)],
                             type=pa.binary()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        blobs = g["regs"].to_numpy()
        merged = np.frombuffer(blobs[0], dtype=np.int8)
        for blob in blobs[1:]:
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.int8))
        return pd.DataFrame({by: [g[by].iloc[0]],
                             "approx_distinct": [_estimate(merged)]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(by).map_groups(arrow_out(merge),
                                    batch_format="pandas"))


def heavy_hitters(items: rd.Dataset, col: str, k: int = 64,
                  exact: bool = True) -> rd.Dataset:
    """Distributed Misra-Gries heavy hitters with EXACT output counts and
    a PROVABLY BOUNDED candidate set (≤ 2(k+1) items at any scale).

    Pass 1 (sketch): each block computes exact local counts (Arrow
    group_by) and MG-compresses to ≤ ks = 2k+1 counters by subtracting
    the (ks+1)-largest local count d_b — so est_b(x) ≥ freq_b(x) − d_b
    and d_b·(ks+1) ≤ n_b. Block summaries plus two sentinel rows (n_b,
    d_b) reduce through ONE distributed groupby-Sum; with D = Σd_b ≤
    n/(2k+2), any x with freq(x)·(k+1) > n satisfies
    Σest(x)·(k+1) > n − D·(k+1) ≥ n/2 — the integer margin filter keeps
    it, and since each survivor carries Σest > n/(2(k+1)) while
    ΣΣest ≤ n, AT MOST 2(k+1) items survive. The driver never sees the
    k·blocks union (at 10⁶ blocks that union is GB-scale; the pruned
    candidate set is bytes).

    Pass 2 (exact; skipped when ``exact=False``): candidates broadcast
    via one ``ray.put``, every block
    counts only candidate items, a tiny groupby-Sum yields exact counts,
    and the final integer filter ``cnt·(k+1) > n`` matches SQL's
    ``HAVING count(*)·(k+1) > n`` hash-exact. Both passes stream; all
    shuffles are sketch-sized. Returns a Dataset of (col, cnt)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ks = 2 * k + 1
    N_KEY, D_KEY = "\x00__n__", "\x00__d__"

    def mg_partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        g = pa.table({col: c}).group_by([col]).aggregate([([], "count_all")])
        cnt = g.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
        d_b = 0
        if len(cnt) > ks:
            kth = np.partition(cnt, len(cnt) - (ks + 1))[len(cnt) - (ks + 1)]
            keep = cnt > kth
            g, cnt, d_b = g.filter(pa.array(keep)), cnt[keep] - kth, int(kth)
        words = g[col]
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        return pa.table({
            col: pa.concat_arrays([words, pa.array([N_KEY, D_KEY])]),
            "p_est": pa.array(np.concatenate(
                [cnt, [batch.num_rows, d_b]]).astype(np.int64)),
        })

    summed1 = (items.map_batches(mg_partial, batch_format="pyarrow")
               .groupby(col).aggregate(Sum("p_est", alias_name="est"))
               .materialize())

    def sentinels(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[col], value_set=pa.array([N_KEY, D_KEY]))
        return b.filter(mask)

    sent = {r[col]: int(r["est"]) for r in
            summed1.map_batches(sentinels,
                                batch_format="pyarrow").take_all()}
    n = sent.get(N_KEY, 0)
    big_d = sent.get(D_KEY, 0)
    if n == 0:
        return rd.from_arrow(pa.table({col: pa.array([], pa.string()),
                                       "cnt": pa.array([], pa.int64())}))
    margin = n - big_d * (k + 1)  # Σest·(k+1) must EXCEED this

    def prune(b: pa.Table) -> pa.Table:
        est = b["est"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = b[col].to_numpy(zero_copy_only=False)
        keep = (est * (k + 1) > margin) & (keys != N_KEY) & (keys != D_KEY)
        return pa.table({col: b[col].filter(pa.array(keep))
                         if not isinstance(b[col], pa.ChunkedArray)
                         else b[col].combine_chunks().filter(
                             pa.array(keep))})

    from .util import collect_table
    cand = collect_table(
        summed1.map_batches(prune, batch_format="pyarrow"))[col]
    if isinstance(cand, pa.ChunkedArray):
        cand = cand.combine_chunks()
    if len(cand) == 0:
        return rd.from_arrow(pa.table({col: pa.array([], pa.string()),
                                       "cnt": pa.array([], pa.int64())}))
    if not exact:
        # candidate-superset mode (skew_join's hot-key detection): one
        # corpus pass instead of two; counts are the Σest lower bounds,
        # membership is a guaranteed superset of the > n/(k+1) items
        return rd.from_arrow(pa.table({
            col: cand, "cnt": pa.nulls(len(cand), pa.int64())}))
    cand_ref = ray.put(cand)

    def exact_partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        mask = pc.is_in(c, value_set=ray.get(cand_ref))
        g = (pa.table({col: c.filter(mask)})
             .group_by([col]).aggregate([([], "count_all")]))
        out = g.rename_columns([col, "p_cnt"])
        return pa.table({col: out[col],
                         "p_cnt": pc.cast(out["p_cnt"], pa.int64())})

    summed = (items.map_batches(exact_partial, batch_format="pyarrow")
              .groupby(col).aggregate(Sum("p_cnt", alias_name="cnt")))
    tbl = collect_table(summed)  # ≤ 2(k+1) rows
    cnts = tbl["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = cnts * (k + 1) > n
    out = pa.table({col: (tbl[col].combine_chunks()
                          if isinstance(tbl[col], pa.ChunkedArray)
                          else tbl[col]).filter(pa.array(keep)),
                    "cnt": pa.array(cnts[keep], type=pa.int64())})
    return rd.from_arrow(out)
