"""Multimodal column plumbing (task extension set).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
(``media_type``, ``width``/``height``/``duration_ms``). The Ray-side plumbing —
schema, actor-pool stage shape, batch sizing for wide binary rows, output
layout — is real and tested; the actual codec work is STUBBED because no
image/audio libraries exist in this container:

- ``Decoder(fake=False)`` raises ``NotImplementedError`` at decode time —
  the documented integration point for PIL/torchaudio/ffmpeg.
- ``Decoder(fake=True)`` produces a deterministic fake decode (byte-hash
  statistics standing in for pixels) so pipelines and tests exercise the full
  path.

Batch-size guidance: for payloads ≥1 MiB keep ``batch_size`` small (≤64) and
rely on Ray's block splitting; binary columns stay in Arrow end-to-end
(never pandas — object dtype would copy every payload).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import stable_hash_ints

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("width", pa.int32()),             # image/video; -1 otherwise
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),       # audio/video; -1 otherwise
])

FEATURE_DIM = 16


def synth_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes) for tests."""
    rng_bytes = []
    types = []
    for i in range(n):
        h = stable_hash_ints(np.array([seed * 1_000_003 + i]))[0]
        size = 64 + int(h % np.uint64(512))
        rng = np.random.default_rng(int(h))
        rng_bytes.append(rng.integers(0, 256, size=size, dtype=np.uint8).tobytes())
        types.append(("image", "audio", "video")[i % 3])
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "media_type": pa.array(types),
        "payload": pa.array(rng_bytes, type=pa.binary()),
        "width": pa.array([64 if t != "audio" else -1 for t in types], pa.int32()),
        "height": pa.array([48 if t != "audio" else -1 for t in types], pa.int32()),
        "duration_ms": pa.array([1000 if t != "image" else -1 for t in types],
                                pa.int32()),
    })


class Decoder:
    """Actor-pool decode/feature-extract stage.

    __init__ is the once-per-actor model-load point (here: nothing to load for
    the fake; a real deployment loads PIL/torch weights HERE, not per batch).
    __call__ appends ``features: list<float>(FEATURE_DIM)`` and
    ``decode_ok: bool``.
    """

    def __init__(self, fake: bool = False) -> None:
        self.fake = fake

    def _decode_one(self, payload: np.ndarray | None,
                    media_type: str) -> np.ndarray:
        """``payload`` is a zero-copy uint8 VIEW into the Arrow data buffer
        (a real decoder hands it to the codec as a memoryview), or None for
        a null payload slot — the fake path then fails the row
        (decode_ok=False), the real path raises its stub error first."""
        if not self.fake:
            raise NotImplementedError(
                "real decode requires an image/audio library not present in "
                "this container; construct Decoder(fake=True) or install "
                "PIL/torchaudio and implement here")
        # deterministic fake: per-chunk byte statistics as 'features'
        arr = payload.astype(np.float64)
        chunks = np.array_split(arr, FEATURE_DIM)
        return np.array([c.mean() if c.size else 0.0 for c in chunks])

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch["payload"]
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        # per-row decode is inherent, but the payload BYTES need no copy:
        # slice uint8 views out of the Arrow data buffer directly instead of
        # to_pylist() (which would copy every payload into Python bytes)
        n = len(pay)
        if n == 0:
            out = batch.append_column(
                "features", pa.array([], type=pa.list_(pa.float64())))
            return out.append_column("decode_ok",
                                     pa.array([], type=pa.bool_()))
        # buffers can be None for 0-length / all-null arrays
        off_dtype = (np.int64 if pa.types.is_large_binary(pay.type)
                     else np.int32)
        off0 = pay.offset
        if pay.buffers()[1] is not None:
            offsets = np.frombuffer(pay.buffers()[1], dtype=off_dtype,
                                    count=n + 1 + off0)[off0:].astype(np.int64)
        else:
            offsets = np.zeros(n + 1, dtype=np.int64)
        data = (np.frombuffer(pay.buffers()[2], dtype=np.uint8,
                              count=int(offsets[-1]))
                if pay.buffers()[2] is not None
                else np.empty(0, dtype=np.uint8))
        # null payloads must keep the pre-zero-copy semantics: decode is
        # ATTEMPTED (so Decoder(fake=False) still raises its documented
        # NotImplementedError) and the fake path records decode_ok=False —
        # never a fabricated decode of whatever bytes the null slot spans
        valid = (pay.is_valid().to_numpy(zero_copy_only=False)
                 if pay.null_count else np.ones(n, dtype=bool))
        feats, ok = [], []
        for i, mt in enumerate(batch["media_type"].to_pylist()):
            try:
                view = (data[offsets[i]:offsets[i + 1]]
                        if valid[i] else None)
                feats.append(self._decode_one(view, mt).tolist())
                ok.append(True)
            except NotImplementedError:
                raise
            except Exception:
                feats.append([0.0] * FEATURE_DIM)
                ok.append(False)
        out = batch.append_column(
            "features", pa.array(feats, type=pa.list_(pa.float64())))
        return out.append_column("decode_ok", pa.array(ok, type=pa.bool_()))


class FrameSampler:
    """Video frame-sample stage shape: emits ``n_frames`` child rows per video
    row (fake frames = payload slices), preserving parent ``media_id``."""

    def __init__(self, n_frames: int = 4, fake: bool = True) -> None:
        if not fake:
            raise NotImplementedError("real frame extraction needs ffmpeg")
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table({
            "media_id": pa.array([], type=pa.int64()),
            "frame_no": pa.array([], type=pa.int32()),
            "frame": pa.array([], type=pa.binary()),
        })
        vids = batch.filter(pc.equal(batch["media_type"], "video"))
        nv = vids.num_rows
        if nv == 0:
            return empty
        pay = vids["payload"]
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        if pay.null_count:
            # match Decoder's null-payload discipline: surface the bad row
            # instead of fabricating empty frames from whatever bytes the
            # null slot spans (the pre-vectorized path also failed loudly)
            raise ValueError("FrameSampler: null video payloads in batch; "
                             "filter or decode-gate them upstream")
        # same zero-copy discipline as Decoder.__call__: payload bytes are
        # read as offset/data buffer views, never materialized as Python
        # bytes objects; the only copy is the single vectorized gather that
        # assembles the (non-contiguous) frame slices into the new column
        off_dtype = (np.int64 if pa.types.is_large_binary(pay.type)
                     else np.int32)
        off0 = pay.offset
        offsets = np.frombuffer(pay.buffers()[1], dtype=off_dtype,
                                count=nv + 1 + off0)[off0:].astype(np.int64)
        data = (np.frombuffer(pay.buffers()[2], dtype=np.uint8,
                              count=int(offsets[-1]))
                if pay.buffers()[2] is not None
                else np.empty(0, dtype=np.uint8))
        lens = offsets[1:] - offsets[:-1]
        k = self.n_frames
        step = np.maximum(1, lens // k)                       # (nv,)
        fi = np.arange(k, dtype=np.int64)                     # (k,)
        starts = np.minimum(offsets[:-1, None] + fi * step[:, None],
                            offsets[1:, None])                # row-clamped
        ends = np.minimum(offsets[:-1, None] + (fi + 1) * step[:, None],
                          offsets[1:, None])
        s, e = starts.ravel(), ends.ravel()
        flens = e - s
        cum = np.concatenate(([0], np.cumsum(flens)))
        total = int(cum[-1])
        gather = (np.arange(total, dtype=np.int64)
                  + np.repeat(s - cum[:-1], flens))
        # offset width follows the actual byte total: >2 GiB of frame
        # bytes needs large_binary/int64 offsets (int32 would silently
        # wrap on large_binary inputs)
        if total < 2 ** 31:
            frame_arr = pa.Array.from_buffers(
                pa.binary(), nv * k,
                [None, pa.py_buffer(cum.astype(np.int32)),
                 pa.py_buffer(data[gather])])
        else:
            frame_arr = pa.Array.from_buffers(
                pa.large_binary(), nv * k,
                [None, pa.py_buffer(cum.astype(np.int64)),
                 pa.py_buffer(data[gather])])
        return pa.table({
            "media_id": pa.array(
                np.repeat(vids["media_id"].to_numpy(), k), type=pa.int64()),
            "frame_no": pa.array(np.tile(fi, nv).astype(np.int32),
                                 type=pa.int32()),
            "frame": frame_arr,
        })
