"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernel is STUBBED — ``DecodeStage`` raises NotImplementedError when
``real_decode=True`` and otherwise produces a deterministic fake feature
vector from the payload bytes. Everything AROUND the kernel is real and
tested: schema (binary + struct metadata), actor-pool signature, small
batch sizes for large payloads, and the partitioned output layout.

At 100-TB scale: payloads dominate block size — keep
``batch_size`` small (64–256 rows), ``concurrency`` sized to the node,
and never carry the binary column past the stage that needs it
(select_columns immediately after feature extraction).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),         # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("duration_ms", pa.int32())])),
])


class DecodeStage:
    """Actor-pool decode/feature-extract stage. __init__ loads the codec
    ONCE per actor (stubbed); __call__ processes one small batch.

    real_decode=True is the seam where PIL/ffmpeg would plug in.
    """

    def __init__(self, feature_dim: int = 8, real_decode: bool = False):
        self.feature_dim = feature_dim
        self.real_decode = real_decode
        self.codec = "stub-codec-v1"  # stands in for model/codec load

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic fake: 8 bytes of blake2b per feature lane
        out = np.empty(self.feature_dim, dtype=np.float32)
        for i in range(self.feature_dim):
            d = hashlib.blake2b(payload, digest_size=8, salt=bytes([i] * 8)).digest()
            out[i] = int.from_bytes(d, "little") / float(1 << 64)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_decode:
            raise NotImplementedError(
                "real image/audio decode requires PIL/ffmpeg (not in this "
                "container); wire the codec here")
        feats, n_bytes = [], []
        for p in batch["payload"].to_pylist():
            p = p or b""
            n_bytes.append(len(p))
            feats.append(self._fake_features(p))
        out = batch.select(["media_id", "media_type"])
        out = out.append_column("n_bytes", pa.array(n_bytes, pa.int64()))
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32())))


def extract_media_features(ds: rd.Dataset, concurrency: int = 2,
                           batch_size: int = 128) -> rd.Dataset:
    """Run the decode actor pool over a MEDIA_SCHEMA dataset. The binary
    payload column is dropped by the stage output (never carried further)."""
    return ds.map_batches(DecodeStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


class ResizeStage:
    """Actor-pool image-resize stage (plumbing real, kernel stubbed like
    DecodeStage): keeps only image rows, emits (media_id, out_w, out_h,
    payload) where the resized payload is a deterministic fake derived
    from the source bytes + target dims; ``real_decode=True`` is the PIL
    seam. Aspect ratio is preserved against the metadata dims (real
    logic — tested)."""

    def __init__(self, max_side: int = 256, real_decode: bool = False):
        self.max_side = max_side
        self.real_decode = real_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_decode:
            raise NotImplementedError("real resize requires PIL")
        keep = pa.compute.equal(batch["media_type"], "image")
        batch = batch.filter(keep)
        ids, ws, hs, payloads = [], [], [], []
        metas = batch["meta"].to_pylist()
        for mid, meta, p in zip(batch["media_id"].to_pylist(), metas,
                                batch["payload"].to_pylist()):
            w, h = meta["width"], meta["height"]
            scale = min(1.0, self.max_side / max(w, h, 1))
            ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
            ids.append(mid)
            ws.append(ow)
            hs.append(oh)
            payloads.append(hashlib.blake2b(
                (p or b"") + ow.to_bytes(4, "little") + oh.to_bytes(4, "little"),
                digest_size=32).digest())
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "out_w": pa.array(ws, pa.int32()),
                         "out_h": pa.array(hs, pa.int32()),
                         "payload": pa.array(payloads, pa.binary())})


class FrameSampleStage:
    """Actor-pool video frame sampler: explodes each video row into one
    row per sampled frame (every ``stride_ms``, capped at ``max_frames``)
    with a deterministic fake frame-feature vector; ``real_decode=True``
    is the ffmpeg seam. The explode plumbing (row fan-out inside
    map_batches, payload dropped from the output) is the real pattern a
    video pipeline needs."""

    def __init__(self, stride_ms: int = 1000, max_frames: int = 16,
                 feature_dim: int = 8, real_decode: bool = False):
        self.stride_ms = stride_ms
        self.max_frames = max_frames
        self.feature_dim = feature_dim
        self.real_decode = real_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_decode:
            raise NotImplementedError("real frame extraction requires ffmpeg")
        keep = pa.compute.equal(batch["media_type"], "video")
        batch = batch.filter(keep)
        ids, idxs, tss, feats = [], [], [], []
        for mid, meta, p in zip(batch["media_id"].to_pylist(),
                                batch["meta"].to_pylist(),
                                batch["payload"].to_pylist()):
            dur = max(0, meta["duration_ms"])
            n_frames = min(self.max_frames, dur // self.stride_ms + 1)
            for fi in range(n_frames):
                ts = fi * self.stride_ms
                ids.append(mid)
                idxs.append(fi)
                tss.append(ts)
                d = hashlib.blake2b((p or b"") + ts.to_bytes(8, "little"),
                                    digest_size=self.feature_dim).digest()
                feats.append([b / 255.0 for b in d])
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_idx": pa.array(idxs, pa.int32()),
                         "ts_ms": pa.array(tss, pa.int32()),
                         "frame_features": pa.array(
                             feats, pa.list_(pa.float32()))})


def resize_images(ds: rd.Dataset, max_side: int = 256,
                  concurrency: int = 2, batch_size: int = 128) -> rd.Dataset:
    return ds.map_batches(ResizeStage, fn_constructor_kwargs={"max_side": max_side},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def sample_frames(ds: rd.Dataset, stride_ms: int = 1000, max_frames: int = 16,
                  concurrency: int = 2, batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(FrameSampleStage,
                          fn_constructor_kwargs={"stride_ms": stride_ms,
                                                 "max_frames": max_frames},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def synth_media_dataset(n: int = 256, seed: int = 9) -> rd.Dataset:
    """Deterministic fake media table for tests/demos (payload = seeded
    bytes; metadata typed per MEDIA_SCHEMA)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    types = ["image", "audio", "video"]
    rows_payload = [rng.bytes(int(rng.integers(100, 2000))) for _ in range(n)]
    t = pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "media_type": pa.array([types[i % 3] for i in range(n)]),
        "payload": pa.array(rows_payload, pa.binary()),
        "meta": pa.array(
            [{"width": int(rng.integers(16, 4096)),
              "height": int(rng.integers(16, 4096)),
              "duration_ms": int(rng.integers(0, 60_000))} for _ in range(n)],
            type=MEDIA_SCHEMA.field("meta").type),
    })
    return rd.from_arrow(t)
