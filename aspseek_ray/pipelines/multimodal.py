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
