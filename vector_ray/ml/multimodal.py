"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are STUBS — clearly marked — behind an import-try;
``fake=True`` substitutes a deterministic fake decoder so the Ray-side
plumbing (schema, actor-pool signature, batch sizing for wide binary
rows, output layout) is real and tested.

Pattern: payloads ride as ``binary``; derived features are appended as
sibling columns; stages are ACTOR POOLS with small ``batch_size``
(binary rows are wide — block sizing must be byte-aware, see
SURVEY.md §7.4 "Wide tokens rows").
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),  # image/jpeg, audio/wav, ...
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, *, seed: int = 21, payload_bytes: int = 256) -> pa.Table:
    """Deterministic fake media rows (binary payload = seeded bytes)."""
    from vector_ray.sources.synth import _splitmix64

    ids = np.arange(n, dtype=np.uint64)
    h = _splitmix64(ids ^ np.uint64(seed))
    payloads = []
    for i in range(n):
        rng = np.random.default_rng(int(h[i]))
        payloads.append(rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes())
    kinds = np.array(["image/jpeg", "audio/wav", "video/mp4"])[(h % np.uint64(3)).astype(int)]
    return pa.table(
        {
            "media_id": pa.array([f"m-{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(kinds),
            "width": pa.array(((h >> np.uint64(8)) % np.uint64(1920)).astype(np.int32) + 32),
            "height": pa.array(((h >> np.uint64(16)) % np.uint64(1080)).astype(np.int32) + 32),
            "duration_ms": pa.array(((h >> np.uint64(24)) % np.uint64(60000)).astype(np.int32)),
        }
    )


class ImageDecode:
    """Actor-pool stage: decode image payloads → features.

    Real path requires PIL (NOT in this container) — raises
    NotImplementedError unless ``fake=True``, which produces a
    deterministic 8-dim byte-histogram 'embedding' so downstream
    plumbing is exercised end-to-end.
    """

    def __init__(self, *, fake: bool = False, resize: Optional[tuple] = None):
        self.resize = resize
        self.fake = fake
        if not fake:
            try:
                from PIL import Image  # noqa: F401

                self._pil = True
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "image decode requires PIL, which is not available in this "
                    "container; construct with fake=True for the deterministic stub"
                ) from e

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        feats = np.zeros((len(payloads), 8), dtype=np.float32)
        for i, p in enumerate(payloads):
            if p is None:
                continue
            if self.fake:
                counts = np.bincount(np.frombuffer(p, dtype=np.uint8) >> 5, minlength=8)
                feats[i] = counts / max(len(p), 1)
            else:  # pragma: no cover - real decode path stub
                raise NotImplementedError("real image decode not available in this container")
        emb = pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1), pa.float32()), 8)
        return t.append_column("image_features", emb)


class AudioDecode:
    """Actor-pool stage: decode audio payloads → per-window RMS
    features. Real path requires librosa/soundfile (NOT in this
    container) — raises NotImplementedError unless ``fake=True``, which
    interprets the payload bytes as int8 samples and emits 8 window-RMS
    values, exercising the identical plumbing."""

    def __init__(self, *, fake: bool = False, windows: int = 8):
        self.fake = fake
        self.windows = windows
        if not fake:
            try:
                import librosa  # noqa: F401
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "audio decode requires librosa, not available in this "
                    "container; construct with fake=True for the deterministic stub"
                ) from e

    def __call__(self, t: pa.Table) -> pa.Table:
        w = self.windows
        payloads = t["payload"].to_pylist()
        feats = np.zeros((len(payloads), w), dtype=np.float32)
        for i, p in enumerate(payloads):
            if p is None or len(p) == 0:
                continue
            if not self.fake:  # pragma: no cover - real decode path stub
                raise NotImplementedError("real audio decode not available here")
            samples = np.frombuffer(p, dtype=np.int8).astype(np.float32) / 128.0
            usable = (len(samples) // w) * w
            if usable == 0:
                continue
            chunks = samples[:usable].reshape(w, usable // w)
            feats[i] = np.sqrt((chunks ** 2).mean(axis=1))
        emb = pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1), pa.float32()), w)
        return t.append_column("audio_features", emb)


class ImageResize:
    """Actor-pool stage: resize image payloads to ``target`` (w, h),
    updating the width/height metadata columns — binary in, binary out,
    so downstream stages (decode, feature-extract) see the same schema.

    Real path requires PIL (NOT in this container) — raises
    NotImplementedError unless ``fake=True``: the deterministic stub
    re-derives a payload whose length scales with the target pixel
    count (seeded from the original bytes), exercising the identical
    actor-pool plumbing and binary-column round trip."""

    def __init__(self, target: tuple = (224, 224), *, fake: bool = False):
        self.target = tuple(target)
        self.fake = fake
        if not fake:
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "image resize requires PIL, which is not available in this "
                    "container; construct with fake=True for the deterministic stub"
                ) from e

    def __call__(self, t: pa.Table) -> pa.Table:
        tw, th = self.target
        payloads = t["payload"].to_pylist()
        out = []
        # stub payload: ~1 byte per 256 target pixels, deterministic
        target_len = max(8, (tw * th) // 256)
        for p in payloads:
            if p is None:
                out.append(None)
                continue
            if self.fake:
                src = np.frombuffer(p, dtype=np.uint8)
                idx = (np.arange(target_len) * max(len(src), 1)) // target_len
                out.append(src[np.minimum(idx, len(src) - 1)].tobytes())
            else:  # pragma: no cover - real resize path stub
                raise NotImplementedError("real image resize not available in this container")
        n = len(t)
        t = t.set_column(t.column_names.index("payload"), "payload",
                         pa.array(out, pa.binary()))
        t = t.set_column(t.column_names.index("width"), "width",
                         pa.array([tw] * n, pa.int32()))
        return t.set_column(t.column_names.index("height"), "height",
                            pa.array([th] * n, pa.int32()))


class FrameSample:
    """Video frame-sampling stage signature: emits one row per sampled
    frame index (1→N explode) with deterministic frame positions; the
    actual frame extraction is the stubbed part."""

    def __init__(self, *, every_ms: int = 1000, fake: bool = False):
        self.every_ms = every_ms
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "video decode requires ffmpeg, not available here; use fake=True"
            )

    def __call__(self, t: pa.Table) -> pa.Table:
        # vectorized 1→N explode: repeat ids by frame count, per-row
        # frame indices via a global arange minus each row's start offset
        dur = np.asarray(
            pa.compute.fill_null(t["duration_ms"], 0).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        n_frames = np.maximum(1, dur // self.every_ms)
        starts = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(n_frames, out=starts[1:])
        total = int(starts[-1])
        row_of = np.repeat(np.arange(len(t)), n_frames)
        frame_idx = np.arange(total, dtype=np.int64) - starts[row_of]
        mid = t["media_id"].combine_chunks() if isinstance(t["media_id"], pa.ChunkedArray) else t["media_id"]
        return pa.table(
            {
                "media_id": mid.take(pa.array(row_of, pa.int64())),
                "frame_idx": pa.array(frame_idx.astype(np.int32)),
                "frame_ms": pa.array((frame_idx * self.every_ms).astype(np.int32)),
            }
        )


def decode_stage(ds, cls=ImageDecode, *, concurrency: int = 2, batch_size: int = 64, **ctor):
    """Wire a decode class as an actor-pool map_batches with small
    batches (wide binary rows)."""
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=ctor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
