"""Training-time shard reader (ref video2dataset/dataloader/): iterate
webdataset tar shards → decode → filter → batch. The webdataset package is
absent, so this is a self-contained tar reader with the same composition
points: decoders per extension, sample filters, dict collation, and video
frame decoding via cv2 (replacing decord)."""

from __future__ import annotations

import io
import json
import tarfile
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def default_decoder(ext: str, data: bytes):
    """Per-extension decode (ref dataloader/custom_wds.py:43-130)."""
    if ext in ("jpg", "jpeg", "png", "webp"):
        from PIL import Image
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    if ext == "json":
        return json.loads(data.decode())
    if ext in ("txt", "text", "caption"):
        return data.decode()
    if ext in ("mp4", "avi", "webm", "mkv"):
        return decode_video(data, ext)
    return data


def decode_video(data: bytes, ext: str, n_frames: Optional[int] = None
                 ) -> np.ndarray:
    """cv2 video decode, optionally uniform n-frame subsample
    (ref dataloader/video_decode.py:40, decord equivalent)."""
    import tempfile
    import cv2
    with tempfile.NamedTemporaryFile(suffix=f".{ext}") as f:
        f.write(data)
        f.flush()
        cap = cv2.VideoCapture(f.name)
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
    if not frames:
        return np.zeros((0, 1, 1, 3), np.uint8)
    if n_frames is not None and len(frames) > n_frames:
        idx = np.linspace(0, len(frames) - 1, n_frames).astype(int)
        frames = [frames[i] for i in idx]
    return np.stack(frames)


def iter_tar_samples(tar_path: str) -> Iterator[Dict]:
    """Group tar members by key and decode."""
    with tarfile.open(tar_path) as tar:
        current_key, sample = None, {}
        for member in sorted(tar.getmembers(), key=lambda m: m.name):
            if "." not in member.name:
                continue
            key, ext = member.name.rsplit(".", 1)
            if current_key is not None and key != current_key:
                sample["__key__"] = current_key
                yield sample
                sample = {}
            current_key = key
            sample[ext] = default_decoder(ext, tar.extractfile(member).read())
        if sample:
            sample["__key__"] = current_key
            yield sample


# -- filters (ref dataloader/filters.py:7-74) -------------------------------


def language_filter(languages: Sequence[str], key: str = "json"
                    ) -> Callable[[Dict], bool]:
    def f(sample):
        meta = sample.get(key, {})
        return meta.get("language") in languages
    return f


def aesthetics_filter(min_score: float, key: str = "json"):
    def f(sample):
        return sample.get(key, {}).get("aesthetic_score", 0) >= min_score
    return f


def unsafe_filter(max_unsafe: float = 0.5, key: str = "json"):
    def f(sample):
        return sample.get(key, {}).get("unsafe_score", 0) <= max_unsafe
    return f


def key_filter(required: Sequence[str]):
    def f(sample):
        return all(k in sample for k in required)
    return f


def dict_collation_fn(samples: List[Dict]) -> Dict:
    """Stack array fields, list everything else (ref custom_wds.py:13-40)."""
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray) and all(
                v.shape == vals[0].shape for v in vals):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


def get_video_dataset(urls: Sequence[str], batch_size: int = 1,
                      filters: Optional[Sequence[Callable]] = None,
                      n_frames: Optional[int] = None,
                      shuffle: bool = False, seed: int = 0
                      ) -> Iterator[Dict]:
    """Compose shards → decode → filter → batch
    (ref dataloader/dataloader.py:35)."""
    import random
    urls = list(urls)
    if shuffle:
        random.Random(seed).shuffle(urls)
    batch: List[Dict] = []
    for url in urls:
        for sample in iter_tar_samples(url):
            if filters and not all(f(sample) for f in filters):
                continue
            batch.append(sample)
            if len(batch) == batch_size:
                yield dict_collation_fn(batch)
                batch = []
    if batch:
        yield dict_collation_fn(batch)
