"""Image/video preprocessing: host (PIL-exact) and on-device (fused) paths.

Reference transform (Emu1/utils.py:17-30, Emu2/emu/chat.py:35-39):
bicubic resize to S×S → /255 → normalize with OpenAI CLIP mean/std.

Host path reproduces PIL bicubic bit-for-bit (the reference uses
torchvision's PIL backend). Device path takes raw uint8 [B, H, W, 3] and
does resize+normalize inside jit — the north-star data path where only
bytes cross host→TPU; jax.image bicubic differs from PIL at the 1e-3 level
(antialiasing), so eval/fidelity flows use the host path.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np

OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_image(image, size: int) -> np.ndarray:
    """PIL image → normalized fp32 [size, size, 3] (NHWC)."""
    from PIL import Image
    if not isinstance(image, Image.Image):
        image = Image.fromarray(np.asarray(image))
    image = image.convert("RGB").resize((size, size), Image.BICUBIC)
    x = np.asarray(image, np.float32) / 255.0
    return (x - np.asarray(OPENAI_MEAN, np.float32)) / np.asarray(
        OPENAI_STD, np.float32)


def preprocess_batch(images: Sequence, size: int) -> np.ndarray:
    return np.stack([preprocess_image(im, size) for im in images])


def to_uint8_rgb(image) -> np.ndarray:
    """PIL image / array → raw uint8 [H, W, 3] with NO host resize or
    normalize — the transfer format for the device-preprocess path
    (device_preprocess does the rest on TPU)."""
    from PIL import Image
    if isinstance(image, Image.Image):
        return np.asarray(image.convert("RGB"), np.uint8)
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[-1] == 4:
        # RGBA ndarray: route through the same PIL convert("RGB") the
        # host path (preprocess_image) uses, so both drop alpha
        # identically instead of this path shipping 4 channels into the
        # [B,H,W,3] device contract — ADVICE r3
        return np.asarray(Image.fromarray(arr).convert("RGB"), np.uint8)
    return arr


@functools.partial(__import__("jax").jit, static_argnums=(1,))
def device_preprocess(raw_uint8, size: int):
    """uint8 [B, H, W, 3] → normalized fp32 [B, size, size, 3], on device.

    Fused resize+normalize under jit so the host→TPU transfer is raw bytes
    (survey §7 north star).
    """
    import jax
    import jax.numpy as jnp
    x = raw_uint8.astype(jnp.float32) / 255.0
    b = x.shape[0]
    x = jax.image.resize(x, (b, size, size, 3), method="bicubic")
    mean = jnp.asarray(OPENAI_MEAN, jnp.float32)
    std = jnp.asarray(OPENAI_STD, jnp.float32)
    return (x - mean) / std


def extract_frames(video_path: str, n_frames: int = 8) -> List[np.ndarray]:
    """Uniform frame extraction (ref Emu1/utils.py:7-14: segment midpoints;
    Emu2/demo/common/utils.py:25-32). cv2 replaces the decord dependency."""
    import cv2
    cap = cv2.VideoCapture(video_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    seg = total / n_frames
    idxs = [int(seg / 2 + np.round(seg * i)) for i in range(n_frames)]
    frames = []
    for idx in idxs:
        cap.set(cv2.CAP_PROP_POS_FRAMES, min(idx, total - 1))
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames
