"""Media subsamplers (ref video2dataset/subsamplers/): per-sample stream
transforms between download and write. The reference shells out to ffmpeg;
this image has cv2 (and no ffmpeg), so video ops decode→transform→encode
through OpenCV, and the API stays drop-in (streams dict in/out)."""

from __future__ import annotations

import io
from typing import Dict, List, Optional, Tuple


class NoOpSubsampler:
    def __call__(self, streams: Dict, meta: dict) -> Tuple[Dict, dict,
                                                           Optional[str]]:
        return streams, meta, None


class ResolutionSubsampler:
    """Resize/crop images or video frames (ref resolution_subsampler.py:9)."""

    def __init__(self, video_size: int = 360, resize_mode: str = "scale"):
        self.size = video_size
        self.mode = resize_mode

    def _resize_image(self, data: bytes) -> bytes:
        from PIL import Image
        im = Image.open(io.BytesIO(data)).convert("RGB")
        w, h = im.size
        if self.mode == "scale":
            if w < h:
                new = (self.size, int(h * self.size / w))
            else:
                new = (int(w * self.size / h), self.size)
            im = im.resize(new, Image.BICUBIC)
        elif self.mode == "center_crop":
            s = min(w, h)
            im = im.crop(((w - s) // 2, (h - s) // 2,
                          (w + s) // 2, (h + s) // 2))
            im = im.resize((self.size, self.size), Image.BICUBIC)
        buf = io.BytesIO()
        im.save(buf, "WEBP")
        return buf.getvalue()

    def __call__(self, streams, meta):
        try:
            out = {}
            for ext, data in streams.items():
                if ext in ("jpg", "jpeg", "png", "webp"):
                    out["webp"] = self._resize_image(data)
                elif ext == "sb" and isinstance(data, list):
                    out["sb"] = [self._resize_image(d) for d in data]
                else:
                    out[ext] = data
            return out, meta, None
        except Exception as e:  # noqa: BLE001
            return streams, meta, str(e)


class FrameSubsampler:
    """Decimate video fps via cv2 (ref frame_subsampler.py:11)."""

    def __init__(self, frame_rate: int = 1):
        self.frame_rate = frame_rate

    def __call__(self, streams, meta):
        import tempfile
        try:
            import cv2
            out = dict(streams)
            for ext in ("mp4", "avi", "mkv", "webm"):
                if ext not in streams:
                    continue
                with tempfile.NamedTemporaryFile(suffix=f".{ext}") as f:
                    f.write(streams[ext])
                    f.flush()
                    cap = cv2.VideoCapture(f.name)
                    fps = cap.get(cv2.CAP_PROP_FPS) or 30
                    step = max(1, int(round(fps / self.frame_rate)))
                    frames = []
                    i = 0
                    while True:
                        ok, frame = cap.read()
                        if not ok:
                            break
                        if i % step == 0:
                            ok2, buf = cv2.imencode(".webp", frame)
                            if ok2:
                                frames.append(buf.tobytes())
                        i += 1
                    cap.release()
                out.pop(ext)
                out["frames"] = frames
                meta["n_frames"] = len(frames)
            return out, meta, None
        except Exception as e:  # noqa: BLE001
            return streams, meta, str(e)


class AudioRateSubsampler:
    """Resample audio streams to a target rate (ref
    audio_rate_subsampler.py:11). The reference shells out to
    `ffmpeg -ar {rate}`; no ffmpeg in this image, so WAV (PCM16) streams
    are parsed with the stdlib `wave` module and resampled with a numpy
    polyphase-free linear interpolator — same contract: streams in,
    streams at `sample_rate` out, (streams, meta, err) result. Non-WAV
    codecs (flac/mp3) need a codec library and report an error string
    instead of silently passing through."""

    def __init__(self, sample_rate: int = 16000,
                 encode_formats: Optional[Dict] = None):
        self.sample_rate = sample_rate
        # target audio container (the reference's encode_formats["audio"]);
        # only wav is producible without ffmpeg — anything else is an
        # up-front config error rather than a silent per-sample failure
        self.ext = (encode_formats or {}).get("audio", "wav")
        if self.ext != "wav":
            raise ValueError(
                f"AudioRateSubsampler: target format {self.ext!r} needs "
                "ffmpeg (not in this image); only 'wav' is supported")

    def _resample_wav(self, data: bytes) -> bytes:
        import wave

        import numpy as np
        with wave.open(io.BytesIO(data), "rb") as w:
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
        if width != 2:
            raise ValueError(f"only PCM16 WAV supported, got width={width}")
        x = np.frombuffer(raw, np.int16).reshape(-1, n_ch).astype(np.float32)
        if rate != self.sample_rate:
            n_out = int(round(x.shape[0] * self.sample_rate / rate))
            t_out = np.arange(n_out) * (rate / self.sample_rate)
            idx = np.arange(x.shape[0])
            x = np.stack([np.interp(t_out, idx, x[:, c])
                          for c in range(n_ch)], axis=1)
        out = np.clip(np.round(x), -32768, 32767).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(n_ch)
            w.setsampwidth(2)
            w.setframerate(self.sample_rate)
            w.writeframes(out.tobytes())
        return buf.getvalue()

    def __call__(self, streams, meta):
        try:
            out = dict(streams)
            unsupported = [e for e in ("flac", "mp3", "m4a")
                           if e in streams]
            if unsupported:
                # keep any completed wav resample? No: mirror the
                # reference's per-sample all-or-nothing error contract,
                # but report BEFORE doing work so nothing is discarded
                return streams, meta, (
                    "audio codec(s) "
                    + ", ".join(f".{e}" for e in unsupported)
                    + " unsupported without ffmpeg")
            if "wav" in streams:
                out["wav"] = self._resample_wav(streams["wav"])
                meta["audio_rate"] = self.sample_rate
            return out, meta, None
        except Exception as e:  # noqa: BLE001
            return streams, meta, str(e)


class ClippingSubsampler:
    """Annotate clip spans (ref clipping_subsampler.py:23).

    Conforms to the shared (streams, meta, err) subsampler contract: clip
    spans from `meta["clips"]` are normalized and recorded as
    `meta["clip_spans"]` for the training-time dataloader's CutsAdder.
    (The reference's one-sample→many-clips ffmpeg fan-out would require a
    fan-out-aware worker; per-clip physical splitting is a round-2 item.)
    """

    def __init__(self, oom_clip_count: int = 5,
                 encode_formats: Optional[Dict] = None):
        self.oom = oom_clip_count

    def __call__(self, streams, meta):
        clips = meta.get("clips")
        if not clips:
            return streams, meta, None
        meta["clip_spans"] = [
            {"clip_id": str(i).zfill(self.oom),
             "span": [float(s), float(e)]}
            for i, (s, e) in enumerate(clips)]
        return streams, meta, None


class CutDetectionSubsampler:
    """Scene-cut detection (ref cut_detection_subsampler.py:27). The
    reference uses PySceneDetect; unavailable here — a cv2 frame-diff
    detector provides the same output contract (meta["cuts"])."""

    def __init__(self, cut_detection_mode: str = "all",
                 threshold: float = 27.0):
        self.threshold = threshold

    def __call__(self, streams, meta):
        import tempfile
        try:
            import cv2
            import numpy as np
            for ext in ("mp4", "avi", "mkv", "webm"):
                if ext not in streams:
                    continue
                with tempfile.NamedTemporaryFile(suffix=f".{ext}") as f:
                    f.write(streams[ext])
                    f.flush()
                    cap = cv2.VideoCapture(f.name)
                    prev = None
                    cuts, i = [0], 0
                    while True:
                        ok, frame = cap.read()
                        if not ok:
                            break
                        small = cv2.resize(frame, (64, 36))
                        hsv = cv2.cvtColor(small, cv2.COLOR_BGR2HSV)
                        if prev is not None:
                            diff = float(np.abs(
                                hsv.astype(np.int16)
                                - prev.astype(np.int16)).mean())
                            if diff > self.threshold:
                                cuts.append(i)
                        prev = hsv
                        i += 1
                    cap.release()
                meta["cuts"] = cuts
            return streams, meta, None
        except Exception as e:  # noqa: BLE001
            return streams, meta, str(e)
