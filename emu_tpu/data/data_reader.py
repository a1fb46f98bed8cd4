"""Data readers: fetch media bytes for a sample URL.

Behavioral model: video2dataset/data_reader.py —
- `WebFileDownloader` (:117): plain http/file fetch (fsspec/urllib);
- `YtDlpDownloader` (:148): yt-dlp format selection, metadata/subtitles,
  and the **storyboard** path that built YT-Storyboard-1B. yt-dlp is not in
  this image, so the class degrades to a clear ImportError at use-time and
  the storyboard fetch accepts any thumbnail-grid URL list;
- `sub_to_dict` (:28-52): WebVTT → deduplicated JSON transcript (own
  minimal VTT parser; the webvtt package is absent).
"""

from __future__ import annotations

import io
import os
import re
from typing import Dict, List, Optional, Tuple


class WebFileDownloader:
    """http(s):// or local-path fetch (ref data_reader.py:117-145)."""

    def __init__(self, timeout: int = 10, tmp_dir: str = "/tmp"):
        self.timeout = timeout

    def __call__(self, url: str) -> Tuple[Optional[bytes], Optional[str]]:
        try:
            if url.startswith(("http://", "https://")):
                import urllib.request
                with urllib.request.urlopen(url, timeout=self.timeout) as r:
                    return r.read(), None
            path = url[7:] if url.startswith("file://") else url
            with open(path, "rb") as f:
                return f.read(), None
        except Exception as e:  # noqa: BLE001
            return None, str(e)


def parse_vtt(vtt_text: str) -> List[Dict]:
    """Minimal WebVTT cue parser → [{start, end, lines}]."""
    cues = []
    block: List[str] = []
    for line in vtt_text.splitlines() + [""]:
        if line.strip():
            block.append(line.strip())
            continue
        for i, bl in enumerate(block):
            if "-->" in bl:
                start, end = [t.strip().split(" ")[0]
                              for t in bl.split("-->")]
                text = [t for t in block[i + 1:] if t]
                if text:
                    cues.append({"start": start, "end": end, "lines": text})
                break
        block = []
    return cues


def sub_to_dict(vtt_text: str, dedupe: bool = True, single: bool = False
                ) -> List[Dict]:
    """VTT → transcript dict, deduplicating rolling-caption repeats
    (ref data_reader.py:28-52)."""
    captions = parse_vtt(vtt_text)
    out = []
    prev_lines: List[str] = []
    for cue in captions:
        lines = []
        for line in cue["lines"]:
            if dedupe and line in prev_lines:
                continue
            lines.append(line)
        prev_lines = cue["lines"]
        if not lines:
            continue
        text = " ".join(lines) if single else lines
        out.append({"start": cue["start"], "end": cue["end"], "lines": text})
    return out


class YtDlpDownloader:
    """yt-dlp video/audio/storyboard download (ref data_reader.py:148-218).

    Fully functional only when the optional `yt_dlp` package is present;
    the storyboard modality ("sb") downloads YouTube's thumbnail-grid
    tracks — the 20×-cheaper representation behind YT-Storyboard-1B
    (ref Emu1/data/yt-sb-1b/README.md:3).
    """

    def __init__(self, metadata_args: Optional[dict] = None,
                 video_size: int = 360, download_size: int = 360,
                 modalities: Tuple[str, ...] = ("sb",)):
        self.metadata_args = metadata_args or {}
        self.video_size = video_size
        self.modalities = modalities

    def _ydl(self):
        try:
            import yt_dlp
        except ImportError as e:
            raise ImportError(
                "YtDlpDownloader requires the optional yt_dlp package "
                "(not bundled in this image)") from e
        return yt_dlp

    def get_metadata(self, url: str) -> dict:
        yt_dlp = self._ydl()
        opts = {"quiet": True, "skip_download": True,
                "writesubtitles": bool(self.metadata_args.get("writesubtitles"))}
        with yt_dlp.YoutubeDL(opts) as ydl:
            return ydl.extract_info(url, download=False)

    def get_storyboard(self, url: str) -> Tuple[Optional[List[bytes]],
                                                Optional[str]]:
        """Fetch the storyboard (thumbnail-grid) frames for a video."""
        try:
            info = self.get_metadata(url)
            fetch = WebFileDownloader()
            frames = []
            for fmt in info.get("formats", []):
                if fmt.get("format_note") == "storyboard" or \
                        str(fmt.get("format_id", "")).startswith("sb"):
                    data, err = fetch(fmt["url"])
                    if data is not None:
                        frames.append(data)
            if not frames:
                return None, "no storyboard formats found"
            return frames, None
        except Exception as e:  # noqa: BLE001
            return None, str(e)

    def __call__(self, url: str) -> Tuple[Optional[dict], Optional[str]]:
        if "sb" in self.modalities:
            frames, err = self.get_storyboard(url)
            if err:
                return None, err
            return {"sb": frames}, None
        raise NotImplementedError(
            "only the storyboard modality is wired; extend for mp4/audio")


class VideoDataReader:
    """Dispatch by URL kind (ref data_reader.py:221-259)."""

    def __init__(self, encode_formats: Optional[Dict[str, str]] = None,
                 **kwargs):
        self.encode_formats = encode_formats or {"sb": "webp"}
        self.web = WebFileDownloader()
        self._yt = None

    def __call__(self, key, url: str):
        if re.search(r"(youtube\.com|youtu\.be)", url):
            if self._yt is None:
                self._yt = YtDlpDownloader()
            streams, err = self._yt(url)
            return key, streams, {"url": url}, err
        data, err = self.web(url)
        if data is None:
            return key, None, {"url": url}, err
        ext = os.path.splitext(url.split("?")[0])[-1].lstrip(".") or "bin"
        return key, {ext: data}, {"url": url}, None
