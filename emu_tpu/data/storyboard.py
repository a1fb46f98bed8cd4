"""YT-Storyboard-1B assembly: interleave storyboard frames with
timestamp-aligned transcript segments into webdataset shards.

Behavioral model: Emu1/data/yt-sb-1b/video_webdataset_maker_YT1b_sb.py
(:21-58) + get_transcript.py — each output sample holds the video's
storyboard frames (one webp per storyboard interval) and the subtitle
lines whose spans overlap each interval, producing the interleaved
vision+text documents Emu1 pretrained on (18M videos / 1.8B frames,
ref yt-sb-1b/README.md:3).
"""

from __future__ import annotations

import io
import json
import os
from typing import Dict, List, Optional, Sequence

from emu_tpu.data.writers import WebDatasetSampleWriter


def _ts_to_seconds(ts: str) -> float:
    parts = ts.replace(",", ".").split(":")
    out = 0.0
    for p in parts:
        out = out * 60 + float(p)
    return out


def align_transcript(frame_times: Sequence[float],
                     transcript: Sequence[Dict]) -> List[str]:
    """For each storyboard frame timestamp, collect overlapping subtitle
    text. transcript entries: {"start", "end", "lines"} (VTT-style) or
    {"start", "duration", "text"} (youtube-transcript-api style)."""
    spans = []
    for seg in transcript:
        if "duration" in seg:
            s = float(seg["start"])
            e = s + float(seg["duration"])
            text = seg["text"]
        else:
            s = _ts_to_seconds(str(seg["start"]))
            e = _ts_to_seconds(str(seg["end"]))
            text = seg["lines"]
            if isinstance(text, list):
                text = " ".join(text)
        spans.append((s, e, text))

    out = []
    bounds = list(frame_times) + [float("inf")]
    for i, t0 in enumerate(frame_times):
        t1 = bounds[i + 1]
        texts = [text for s, e, text in spans if s < t1 and e > t0]
        out.append(" ".join(texts))
    return out


def split_storyboard_grid(grid_bytes: bytes, rows: int = 5, cols: int = 5
                          ) -> List[bytes]:
    """Split a storyboard thumbnail grid into per-interval webp frames."""
    from PIL import Image
    grid = Image.open(io.BytesIO(grid_bytes)).convert("RGB")
    w, h = grid.size
    fw, fh = w // cols, h // rows
    frames = []
    for r in range(rows):
        for c in range(cols):
            tile = grid.crop((c * fw, r * fh, (c + 1) * fw, (r + 1) * fh))
            buf = io.BytesIO()
            tile.save(buf, "WEBP")
            frames.append(buf.getvalue())
    return frames


def get_transcript(video_id: str, languages=("en",)) -> List[Dict]:
    """Fetch a YouTube transcript (≙ Emu1/data/yt-sb-1b/get_transcript.py).
    Requires the optional youtube_transcript_api package."""
    try:
        from youtube_transcript_api import YouTubeTranscriptApi
    except ImportError as e:
        raise ImportError(
            "get_transcript requires youtube_transcript_api "
            "(optional, not bundled)") from e
    return YouTubeTranscriptApi.get_transcript(video_id,
                                               languages=list(languages))


def make_interleaved_shards(samples: Sequence[Dict], output_folder: str,
                            samples_per_shard: int = 1000,
                            grid_rows: int = 5, grid_cols: int = 5) -> int:
    """samples: [{"video_id", "storyboards": [grid bytes], "transcript":
    [...], "interval": seconds-per-frame}] → interleaved webdataset shards.
    Returns the number of shards written."""
    os.makedirs(output_folder, exist_ok=True)
    shard_id, writer, in_shard = 0, None, 0
    for sample in samples:
        if writer is None:
            writer = WebDatasetSampleWriter(shard_id, output_folder)
        frames: List[bytes] = []
        for grid in sample["storyboards"]:
            frames.extend(split_storyboard_grid(grid, grid_rows, grid_cols))
        interval = float(sample.get("interval", 2.0))
        times = [i * interval for i in range(len(frames))]
        texts = align_transcript(times, sample.get("transcript", []))
        streams = {}
        doc = []
        for i, frame in enumerate(frames):
            streams[f"{i:04d}.webp"] = frame
            doc.append({"frame": f"{i:04d}.webp", "t": times[i],
                        "text": texts[i]})
        streams["doc.json"] = json.dumps(doc).encode()
        meta = {"key": sample["video_id"], "status": "success",
                "error_message": None, "n_frames": len(frames)}
        writer.write(streams, sample["video_id"], meta)
        in_shard += 1
        if in_shard >= samples_per_shard:
            writer.close()
            writer, in_shard = None, 0
            shard_id += 1
    if writer is not None:
        writer.close()
        shard_id += 1
    return shard_id
