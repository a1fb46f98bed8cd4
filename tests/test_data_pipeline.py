"""Data pipeline tests, mirroring the reference's own test discipline
(video2dataset tests/test_data_writers.py, test_main.py) — but offline:
synthetic image files served via file:// URLs."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from emu_tpu.data import video2dataset
from emu_tpu.data.dataloader import (dict_collation_fn, get_video_dataset,
                                     iter_tar_samples, key_filter)
from emu_tpu.data.data_reader import parse_vtt, sub_to_dict
from emu_tpu.data.stats import CappedCounter, done_shards
from emu_tpu.data.storyboard import (align_transcript,
                                     make_interleaved_shards,
                                     split_storyboard_grid)
from emu_tpu.data.writers import WRITERS


@pytest.fixture
def image_urls(tmp_path):
    urls = []
    for i in range(6):
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(
            np.full((40, 50, 3), i * 30, "uint8")).save(p)
        urls.append(f"file://{p}")
    url_file = tmp_path / "urls.txt"
    url_file.write_text("\n".join(urls))
    return url_file


@pytest.mark.parametrize("fmt", ["webdataset", "files", "parquet", "dummy"])
def test_writers_roundtrip(fmt, tmp_path, image_urls):
    out = tmp_path / f"out_{fmt}"
    video2dataset(str(image_urls), output_folder=str(out),
                  output_format=fmt, number_sample_per_shard=3,
                  tmp_dir=str(tmp_path / "shards"))
    stats = [f for f in os.listdir(out) if f.endswith("_stats.json")]
    assert len(stats) == 2                      # 6 samples / 3 per shard
    s = json.load(open(out / stats[0]))
    assert s["successes"] == 3 and s["failed"] == 0


def test_end_to_end_webdataset_and_resume(tmp_path, image_urls):
    out = tmp_path / "out"
    video2dataset(str(image_urls), output_folder=str(out),
                  number_sample_per_shard=3, resize_mode="center_crop",
                  video_size=32, tmp_dir=str(tmp_path / "shards"))
    tars = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    assert len(tars) == 2
    samples = list(iter_tar_samples(str(out / tars[0])))
    assert len(samples) == 3
    assert samples[0]["webp"].shape == (32, 32, 3)   # resized+cropped
    assert samples[0]["json"]["status"] == "success"

    # resume: all shards done → no work
    assert done_shards(str(out)) == {0, 1}
    video2dataset(str(image_urls), output_folder=str(out),
                  number_sample_per_shard=3,
                  tmp_dir=str(tmp_path / "shards2"))
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 2


def test_failed_url_recorded(tmp_path):
    url_file = tmp_path / "urls.txt"
    url_file.write_text(f"file://{tmp_path}/missing.png")
    out = tmp_path / "out"
    video2dataset(str(url_file), output_folder=str(out),
                  number_sample_per_shard=10,
                  tmp_dir=str(tmp_path / "shards"))
    import pandas as pd
    meta = pd.read_parquet(out / "00000.parquet")
    assert meta.iloc[0]["status"] == "failed"
    assert meta.iloc[0]["error_message"]


def test_dataloader_filters_and_collation(tmp_path, image_urls):
    out = tmp_path / "out"
    video2dataset(str(image_urls), output_folder=str(out),
                  number_sample_per_shard=6, resize_mode="center_crop",
                  video_size=16, tmp_dir=str(tmp_path / "shards"))
    tars = [str(out / f) for f in os.listdir(out) if f.endswith(".tar")]
    batches = list(get_video_dataset(tars, batch_size=2,
                                     filters=[key_filter(["webp"])]))
    assert len(batches) == 3
    assert batches[0]["webp"].shape == (2, 16, 16, 3)


def test_audio_rate_subsampler_resamples_wav():
    """PCM16 WAV roundtrip through AudioRateSubsampler: rate converted,
    duration preserved, signal shape (a sine) preserved."""
    import io
    import wave

    import numpy as np

    from emu_tpu.data.subsamplers import AudioRateSubsampler

    rate_in, rate_out, secs, freq = 44100, 16000, 1, 440
    t = np.arange(rate_in * secs) / rate_in
    x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate_in)
        w.writeframes(x.tobytes())

    sub = AudioRateSubsampler(sample_rate=rate_out)
    streams, meta, err = sub({"wav": buf.getvalue()}, {})
    assert err is None and meta["audio_rate"] == rate_out
    with wave.open(io.BytesIO(streams["wav"]), "rb") as w:
        assert w.getframerate() == rate_out
        y = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert abs(len(y) - rate_out * secs) <= 1
    # dominant frequency survives the resample
    spec = np.abs(np.fft.rfft(y.astype(np.float64)))
    assert abs(np.argmax(spec) - freq * secs) <= 2

    # unsupported codecs report an error, not a silent pass-through
    _, _, err = sub({"flac": b"\x00"}, {})
    assert err and "flac" in err


def test_vtt_parse_and_dedupe():
    vtt = ("WEBVTT\n\n00:00:01.000 --> 00:00:03.000\nhello world\n\n"
           "00:00:03.000 --> 00:00:05.000\nhello world\nsecond line\n")
    cues = parse_vtt(vtt)
    assert len(cues) == 2
    deduped = sub_to_dict(vtt, dedupe=True, single=True)
    assert deduped[1]["lines"] == "second line"


def test_storyboard_interleaver(tmp_path):
    grid = Image.new("RGB", (100, 100))
    buf = io.BytesIO()
    grid.save(buf, "PNG")
    frames = split_storyboard_grid(buf.getvalue(), rows=2, cols=2)
    assert len(frames) == 4

    transcript = [{"start": 0, "duration": 3, "text": "first"},
                  {"start": 3, "duration": 4, "text": "second"}]
    texts = align_transcript([0.0, 2.0, 4.0, 6.0], transcript)
    assert texts[0] == "first"
    assert "second" in texts[1] and "first" in texts[1]
    assert texts[3] == "second"

    n = make_interleaved_shards(
        [{"video_id": "vid0", "storyboards": [buf.getvalue()],
          "transcript": transcript, "interval": 2.0}],
        str(tmp_path / "sb"), grid_rows=2, grid_cols=2)
    assert n == 1
    with tarfile.open(tmp_path / "sb" / "00000.tar") as tar:
        names = tar.getnames()
    assert "vid0.doc.json" in names
    assert sum(1 for n_ in names if n_.endswith(".webp")) == 4


def test_capped_counter_prunes():
    c = CappedCounter(max_size=10)
    for i in range(100):
        c.increment(f"k{i % 20}")
    assert len(c.counter) <= 10


def test_run_summary_aggregation(tmp_path, image_urls):
    out = tmp_path / "out"
    summary = video2dataset(str(image_urls), output_folder=str(out),
                            number_sample_per_shard=3,
                            tmp_dir=str(tmp_path / "shards"))
    assert summary["shards"] == 2
    assert summary["successes"] == 6 and summary["failed"] == 0
    assert summary["status_dict"].get("success") == 6
    assert summary["success_rate"] == 1.0
