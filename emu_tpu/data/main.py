"""video2dataset orchestrator (ref video2dataset/main.py:24-205):
url list → shards → distributed download/transform → encoded shards,
with incremental resume via per-shard stats JSONs and SIGINT cleanup."""

from __future__ import annotations

import os
import signal
from typing import List, Optional

from emu_tpu.data import stats as S
from emu_tpu.data.distributor import (multiprocessing_distributor,
                                      pyspark_distributor)
from emu_tpu.data.input_sharder import InputSharder, OutputSharder
from emu_tpu.data.subsamplers import (AudioRateSubsampler,
                                      ClippingSubsampler,
                                      CutDetectionSubsampler,
                                      FrameSubsampler, NoOpSubsampler,
                                      ResolutionSubsampler)
from emu_tpu.data.workers import DownloadWorker, SubsetWorker
from emu_tpu.data.writers import WRITERS


def video2dataset(
    url_list: str,
    output_folder: str = "dataset",
    input_format: str = "txt",
    output_format: str = "webdataset",
    url_col: str = "url",
    caption_col: Optional[str] = None,
    clip_col: Optional[str] = None,
    save_additional_columns: Optional[List[str]] = None,
    number_sample_per_shard: int = 10000,
    processes_count: int = 1,
    thread_count: int = 8,
    distributor: str = "multiprocessing",
    max_shard_retry: int = 1,
    video_size: int = 360,
    resize_mode: Optional[str] = None,
    frame_rate: Optional[int] = None,
    audio_rate: Optional[int] = None,
    detect_cuts: bool = False,
    encode_formats: Optional[dict] = None,
    stage: str = "download",
    incremental_mode: str = "incremental",
    tmp_dir: str = "/tmp/emu_tpu_shards",
):
    """Download/transform a URL list into encoded shards.

    Default encode format {"sb": "webp"} — the storyboard modality used to
    build YT-Storyboard-1B (ref main.py:74).
    """
    encode_formats = encode_formats or {"sb": "webp"}
    os.makedirs(output_folder, exist_ok=True)

    done = (S.done_shards(output_folder)
            if incremental_mode == "incremental" else set())

    subsamplers = []
    if resize_mode:
        subsamplers.append(ResolutionSubsampler(video_size, resize_mode))
    if frame_rate:
        subsamplers.append(FrameSubsampler(frame_rate))
    if audio_rate:
        subsamplers.append(AudioRateSubsampler(audio_rate, encode_formats))
    if detect_cuts:
        subsamplers.append(CutDetectionSubsampler())
    if not subsamplers:
        subsamplers.append(NoOpSubsampler())

    writer_class = WRITERS[output_format]

    if stage == "download":
        sharder = InputSharder(
            url_list, input_format, url_col, caption_col, clip_col,
            save_additional_columns, number_sample_per_shard, done, tmp_dir)
        shards, columns = sharder()
        worker = DownloadWorker(
            sample_writer_class=writer_class, output_folder=output_folder,
            thread_count=thread_count, column_list=columns,
            subsamplers=subsamplers, encode_formats=encode_formats,
            url_col=url_col, caption_col=caption_col)
    elif stage == "subset":
        sharder = OutputSharder(url_list, done)
        shards, _ = sharder()
        worker = SubsetWorker(sample_writer_class=writer_class,
                              output_folder=output_folder,
                              subsamplers=subsamplers)
    else:
        raise ValueError(f"unknown stage {stage}")

    if not shards:
        print("nothing to do (all shards already done)")
        return S.aggregate_stats(output_folder)

    # SIGINT cleanup (ref main.py:92-100)
    original = signal.getsignal(signal.SIGINT)

    def handler(signum, frame):
        print("interrupted — shards in flight will be retried on resume")
        signal.signal(signal.SIGINT, original)
        raise KeyboardInterrupt

    signal.signal(signal.SIGINT, handler)
    try:
        dist = (pyspark_distributor if distributor == "pyspark"
                else multiprocessing_distributor)
        dist(processes_count, worker, shards, max_shard_retry)
    finally:
        signal.signal(signal.SIGINT, original)

    summary = S.aggregate_stats(output_folder)
    print(f"run summary: {summary['shards']} shards, "
          f"{summary['successes']}/{summary['count']} ok, "
          f"statuses {summary['status_dict']}")
    return summary


_INT_ARGS = {"number_sample_per_shard", "processes_count", "thread_count",
             "max_shard_retry", "video_size", "frame_rate", "audio_rate"}
_JSON_ARGS = {"save_additional_columns", "encode_formats"}


def main():
    import argparse
    import inspect
    import json as _json
    sig = inspect.signature(video2dataset)
    p = argparse.ArgumentParser(description=video2dataset.__doc__)
    p.add_argument("url_list")
    for name, param in sig.parameters.items():
        if name == "url_list":
            continue
        default = param.default
        kw = {"default": default}
        if isinstance(default, bool):
            kw = {"action": "store_true"} if not default else kw
        elif name in _INT_ARGS:
            kw["type"] = int                      # incl. None-defaulted ints
        elif name in _JSON_ARGS:
            kw["type"] = _json.loads              # lists/dicts as JSON
        p.add_argument(f"--{name}", **kw)
    args = vars(p.parse_args())
    video2dataset(**args)


if __name__ == "__main__":
    main()
