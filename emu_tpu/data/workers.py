"""Shard workers (ref video2dataset/workers/): DownloadWorker pulls one
feather shard, fetches each sample on a thread pool, applies subsamplers,
writes through the configured writer, and emits the shard stats JSON.
SubsetWorker re-transforms existing webdataset shards."""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

from emu_tpu.data import stats as S
from emu_tpu.data.data_reader import VideoDataReader
from emu_tpu.data.writers import WRITERS


def compute_key(key: int, shard_id: int, oom_sample_per_shard: int = 4,
                oom_shard_count: int = 5) -> str:
    """Globally ordered sample key (ref workers/download_worker.py:28-34)."""
    return (str(shard_id).zfill(oom_shard_count)
            + str(key).zfill(oom_sample_per_shard))


class DownloadWorker:
    def __init__(self, sample_writer_class=None, output_folder: str = ".",
                 thread_count: int = 8, column_list: Optional[List] = None,
                 subsamplers: Optional[List] = None,
                 encode_formats: Optional[Dict] = None,
                 url_col: str = "url", caption_col: Optional[str] = None):
        self.writer_class = sample_writer_class or WRITERS["webdataset"]
        self.output_folder = output_folder
        self.thread_count = thread_count
        self.column_list = column_list or [url_col]
        self.subsamplers = subsamplers or []
        self.reader = VideoDataReader(encode_formats)
        self.url_col = url_col
        self.caption_col = caption_col

    def __call__(self, shard) -> dict:
        shard_id, shard_path = shard
        import pandas as pd
        df = pd.read_feather(shard_path)
        writer = self.writer_class(shard_id, self.output_folder,
                                   columns=self.column_list)
        speed = S.SpeedLogger(f"shard {shard_id}")
        status = S.CappedCounter()
        t0 = time.time()
        successes = 0

        def fetch(item):
            idx, row = item
            key = compute_key(idx, shard_id)
            return key, self.reader(key, row[self.url_col]), dict(row)

        with ThreadPoolExecutor(self.thread_count) as pool:
            for key, (k, streams, read_meta, err), row in pool.map(
                    fetch, df.iterrows()):
                meta = {**row, **read_meta, "key": key,
                        "status": "success" if err is None else "failed",
                        "error_message": err}
                n_bytes = 0
                if err is None:
                    for sub in self.subsamplers:
                        streams, meta, sub_err = sub(streams, meta)
                        if sub_err is not None:
                            meta["status"] = "failed_subsample"
                            meta["error_message"] = sub_err
                            break
                    n_bytes = sum(
                        len(v) if isinstance(v, bytes)
                        else sum(len(x) for x in v)
                        for v in (streams or {}).values())
                ok = meta["status"] == "success"
                successes += int(ok)
                status.increment(meta["status"])
                speed(ok, n_bytes)
                writer.write(streams if ok else {}, key, meta)
        writer.close()
        S.write_stats(self.output_folder, shard_id, len(df), successes,
                      len(df) - successes, time.time() - t0, status)
        speed.log()
        return speed.stats()


class SubsetWorker:
    """Re-transform existing webdataset shards (ref workers/subset_worker.py)."""

    def __init__(self, sample_writer_class=None, output_folder: str = ".",
                 subsamplers: Optional[List] = None):
        self.writer_class = sample_writer_class or WRITERS["webdataset"]
        self.output_folder = output_folder
        self.subsamplers = subsamplers or []

    def __call__(self, shard) -> dict:
        import json
        import tarfile
        shard_id, tar_path = shard
        writer = self.writer_class(shard_id, self.output_folder)
        t0 = time.time()
        count = successes = 0
        with tarfile.open(tar_path) as tar:
            samples: Dict[str, Dict[str, bytes]] = {}
            for member in tar.getmembers():
                key, ext = member.name.rsplit(".", 1)
                samples.setdefault(key, {})[ext] = tar.extractfile(
                    member).read()
        for key, streams in samples.items():
            meta = json.loads(streams.pop("json", b"{}").decode())
            meta.setdefault("key", key)
            meta.setdefault("status", "success")
            meta.setdefault("error_message", None)
            err = None
            for sub in self.subsamplers:
                streams, meta, err = sub(streams, meta)
                if err:
                    break
            count += 1
            successes += int(err is None)
            writer.write(streams, key, meta)
        writer.close()
        S.write_stats(self.output_folder, shard_id, count, successes,
                      count - successes, time.time() - t0)
        return {"count": count}
