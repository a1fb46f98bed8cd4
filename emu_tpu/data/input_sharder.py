"""Input sharding: url lists → feather shards (ref video2dataset/
input_sharder.py:13-120): reads txt/csv/tsv/json/parquet, chunks into
shards of `number_sample_per_shard`, skips shards already done."""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple


class InputSharder:
    def __init__(self, url_list: str, input_format: str = "txt",
                 url_col: str = "url", caption_col: Optional[str] = None,
                 clip_col: Optional[str] = None,
                 save_additional_columns: Optional[List[str]] = None,
                 number_sample_per_shard: int = 10000,
                 done_shards: Optional[set] = None,
                 tmp_path: str = "/tmp/emu_tpu_shards"):
        import pandas as pd
        self.tmp_path = tmp_path
        os.makedirs(tmp_path, exist_ok=True)
        self.done_shards = done_shards or set()

        if input_format == "txt":
            with open(url_list) as f:
                urls = [l.strip() for l in f if l.strip()]
            df = pd.DataFrame({url_col: urls})
        elif input_format in ("csv", "tsv"):
            df = pd.read_csv(url_list,
                             sep="\t" if input_format == "tsv" else ",")
        elif input_format == "json":
            with open(url_list) as f:
                df = pd.DataFrame(json.load(f))
        elif input_format == "parquet":
            df = pd.read_parquet(url_list)
        else:
            raise ValueError(f"unknown input_format {input_format}")

        self.columns = [url_col]
        if caption_col:
            self.columns.append(caption_col)
        if clip_col:
            self.columns.append(clip_col)
        self.columns += list(save_additional_columns or [])
        self.df = df[[c for c in self.columns if c in df.columns]]
        self.shard_size = number_sample_per_shard

    def __call__(self) -> Tuple[List[Tuple[int, str]], List[str]]:
        """→ ([(shard_id, shard_file)], columns)."""
        shards = []
        n = len(self.df)
        n_shards = (n + self.shard_size - 1) // self.shard_size
        for shard_id in range(n_shards):
            if shard_id in self.done_shards:
                continue
            path = os.path.join(self.tmp_path, f"{shard_id}.feather")
            chunk = self.df.iloc[shard_id * self.shard_size:
                                 (shard_id + 1) * self.shard_size]
            chunk.reset_index(drop=True).to_feather(path)
            shards.append((shard_id, path))
        return shards, list(self.df.columns)


class OutputSharder:
    """Re-process existing webdataset shards (ref output_sharder.py:5)."""

    def __init__(self, shard_glob: str, done_shards: Optional[set] = None):
        import glob
        self.shards = sorted(glob.glob(shard_glob))
        self.done_shards = done_shards or set()

    def __call__(self):
        out = []
        for path in self.shards:
            shard_id = int(os.path.basename(path).split(".")[0])
            if shard_id not in self.done_shards:
                out.append((shard_id, path))
        return out, None
