"""Sample writers: webdataset-tar, parquet, files, dummy, tfrecord.

Behavioral model: video2dataset's writer zoo (ref Emu1/data/yt-sb-1b/
video2dataset-1.1.0/video2dataset/data_writer.py:13-307) — each writer
receives (key, streams: {ext: bytes}, meta) per sample and produces one
shard plus a metadata parquet. `DummySampleWriter` exists for benchmarks,
as in the reference (README:76). The webdataset writer uses stdlib tarfile
(the webdataset package is not in this image).
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from typing import Dict, List, Optional


class BufferedParquetWriter:
    """Buffer rows, flush once per shard (ref data_writer.py:13-53)."""

    def __init__(self, output_file: str, schema_columns: List[str],
                 buffer_size: int = 100):
        self.output_file = output_file
        self.columns = list(schema_columns)
        self.rows: List[dict] = []

    def write(self, row: dict):
        self.rows.append({k: row.get(k) for k in self.columns})

    def flush(self):
        import pandas as pd
        df = pd.DataFrame(self.rows, columns=self.columns)
        df.to_parquet(self.output_file)


class _BaseWriter:
    def __init__(self, shard_id: int, output_folder: str,
                 oom_shard_count: int = 5, columns: Optional[List] = None):
        self.shard_name = str(shard_id).zfill(oom_shard_count)
        self.output_folder = output_folder
        os.makedirs(output_folder, exist_ok=True)
        cols = list(columns or []) + ["key", "status", "error_message"]
        self.meta_writer = BufferedParquetWriter(
            os.path.join(output_folder, f"{self.shard_name}.parquet"), cols)

    def write(self, streams: Dict[str, bytes], key: str, meta: dict):
        raise NotImplementedError

    def close(self):
        self.meta_writer.flush()


class WebDatasetSampleWriter(_BaseWriter):
    """Tar shards with {key}.{ext} members + {key}.json metadata."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tar_path = os.path.join(self.output_folder,
                                     f"{self.shard_name}.tar")
        self.tar = tarfile.open(self.tar_path, "w")

    def _add(self, name: str, data: bytes):
        info = tarfile.TarInfo(name)
        info.size = len(data)
        self.tar.addfile(info, io.BytesIO(data))

    def write(self, streams, key, meta):
        if streams:
            for ext, data in streams.items():
                self._add(f"{key}.{ext}", data)
            self._add(f"{key}.json",
                      json.dumps(meta, default=str).encode())
        self.meta_writer.write(meta)

    def close(self):
        self.tar.close()
        super().close()


class ParquetSampleWriter(_BaseWriter):
    """Everything into one parquet: binary columns per modality."""

    def __init__(self, *args, encode_formats: Optional[Dict] = None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.samples: List[dict] = []

    def write(self, streams, key, meta):
        row = dict(meta)
        for ext, data in (streams or {}).items():
            row[ext] = data
        self.samples.append(row)
        self.meta_writer.write(meta)

    def close(self):
        import pandas as pd
        pd.DataFrame(self.samples).to_parquet(
            os.path.join(self.output_folder,
                         f"{self.shard_name}_data.parquet"))
        super().close()


class FilesSampleWriter(_BaseWriter):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.dir = os.path.join(self.output_folder, self.shard_name)
        os.makedirs(self.dir, exist_ok=True)

    def write(self, streams, key, meta):
        if streams:
            for ext, data in streams.items():
                with open(os.path.join(self.dir, f"{key}.{ext}"), "wb") as f:
                    f.write(data)
            with open(os.path.join(self.dir, f"{key}.json"), "w") as f:
                json.dump(meta, f, default=str)
        self.meta_writer.write(meta)


class DummySampleWriter(_BaseWriter):
    """No-op payload writer ("useful for benchmarks", ref README:76)."""

    def write(self, streams, key, meta):
        self.meta_writer.write(meta)


class TFRecordSampleWriter(_BaseWriter):
    def __init__(self, *args, **kwargs):
        try:
            import tensorflow  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "tfrecord writer requires tensorflow (not in this image); "
                "use output_format='webdataset'") from e
        super().__init__(*args, **kwargs)


WRITERS = {
    "webdataset": WebDatasetSampleWriter,
    "parquet": ParquetSampleWriter,
    "files": FilesSampleWriter,
    "dummy": DummySampleWriter,
    "tfrecord": TFRecordSampleWriter,
}
