"""Pipeline telemetry (ref video2dataset/logger.py): CappedCounter,
SpeedLogger (videos/s, bytes/s, success rates) and per-shard status JSON
used for incremental resume."""

from __future__ import annotations

import json
import os
import time
from collections import Counter
from typing import Optional


class CappedCounter:
    """Frequency counter that prunes rare keys when it grows too large
    (ref logger.py:13-80)."""

    def __init__(self, max_size: int = 10 ** 5):
        self.max_size = max_size
        self.counter: Counter = Counter()

    def increment(self, key):
        if len(self.counter) >= self.max_size:
            self._prune()
        self.counter[key] += 1

    def _prune(self):
        keep = self.max_size // 2
        self.counter = Counter(dict(self.counter.most_common(keep)))

    def most_common(self, k: int):
        return self.counter.most_common(k)

    def dump(self) -> dict:
        return dict(self.counter)


class SpeedLogger:
    """Throughput tracker (ref logger.py:83-153)."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.start = time.perf_counter()
        self.count = self.success = self.failed = 0
        self.bytes = 0

    def __call__(self, success: bool, n_bytes: int = 0):
        self.count += 1
        self.bytes += n_bytes
        if success:
            self.success += 1
        else:
            self.failed += 1

    def stats(self) -> dict:
        dt = max(time.perf_counter() - self.start, 1e-9)
        return {
            "count": self.count,
            "success_rate": self.success / max(self.count, 1),
            "samples_per_s": self.count / dt,
            "mb_per_s": self.bytes / dt / 1e6,
        }

    def log(self):
        s = self.stats()
        print(f"[{self.prefix}] {s['count']} samples, "
              f"{s['samples_per_s']:.2f}/s, {s['mb_per_s']:.2f} MB/s, "
              f"success {100 * s['success_rate']:.1f}%")


class StatusTableLogger:
    """wandb run/table logging (ref logger.py:155-211); no-ops cleanly when
    wandb is absent (it is not bundled in this image)."""

    def __init__(self, project: str = "emu-tpu-data", enabled: bool = True):
        self.run = None
        if not enabled:
            return
        try:
            import wandb
            self.run = wandb.init(project=project, anonymous="allow")
        except Exception:  # noqa: BLE001
            self.run = None

    def log(self, stats: dict, step: Optional[int] = None):
        if self.run is not None:
            self.run.log(stats, step=step)

    def finish(self):
        if self.run is not None:
            self.run.finish()


def write_stats(output_folder: str, shard_id: int, count: int,
                successes: int, failed: int, duration: float,
                status_dict: Optional[CappedCounter] = None,
                oom_shard_count: int = 5):
    """Per-shard stats JSON — also the resume marker (ref logger.py:173-211,
    main.py:110-117)."""
    name = str(shard_id).zfill(oom_shard_count)
    stats = {
        "count": count, "successes": successes, "failed": failed,
        "duration": duration,
        "status_dict": status_dict.dump() if status_dict else {},
    }
    path = os.path.join(output_folder, f"{name}_stats.json")
    with open(path + ".tmp", "w") as f:
        json.dump(stats, f)
    os.replace(path + ".tmp", path)
    return path


def aggregate_stats(output_folder: str) -> dict:
    """Sum all per-shard stats JSONs into a run summary (≙ LoggerProcess
    aggregation across workers, ref logger.py:213-317)."""
    total = {"shards": 0, "count": 0, "successes": 0, "failed": 0,
             "duration": 0.0, "status_dict": {}}
    if not os.path.isdir(output_folder):
        return total
    for name in sorted(os.listdir(output_folder)):
        if not name.endswith("_stats.json"):
            continue
        with open(os.path.join(output_folder, name)) as f:
            s = json.load(f)
        total["shards"] += 1
        for k in ("count", "successes", "failed", "duration"):
            total[k] += s.get(k, 0)
        for k, v in s.get("status_dict", {}).items():
            total["status_dict"][k] = total["status_dict"].get(k, 0) + v
    if total["count"]:
        total["success_rate"] = total["successes"] / total["count"]
    return total


def done_shards(output_folder: str) -> set:
    """Scan for completed shards (incremental resume)."""
    done = set()
    if not os.path.isdir(output_folder):
        return done
    for name in os.listdir(output_folder):
        if name.endswith("_stats.json"):
            done.add(int(name.split("_")[0]))
    return done
