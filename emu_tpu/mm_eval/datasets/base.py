"""Shared dataset plumbing: lazy image batches + per-process sharding."""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Iterator, List


def load_json(root: str, rel: str):
    with open(os.path.join(root, rel)) as f:
        return json.load(f)


def batched_loader(samples: List[Dict], batch_size: int,
                   make_sample: Callable[[Dict, int], Dict]
                   ) -> Iterator[List[Dict]]:
    """Shard across processes, load images lazily per batch.

    ≙ DataLoader(DistributedSampler(...), collate_fn=identity) in the
    reference (ref Emu1/mm_eval/datasets/coco.py:64-82).
    """
    from emu_tpu.mm_eval.engine import shard_for_process
    indexed = shard_for_process(list(enumerate(samples)))
    for start in range(0, len(indexed), batch_size):
        yield [make_sample(s, i) for i, s in indexed[start:start + batch_size]]


def sharded(samples: List) -> List:
    from emu_tpu.mm_eval.engine import shard_for_process
    return shard_for_process(samples)


def open_image(root: str, *parts: str):
    from PIL import Image
    return Image.open(os.path.join(root, *parts)).convert("RGB")


def short_answer(answer: str) -> str:
    """VQA answer postprocessing (ref Emu1/mm_eval/datasets/utils.py)."""
    answer = answer.split("\n")[0].split(". ")[0].split('"')[0]
    answer = answer.split(", ")[0].strip().lower()
    if answer and answer[-1] == ".":
        answer = answer[:-1]
    for prefix in ("it is ", "it's ", "a ", "an ", "the "):
        if answer.startswith(prefix):
            answer = answer.replace(prefix, "", 1)
            break
    return answer


def dump_json(results, output_dir: str, name: str) -> str:
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, name)
    with open(path, "w") as f:
        json.dump(results, f)
    return path
