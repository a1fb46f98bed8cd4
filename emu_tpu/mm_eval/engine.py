"""Distributed zero-shot evaluation engine.

Behavioral model: `evaluate_engine` (ref Emu1/mm_eval/__init__.py:54-98) —
dataset registry → per-worker inference → all-gather → dedupe by
instance_id → rank-0 metrics. The NCCL process group + DistributedSampler
become jax.process_index()/process_count() round-robin sharding with a
JSON-over-allgather result merge (TPU hosts communicate over DCN through
jax's multihost utils; no torch.distributed).

Also fixes the reference's shipped bug: `mm_eval/__init__.py:8` imports a
nonexistent `datasets.mmbench` module, so the stock eval.py crashes —
our registry only lists datasets that exist.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

image_placeholder = "[IMG]" + "<image>" * 32 + "[/IMG]"
image_system_msg = (
    "You will be presented with an image: [IMG]ImageContent[/IMG]. "
    "You will be able to see the image after I provide it to you. "
    "Please answer my questions based on the given image.")


@dataclass
class EvalArguments:
    output_path: str = "./output/"
    dataset_name: str = "coco"
    batch_size: int = 1
    root_path: str = "./benchmarks"


def _registry():
    from emu_tpu.mm_eval.datasets import (coco, mmbench, mmvet, okvqa,
                                          visdial, vizwiz, vqav2)
    return {
        "coco": (coco.coco_dataloader, coco.coco_results_processor),
        "vqav2": (vqav2.vqav2_dataloader, vqav2.vqav2_results_processor),
        "okvqa": (okvqa.okvqa_dataloader, okvqa.okvqa_results_processor),
        "vizwiz": (vizwiz.vizwiz_dataloader, vizwiz.vizwiz_results_processor),
        "visdial": (visdial.visdial_dataloader,
                    visdial.visdial_results_processor),
        "mmvet": (mmvet.mmvet_dataloader, mmvet.mmvet_results_processor),
        "mmbench": (mmbench.mmbench_dataloader,
                    mmbench.mmbench_results_processor),
    }


def shard_for_process(samples: List, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> List:
    """Round-robin shard (the DistributedSampler equivalent)."""
    import jax
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return samples[pi::pc]


def allgather_results(results: List[Dict]) -> List[Dict]:
    """Merge per-host result lists (≙ dist.all_gather_object,
    ref mm_eval/__init__.py:77-82). JSON → padded uint8 → allgather."""
    import jax
    if jax.process_count() == 1:
        return results
    from jax.experimental import multihost_utils
    payload = json.dumps(results).encode()
    n = np.asarray([len(payload)], np.int32)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    buf = np.zeros((int(sizes.max()),), np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, np.uint8)
    all_bufs = np.asarray(multihost_utils.process_allgather(buf))
    merged = []
    for i, size in enumerate(sizes):
        merged.extend(json.loads(bytes(all_bufs[i][:int(size)]).decode()))
    return merged


def dedupe(results: List[Dict]) -> List[Dict]:
    out, seen = [], set()
    for r in results:
        if r["instance_id"] in seen:
            continue
        seen.add(r["instance_id"])
        out.append(r)
    return out


def evaluate_engine(model, eval_args: EvalArguments):
    """model: an object exposing `generate_batch(samples, **kwargs)` and
    `predict_batch(samples, **kwargs)` (see emu_tpu.mm_eval.model)."""
    import jax
    registry = _registry()
    loader_fn, processor = registry[eval_args.dataset_name]
    batches, inference_kwargs, processor_kwargs = loader_fn(
        eval_args.root_path, eval_args.batch_size)

    inference_type = inference_kwargs.pop("inference_type", "generation")
    answerability = inference_kwargs.pop("answerability_candidates", None)
    results = []
    for batch in batches:
        if inference_type == "classification":
            preds = model.predict_batch(batch, **inference_kwargs)
        else:
            preds = model.generate_batch(batch, **inference_kwargs)
        answerable = (model.generate_answerability(batch, answerability)
                      if answerability else [None] * len(batch))
        for sample, pred, ans in zip(batch, preds, answerable):
            r = {"instance_id": sample["instance_id"], "prediction": pred}
            if "image_name" in sample:
                r["image_name"] = sample["image_name"]
            if ans is not None:
                r["answerability"] = ans
            results.append(r)

    results = dedupe(allgather_results(results))
    if jax.process_index() == 0:
        return processor(results, eval_args.output_path, **processor_kwargs)
    return None
