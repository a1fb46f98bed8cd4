"""MMBench eval — the module the reference *imports but never shipped*
(Emu1/mm_eval/__init__.py:8 imports datasets.mmbench, which does not exist,
crashing eval.py). This is a working implementation of the standard
MMBench protocol: TSV rows with base64 images and A/B/C/D options, answers
ranked by LM loss over the options (single-pass; the official
circular-shift evaluation can be applied by the grader server).
"""

from __future__ import annotations

import base64
import io
import os

TSV = "mmbench/mmbench_dev.tsv"


def mmbench_dataloader(root_path: str, batch_size: int):
    import pandas as pd
    from PIL import Image
    from emu_tpu.mm_eval.datasets.base import batched_loader
    from emu_tpu.mm_eval.engine import image_placeholder, image_system_msg

    df = pd.read_csv(os.path.join(root_path, TSV), sep="\t")
    samples = df.to_dict("records")

    def make(sample, index):
        img = Image.open(io.BytesIO(
            base64.b64decode(sample["image"]))).convert("RGB")
        options = [sample[c] for c in ("A", "B", "C", "D")
                   if isinstance(sample.get(c), str)]
        question = sample["question"]
        hint = sample.get("hint")
        ctx = f"{hint} " if isinstance(hint, str) else ""
        prompt = (image_system_msg
                  + f" [USER]: {image_placeholder} {ctx}{question} "
                  "[ASSISTANT]:")
        return {"image": img, "instance_id": int(sample["index"]),
                "prompt": prompt, "options": options}

    loader = batched_loader(samples, batch_size, make)
    inference_kwargs = dict(inference_type="classification", n_segments=1)
    return loader, inference_kwargs, {}


def mmbench_results_processor(results, output_dir):
    from emu_tpu.mm_eval.datasets.base import dump_json
    letters = "ABCD"
    save = [{"index": r["instance_id"],
             "prediction": letters[r["prediction"][0]]}
            for r in results]
    path = dump_json(save, output_dir, "mmbench_answer.json")
    print(f"MMBench predictions written to {path}")
    return {"n": len(save), "file": path}
