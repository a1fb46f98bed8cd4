"""COCO caption zero-shot eval (ref Emu1/mm_eval/datasets/coco.py).

Karpathy-split annotations; beam-5, max 20, min 8, length_penalty −1;
metric via our own BLEU/CIDEr (reference uses pycocoevalcap).
"""

from __future__ import annotations

import os

from emu_tpu.mm_eval.datasets import base

SPLIT_PATHS = {
    "val": ("coco/annotations/coco_karpathy_val.json", "coco/images/"),
    "test": ("coco/annotations/coco_karpathy_test.json", "coco/images/"),
}


def coco_dataloader(root_path: str, batch_size: int, split: str = "test"):
    ann, img_dir = SPLIT_PATHS[split]
    samples = base.load_json(root_path, ann)
    from emu_tpu.mm_eval.engine import image_placeholder, image_system_msg

    def make(sample, index):
        image_id = int(sample["image"].split("/")[-1]
                       .replace(".jpg", "").split("_")[-1])
        prompt = image_system_msg
        prompt += (f" [USER]: {image_placeholder} please provide an "
                   "accurate and concise description of the given image. "
                   "[ASSISTANT]: the image depicts a photo of")
        return {"image": base.open_image(root_path, img_dir,
                                         sample["image"]),
                "instance_id": image_id, "prompt": prompt}

    loader = base.batched_loader(samples, batch_size, make)
    inference_kwargs = dict(num_beams=5, max_new_tokens=20, min_length=8,
                            length_penalty=-1.0,
                            inference_type="generation")
    return loader, inference_kwargs, {"gt_file": os.path.join(
        root_path, "coco/annotations/coco_karpathy_test_gt.json")}


def coco_results_processor(results, output_dir, gt_file=None):
    save = []
    for res in results:
        caption = res["prediction"].split("\n")[0].split(". ")[0]
        if caption and caption[-1] == ".":
            caption = caption[:-1]
        save.append({"image_id": res["instance_id"],
                     "caption": caption.lower()})
    base.dump_json(save, output_dir, "coco_answer.json")

    if gt_file and os.path.exists(gt_file):
        import json
        from emu_tpu.mm_eval.metrics.caption import evaluate_captions
        with open(gt_file) as f:
            gt = json.load(f)
        refs = {}
        if isinstance(gt, dict) and "annotations" in gt:
            for a in gt["annotations"]:
                refs.setdefault(str(a["image_id"]), []).append(a["caption"])
        metrics = evaluate_captions(save, refs)
        for k, v in metrics.items():
            print(f"{k}: {v:.3f}")
        return metrics
    return {"n": len(save)}
