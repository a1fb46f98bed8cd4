"""VQAv2 zero-shot eval (ref Emu1/mm_eval/datasets/vqav2.py)."""

from __future__ import annotations

import os

from emu_tpu.mm_eval.datasets import base

QUESTIONS = "vqav2/v2_OpenEnded_mscoco_val2014_questions.json"
ANNOTATIONS = "vqav2/v2_mscoco_val2014_annotations.json"
IMAGE_DIR = "vqav2/val2014"

VQA_PROMPT = (" [USER]: {placeholder} based on the content of the image "
              "and common sense, please provide an accurate answer "
              "consisting of only one word or phrase. {question} "
              "[ASSISTANT]: the answer is:")


def _make_loader(root_path, batch_size, questions_rel, image_dir,
                 image_name_fmt):
    qs = base.load_json(root_path, questions_rel)["questions"]
    from emu_tpu.mm_eval.engine import image_placeholder, image_system_msg

    def make(sample, index):
        prompt = image_system_msg + VQA_PROMPT.format(
            placeholder=image_placeholder, question=sample["question"])
        img = image_name_fmt.format(sample["image_id"])
        return {"image": base.open_image(root_path, image_dir, img),
                "instance_id": sample["question_id"], "prompt": prompt}

    return base.batched_loader(qs, batch_size, make)


def vqav2_dataloader(root_path: str, batch_size: int):
    loader = _make_loader(root_path, batch_size, QUESTIONS, IMAGE_DIR,
                          "COCO_val2014_{:012d}.jpg")
    inference_kwargs = dict(num_beams=5, max_new_tokens=20,
                            inference_type="generation")
    return loader, inference_kwargs, {"annotation_file": os.path.join(
        root_path, ANNOTATIONS)}


def vqav2_results_processor(results, output_dir, annotation_file=None):
    save = [{"question_id": r["instance_id"],
             "answer": base.short_answer(r["prediction"])}
            for r in results]
    base.dump_json(save, output_dir, "vqav2_answer.json")
    if annotation_file and os.path.exists(annotation_file):
        import json
        from emu_tpu.mm_eval.metrics.vqa import evaluate_vqa
        with open(annotation_file) as f:
            anns = json.load(f)["annotations"]
        gt = {a["question_id"]: [x["answer"] for x in a["answers"]]
              for a in anns}
        metrics = evaluate_vqa(save, gt)
        print(f"VQAv2 accuracy: {metrics['overall']:.2f} (n={metrics['n']})")
        return metrics
    return {"n": len(save)}
