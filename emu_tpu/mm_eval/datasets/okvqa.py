"""OK-VQA zero-shot eval (ref Emu1/mm_eval/datasets/okvqa.py)."""

from __future__ import annotations

import os

from emu_tpu.mm_eval.datasets import base, vqav2

QUESTIONS = "okvqa/OpenEnded_mscoco_val2014_questions.json"
ANNOTATIONS = "okvqa/mscoco_val2014_annotations.json"
IMAGE_DIR = "okvqa/val2014"


def okvqa_dataloader(root_path: str, batch_size: int):
    loader = vqav2._make_loader(root_path, batch_size, QUESTIONS, IMAGE_DIR,
                                "COCO_val2014_{:012d}.jpg")
    inference_kwargs = dict(num_beams=5, max_new_tokens=20,
                            inference_type="generation")
    return loader, inference_kwargs, {"annotation_file": os.path.join(
        root_path, ANNOTATIONS)}


def okvqa_results_processor(results, output_dir, annotation_file=None):
    # OK-VQA uses the same consensus accuracy with stemmed answers in the
    # official kit; we apply the shared normalization path.
    return vqav2.vqav2_results_processor(results, output_dir,
                                         annotation_file)
