"""VizWiz zero-shot eval (ref Emu1/mm_eval/datasets/vizwiz.py).

Two passes per question: open answer + Trie-constrained answerability
("yes"/"no"; ref mm_eval/models/emu.py:97-109 builds a Trie over candidate
continuations). Results are dumped as the server-submission JSON.
"""

from __future__ import annotations

from emu_tpu.mm_eval.datasets import base
from emu_tpu.mm_eval.datasets.vqav2 import VQA_PROMPT

QUESTIONS = "vizwiz/val.json"
IMAGE_DIR = "vizwiz/val"


def vizwiz_dataloader(root_path: str, batch_size: int):
    samples = base.load_json(root_path, QUESTIONS)
    from emu_tpu.mm_eval.engine import image_placeholder, image_system_msg

    def make(sample, index):
        prompt = image_system_msg + VQA_PROMPT.format(
            placeholder=image_placeholder, question=sample["question"])
        answerability = image_system_msg + (
            f" [USER]: {image_placeholder} based on the content of the "
            "image and common sense, please provide an accurate answer "
            f"consisting of only one word or phrase. {sample['question']}, "
            "is the answer known? [ASSISTANT]:")
        return {"image": base.open_image(root_path, IMAGE_DIR,
                                         sample["image"]),
                "instance_id": index, "prompt": prompt,
                "answerability_prompt": answerability,
                "image_name": sample["image"]}

    loader = base.batched_loader(samples, batch_size, make)
    inference_kwargs = dict(num_beams=5, max_new_tokens=20,
                            inference_type="generation",
                            answerability_candidates=("yes", "no"))
    return loader, inference_kwargs, {}


def vizwiz_results_processor(results, output_dir):
    save = []
    for r in results:
        row = {"image": r.get("image_name", r["instance_id"]),
               "answer": base.short_answer(r["prediction"])}
        if "answerability" in r:
            # constrained decode emits "yes"/"no" → answerability prob
            row["answerable"] = int("yes" in r["answerability"].lower())
        save.append(row)
    path = base.dump_json(save, output_dir, "vizwiz_answer.json")
    print(f"VizWiz predictions written to {path} (server-scored benchmark)")
    return {"n": len(save), "file": path}
