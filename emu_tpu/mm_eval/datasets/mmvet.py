"""MM-Vet eval (ref Emu1/mm_eval/datasets/mmvet.py): open-ended generation,
results dumped as the grader-submission JSON."""

from __future__ import annotations

from emu_tpu.mm_eval.datasets import base

ANNOTATIONS = "mm-vet/mm-vet.json"
IMAGE_DIR = "mm-vet/images"


def mmvet_dataloader(root_path: str, batch_size: int):
    data = base.load_json(root_path, ANNOTATIONS)
    from emu_tpu.mm_eval.engine import image_placeholder, image_system_msg
    samples = [{"id": k, **v} for k, v in data.items()]

    def make(sample, index):
        question = sample["question"].replace("<image>", image_placeholder)
        if image_placeholder not in question:
            question = f"{image_placeholder} {question}"
        prompt = image_system_msg + f" [USER]: {question} [ASSISTANT]:"
        return {"image": base.open_image(root_path, IMAGE_DIR,
                                         sample["imagename"]),
                "instance_id": sample["id"], "prompt": prompt}

    loader = base.batched_loader(samples, batch_size, make)
    inference_kwargs = dict(num_beams=5, max_new_tokens=128,
                            inference_type="generation")
    return loader, inference_kwargs, {}


def mmvet_results_processor(results, output_dir):
    save = {r["instance_id"]: r["prediction"].strip() for r in results}
    path = base.dump_json(save, output_dir, "mmvet_answer.json")
    print(f"MM-Vet predictions written to {path} (GPT-graded benchmark)")
    return {"n": len(save), "file": path}
