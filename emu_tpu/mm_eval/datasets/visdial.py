"""VisDial eval: classification over 100 answer options by LM loss
(ref Emu1/mm_eval/datasets/visdial.py, prediction via PredictClassMixin)."""

from __future__ import annotations

from emu_tpu.mm_eval.datasets import base

ANNOTATIONS = "visdial/visdial_1.0_val.json"
IMAGE_DIR = "visdial/VisualDialog_val2018"


def visdial_dataloader(root_path: str, batch_size: int):
    data = base.load_json(root_path, ANNOTATIONS)["data"]
    answers, questions = data["answers"], data["questions"]
    from emu_tpu.mm_eval.engine import image_placeholder, image_system_msg

    samples = []
    for dialog in data["dialogs"]:
        for round_idx, turn in enumerate(dialog["dialog"]):
            samples.append({"image_id": dialog["image_id"],
                            "dialog": dialog["dialog"][:round_idx + 1],
                            "caption": dialog["caption"]})

    def make(sample, index):
        prompt = image_system_msg + f" [USER]: {image_placeholder}</s>"
        for turn in sample["dialog"][:-1]:
            q = questions[turn["question"]]
            a = answers[turn["answer"]]
            prompt += f" [USER]: {q}? [ASSISTANT]: {a}.</s>"
        last = sample["dialog"][-1]
        prompt += f" [USER]: {questions[last['question']]}? [ASSISTANT]:"
        options = [answers[i] for i in last["answer_options"]]
        img = f"VisualDialog_val2018_{sample['image_id']:012d}.jpg"
        return {"image": base.open_image(root_path, IMAGE_DIR, img),
                "instance_id": index, "prompt": prompt, "options": options}

    loader = base.batched_loader(samples, batch_size, make)
    inference_kwargs = dict(inference_type="classification", n_segments=100)
    return loader, inference_kwargs, {}


def visdial_results_processor(results, output_dir):
    save = [{"instance_id": r["instance_id"], "ranks": r["prediction"]}
            for r in results]
    path = base.dump_json(save, output_dir, "visdial_answer.json")
    print(f"VisDial ranks written to {path} (server-scored benchmark)")
    return {"n": len(save), "file": path}
