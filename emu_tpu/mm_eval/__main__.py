"""CLI: `python -m emu_tpu.mm_eval --dataset_name coco --root_path ...`

≙ the reference's `eval.py` + HfArgumentParser entry
(ref Emu1/eval.py:1-7, mm_eval/__init__.py:41-51).
"""

import argparse

import jax
import jax.numpy as jnp

from emu_tpu.config import Emu1Config
from emu_tpu.mm_eval.engine import EvalArguments, evaluate_engine
from emu_tpu.mm_eval.model import EmuEvalModel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_name", default="coco")
    p.add_argument("--root_path", default="./benchmarks")
    p.add_argument("--output_path", default="./output/")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--instruct", action="store_true", default=True)
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--tokenizer_path", default=None)
    args = p.parse_args()

    cfg = Emu1Config(instruct=args.instruct)
    if args.ckpt_path:
        from emu_tpu.checkpoint import load_emu1_checkpoint
        params = load_emu1_checkpoint(args.ckpt_path, cfg, jnp.bfloat16)
    else:
        print("WARNING: no --ckpt_path; evaluating RANDOM weights")
        from emu_tpu.models import emu1
        params = emu1.init(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    tokenizer = None
    if args.tokenizer_path:
        from emu_tpu.tokenization import EmuTokenizer
        tokenizer = EmuTokenizer.emu1(args.tokenizer_path,
                                      instruct=args.instruct)
    model = EmuEvalModel(params, cfg, tokenizer)
    metric = evaluate_engine(model, EvalArguments(
        output_path=args.output_path, dataset_name=args.dataset_name,
        batch_size=args.batch_size, root_path=args.root_path))
    print("metric:", metric)


if __name__ == "__main__":
    main()
