from emu_tpu.mm_eval.engine import evaluate_engine, EvalArguments  # noqa: F401
