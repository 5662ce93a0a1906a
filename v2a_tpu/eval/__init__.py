from v2a_tpu.eval.harness import EvalConfig, Evaluator  # noqa: F401
