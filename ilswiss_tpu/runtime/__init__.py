from ilswiss_tpu.runtime.loop import OffPolicyLoop, OffPolicyConfig, RunnerState
from ilswiss_tpu.runtime.evaluator import make_evaluator
