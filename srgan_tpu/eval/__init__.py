from srgan_tpu.eval.evaluation import evaluate_model
from srgan_tpu.eval.inference import Upscaler, upscale

__all__ = ["evaluate_model", "Upscaler", "upscale"]
