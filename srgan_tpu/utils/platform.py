"""Platform-selection helpers.

The axon dev-tunnel boot hook (its ``sitecustomize``) registers the TPU
backend in a way that overrides the standard ``JAX_PLATFORMS`` environment
variable: a user running ``JAX_PLATFORMS=cpu python -m srgan_tpu.cli ...``
would silently still execute (and remote-compile) on the TPU. Entry points
call :func:`honor_jax_platforms_env` first so the documented env var keeps
its standard JAX meaning.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Re-apply ``JAX_PLATFORMS`` from the environment through jax.config.

    No-op when the variable is unset/empty, already in effect, or when a
    backend has initialized (jax raises then; we leave things as they are).
    """
    val = os.environ.get("JAX_PLATFORMS")
    if not val:
        return
    try:
        import jax

        if (jax.config.jax_platforms or "") != val:
            jax.config.update("jax_platforms", val)
    except Exception:
        pass


# bf16 dense peak TFLOPS per chip, by device kind. The single source of
# truth for MFU reporting (bench.py and scripts/mfu_report.py both read it —
# ADVICE r3: a hardcoded v5e constant misreports MFU on other TPU
# generations). Override with the PEAK_TFLOPS env var.
_PEAK_BF16_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v5p": 459.0,
    "TPU v6e": 918.0,
}


def peak_bf16_tflops(device) -> float | None:
    """Known bf16 dense peak for ``device`` (a jax Device), or None when the
    device kind is unrecognized — callers must then omit MFU rather than
    report a number against the wrong ceiling."""
    env = os.environ.get("PEAK_TFLOPS")
    if env:
        return float(env)
    kind = getattr(device, "device_kind", "")
    for prefix, peak in _PEAK_BF16_TFLOPS.items():
        if kind.startswith(prefix):
            return peak
    return None


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: recompiles of the same executables
    (re-running a bench, resuming training, repeat evals) become loads
    instead of multi-minute tunnel compiles. Opt out with
    SRGAN_TPU_NO_COMPILE_CACHE=1; relocate with SRGAN_TPU_COMPILE_CACHE."""
    if os.environ.get("SRGAN_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    path = os.environ.get(
        "SRGAN_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/srgan_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
