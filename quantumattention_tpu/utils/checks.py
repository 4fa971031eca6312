"""Capability / feature gates.

TPU-native analogue of the reference's version & CUDA-capability predicates
(reference: src/quantum_attn/utils/checks.py:9-75).  On TPU the interesting
axes are: which backend the arrays live on (tpu vs cpu interpret), the TPU
generation (for 8-bit MXU throughput), and the JAX version.

All predicates are pure Python evaluated at trace time, so under ``jax.jit``
they constant-fold — the JAX analogue of the reference's
``assume_constant_result`` wrappers (checks.py:9-15).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.cache
def jax_version_tuple() -> tuple:
    return tuple(int(p) for p in jax.__version__.split(".")[:3])


def jax_version_at_least(major: int, minor: int, patch: int = 0) -> bool:
    return jax_version_tuple() >= (major, minor, patch)


@functools.cache
def default_backend() -> str:
    return jax.default_backend()


def is_tpu_backend() -> bool:
    return default_backend() == "tpu"


def is_cpu_backend() -> bool:
    return default_backend() == "cpu"


@functools.cache
def tpu_generation() -> int:
    """Best-effort TPU generation number (0 when not on TPU).

    The analogue of the reference's ``cuda_capability_compare`` gate
    (checks.py:61-64) which it uses to require Hopper (SM90) for the fused
    kernels; here it gates 8-bit-MXU paths by TPU generation.
    """
    if not is_tpu_backend():
        return 0
    import re

    kind = jax.devices()[0].device_kind.lower()
    # Matches both "tpu v5 lite" style and bare "tpu7x" style names.
    m = re.search(r"v?(\d+)", kind.replace("tpu", " ", 1))
    return int(m.group(1)) if m else 0


def supports_int8_mxu() -> bool:
    """Whether the MXU runs int8 x int8 -> int32 at >= bf16 rate (v5+)."""
    return tpu_generation() >= 5


def supports_fp8_mxu() -> bool:
    """Whether the MXU multiplies fp8 e4m3 operands natively (v6e+).

    The TPU mirror of the reference's Hopper CC >= 9.0 gate for its fp8
    WGMMA kernel (reference checks.py:61-64, tk/attention.py:233).  v5e has
    no fp8 MXU mode — 8-bit throughput there comes from the int8 path.
    """
    return tpu_generation() >= 6


def fp8_dot_enabled() -> bool:
    """Resolve config.attention.fp8_dot ("auto" => generation gate).

    Forcing it on (config.patch({"attention.fp8_dot": True})) lets CPU
    interpret-mode tests exercise the fp8-native dot path that compiled
    kernels take on v6e+.
    """
    from .. import config

    mode = config.attention.fp8_dot
    if mode == "auto":
        return supports_fp8_mxu()
    return bool(mode)


def supports_fp8_storage() -> bool:
    """float8_e4m3fn arrays are supported by this jax/backend."""
    try:
        jnp.zeros((1,), jnp.float8_e4m3fn)
        return True
    except TypeError:  # pragma: no cover
        return False


def is_fp8_dtype(dtype) -> bool:
    """Predicate over FP8 dtypes (reference: utils/types.py:1-3)."""
    return jnp.issubdtype(dtype, jnp.floating) and jnp.dtype(dtype).itemsize == 1


def is_8bit_dtype(dtype) -> bool:
    """Predicate over any 8-bit dtype (reference: utils/types.py:5-6)."""
    return jnp.dtype(dtype).itemsize == 1


def resolve_interpret(interpret) -> bool:
    """Resolve the config.interpret setting to a concrete bool.

    "auto" => interpret only when running on CPU (so correctness tests run
    without TPUs; SURVEY.md section 4 implication).
    """
    if interpret == "auto":
        return not is_tpu_backend()
    return bool(interpret)
