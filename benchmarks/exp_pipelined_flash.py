"""EXPERIMENT: software-pipelined flash forward (deferred softmax).

Hypothesis: the fused kernel is VPU-bound once the QK matmul runs at the
int8 MXU rate — the per-step chain QK -> softmax -> PV serializes the MXU
and VPU.  Restructure so grid step j computes QK_j (MXU) while running
softmax_{j-1} (VPU) and PV_{j-1} (MXU): the independent QK_j can overlap
the VPU pass, hiding most of the softmax/convert cost.

Mechanics: KV grid gets one extra drain step; K's index map fetches block
j, V's fetches block j-1; raw QK scores land in a parity-double-buffered
VMEM scratch and are consumed one step later.

Run: python benchmarks/exp_pipelined_flash.py  (on the TPU)
"""

import sys, time, functools, math

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LOG2E = math.log2(math.e)


def _pipelined_kernel(
    sq_ref, sk_ref, q_ref, k_ref, v_ref, o_ref,
    s_scr, m_scr, l_scr, acc_scr,
    *, int8: bool, sm_scale: float, block_q: int, block_kv: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    j = pl.program_id(3)
    n = pl.num_programs(3) - 1  # real KV blocks; last step drains

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # ---- A_j: QK matmul for block j into the parity slot (independent of
    # everything below -> Mosaic may overlap it with the VPU pass) ----
    @pl.when(j < n)
    def _qk():
        if int8:
            s_scr[j % 2] = jax.lax.dot_general(
                q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            s_scr[j % 2] = jax.lax.dot_general(
                q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(s_scr.dtype)

    # ---- B_{j-1} + C_{j-1}: softmax + PV for the previous block ----
    @pl.when(j > 0)
    def _softmax_pv():
        # Head-wise scale fold (scales are ones in the bf16 run).
        base = sm_scale * LOG2E * sq_ref[b, h] * sk_ref[b, h]
        s = s_scr[(j + 1) % 2].astype(jnp.float32) * base
        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_scr[:] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[:] = m_next
        v = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha[:, :1] + pv

    @pl.when(j == n)
    def _epilogue():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[:] * l_inv).astype(o_ref.dtype)


def pipelined_flash(q, k, v, scale_q=None, scale_k=None, *, block_q=1024,
                    block_kv=2048, sm_scale=None):
    batch, heads, q_len, d = q.shape
    kv_len = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    int8 = q.dtype == jnp.int8
    if scale_q is None:
        scale_q = jnp.ones((batch, heads), jnp.float32)
        scale_k = jnp.ones((batch, heads), jnp.float32)
    n_kv = kv_len // block_kv
    grid = (batch, heads, q_len // block_q, n_kv + 1)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [
        smem, smem,
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec(
            (1, 1, block_kv, d),
            lambda b, h, i, j: (b, h, jnp.minimum(j, n_kv - 1), 0),
        ),
        pl.BlockSpec(
            (1, 1, block_kv, d),
            lambda b, h, i, j: (b, h, jnp.maximum(j - 1, 0), 0),
        ),
    ]
    kernel = functools.partial(
        _pipelined_kernel, int8=int8, sm_scale=float(sm_scale),
        block_q=block_q, block_kv=block_kv,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((batch, heads, q_len, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, block_q, block_kv),
                       jnp.int32 if int8 else jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(scale_q.astype(jnp.float32), scale_k.astype(jnp.float32), q, k, v)


def bench(fn, q, k, v, iters=8):
    @jax.jit
    def run_n(q, k, v):
        def body(carry, _):
            o = fn(q + carry.astype(q.dtype), k, v)
            return jnp.float32(o[0, 0, 0, 0]) * 0.0, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run_n(q, k, v))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_n(q, k, v))
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[1]


def main():
    import numpy as np
    from quantumattention_tpu.ops.quant import quantize_head_wise
    from quantumattention_tpu.ops.sdpa import sdpa_reference

    B, H, S, D = 16, 16, 8192, 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    qf = jax.random.normal(k1, (B, H, S, D), jnp.float32)
    kf = jax.random.normal(k2, (B, H, S, D), jnp.float32)
    v = jax.random.normal(k3, (B, H, S, D), jnp.bfloat16)
    q8, sq = quantize_head_wise(qf, jnp.int8)
    k8, sk = quantize_head_wise(kf, jnp.int8)
    qb = qf.astype(jnp.bfloat16)
    kb = kf.astype(jnp.bfloat16)
    flops = 4 * B * H * S * S * D

    # Correctness check at small scale first.
    qs, ks_, vs_ = qb[:1, :2, :2048], kb[:1, :2, :2048], v[:1, :2, :2048]
    out = pipelined_flash(qs, ks_, vs_)
    ref = sdpa_reference(qs, ks_, vs_)
    err = float(jnp.sqrt(jnp.mean(
        (out.astype(jnp.float32) - ref.astype(jnp.float32)) ** 2)))
    print(f"bf16 pipelined rmse={err:.5f}", flush=True)
    assert err < 1e-2

    q8s, k8s = q8[:1, :2, :2048], k8[:1, :2, :2048]
    out8 = pipelined_flash(q8s, k8s, vs_, sq[:1, :2], sk[:1, :2])
    err8 = float(jnp.sqrt(jnp.mean(
        (out8.astype(jnp.float32) - ref.astype(jnp.float32)) ** 2)))
    print(f"int8 pipelined rmse={err8:.5f}", flush=True)
    assert err8 < 1e-2

    for name, fn, args in [
        ("bf16 pipelined", lambda q, k, v: pipelined_flash(q, k, v), (qb, kb, v)),
        ("int8 pipelined", lambda q, k, v: pipelined_flash(q, k, v, sq, sk),
         (q8, k8, v)),
    ]:
        for bq, bkv in [(1024, 2048), (1024, 1024), (512, 1024)]:
            f = lambda q, k, v: pipelined_flash(
                q, k, v, *( (sq, sk) if "int8" in name else ()),
                block_q=bq, block_kv=bkv)
            try:
                t = bench(f, *args)
                print(f"{name} ({bq}x{bkv}): {t*1e3:.2f} ms  "
                      f"{flops/t/1e12:.1f} TFLOP/s", flush=True)
            except Exception as e:
                print(f"{name} ({bq}x{bkv}): FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
    print("done")


if __name__ == "__main__":
    main()
