"""Compiled-mode (real TPU) validation of the decode kernel's grid modes.

CLAUDE.md TPU queue item (b): the multi-query (q_tokens > 1, speculative
verification) and WINDOW (j-innermost grid + scalar-clamped index maps)
modes were interpret-tested only.  This script runs each variant COMPILED
on the chip against the fp32 oracle, then measures whether the window
mode's below-window fetch elision actually lands (windowed decode must
stream ~window bytes/step, not the whole cache).

Chained in ONE process (one TPU client at a time — CLAUDE.md).
Run: python benchmarks/validate_decode_modes.py > /tmp/validate_decode.log 2>&1
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from quantumattention_tpu.ops.decode import decode_attention
from quantumattention_tpu.ops.quant import dynamically_quantize_int8
from quantumattention_tpu.ops.sdpa import sdpa_reference
from quantumattention_tpu.utils.profiling import chain_bench

FAILED = []


def rmse(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def check(name, got, ref, tol=1e-2):
    r = rmse(got, ref)
    ok = r < tol
    print(f"[{'PASS' if ok else 'FAIL'}] {name}: rmse={r:.2e} tol={tol}",
          flush=True)
    if not ok:
        FAILED.append(name)


def stamp(msg):
    print(f"--- {msg} ({time.strftime('%H:%M:%S')})", flush=True)


def multi_query_oracle(q, kraw, vraw, lengths, T, G):
    B, Hq = q.shape[0], q.shape[1]
    D = q.shape[-1]
    ref = np.zeros((B, Hq, T, D), np.float32)
    for b in range(B):
        for t in range(T):
            n = int(lengths[b]) - (T - 1 - t)
            o = sdpa_reference(
                q[b][None, :, t : t + 1, :],
                jnp.repeat(kraw[b][None, :, :n], G, 1),
                jnp.repeat(vraw[b][None, :, :n], G, 1),
            )
            ref[b, :, t] = np.asarray(o[0, :, 0], np.float32)
    return ref


def window_oracle(q, kraw, vraw, lengths, left, G):
    B, Hq, D = q.shape
    ref = np.zeros((B, Hq, D), np.float32)
    for b in range(B):
        n = int(lengths[b])
        if n == 0:
            continue
        lo = max(0, n - 1 - left)
        o = sdpa_reference(
            q[b][None, :, None, :],
            jnp.repeat(kraw[b][None, :, lo:n], G, 1),
            jnp.repeat(vraw[b][None, :, lo:n], G, 1),
        )
        ref[b] = np.asarray(o[0, :, 0], np.float32)
    return ref


def main():
    print(f"devices: {jax.devices()}", flush=True)

    # ---- 1. multi-query (speculative verification), int8 cache ----
    stamp("compile+run: multi-query int8 (T=4, GQA 8/2, D=128)")
    B, Hq, Hkv, D, S, T = 3, 8, 2, 128, 512, 4
    G = Hq // Hkv
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, Hq, T, D), jnp.float32)
    kraw = jax.random.normal(k2, (B, Hkv, S, D), jnp.float32)
    vraw = jax.random.normal(k3, (B, Hkv, S, D), jnp.float32)
    lengths = jnp.array([100 + T, 37 + T, T], jnp.int32)
    kc, ks = dynamically_quantize_int8(kraw)
    vc, vs = dynamically_quantize_int8(vraw)
    out = decode_attention(
        q.astype(jnp.bfloat16), kc, vc, lengths,
        k_scale=ks, v_scale=vs, block_kv=128, block_batch=1,
        interpret=False,
    )
    check("multi-query int8 T=4",
          out, multi_query_oracle(q, kraw, vraw, lengths, T, G))

    # ---- 2. multi-query, bf16 cache, engine-default block (T=8) ----
    stamp("compile+run: multi-query bf16 (T=8, default blocks)")
    T2 = 8
    q2 = jax.random.normal(k1, (B, Hq, T2, D), jnp.float32)
    lengths2 = jnp.array([200 + T2, 64 + T2, T2], jnp.int32)
    out = decode_attention(
        q2.astype(jnp.bfloat16), kraw.astype(jnp.bfloat16),
        vraw.astype(jnp.bfloat16), lengths2, interpret=False,
    )
    check("multi-query bf16 T=8 default-blocks",
          out, multi_query_oracle(q2, kraw, vraw, lengths2, T2, G))

    # ---- 3. window mode, bf16, ragged ----
    stamp("compile+run: window bf16 ragged (left=31)")
    Bw, Hkvw, Sw, Dw = 3, 2, 512, 64
    Hqw, left = 4, 31
    Gw = Hqw // Hkvw
    w1, w2, w3 = jax.random.split(jax.random.PRNGKey(2), 3)
    qw = jax.random.normal(w1, (Bw, Hqw, Dw), jnp.float32)
    kw = jax.random.normal(w2, (Bw, Hkvw, Sw, Dw), jnp.float32)
    vw = jax.random.normal(w3, (Bw, Hkvw, Sw, Dw), jnp.float32)
    lw = jnp.array([512, 200, 16], jnp.int32)
    out = decode_attention(
        qw.astype(jnp.bfloat16), kw.astype(jnp.bfloat16),
        vw.astype(jnp.bfloat16), lw, block_kv=128, window=(left, 0),
        interpret=False,
    )
    check("window bf16 left=31", out, window_oracle(qw, kw, vw, lw, left, Gw))

    # ---- 4. window mode, int8 + block_batch=2, ragged ----
    stamp("compile+run: window int8 bb=2 ragged (left=63)")
    Bq, Hkvq, Sq, Dq = 4, 2, 768, 128
    Hqq, left2 = 8, 63
    Gq = Hqq // Hkvq
    s1, s2, s3 = jax.random.split(jax.random.PRNGKey(5), 3)
    qq = jax.random.normal(s1, (Bq, Hqq, Dq), jnp.float32)
    kq = jax.random.normal(s2, (Bq, Hkvq, Sq, Dq), jnp.float32)
    vq = jax.random.normal(s3, (Bq, Hkvq, Sq, Dq), jnp.float32)
    lq = jnp.array([768, 700, 130, 0], jnp.int32)
    kqc, kqs = dynamically_quantize_int8(kq)
    vqc, vqs = dynamically_quantize_int8(vq)
    out = decode_attention(
        qq.astype(jnp.bfloat16), kqc, vqc, lq,
        k_scale=kqs, v_scale=vqs, block_kv=128, block_batch=2,
        window=(left2, 0), interpret=False,
    )
    check("window int8 bb=2 left=63",
          out, window_oracle(qq, kq, vq, lq, left2, Gq))
    if not np.all(np.asarray(out[3], np.float32) == 0.0):
        print("[FAIL] window int8: zero-length row not zero", flush=True)
        FAILED.append("window-zero-row")

    # ---- 5. multi-query x window interaction ----
    stamp("compile+run: multi-query T=4 + window left=63, int8")
    qmw = jax.random.normal(s1, (Bq, Hqq, 4, Dq), jnp.float32)
    lmw = jnp.array([768, 700, 130, 4], jnp.int32)
    out = decode_attention(
        qmw.astype(jnp.bfloat16), kqc, vqc, lmw,
        k_scale=kqs, v_scale=vqs, block_kv=128, block_batch=1,
        window=(left2, 0), interpret=False,
    )
    ref = np.zeros((Bq, Hqq, 4, Dq), np.float32)
    for b in range(Bq):
        for t in range(4):
            n = int(lmw[b]) - (4 - 1 - t)
            lo = max(0, n - 1 - left2)
            o = sdpa_reference(
                qmw[b][None, :, t : t + 1, :],
                jnp.repeat(kq[b][None, :, lo:n], Gq, 1),
                jnp.repeat(vq[b][None, :, lo:n], Gq, 1),
            )
            ref[b, :, t] = np.asarray(o[0, :, 0], np.float32)
    check("multi-query T=4 + window", out, ref)

    # ---- 6. window fetch-elision timing ----
    # Full-cache decode streams B*Hkv*S*D bytes/step; a (left=1023) window
    # with the clamped index map should stream ~window bytes.  If the
    # elision lands, windowed ms/step << full ms/step (~S/window ratio,
    # floored by fixed overhead).
    stamp("timing: window fetch elision (S=8192 vs left=1023), int8")
    Bt, Hkvt, Hqt, Dt, St = 32, 8, 32, 128, 8192
    t1, t2, t3 = jax.random.split(jax.random.PRNGKey(9), 3)
    qt = jax.random.normal(t1, (Bt, Hqt, Dt), jnp.bfloat16)
    ktc = jax.random.randint(t2, (Bt, Hkvt, St, Dt), -127, 127, jnp.int8)
    vtc = jax.random.randint(t3, (Bt, Hkvt, St, Dt), -127, 127, jnp.int8)
    kts = jnp.full((Bt, Hkvt, St), 0.01, jnp.float32)
    vts = jnp.full((Bt, Hkvt, St), 0.01, jnp.float32)
    lt = jnp.full((Bt,), St, jnp.int32)

    t_full = chain_bench(
        lambda q, k, v, ks, vs, l: decode_attention(
            q, k, v, l, k_scale=ks, v_scale=vs, interpret=False
        ),
        (qt, ktc, vtc, kts, vts, lt), iters=128,
    )
    t_win = chain_bench(
        lambda q, k, v, ks, vs, l: decode_attention(
            q, k, v, l, k_scale=ks, v_scale=vs, window=(1023, 0),
            interpret=False
        ),
        (qt, ktc, vtc, kts, vts, lt), iters=128,
    )
    bytes_full = Bt * Hkvt * St * Dt * 2 + Bt * Hkvt * St * 4 * 2
    print(
        f"full:   {t_full*1e3:.3f} ms/step ({bytes_full/t_full/1e9:.0f} GB/s"
        f" if full stream)\n"
        f"window: {t_win*1e3:.3f} ms/step  speedup {t_full/t_win:.2f}x "
        f"(ideal ~{St/1024:.0f}x minus fixed overhead)",
        flush=True,
    )
    if t_win < 0.6 * t_full:
        print("[PASS] window fetch elision lands (>1.67x)", flush=True)
    else:
        print("[WARN] window mode NOT faster — fetch elision may not land",
              flush=True)

    print(f"\nDONE failed={FAILED}", flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
