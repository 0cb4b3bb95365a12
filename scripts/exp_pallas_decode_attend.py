"""Fresh Pallas probe of the decode prefix-attend on TODAY'S program shape.

VERDICT r4 #1b: the decode-ceiling closure leaned on a ROUND-2 Mosaic probe
("30-80x slower than XLA") that predates two rounds of program changes. This
re-probes with a fundamentally better kernel formulation than round 2's:

  - batch on the LANE dimension (512 lanes-worth of batch, full VPU width)
    instead of a grid step per batch row (round 2's shape wasted 124/128
    lanes per step);
  - flash-style two-level grid (batch blocks x capacity blocks) with running
    (max, sum, acc) scratch, exporting logsumexp so the tiny fresh-chunk
    attend + combine stay in XLA (matching the chunked-carry split in
    models/attention.py::_chunked_cache_attend);
  - caches pre-laid as (cap, d, b) so the kernel streams contiguous lanes —
    the relayout is NOT timed, making this an UPPER BOUND for a Pallas win
    (production would have to either pay it per chunk-merge or change
    write_kv's layout).

Shapes: the flagship decode step (batch 512, 4 heads, dim_head 64,
one_kv_head, cap 256, chunk 16, fp32) — one decoder layer's attend core.
Compares amortized wall of XLA's fused attend (the exact
_chunked_cache_attend math) vs pallas-prefix + XLA-fresh + combine, with a
numerical agreement check.

Run on the TPU:  timeout 3000 python scripts/exp_pallas_decode_attend.py
Results recorded in BASELINE.md round 5 (replaces the round-2 citation).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scoreperformer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

B, H, D = 512, 4, 64
CAP, CHUNK = 256, 16
BB, JB = 128, 64  # batch-lane block, capacity block
MASK_VALUE = -1e9


# ---------------------------------------------------------------- kernel ---
def _prefix_attend_kernel(q_ref, pk_ref, pv_ref, bias_ref,
                          o_ref, lse_ref, m_sc, l_sc, acc_sc):
    """One (batch-block, cap-block) grid step of the prefix attend.

    q_ref   (H, D, BB)   queries, scale pre-folded
    pk_ref  (JB, D, BB)  prefix keys for this cap block
    pv_ref  (JB, D, BB)  prefix values
    bias_ref(JB, H)      additive bias: ALiBi + key_valid mask (-1e9 stale);
                         stored key-major so the block is (JB, H) with H the
                         full trailing dim (TPU tiling: last two block dims
                         must divide (8, 128) or equal the array dims)
    o_ref   (H, D, BB)   combined prefix output (written at last cap block)
    lse_ref (H, BB)      logsumexp over prefix keys (written at last)
    scratch: m (H, BB), l (H, BB), acc (H, D, BB)
    """
    jc = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(jc == 0)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, MASK_VALUE)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    q = q_ref[:]          # (H, D, BB)
    pk = pk_ref[:]        # (JB, D, BB)
    pv = pv_ref[:]        # (JB, D, BB)
    bias = bias_ref[:]    # (JB, H)

    # dots[h, j, b] = sum_d q[h, d, b] * pk[j, d, b]  — VPU contraction with
    # batch on lanes; h is a tiny unrolled python loop
    dots = jnp.stack(
        [jnp.sum(pk * q[h][None], axis=1) + bias[:, h][:, None]
         for h in range(q.shape[0])],
        axis=0,
    )  # (H, JB, BB)

    m_old = m_sc[:]                                     # (H, BB)
    m_new = jnp.maximum(m_old, jnp.max(dots, axis=1))   # (H, BB)
    alpha = jnp.exp(m_old - m_new)                      # (H, BB)
    p = jnp.exp(dots - m_new[:, None, :])               # (H, JB, BB)
    l_sc[:] = l_sc[:] * alpha + jnp.sum(p, axis=1)
    # acc[h, d, b] = sum_j p[h, j, b] * pv[j, d, b]
    pv_acc = jnp.stack(
        [jnp.sum(pv * p[h][:, None, :], axis=0) for h in range(q.shape[0])],
        axis=0,
    )  # (H, D, BB)
    acc_sc[:] = acc_sc[:] * alpha[:, None, :] + pv_acc
    m_sc[:] = m_new

    @pl.when(jc == nc - 1)
    def _write():
        l = l_sc[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[:] = (acc_sc[:] / safe_l[:, None, :]).astype(o_ref.dtype)
        lse_ref[:] = m_sc[:] + jnp.log(safe_l)


def pallas_prefix_attend(q_t, pk_t, pv_t, bias):
    """q_t (H, D, B) scale-folded; pk_t/pv_t (CAP, D, B); bias (CAP, H).

    Returns (o (H, D, B), lse (H, B))."""
    nb, nc = B // BB, CAP // JB
    interpret = jax.default_backend() == "cpu"  # CPU correctness runs
    return pl.pallas_call(
        _prefix_attend_kernel,
        grid=(nb, nc),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((H, D, BB), lambda ib, jc: (0, 0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((JB, D, BB), lambda ib, jc: (jc, 0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((JB, D, BB), lambda ib, jc: (jc, 0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((JB, H), lambda ib, jc: (jc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((H, D, BB), lambda ib, jc: (0, 0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, BB), lambda ib, jc: (0, ib),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, D, B), jnp.float32),
            jax.ShapeDtypeStruct((H, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, BB), jnp.float32),
            pltpu.VMEM((H, BB), jnp.float32),
            pltpu.VMEM((H, D, BB), jnp.float32),
        ],
    )(q_t, pk_t, pv_t, bias)


# ------------------------------------------------------------- reference ---
def xla_attend(q, pk, pv, fk, fv, bias, key_valid, precision=None):
    """The exact _chunked_cache_attend core (attention.py:207-250), n=1.

    `precision=None` (DEFAULT) is the production program — TPU einsums run
    bf16 on the MXU. The Pallas kernel computes true fp32 on the VPU, so
    numerical agreement is checked against precision=HIGHEST (~1e-6) while
    timing compares against the production DEFAULT program."""
    scale = D**-0.5
    dots_p = jnp.einsum("bhd,jbd->bhj", q, pk, precision=precision)
    dots_f = jnp.einsum("bhd,jbd->bhj", q, fk, precision=precision)
    dots = jnp.concatenate([dots_p, dots_f], axis=-1) * scale
    dots = dots + bias[None]
    dots = jnp.where(key_valid[None, None, :], dots, MASK_VALUE)
    attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhj,jbd->bhd", attn[..., :CAP], pv, precision=precision)
    out = out + jnp.einsum("bhj,jbd->bhd", attn[..., CAP:], fv,
                           precision=precision)
    return out


def hybrid_attend(q_t, pk_t, pv_t, bias_p, q, fk, fv, bias_f, valid_f):
    """Pallas prefix + XLA fresh + logsumexp combine. The fresh side runs
    HIGHEST precision (chunk=16 — negligible cost) so the whole hybrid path
    is true fp32 like the kernel; agreement is then checked vs HIGHEST XLA."""
    hi = jax.lax.Precision.HIGHEST
    o_p, lse_p = pallas_prefix_attend(q_t, pk_t, pv_t, bias_p)
    scale = D**-0.5
    dots_f = jnp.einsum("bhd,jbd->bhj", q, fk, precision=hi) * scale + bias_f[None]
    dots_f = jnp.where(valid_f[None, None, :], dots_f, MASK_VALUE)
    m_f = jnp.max(dots_f, axis=-1)
    p_f = jnp.exp(dots_f - m_f[..., None])
    l_f = jnp.sum(p_f, axis=-1)
    o_f = jnp.einsum("bhj,jbd->bhd", p_f / l_f[..., None], fv, precision=hi)
    lse_f = m_f + jnp.log(l_f)                     # (B, H)
    lse_p_bh = lse_p.transpose(1, 0)               # (B, H)
    o_p_bh = o_p.transpose(2, 0, 1)                # (B, H, D)
    lse = jnp.logaddexp(lse_p_bh, lse_f)
    w_p = jnp.exp(lse_p_bh - lse)[..., None]
    w_f = jnp.exp(lse_f - lse)[..., None]
    return o_p_bh * w_p + o_f * w_f


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, D), jnp.float32)
    pk = jnp.asarray(rng.randn(CAP, B, D), jnp.float32)
    pv = jnp.asarray(rng.randn(CAP, B, D), jnp.float32)
    fk = jnp.asarray(rng.randn(CHUNK, B, D), jnp.float32)
    fv = jnp.asarray(rng.randn(CHUNK, B, D), jnp.float32)

    base, step = 200, 8  # prefix written to 200; decoding fresh slot 8
    # ALiBi-like per-head additive bias over key positions + validity masks
    slopes = 0.5 ** np.arange(1, H + 1)
    key_pos = np.concatenate([np.arange(CAP), base + np.arange(CHUNK)])
    pos_q = base + step
    alibi = -np.abs(pos_q - key_pos)[None] * slopes[:, None]  # (H, CAP+CHUNK)
    valid = np.concatenate(
        [np.arange(CAP) < base, base + np.arange(CHUNK) <= pos_q]
    )
    bias_full = jnp.asarray(alibi, jnp.float32)
    key_valid = jnp.asarray(valid)
    # prefix-side bias folds scale-invariant mask in; fresh side separate.
    # Key-major (CAP, H) layout — see _prefix_attend_kernel's bias_ref note.
    bias_p = jnp.where(key_valid[None, :CAP], bias_full[:, :CAP], MASK_VALUE).T
    bias_f = bias_full[:, CAP:]
    valid_f = key_valid[CAP:]

    scale = D**-0.5
    q_t = (q * scale).transpose(1, 2, 0)       # (H, D, B)
    pk_t = pk.transpose(0, 2, 1)               # (CAP, D, B)
    pv_t = pv.transpose(0, 2, 1)

    xla_fn = jax.jit(functools.partial(xla_attend))
    xla_hi = jax.jit(functools.partial(xla_attend,
                                       precision=jax.lax.Precision.HIGHEST))
    hyb_fn = jax.jit(hybrid_attend)

    out_x = xla_fn(q, pk, pv, fk, fv, bias_full, key_valid)
    out_hi = xla_hi(q, pk, pv, fk, fv, bias_full, key_valid)
    out_h = hyb_fn(q_t, pk_t, pv_t, bias_p, q, fk, fv, bias_f, valid_f)
    err = float(jnp.max(jnp.abs(out_hi - out_h)))
    err_prod = float(jnp.max(jnp.abs(out_x - out_h)))
    print(f"max abs err vs HIGHEST xla: {err:.2e} "
          f"(vs production bf16-MXU xla: {err_prod:.2e})", flush=True)
    # fp32-grade bound: the two-block logsumexp combine reassociates the
    # softmax sum (measured 1.2e-4 on chip); the production bf16 program
    # differs from HIGHEST by ~2e-2 — two orders looser.
    assert err < 5e-4, err

    def fetch(o):
        return float(np.asarray(o).ravel()[0])

    def time_fn(f, args, tag, K=32, reps=5):
        fetch(f(*args))
        done = f(*args)
        t0 = time.perf_counter()
        for _ in range(3):
            fetch(done)
        rtt = (time.perf_counter() - t0) / 3
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [f(*args) for _ in range(K)]
            fetch(outs[-1])
            walls.append((time.perf_counter() - t0 - rtt) / K)
        best = min(walls) * 1e6
        print(f"RESULT {tag}: {best:.1f} us/call (K={K}, rtt {rtt*1e3:.1f} ms)",
              flush=True)
        return best

    t_x = time_fn(xla_fn, (q, pk, pv, fk, fv, bias_full, key_valid), "xla_attend")
    t_h = time_fn(hyb_fn, (q_t, pk_t, pv_t, bias_p, q, fk, fv, bias_f, valid_f),
                  "pallas_hybrid")
    print(f"SUMMARY standalone pallas_vs_xla {t_h/t_x:.2f}x  "
          f"(>1 = pallas slower; relayout NOT charged to pallas)", flush=True)

    # --- per-iteration cost inside ONE program (the real decode runs its
    # attends inside a lax.scan — standalone calls above carry ~0.5-1 ms of
    # per-dispatch overhead that dilutes the true difference). A serialized
    # scan feeds each attend's output back into the next q, so iterations
    # cannot overlap or CSE; per-iteration delta vs the loop harness is the
    # honest per-attend cost.
    LOOP = 64

    @jax.jit
    def loop_xla(q0):
        def body(carry, _):
            out = xla_attend(carry, pk, pv, fk, fv, bias_full, key_valid)
            return q0 + 1e-6 * out, None
        return jax.lax.scan(body, q0, None, length=LOOP)[0]

    @jax.jit
    def loop_hyb(q0):
        scale = D**-0.5
        def body(carry, _):
            qt = (carry * scale).transpose(1, 2, 0)  # tiny; charged to pallas
            out = hybrid_attend(qt, pk_t, pv_t, bias_p, carry, fk, fv,
                                bias_f, valid_f)
            return q0 + 1e-6 * out, None
        return jax.lax.scan(body, q0, None, length=LOOP)[0]

    err_loop = float(jnp.max(jnp.abs(loop_xla(q) - loop_hyb(q))))
    print(f"loop parity (64 serialized attends): {err_loop:.2e}", flush=True)
    t_lx = time_fn(loop_xla, (q,), "loop_xla", K=4) / LOOP
    t_lh = time_fn(loop_hyb, (q,), "loop_pallas", K=4) / LOOP
    print(f"SUMMARY per-attend in-program: xla {t_lx:.1f} us  "
          f"pallas {t_lh:.1f} us  ratio {t_lh/t_lx:.2f}x", flush=True)


if __name__ == "__main__":
    main()
