"""Benchmark: decoded performance tokens/sec/chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline config (BASELINE.json config 5): batched KV-cached MixedLM unmasking
with style conditioning on the flagship architecture (dim 256, decoder depth 4,
heads 4, one-KV-head, learned ALiBi, GLU-swish FF, multi-seq post-cat
continuous-dense embeddings, tied LM head, SPMupleWindow vocab sizes).

Baseline: the reference implementation's decode loop is PyTorch on CPU with a
per-position Python loop and concat-grown KV caches
(reference wrappers.py:324-407). The reference repo itself cannot run here
(miditok is not installed), so `--measure-baseline` runs a faithful
torch-CPU re-enactment of that loop at identical dims; the default constant
below was measured that way on this machine.
"""
import argparse
import json
import time

import numpy as np

# torch-CPU reference-style decode, tokens/sec, measured via --measure-baseline
# on this host (see measure_torch_baseline()).
DEFAULT_BASELINE_TOKENS_PER_SEC = None  # filled in after first measurement

FLAGSHIP_NUM_TOKENS = {
    "Bar": 260, "Position": 132, "Pitch": 92, "Velocity": 132, "Duration": 133,
    "Tempo": 125, "TimeSig": 26, "PositionShift": 69, "NotesInOnset": 16,
    "PositionInOnset": 16, "RelOnsetDev": 165, "RelPerfDuration": 85,
}
DIM = 256
EMB_DIM = 128
DEPTH = 4
HEADS = 4
DIM_HEAD = 64


def build_flagship(batch, seq, num_tokens=None, token_values=None, max_segments=None,
                   return_train_inputs=False, return_config=False, dim=DIM,
                   emb_dim=EMB_DIM, depth=DEPTH, heads=HEADS, dim_head=DIM_HEAD,
                   enc_depth=2, mmd_depth=4, use_flash=False, attn_extra=None,
                   dec_ff_extra=None):
    import jax
    import jax.numpy as jnp

    from scoreperformer_tpu.models import MODELS

    if max_segments is None:
        max_segments = max(260, seq + 4)
    num_tokens = num_tokens or FLAGSHIP_NUM_TOKENS
    score_tokens = {
        k: v for k, v in num_tokens.items() if k not in ("RelOnsetDev", "RelPerfDuration")
    }
    if token_values is None:
        token_values = {k: np.linspace(0, 1, v).tolist() for k, v in num_tokens.items()}
    emb = {
        "_target_": "simple", "emb_dims": emb_dim, "mode": "cat", "emb_norm": True,
        "discrete": False, "continuous": True, "continuous_dense": True,
        "discrete_ids": [0, 1, 2, 3], "token_values": token_values,
    }
    attn = {"dim_head": dim_head, "one_kv_head": True,
            "alibi_pos_bias": True, "alibi_learned": True, "use_flash": use_flash,
            **(attn_extra or {})}
    ff = {"mult": 4, "glu": True, "swish": True}
    cfg = {
        "num_tokens": num_tokens, "num_score_tokens": score_tokens,
        "dim": dim, "tie_token_emb": True, "mode": "mixlm",
        "score_encoder": {"token_embeddings": dict(emb), "emb_norm": True,
                          "use_abs_pos_emb": False, "max_seq_len": seq + 2,
                          "transformer": {"_target_": "encoder", "depth": enc_depth,
                                          "heads": heads,
                                          "attention": attn, "feed_forward": ff}},
        "perf_encoder": {"token_embeddings": dict(emb), "emb_norm": True,
                         "use_abs_pos_emb": False, "max_seq_len": seq + 2,
                         "latent_dim": [32, 20, 8, 4],
                         "aggregate_mode": ["mean", "bar_mean", "beat_mean", "onset_mean"],
                         "hierarchical": True, "max_segments": max_segments,
                         "transformer": {"_target_": "encoder", "depth": mmd_depth,
                                         "heads": heads,
                                         "attention": attn, "feed_forward": ff}},
        "perf_decoder": {"token_embeddings": {**emb, "_target_": "multi-seq",
                                              "multiseq_mode": "post-cat"},
                         "emb_norm": True, "use_abs_pos_emb": False, "max_seq_len": seq + 2,
                         "context_emb_mode": "cat", "style_emb_mode": "adanorm",
                         "transformer": {"_target_": "decoder", "depth": depth, "heads": heads,
                                         "attention": attn,
                                         "feed_forward": {**ff, **(dec_ff_extra or {})}},
                         "lm_head": {"_target_": "lm-tied"}},
    }
    model, model_cfg = MODELS.get("ScorePerformer")(**cfg)

    rng = np.random.RandomState(0)

    def rand(nt):
        return jnp.array(np.stack([rng.randint(4, v, (batch, seq)) for v in nt.values()], -1))

    perf = rand(num_tokens)
    tokens = perf.at[:, 1:, (3, 5, 10, 11)].set(1)  # masked perf streams
    masked = perf.at[..., (3, 5, 10, 11)].set(1)
    batch_data = {
        "tokens": tokens,
        "masked": masked,
        "style": jnp.zeros((batch, seq, 64), jnp.float32),
        "context": jnp.zeros((batch, seq, dim), jnp.float32),
    }

    import jax

    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent_dropout": jax.random.PRNGKey(2), "mmd": jax.random.PRNGKey(3)}
    init_kwargs = dict(
        masked_perf=masked,
        score=rand(score_tokens),
        bars=jnp.array(np.sort(rng.randint(4, 20, (batch, seq)), 1)),
        beats=jnp.array(np.sort(rng.randint(4, 64, (batch, seq)), 1)),
        onsets=jnp.array(np.sort(rng.randint(4, min(seq + 4, max_segments), (batch, seq)), 1)),
        deadpan_mask=jnp.zeros((batch,), bool),
    )
    # jit the init: eager init dispatches thousands of tiny ops (very slow on
    # remote-compile platforms)
    variables = jax.jit(
        lambda r, p, kw: model.init(r, p, **kw, deterministic=True)
    )(rngs, perf, init_kwargs)
    if return_train_inputs:
        labels = np.full((batch, seq, len(num_tokens)), -100)
        for d in (3, 5, 10, 11):
            labels[..., d] = np.array(perf[..., d])
        train_batch = dict(init_kwargs, perf=perf, labels=jnp.array(labels))
        if return_config:
            return model, variables, batch_data, train_batch, model_cfg
        return model, variables, batch_data, train_batch
    if return_config:
        return model, variables, batch_data, model_cfg
    return model, variables, batch_data


def measure_tpu_decode(batch=32, seq=256, repeats=3):
    import jax

    from scoreperformer_tpu.models.wrappers import mixedlm_unmask

    model, variables, data = build_flagship(batch, seq)

    @jax.jit
    def unmask(rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0,
            # the four masked perf streams — skips the 8 discarded
            # per-stream filters (+7% measured, scripts/exp_sample_dims.py)
            sample_dims=(3, 5, 10, 11),
        )

    def dispatch(seed):
        return unmask(
            jax.random.PRNGKey(seed),
            data["tokens"], data["masked"], data["style"], data["context"],
        )

    def fetch(out):
        # On the remote-axon transport block_until_ready is unreliable; a
        # scalar host fetch forces completion. Its round-trip is measured
        # separately below and subtracted, so walls are DEVICE time — the
        # pre-round-4 methodology counted one tunnel RTT (~30 ms) per run
        # and understated throughput by ~25% (BASELINE.md round 4).
        return float(np.asarray(out[0, -1, 0]))

    fetch(dispatch(0))  # compile

    done = dispatch(1)
    fetch(done)
    t0 = time.perf_counter()
    for _ in range(3):
        fetch(done)
    rtt = (time.perf_counter() - t0) / 3

    K = 3  # back-to-back dispatches amortize queueing; one final fetch syncs
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        outs = [dispatch(10 + i * K + j) for j in range(K)]
        fetch(outs[-1])
        times.append((time.perf_counter() - t0 - rtt) / K)
    best = min(times)
    tokens_decoded = batch * (seq - 1)
    return tokens_decoded / best, best


def measure_render(n_bars=32, repeats=3):
    """End-to-end score→performance render of an n_bars piece: host
    tokenization, encoder chunk pass, scan MixedLM decode, messenger-style
    detokenization back to MIDI (BASELINE configs 2+5 combined). Returns
    (notes_per_sec, wall_s, num_notes)."""
    import jax
    import jax.numpy as jnp

    from scoreperformer_tpu.data.synthetic import synthetic_score
    from scoreperformer_tpu.inference.render import prepare_render_inputs
    from scoreperformer_tpu.models.wrappers import mixedlm_unmask
    from scoreperformer_tpu.tokenizers import SPMupleWindow, TokenizerConfig, TokSequence

    tokenizer = SPMupleWindow(
        TokenizerConfig(additional_params={"max_bar_embedding": 256})
    )
    score = synthetic_score(np.random.RandomState(0), n_bars=n_bars)
    inputs = prepare_render_inputs(tokenizer, score)
    T = len(inputs["deadpan_ids"])

    num_tokens = dict(tokenizer.performance_sizes)
    token_values = {
        k: np.asarray(v).tolist()
        for k, v in tokenizer.token_values(normalize=True).items()
    }
    max_segments = int(max(inputs["onsets"].max(), inputs["bars"].max(),
                           inputs["beats"].max())) + 8
    model, variables, _ = build_flagship(
        1, T, num_tokens=num_tokens, token_values=token_values,
        max_segments=max_segments,
    )

    perf = jnp.asarray(inputs["deadpan_ids"][None])
    score_ids = jnp.asarray(inputs["score_ids"][None])
    tokens_in = jnp.asarray(inputs["tokens_in"][None])
    masked_all = jnp.asarray(inputs["masked_all"][None])
    bars = jnp.asarray(inputs["bars"][None])
    beats = jnp.asarray(inputs["beats"][None])
    onsets = jnp.asarray(inputs["onsets"][None])

    @jax.jit
    def encode_and_unmask(rng, perf, score_ids, tokens_in, masked_all, bars, beats, onsets):
        mask = jnp.ones(perf.shape[:2], bool)
        score_emb, style_emb, _ = model.apply(
            variables, perf, mask, score_ids, mask, bars, beats, onsets,
            method="encode_embeddings", rngs={"mmd": jax.random.PRNGKey(0)},
        )
        return mixedlm_unmask(
            model, variables, tokens_in, masked_all, rng=rng,
            style_embeddings=style_emb, context=score_emb, greedy=False,
        )

    def run(seed):
        out = encode_and_unmask(
            jax.random.PRNGKey(seed), perf, score_ids, tokens_in, masked_all,
            bars, beats, onsets,
        )
        out_tokens = np.asarray(out[0])  # device sync
        return tokenizer.performance_tokens_to_midi(TokSequence(ids=out_tokens))

    run(0)  # compile + host-path warmup
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    return T / best, best, T


def train_flops_per_step(
    batch, seq, dim=DIM, emb_dim=EMB_DIM, dec_depth=DEPTH, enc_depth=2,
    mmd_depth=4, heads=HEADS, dim_head=DIM_HEAD, style_dim=64,
    num_tokens=None,
) -> float:
    """Analytic model FLOPs for one train step (fwd + bwd ≈ 3x forward
    matmul FLOPs, the standard MFU convention). Counts the three trunks'
    QKV/attend/out/GLU projections, AdaLN conditioning, embedding and head
    projections; elementwise/norm work is excluded (MXU accounting)."""
    num_tokens = num_tokens or FLAGSHIP_NUM_TOKENS
    n_streams = len(num_tokens)
    n_score = n_streams - 2  # RelOnsetDev / RelPerfDuration are perf-only
    v_total = sum(num_tokens.values())
    emb_perf = emb_dim * n_streams
    emb_score = emb_dim * n_score

    def unit(T, adanorm):
        # one (attention, feed-forward) depth unit, per position
        f = (
            2 * dim * (heads * dim_head)      # q
            + 2 * 2 * dim * dim_head          # k, v (one kv head)
            + 2 * T * (heads * dim_head) * 2  # q.K + attn.V over T keys
            + 2 * (heads * dim_head) * dim    # out proj
            + 2 * dim * (8 * dim)             # GLU in (2x mult-4 inner)
            + 2 * (4 * dim) * dim             # GLU out
        )
        if adanorm:
            f += 2 * (2 * style_dim * (2 * dim))  # two AdaLN per unit
        return f

    enc = enc_depth * unit(seq, False) + 2 * emb_score * dim
    mmd = mmd_depth * unit(seq, False) + 2 * emb_perf * dim
    dec = (
        dec_depth * unit(seq, True)
        + 2 * (2 * emb_perf * dim)       # two embedded streams (multi-seq)
        + 2 * (2 * dim) * dim            # post-cat fusion projection
        + 2 * (2 * dim) * dim            # context cat projection
    )
    head = 2 * dim * emb_perf + 2 * emb_dim * v_total
    forward = float(enc + mmd + dec + head) * batch * seq
    return 3.0 * forward


def measure_tpu_train(batch=128, seq=256, repeats=3, **build_kw):
    """Flagship train step (forward + backward + adamw) throughput."""
    import jax
    import jax.numpy as jnp
    import optax

    model, variables, _, train_batch = build_flagship(
        batch, seq, return_train_inputs=True, **build_kw
    )
    params = variables["params"]
    tx = optax.chain(optax.clip_by_global_norm(2.0), optax.adamw(2e-4))
    opt_state = tx.init(params)

    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, **batch, deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, 0),
                      "latent_dropout": jax.random.fold_in(rng, 1),
                      "mmd": jax.random.fold_in(rng, 2)},
            )
            return out.loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    n_params = int(sum(x.size for x in jax.tree.leaves(params)))
    step = jax.jit(train_step, donate_argnums=(0, 1))
    params, opt_state, loss = step(params, opt_state, train_batch, jax.random.PRNGKey(0))

    def fetch(x):
        # scalar host fetch forces completion (block_until_ready is
        # unreliable over the remote-axon transport); its round-trip is
        # measured on an already-computed buffer and subtracted below, same
        # amortized methodology as measure_tpu_decode (BASELINE.md round 4).
        return float(np.asarray(x))

    fetch(loss)
    t0 = time.perf_counter()
    for _ in range(3):
        fetch(loss)
    rtt = (time.perf_counter() - t0) / 3

    K = 4  # chained steps per timed run (params/opt_state donated through)
    times = []
    loss_out = loss
    for i in range(repeats):
        t0 = time.perf_counter()
        for j in range(K):
            params, opt_state, loss_out = step(
                params, opt_state, train_batch, jax.random.PRNGKey(1 + i * K + j)
            )
        fetch(loss_out)
        times.append((time.perf_counter() - t0 - rtt) / K)
    best = min(times)
    return batch * seq / best, best, float(loss_out), n_params


def measure_torch_baseline(seq=256, steps=64):
    """Reference-style decode loop: torch CPU, batch 1, per-position Python
    loop with concat-grown KV caches and SDPA (reference attend.py:58-126,
    wrappers.py:324-407). Measures steady-state per-token latency over the
    first `steps` positions and extrapolates to tokens/sec."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    num_tokens = FLAGSHIP_NUM_TOKENS
    S = len(num_tokens)
    emb_total = EMB_DIM * S

    tables = [torch.randn(v, EMB_DIM) * 0.01 for v in num_tokens.values()]
    project_emb = torch.nn.Linear(emb_total, DIM)
    project_multiemb = torch.nn.Linear(2 * DIM, DIM)
    project_ctx = torch.nn.Linear(2 * DIM, DIM)  # context cat projection
    ada_lin = [torch.nn.Linear(64, 2 * DIM) for _ in range(2 * DEPTH + 1)]
    head_norm = torch.nn.LayerNorm(emb_total)

    q_proj = [torch.nn.Linear(DIM, HEADS * DIM_HEAD, bias=False) for _ in range(DEPTH)]
    k_proj = [torch.nn.Linear(DIM, DIM_HEAD, bias=False) for _ in range(DEPTH)]
    v_proj = [torch.nn.Linear(DIM, DIM_HEAD, bias=False) for _ in range(DEPTH)]
    o_proj = [torch.nn.Linear(HEADS * DIM_HEAD, DIM, bias=False) for _ in range(DEPTH)]
    ff_in = [torch.nn.Linear(DIM, DIM * 8, bias=False) for _ in range(DEPTH)]
    ff_out = [torch.nn.Linear(DIM * 4, DIM, bias=False) for _ in range(DEPTH)]
    slopes = torch.rand(HEADS, 1, 1)

    tokens = [torch.randint(4, min(v for v in num_tokens.values()), (seq,)) for _ in range(2)]
    style = torch.zeros(seq, 64)
    context = torch.zeros(seq, DIM)

    caches = [None] * DEPTH

    def embed(pos):
        embs = []
        for seq_tokens in tokens:
            e = torch.cat([t[seq_tokens[pos]] for t in tables], dim=-1)
            e = project_emb(F.layer_norm(e, (emb_total,)))
            embs.append(e)
        h = project_multiemb(torch.cat(embs, dim=-1))
        h = project_ctx(torch.cat([h, context[pos]], dim=-1))
        return h[None, None]  # (1, 1, dim)

    def ada(x, lin, cond):
        gb = lin(cond)
        gamma, beta = gb[..., :DIM], gb[..., DIM:]
        return gamma * F.layer_norm(x, (DIM,)) + beta

    def step(pos):
        with torch.inference_mode():
            x = embed(pos)
            cond = style[pos]
            for layer in range(DEPTH):
                resid = x
                h = ada(x, ada_lin[2 * layer], cond)
                q = q_proj[layer](h).view(1, 1, HEADS, DIM_HEAD).transpose(1, 2)
                k_new = k_proj[layer](h)
                v_new = v_proj[layer](h)
                if caches[layer] is None:
                    k, v = k_new, v_new
                else:
                    k = torch.cat([caches[layer][0], k_new], dim=1)
                    v = torch.cat([caches[layer][1], v_new], dim=1)
                caches[layer] = (k, v)
                j = k.shape[1]
                kh = k.view(1, 1, j, DIM_HEAD).expand(1, HEADS, j, DIM_HEAD)
                vh = v.view(1, 1, j, DIM_HEAD).expand(1, HEADS, j, DIM_HEAD)
                bias = -torch.abs(
                    torch.arange(j, dtype=torch.float32) - (j - 1)
                )[None, None, None, :] * slopes[None]
                out = F.scaled_dot_product_attention(q, kh, vh, attn_mask=bias)
                x = resid + o_proj[layer](out.transpose(1, 2).reshape(1, 1, -1))
                resid = x
                h = ada(x, ada_lin[2 * layer + 1], cond)
                hh, gate = ff_in[layer](h).chunk(2, dim=-1)
                x = resid + ff_out[layer](hh * F.silu(gate))
            # tied LM head
            h = head_norm(x[0, 0] @ project_emb.weight)
            offset = 0
            samples = []
            for idx, (key, table) in enumerate(zip(num_tokens, tables)):
                logits = h[offset : offset + EMB_DIM] @ table.t()
                offset += EMB_DIM
                if idx in (3, 5, 10, 11):  # sampled streams
                    logits = logits / 1.0
                    k = max(1, int(0.1 * logits.shape[-1]))
                    val, ind = torch.topk(logits, k)
                    probs = torch.full_like(logits, -float("inf"))
                    probs.scatter_(0, ind, val)
                    probs = torch.softmax(probs, dim=-1)
                    samples.append(torch.multinomial(probs, 1))
        return samples

    # warmup + measure
    for pos in range(4):
        step(pos)
    t0 = time.perf_counter()
    for pos in range(4, 4 + steps):
        step(pos)
    elapsed = time.perf_counter() - t0
    return steps / elapsed


# Pinned torch-CPU reference baseline (reference-style decode loop, batch 1).
# Re-measured per run it swings with host load (recorded: 131 r1, 370/198 r2),
# making the headline ratio incomparable across rounds — so the ratio is
# computed against this pinned median-of-3 from an idle host (2026-08-17:
# 365.1/362.6/371.7 tok/s). `--measure-baseline` re-measures and reports the
# live number alongside, without changing the pinned ratio.
PINNED_TORCH_BASELINE = 365.1

# v5e (v5 lite) speed-of-light reference numbers for MFU context
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0

# Measured capacity-sweep intercept at the flagship b512 config
# (scripts/exp_decode_ceiling2.py, late round 4, sample_dims on): the
# capacity-INDEPENDENT per-step work (small matmuls, 4-stream sampling, scan
# dispatch). The earlier 372 us intercept (exp_decode_ceiling.py) included
# the 8 discarded per-stream filters that sample_dims removed. The
# capacity-proportional term (~900 ns/row) is NOT storage-bandwidth bound:
# bf16/int8 caches measured -8.5%/+0% despite 2x/4x smaller reads — it
# prices the attend's per-row compute/layout work, overlapped with reads.
DECODE_FIXED_WORK_US = 297.0


def flagship_decode_flops_per_token() -> float:
    """Analytic MXU FLOPs per decoded token (flagship decode step): embedding
    projections, per-layer AdaLN/QKV/attend/out/GLU-FF, tied head + logits.
    2*m*n per m→n matmul row; attention terms scale with the attended length
    (full cache capacity, the compiled shape)."""
    S = len(FLAGSHIP_NUM_TOKENS)
    emb_total = EMB_DIM * S
    v_total = sum(FLAGSHIP_NUM_TOKENS.values())
    j = 256  # attended length = cache capacity (static shape)

    embed = 2 * (2 * emb_total * DIM) + 2 * (2 * DIM) * DIM + 2 * (2 * DIM) * DIM
    per_layer = (
        2 * 64 * (2 * DIM)            # AdaLN gamma/beta
        + 2 * DIM * (HEADS * DIM_HEAD)  # q
        + 2 * 2 * DIM * DIM_HEAD        # k, v (one kv head)
        + 2 * j * (HEADS * DIM_HEAD)    # q.K
        + 2 * j * (HEADS * DIM_HEAD)    # attn.V
        + 2 * (HEADS * DIM_HEAD) * DIM  # out proj
        + 2 * 64 * (2 * DIM)            # AdaLN 2
        + 2 * DIM * (8 * DIM)           # GLU in (2x mult-4 inner)
        + 2 * (4 * DIM) * DIM           # GLU out
    )
    head = 2 * DIM * emb_total + 2 * EMB_DIM * v_total
    return float(embed + DEPTH * per_layer + head)


def flagship_decode_cache_bytes_per_token(dtype_bytes: int = 4) -> float:
    """HBM bytes of KV-cache traffic per decoded token: each step reads both
    (cap, b, kv) buffers of every layer for the attend (batch-amortized to
    per-token) plus one row write per buffer."""
    cap, kv = 256, DIM_HEAD  # one kv head
    reads = 2 * DEPTH * cap * kv * dtype_bytes
    writes = 2 * DEPTH * kv * dtype_bytes
    return float(reads + writes)


def _enable_compile_cache():
    # host-keyed: stale cross-host XLA:CPU AOT entries can segfault on load
    from scoreperformer_tpu.utils import enable_compile_cache

    enable_compile_cache()


def main():
    parser = argparse.ArgumentParser()
    # batch sweep on v5e-1 with time-major caches (round 2): 512 -> 309k,
    # 1024 -> 237k, 2048 -> 218k tokens/s — larger batches regress because
    # the carried cache buffers (and XLA's defensive copies of them) scale
    # with batch; 512 is the knee. (Round-1 batch-major sweep in BASELINE.md.)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--seq", type=int, default=256)
    parser.add_argument("--measure-baseline", action="store_true")
    parser.add_argument("--baseline", type=float, default=None)
    parser.add_argument("--render-bars", type=int, default=32)
    parser.add_argument("--skip-render", action="store_true")
    parser.add_argument("--skip-train", action="store_true")
    parser.add_argument("--skip-scale", action="store_true")
    args = parser.parse_args()

    _enable_compile_cache()

    baseline = args.baseline or PINNED_TORCH_BASELINE
    live_baseline = None
    if args.measure_baseline:
        live_baseline = measure_torch_baseline(seq=args.seq)

    tokens_per_sec, wall = measure_tpu_decode(args.batch, args.seq)

    # speed-of-light context (VERDICT r2 #9): FLOPs/token and cache traffic
    # are analytic properties of the compiled program; achieved rates follow
    # from the measured tokens/s, judged against v5e peak numbers
    flops_tok = flagship_decode_flops_per_token()
    cache_bytes_tok = flagship_decode_cache_bytes_per_token()
    achieved_tflops = tokens_per_sec * flops_tok / 1e12
    cache_gbps = tokens_per_sec * cache_bytes_tok / 1e9
    step_us = wall / (args.seq - 1) * 1e6
    sol = {
        "flops_per_token": round(flops_tok / 1e6, 3),  # MFLOPs
        "achieved_tflops": round(achieved_tflops, 3),
        "mfu_vs_bf16_peak": round(achieved_tflops / V5E_PEAK_BF16_TFLOPS, 5),
        "kv_cache_traffic_gbps": round(cache_gbps, 1),
        "kv_traffic_vs_hbm_peak": round(cache_gbps / V5E_HBM_GBPS, 3),
        # capacity-sweep decomposition (BASELINE.md round 4, measured):
        # step(cap) = FIXED_WORK_US + slope*cap, with the slope-implied read
        # bandwidth ABOVE physical peak — reads overlap the fixed work, so
        # the binding floor is the capacity-independent compute, not HBM.
        "step_us": round(step_us, 1),
        "fixed_work_floor_us": DECODE_FIXED_WORK_US,
        "vs_fixed_work_floor": round(DECODE_FIXED_WORK_US / step_us, 3),
        "note": "decode floor = fixed work (297us) + a capacity term that is "
                "attend compute/layout, not HBM: slope-implied BW (~1.16TB/s) "
                "exceeds the 770GB/s probed peak AND bf16/int8 caches measure "
                "-8.5%/+0% despite 2x/4x smaller reads, so neither bandwidth "
                "nor precision cuts it (BASELINE.md round 4, ceiling2); "
                "kv_traffic_vs_hbm_peak kept for round-over-round continuity",
    }

    # end-to-end render (tokenize -> encode -> scan decode -> detokenize);
    # secondary metric so round-over-round perf covers the whole pipeline,
    # never allowed to sink the primary decode metric
    train = None
    if not args.skip_train:
        try:
            train_tps, train_step_s, train_loss, n_params = measure_tpu_train(
                128, args.seq
            )
            step_flops = train_flops_per_step(128, args.seq)
            train_tflops = step_flops / train_step_s / 1e12
            train = {
                "tokens_per_sec": round(train_tps, 1),
                "step_ms": round(train_step_s * 1e3, 1),
                "batch": 128,
                "loss": round(train_loss, 4),
                "params": n_params,
                "model_tflops_per_step": round(step_flops / 1e12, 4),
                "achieved_tflops": round(train_tflops, 2),
                "mfu": round(train_tflops / V5E_PEAK_BF16_TFLOPS, 4),
            }
        except Exception as e:  # pragma: no cover - diagnostic path
            train = {"error": f"{type(e).__name__}: {e}"}

    # scale-regime train step (the scale_1024 / exp_scale config: dim 1024,
    # decoder depth 8, dim_head 128, seq 1024, fp32, batch 8 per chip — the
    # measured-lever settings; scripts/exp_scale.py is the full matrix)
    scale = None
    if not args.skip_scale:
        try:
            s_batch, s_seq = 8, 1024
            # scale-tail levers (scripts/exp_scale_tail.py, round 5): bf16
            # mask+softmax chain + single fused mask select, +21.5% at b8
            # (200.5 -> 165.0 ms); recipe recipes/scoreperformer/scale_1024.yaml
            s_tps, s_step_s, s_loss, s_params = measure_tpu_train(
                s_batch, s_seq, dim=1024, emb_dim=256, depth=8, heads=8,
                dim_head=128,
                attn_extra={"softmax_bf16": True, "fused_mask_select": True},
            )
            s_flops = train_flops_per_step(
                s_batch, s_seq, dim=1024, emb_dim=256, dec_depth=8,
                heads=8, dim_head=128,
            )
            s_tflops = s_flops / s_step_s / 1e12
            scale = {
                "tokens_per_sec": round(s_tps, 1),
                "step_ms": round(s_step_s * 1e3, 1),
                "batch": s_batch,
                "seq": s_seq,
                "dim": 1024,
                "decoder_depth": 8,
                "params": s_params,
                "model_tflops_per_step": round(s_flops / 1e12, 4),
                "achieved_tflops": round(s_tflops, 2),
                "mfu": round(s_tflops / V5E_PEAK_BF16_TFLOPS, 4),
                "softmax_bf16": True,
                "fused_mask_select": True,
            }
        except Exception as e:  # pragma: no cover - diagnostic path
            scale = {"error": f"{type(e).__name__}: {e}"}

    render = None
    if not args.skip_render:
        try:
            notes_per_sec, render_wall, n_notes = measure_render(n_bars=args.render_bars)
            render = {
                "notes_per_sec": round(notes_per_sec, 2),
                "wall_s": round(render_wall, 3),
                "notes": n_notes,
                "bars": args.render_bars,
            }
        except Exception as e:  # pragma: no cover - diagnostic path
            render = {"error": f"{type(e).__name__}: {e}"}

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip",
                "value": round(tokens_per_sec, 2),
                "unit": "tokens/s",
                "vs_baseline": round(tokens_per_sec / baseline, 2),
                "baseline_torch_cpu_tokens_per_sec": round(baseline, 2),
                "baseline_pinned": args.baseline is None,
                "baseline_live_tokens_per_sec": (
                    round(live_baseline, 2) if live_baseline else None
                ),
                "speed_of_light": sol,
                "train_step": train,
                "scale_1024_train_step": scale,
                "render_32bar": render,
                "config": {
                    "batch": args.batch,
                    "seq": args.seq,
                    "dim": DIM,
                    "decoder_depth": DEPTH,
                    "wall_s": round(wall, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
