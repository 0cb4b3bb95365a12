"""Serving layer: RenderServer bucketing + the serve.py line protocol."""
import base64
import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from test_render import tiny_cfg

from scoreperformer_tpu.configs import to_dict
from scoreperformer_tpu.data import (
    LocalScorePerformanceDataset,
    MixedLMScorePerformanceCollator,
    scoreperformer_model_inputs,
)
from scoreperformer_tpu.data.synthetic import build_synthetic_dataset, synthetic_score
from scoreperformer_tpu.midi import write_midi
from scoreperformer_tpu.models import MODELS
from scoreperformer_tpu.training import inject_data_config
from scoreperformer_tpu.training.checkpoint import save_checkpoint

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    root = str(tmp / "data")
    build_synthetic_dataset(root, n_scores=1, n_perfs_per_score=1, n_bars=6, seed=13,
                            with_directions=False)
    dataset = LocalScorePerformanceDataset(root=root, max_seq_len=80, bar_sliding_window=4)
    cfg_dict = inject_data_config(tiny_cfg(), dataset)
    model, model_cfg = MODELS.get("ScorePerformer")(**cfg_dict)

    collator = MixedLMScorePerformanceCollator(
        mask_ignore_token_ids=[0, 1, 2, 3],
        mask_ignore_token_dims=[0, 1, 2, 4, 6, 7, 8, 9],
    )
    import jax.numpy as jnp

    inputs = {k: jnp.asarray(v) for k, v in scoreperformer_model_inputs(collator([dataset[0]])).items()}
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent_dropout": jax.random.PRNGKey(2), "mmd": jax.random.PRNGKey(3)}
    variables = model.init(rngs, **inputs, deterministic=True)

    path = save_checkpoint(str(tmp / "ckpt"), jax.device_get(variables["params"]),
                           model_config=to_dict(model_cfg))
    dataset.tokenizer.save(os.path.join(path, "tokenizer.json"))
    return path


class TestRenderServer:
    def test_handle_requests_and_bucketing(self, checkpoint, tmp_path):
        from scoreperformer_tpu.inference import RenderServer

        server = RenderServer(checkpoint, bucket=64, max_len=512)

        pong = server.handle_request({"id": 0, "cmd": "ping"})
        assert pong == {"id": 0, "ok": True, "pong": True, "requests": 0}

        # two scores of different lengths -> same bucket -> one compiled shape
        score_a = synthetic_score(np.random.RandomState(3), n_bars=6)
        score_b = synthetic_score(np.random.RandomState(4), n_bars=5)
        path_a = str(tmp_path / "a.mid")
        path_b = str(tmp_path / "b.mid")
        write_midi(score_a, path_a)
        write_midi(score_b, path_b)

        out_a = str(tmp_path / "perf_a.mid")
        ra = server.handle_request(
            {"id": 1, "score": path_a, "out": out_a, "greedy": True}
        )
        assert ra["ok"], ra
        assert ra["out"] == out_a and os.path.exists(out_a)
        assert ra["notes"] > 0 and ra["padded_to"] % 64 == 0

        rb = server.handle_request({"id": 2, "score": path_b, "greedy": True})
        assert rb["ok"], rb
        assert "midi_b64" in rb and len(base64.b64decode(rb["midi_b64"])) > 0
        assert len(server.stats["buckets"]) >= 1

        # b64 input path mirrors the file path
        with open(path_a, "rb") as f:
            b64 = base64.b64encode(f.read()).decode("ascii")
        rc = server.handle_request({"id": 3, "score_b64": b64, "greedy": True, "seed": 1})
        assert rc["ok"] and rc["notes"] > 0

        # identical score (path vs b64) => identical bucket; all buckets are
        # multiples of the bucket size
        assert ra["padded_to"] == rc["padded_to"]
        assert rb["padded_to"] % 64 == 0

        # errors are reported, not fatal
        bad = server.handle_request({"id": 4})
        assert bad["ok"] is False and "error" in bad
        missing = server.handle_request({"id": 5, "score": "/nonexistent.mid"})
        assert missing["ok"] is False
        after = server.handle_request({"id": 6, "cmd": "ping"})
        assert after["ok"] and after["requests"] == 3

    def test_auto_cache_dtype_resolves_by_dim(self, checkpoint, tmp_path):
        # "auto" applies the measured ladder: fp32 below dim 1024 (the test
        # model is tiny), int8 at/above — and the resolved choice is recorded
        from scoreperformer_tpu.inference import RenderServer

        server = RenderServer(checkpoint, bucket=64, max_len=512,
                              cache_dtype="auto", chunk_size=8)
        assert server.cache_dtype == "fp32"
        score = synthetic_score(np.random.RandomState(11), n_bars=3)
        path = str(tmp_path / "auto.mid")
        write_midi(score, path)
        r = server.handle_request({"id": 1, "score": path, "greedy": True})
        assert r["ok"], r

    def test_bf16_cache_server_renders(self, checkpoint, tmp_path):
        # the big-cache serving config (BASELINE.md: bf16 KV caches measured
        # +18% at >= 1 GB) must produce a valid render end-to-end
        from scoreperformer_tpu.inference import RenderServer

        server = RenderServer(checkpoint, bucket=64, max_len=512,
                              cache_dtype="bf16", chunk_size=8)
        score = synthetic_score(np.random.RandomState(5), n_bars=5)
        path = str(tmp_path / "bf16.mid")
        write_midi(score, path)
        r = server.handle_request({"id": 1, "score": path, "greedy": True})
        assert r["ok"], r
        assert r["notes"] > 0

    def test_warmup_precompiles_buckets(self, checkpoint, tmp_path):
        from scoreperformer_tpu.inference import RenderServer

        server = RenderServer(checkpoint, bucket=64, max_len=512)
        server.warmup([60, 130], greedy_variants=(False, True))
        assert {64, 192} <= server.stats["buckets"]

        score = synthetic_score(np.random.RandomState(11), n_bars=4)
        p = str(tmp_path / "w.mid")
        write_midi(score, p)
        r = server.handle_request({"id": 1, "score": p, "greedy": True})
        assert r["ok"] and r["padded_to"] in server.stats["buckets"]

    def test_style_delta_steers_output(self, checkpoint, tmp_path):
        from scoreperformer_tpu.inference import RenderServer

        server = RenderServer(checkpoint, bucket=64, max_len=512)
        score = synthetic_score(np.random.RandomState(9), n_bars=4)
        p = str(tmp_path / "s.mid")
        write_midi(score, p)

        base = server.handle_request({"id": 1, "score": p, "greedy": True})
        zero = server.handle_request(
            {"id": 2, "score": p, "greedy": True,
             "style_delta": [0.0] * 20}  # tiny model: 8+6+4+2 latent dims
        )
        big = server.handle_request(
            {"id": 3, "score": p, "greedy": True, "style_delta": [5.0] * 20}
        )
        assert base["ok"] and zero["ok"] and big["ok"]
        assert base["midi_b64"] == zero["midi_b64"]  # zero delta is a no-op
        assert base["midi_b64"] != big["midi_b64"]  # steering changes the rendition

        wrong = server.handle_request(
            {"id": 4, "score": p, "style_delta": [1.0, 2.0]}
        )
        assert wrong["ok"] is False and "style_delta" in wrong["error"]

    def test_render_deterministic_with_seed(self, checkpoint, tmp_path):
        from scoreperformer_tpu.inference import RenderServer
        from scoreperformer_tpu.midi import read_midi

        server = RenderServer(checkpoint, bucket=64, max_len=512)
        score = synthetic_score(np.random.RandomState(7), n_bars=4)
        p = str(tmp_path / "s.mid")
        write_midi(score, p)
        r1 = server.handle_request({"id": 1, "score": p, "seed": 5})
        r2 = server.handle_request({"id": 2, "score": p, "seed": 5})
        assert r1["ok"] and r2["ok"]
        assert r1["midi_b64"] == r2["midi_b64"]
        perf = read_midi(base64.b64decode(r1["midi_b64"]))
        assert perf.num_notes == r1["notes"]


class TestBatchedRendering:
    """Dynamic request batching: render_batch stacks requests into ONE
    compiled call with per-row valid lengths / temperatures / style deltas;
    greedy outputs must be batch-invariant (rows are independent and padding
    cannot leak — same property the sharded-decode bit-parity test pins)."""

    def test_render_batch_matches_individual_greedy(self, checkpoint):
        from scoreperformer_tpu.inference import RenderServer
        from scoreperformer_tpu.midi import write_midi as wm

        server = RenderServer(checkpoint, bucket=64, max_len=512)
        scores = [
            synthetic_score(np.random.RandomState(s), n_bars=b)
            for s, b in [(3, 6), (4, 4), (5, 5)]
        ]
        individual = [server.render(sc, greedy=True) for sc in scores]
        batched = server.render_batch(
            [dict(score_midi=sc, greedy=True) for sc in scores]
        )
        assert batched[0]["batched"] == 4  # 3 requests -> next power of two
        assert server.stats["batches"].get(4) == 1
        for ind, bat in zip(individual, batched):
            assert ind["notes"] == bat["notes"]
            assert wm(ind["perf"], None) == wm(bat["perf"], None)

    def test_render_batch_per_request_knobs(self, checkpoint):
        # per-row temperature and per-row style delta in one sampled batch
        from scoreperformer_tpu.inference import RenderServer

        server = RenderServer(checkpoint, bucket=64, max_len=512)
        scores = [synthetic_score(np.random.RandomState(s), n_bars=4) for s in (7, 8)]
        res = server.render_batch([
            dict(score_midi=scores[0], temperature=0.7, seed=1),
            dict(score_midi=scores[1], temperature=1.3, seed=2,
                 style_delta=[0.5] * 20),
        ])
        assert len(res) == 2 and all(r["notes"] > 0 for r in res)
        # identical batch composition reproduces exactly (combined RNG stream)
        res2 = server.render_batch([
            dict(score_midi=scores[0], temperature=0.7, seed=1),
            dict(score_midi=scores[1], temperature=1.3, seed=2,
                 style_delta=[0.5] * 20),
        ])
        from scoreperformer_tpu.midi import write_midi as wm

        for a, b in zip(res, res2):
            assert wm(a["perf"], None) == wm(b["perf"], None)

    def test_render_batch_rejects_mixed_greedy(self, checkpoint):
        from scoreperformer_tpu.inference import RenderServer

        server = RenderServer(checkpoint, bucket=64, max_len=512)
        sc = synthetic_score(np.random.RandomState(1), n_bars=4)
        with pytest.raises(ValueError, match="greedy"):
            server.render_batch([
                dict(score_midi=sc, greedy=True),
                dict(score_midi=sc, greedy=False),
            ])

    def test_handle_batch_mixed_and_errors(self, checkpoint, tmp_path):
        # the wire layer groups by greedy flag and reports per-request errors
        from scoreperformer_tpu.inference import RenderServer

        server = RenderServer(checkpoint, bucket=64, max_len=512)
        p = str(tmp_path / "h.mid")
        write_midi(synthetic_score(np.random.RandomState(2), n_bars=4), p)
        resps = server.handle_batch([
            {"id": 1, "score": p, "greedy": True},
            {"id": 2, "score": "/nonexistent.mid"},
            {"id": 3, "score": p, "seed": 4},
            {"id": 4, "cmd": "ping"},
        ])
        assert [r["id"] for r in resps] == [1, 2, 3, 4]
        assert resps[0]["ok"] and resps[2]["ok"] and resps[3]["pong"]
        assert resps[1]["ok"] is False and "error" in resps[1]

    def test_coalescer_batches_concurrent_requests(self, checkpoint, tmp_path):
        import threading

        from serve import _Coalescer

        from scoreperformer_tpu.inference import RenderServer

        server = RenderServer(checkpoint, bucket=64, max_len=512)
        p = str(tmp_path / "c.mid")
        write_midi(synthetic_score(np.random.RandomState(6), n_bars=4), p)

        co = _Coalescer(server, max_batch=2, window_ms=5000)
        results = [None, None]

        def client(i):
            results[i] = co.submit({"id": i, "score": p, "greedy": True})

        threads = [threading.Thread(target=client, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=550)
        co.stop()
        assert all(r is not None and r["ok"] for r in results), results
        # the two concurrent requests rendered as ONE batch-2 compiled call
        assert server.stats["batches"].get(2) == 1, server.stats["batches"]
        assert results[0]["batched"] == 2 and results[1]["batched"] == 2


def test_render_cli_multi_score_batched(checkpoint, tmp_path, monkeypatch):
    """render.py with several scores renders them as ONE coalesced batch."""
    import render as render_cli

    d = tmp_path / "scores"
    d.mkdir()
    for i in range(2):
        write_midi(synthetic_score(np.random.RandomState(20 + i), n_bars=4),
                   str(d / f"s{i}.mid"))
    outdir = tmp_path / "perfs"
    monkeypatch.setattr(sys, "argv", [
        "render.py", "--checkpoint", checkpoint, "--score", str(d),
        "--out", str(outdir), "--greedy", "--bucket", "64",
    ])
    render_cli.main()
    outs = sorted(os.listdir(outdir))
    assert outs == ["s0.perf.mid", "s1.perf.mid"]
    for f in outs:
        assert os.path.getsize(outdir / f) > 0


def test_serve_stdio_protocol(checkpoint, tmp_path):
    """Drive serve.py end-to-end through its real stdin/stdout surface."""
    score = synthetic_score(np.random.RandomState(3), n_bars=4)
    score_path = str(tmp_path / "score.mid")
    out_path = str(tmp_path / "perf.mid")
    write_midi(score, score_path)

    requests = "\n".join([
        json.dumps({"id": 1, "cmd": "ping"}),
        json.dumps({"id": 2, "score": score_path, "out": out_path, "greedy": True}),
        json.dumps({"id": 3, "cmd": "shutdown"}),
    ]) + "\n"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "serve.py"), "--checkpoint", checkpoint,
         "--bucket", "64"],
        input=requests, capture_output=True, text=True, timeout=560, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stdout.strip().splitlines()]
    assert lines[0] == {"id": 1, "ok": True, "pong": True, "requests": 0}
    assert lines[1]["ok"] is True and lines[1]["out"] == out_path
    assert os.path.exists(out_path)
    assert lines[2] == {"id": 3, "ok": True, "bye": True}
