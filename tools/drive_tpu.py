"""Consolidated on-chip drive (CLAUDE.md TPU TODO #5/#6/#7/#8).

Runs on the real TPU chip.  Checks, per section:
  attn   : fused_attention xla vs off — bit-exact model outputs (the
           prefill Pallas kernel was deleted in round 2 after losing on-chip)
  qkv    : fuse_qkv pallas vs off — bit-exact
  w4     : w4_kernel pallas vs xla — bit-exact + per-call timing
  levers : smooth / adaround / mixed precision / gptq on a tiny gpt — run
           on chip, finite outputs, argmax agreement vs torch twin

Usage: python /tmp/drive_tpu2.py [section ...]   (default: all)
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import torch
from int8inferenceengine_tpu import models, tensor, utils
from int8inferenceengine_tpu.config import QuantConfig

RNG = np.random.default_rng(0)


def tiny_pair(cfg, seed=0):
    torch.manual_seed(seed)
    tw = models.torch_twin("gpt_tiny")
    m = models.build("gpt_tiny", config=cfg)
    m.load(tw.state_dict())
    return m, tw


def calib_ids(n=8, t=24):
    return RNG.integers(0, 1000, (n, t)).astype(np.int32)


def run(m, ids):
    return m(tensor(ids)).numpy()


def sec_attn():
    ids = calib_ids()
    outs = {}
    for fa in ("off", "xla"):
        m, _ = tiny_pair(QuantConfig(fused_attention=fa))
        m.prepare(); run(m, ids); m.convert()
        outs[fa] = run(m, ids)
    ok1 = np.array_equal(outs["off"], outs["xla"])
    print(f"attn: off==xla {ok1}", flush=True)
    assert ok1


def sec_qkv():
    ids = calib_ids()
    outs = {}
    for fq in ("off", "xla", "pallas"):
        m, _ = tiny_pair(QuantConfig(fuse_qkv=fq))
        m.prepare(); run(m, ids); m.convert()
        outs[fq] = run(m, ids)
    ok1 = np.array_equal(outs["off"], outs["xla"])
    ok2 = np.array_equal(outs["xla"], outs["pallas"])
    print(f"qkv: off==xla {ok1}, xla==pallas {ok2}", flush=True)
    assert ok1 and ok2


def sec_w4():
    ids = calib_ids()
    outs, times = {}, {}
    for be in ("xla", "pallas"):
        m, tw = tiny_pair(QuantConfig(weight_only=True, weight_bits=4,
                                      w4_group=64, w4_kernel=be))
        m.convert()
        outs[be] = run(m, ids)  # compile + run
        t0 = time.perf_counter(); [run(m, ids) for _ in range(5)]
        times[be] = (time.perf_counter() - t0) / 5
    # On chip both backends run f32 dots through bf16 MXU passes with
    # different accumulation orders — numeric closeness, not bit equality
    # (measured op-level max diff 9e-3 vs f64 oracle err 1e-2 for both).
    diff = np.abs(outs["xla"] - outs["pallas"]).max()
    scale = np.abs(outs["xla"]).max()
    print(f"w4: pallas-vs-xla max diff {diff:.3e} (out scale {scale:.1f}); "
          f"per-fwd xla {times['xla']*1e3:.1f} ms, "
          f"pallas {times['pallas']*1e3:.1f} ms", flush=True)
    assert diff <= 0.05 * scale
    # torch-twin agreement sanity
    tw_out = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    agree = (outs["xla"][:, -1].argmax(-1) == tw_out[:, -1].argmax(-1)).mean()
    print(f"w4: argmax agreement vs torch {agree:.2f}", flush=True)


def sec_levers():
    ids = calib_ids()

    # smooth + static INT8
    m, tw = tiny_pair(QuantConfig())
    utils.smooth(m, utils.transformer_smooth_pairs(m), ids)
    m.prepare(); run(m, ids); m.convert()
    out = run(m, ids)
    tw_out = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    agree = (out[:, -1].argmax(-1) == tw_out[:, -1].argmax(-1)).mean()
    assert np.isfinite(out).all()
    print(f"smooth: finite, argmax agree {agree:.2f}", flush=True)

    # adaround
    m, tw = tiny_pair(QuantConfig())
    m.prepare(); run(m, ids)
    utils.adaround(m, ids, iters=60)
    m.convert()
    out = run(m, ids)
    agree = (out[:, -1].argmax(-1) == tw_out[:, -1].argmax(-1)).mean()
    assert np.isfinite(out).all()
    print(f"adaround: finite, argmax agree {agree:.2f}", flush=True)

    # mixed precision islands
    m, tw = tiny_pair(QuantConfig())
    m.prepare(); run(m, ids)
    m.convert(skip=("head", "fc1_1"))
    out = run(m, ids)
    agree = (out[:, -1].argmax(-1) == tw_out[:, -1].argmax(-1)).mean()
    assert np.isfinite(out).all()
    print(f"mixed: finite, argmax agree {agree:.2f}", flush=True)

    # gptq on W4
    m, tw = tiny_pair(QuantConfig(weight_only=True, weight_bits=4,
                                  w4_group=64))
    utils.gptq(m, ids)
    m.convert()
    out = run(m, ids)
    agree = (out[:, -1].argmax(-1) == tw_out[:, -1].argmax(-1)).mean()
    assert np.isfinite(out).all()
    # Expected range 0.75-1.00, NOT a GPTQ defect (chased 2026-08-19):
    # plain W4 on this UNTRAINED toy decoder shows the same agreement
    # (4-bit weight noise on near-flat logits flips the toy's argmax);
    # GPTQ actually raises last-token agreement vs plain W4 here
    # (0.88 vs 0.75 on CPU, bit-deterministic). Trained-model levers are
    # guarded by tests/test_gptq.py (layer MSE) and the depth-8 labelled
    # accuracy study.
    print(f"gptq-w4: finite, argmax agree {agree:.2f}", flush=True)


SECTIONS = {"attn": sec_attn, "qkv": sec_qkv, "w4": sec_w4,
            "levers": sec_levers}

if __name__ == "__main__":
    names = sys.argv[1:] or list(SECTIONS)
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    for n in names:
        t0 = time.perf_counter()
        SECTIONS[n]()
        print(f"[{n}] OK in {time.perf_counter()-t0:.0f}s", flush=True)
    print("ALL OK", flush=True)
