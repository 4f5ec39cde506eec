"""Trained-LM accuracy: perplexity + next-token accuracy on REAL
trained weights (round-4 VERDICT #2 — the untrained-toy metric class
ends here).

No text corpus ships in this environment, so the task is procedural
with KNOWN structure: an order-2 Markov language over a small vocab
(each (prev2, prev1) state has 4 permitted successors with fixed probs
[0.55, 0.25, 0.15, 0.05]).  The true per-token entropy is therefore
computable in closed form — perplexities have an absolute floor
(exp(H) ~ 3.08) to be read against, not just each other.  Order 2
matters: a first-order predictor cannot reach the floor, so the model
must actually use attention (two tokens back), which is the quantized
path under test.

Flow (the examples/accuracy_synthetic.py recipe, LM edition):
  1. train the llama-architecture TORCH twin on chain samples (CPU,
     AdamW, a few minutes);
  2. load the trained state_dict into LlamaDecoder variants, run the
     PTQ lifecycle, and measure held-out perplexity + next-token
     accuracy for: torch FP32 (oracle), engine FP32, INT8 trunc
     (reference-parity default), INT8 nearest, nearest+SmoothQuant,
     INT8 per-channel, W4 weight-only, W4+GPTQ.

    python examples/accuracy_lm.py [--steps 700] [--dim 128]

Measured run (CPU, defaults — dim 128 / depth 4 / 700 steps, seed 0,
2026-08-20; the trained model sits ~1% off the information-theoretic
floor, so the quantization deltas below are REAL task-quality deltas,
not underfitting noise):

    entropy floor                 ppl 3.08
    torch FP32                    ppl 3.113  acc 0.553
    engine FP32                   ppl 3.113  acc 0.553   (exact parity)
    INT8 trunc (default)          ppl 3.183  acc 0.548   (+2.2% ppl)
    INT8 nearest                  ppl 3.119  acc 0.553   (+0.2%)
    INT8 nearest + smooth         ppl 3.118  acc 0.553
    INT8 nearest + per-channel    ppl 3.118  acc 0.553
    W4 weight-only                ppl 3.134  acc 0.552   (+0.7%)
    W4 + GPTQ                     ppl 3.139  acc 0.554   (GPTQ ~= plain
                                  W4 here: with MSE-optimized group
                                  scales already on, the toy's margins
                                  leave it little to recover)
    W4A8 static (g=128)           ppl 3.143  acc 0.550   (+1.0%: the u8
                                  activation grid costs ~0.3% over
                                  weight-only W4 — and serves 1.7x
                                  faster than wo8, see README)
    W4A8 static (g=256)           ppl 3.141  acc 0.551   (group 256 is
                                  accuracy-NEUTRAL here and ~5% faster
                                  — the serving default trade)

At the smaller test geometry (dim 48 / depth 3, underfit at ppl ~5.9)
the trunc penalty is larger (+8.4%) — the -s/2 DC bias compounds worse
when logit margins are slimmer.  Both pins live in
tests/test_accuracy_lm.py; the round-3 llama logit-rms finding is now a
measured task-level regression, not a proxy metric.

``--spec`` (measured 2026-08-21): a 64d/2L draft trained on the same
chain (ppl 3.844 vs the 128d/4L target's 3.113) reaches draft-target
INT8 greedy agreement a = 0.838 -> 3.62 expected tokens per k=4
macro-step; with the on-chip verify cost (extend m=5 = 1.87x one step,
tools/spec_decode_tpu.py) and the weight-byte cost ratio f = 0.13,
estimated speculative speedup 1.44x — the first acceptance number on
REAL trained weights (round 3's spec evidence was random-weight
exactness only).  spec == greedy on the trained pair: True.
"""

from __future__ import annotations

import os

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # this host pre-imports jax with the remote axon TPU platform;
    # honoring the env var needs a post-import config update
    # (CLAUDE.md gotcha)
    jax.config.update("jax_platforms", "cpu")

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_chain(vocab: int, rng: np.random.Generator):
    """Order-2 Markov language: successors[s2, s1] = 4 permitted next
    tokens (distinct), probs [0.55, 0.25, 0.15, 0.05]."""
    succ = np.zeros((vocab, vocab, 4), np.int64)
    for a in range(vocab):
        for b in range(vocab):
            succ[a, b] = rng.choice(vocab, size=4, replace=False)
    probs = np.array([0.55, 0.25, 0.15, 0.05])
    ent = -(probs * np.log(probs)).sum()
    return succ, probs, float(np.exp(ent))


def sample_chain(succ, probs, n_seq: int, seq_len: int,
                 rng: np.random.Generator):
    vocab = succ.shape[0]
    out = np.zeros((n_seq, seq_len), np.int64)
    out[:, 0] = rng.integers(0, vocab, n_seq)
    out[:, 1] = rng.integers(0, vocab, n_seq)
    for t in range(2, seq_len):
        choice = rng.choice(4, size=n_seq, p=probs)
        out[:, t] = succ[out[:, t - 2], out[:, t - 1], choice]
    return out


def torch_eval(net, ids):
    import torch
    with torch.no_grad():
        logits = net(torch.tensor(ids))
    return np.asarray(logits.numpy(), np.float32)


def metrics(logits: np.ndarray, ids: np.ndarray, skip: int = 2):
    """Perplexity + next-token top-1 accuracy, predictions for rows
    [skip-1, T-1) against targets [skip, T) (the first ``skip`` tokens
    are unpredictable by construction)."""
    x = logits[:, skip - 1:-1].astype(np.float64)
    tgt = ids[:, skip:]
    x = x - x.max(-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    nll = -np.take_along_axis(logp, tgt[..., None], -1).mean()
    acc = (x.argmax(-1) == tgt).mean()
    return float(np.exp(nll)), float(acc)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=32)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--kv-heads", type=int, default=2)
    ap.add_argument("--seq", type=int, default=64)
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quick", action="store_true",
                    help="tiny geometry + few steps (the test harness)")
    ap.add_argument("--legs", type=str, default=None,
                    help="comma-separated substring filter over lever "
                         "legs (default: all)")
    ap.add_argument("--spec", action="store_true",
                    help="also train a SMALLER draft on the same chain "
                         "and measure speculative-decoding acceptance "
                         "on real trained weights")
    ap.add_argument("--family", choices=("llama", "gemma"),
                    default="llama",
                    help="twin architecture: llama (default) or gemma "
                         "(sandwich norms, softcaps, GeGLU, alternating "
                         "windows).  The round-1 lesson says gemma's "
                         "FINAL softcap compresses logit margins, so "
                         "its INT8 claims need trained-twin ppl, not "
                         "toy argmax agreement (round-4 VERDICT #8)")
    args = ap.parse_args(argv)
    if args.quick:
        args.dim, args.depth, args.steps, args.batch = 64, 3, 260, 48

    import torch
    import jax
    from int8inferenceengine_tpu import models, tensor, QuantConfig
    from int8inferenceengine_tpu.models.llama import torch_llama
    from int8inferenceengine_tpu.utils import (gptq, smooth,
                                               transformer_smooth_pairs)

    rng = np.random.default_rng(args.seed)
    succ, probs, floor = make_chain(args.vocab, rng)
    print(f"entropy floor: ppl {floor:.2f}")

    geo = dict(vocab_size=args.vocab, max_len=args.seq, dim=args.dim,
               depth=args.depth, heads=args.heads, kv_heads=args.kv_heads)
    if args.family == "gemma":
        from int8inferenceengine_tpu.models.gemma import torch_gemma
        # alternating windows engage for real: window < seq
        geo["sliding_window"] = max(8, args.seq // 4)
        twin_fn, zoo_name = torch_gemma, "gemma_tiny"
    else:
        twin_fn, zoo_name = torch_llama, "llama_tiny"
    net = twin_fn(**geo, seed=args.seed)
    opt = torch.optim.AdamW(net.parameters(), lr=3e-3,
                            weight_decay=0.01)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, args.steps)
    lossf = torch.nn.CrossEntropyLoss()
    t0 = time.time()
    for step in range(args.steps):
        ids = sample_chain(succ, probs, args.batch, args.seq, rng)
        x = torch.tensor(ids)
        logits = net(x)
        loss = lossf(logits[:, 1:-1].reshape(-1, args.vocab),
                     x[:, 2:].reshape(-1))
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if step % 100 == 0 or step == args.steps - 1:
            print(f"  step {step:4d} loss {float(loss):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    test = sample_chain(succ, probs, 64, args.seq,
                        np.random.default_rng(args.seed + 1))
    calib = sample_chain(succ, probs, 32, args.seq,
                         np.random.default_rng(args.seed + 2))
    t_ppl, t_acc = metrics(torch_eval(net, test), test)
    print(f"torch FP32: ppl {t_ppl:.3f} acc {t_acc:.3f}")
    state = net.state_dict()

    def engine_logits(m, ids):
        out = m(tensor(ids.astype(np.int32)))
        if out.quantized:
            return (np.asarray(out.data, np.float32)
                    - float(out.zero_point)) * float(out.scale)
        return np.asarray(out.data, np.float32)

    def build(config, quantize=True, use_smooth=False, use_gptq=False):
        m = models.build(zoo_name, **geo, config=config)
        m.load(state)
        if not quantize:
            return m
        if use_smooth:
            smooth(m, transformer_smooth_pairs(m),
                   calib.astype(np.int32))
        m.prepare()
        m(tensor(calib.astype(np.int32)))
        if use_gptq:
            gptq(m, calib.astype(np.int32))
        m.convert()
        return m

    results = {}
    legs = [
        ("engine FP32", dict(quantize=False), QuantConfig()),
        ("INT8 trunc (default)", {}, QuantConfig()),
        ("INT8 nearest", {}, QuantConfig(rounding="nearest")),
        ("INT8 nearest + smooth", dict(use_smooth=True),
         QuantConfig(rounding="nearest")),
        ("INT8 nearest + per-channel", {},
         QuantConfig(rounding="nearest", weight_per_channel=True)),
        ("W4 weight-only", {}, QuantConfig(weight_only=True,
                                           weight_bits=4)),
        ("W4 + GPTQ", dict(use_gptq=True),
         QuantConfig(weight_only=True, weight_bits=4)),
        ("W4A8 static (g=128)", {},
         QuantConfig(weight_bits=4, rounding="nearest")),
        ("W4A8 static (g=256)", {},
         QuantConfig(weight_bits=4, rounding="nearest", w4_group=256)),
    ]
    if args.legs:
        wanted = [w.strip() for w in args.legs.split(",")]
        legs = [leg for leg in legs
                if any(w == leg[0] or (w not in
                       [other[0] for other in legs] and w in leg[0])
                       for w in wanted)]
    for name, kw, cfg in legs:
        m = build(cfg, **kw)
        ppl, acc = metrics(engine_logits(m, test), test)
        results[name] = (ppl, acc)
        print(f"{name}: ppl {ppl:.3f} acc {acc:.3f}", flush=True)

    if args.spec:
        # speculative decoding on REAL trained weights: train a draft
        # at ~1/4 the size on the same chain, measure the draft-target
        # greedy agreement (the acceptance-rate driver) and verify
        # target-exactness of generate_speculative end to end
        dgeo = dict(geo, dim=max(32, args.dim // 2),
                    depth=max(1, args.depth // 2))
        dnet = torch_llama(**dgeo, seed=args.seed + 9)
        dopt = torch.optim.AdamW(dnet.parameters(), lr=3e-3,
                                 weight_decay=0.01)
        for step in range(args.steps // 2):
            ids = sample_chain(succ, probs, args.batch, args.seq, rng)
            x = torch.tensor(ids)
            loss = lossf(dnet(x)[:, 1:-1].reshape(-1, args.vocab),
                         x[:, 2:].reshape(-1))
            dopt.zero_grad()
            loss.backward()
            dopt.step()
        d_ppl, d_acc = metrics(torch_eval(dnet, test), test)
        print(f"draft torch FP32 ({dgeo['dim']}d/{dgeo['depth']}L): "
              f"ppl {d_ppl:.3f} acc {d_acc:.3f}", flush=True)
        tgt = build(QuantConfig(rounding="nearest"))
        drf = models.build("llama_tiny", **dgeo,
                           config=QuantConfig(rounding="nearest"))
        drf.load(dnet.state_dict())
        drf.prepare()
        drf(tensor(calib.astype(np.int32)))
        drf.convert()
        # acceptance driver: greedy agreement of draft vs target
        # next-token predictions on held-out text
        tl = engine_logits(tgt, test)[:, :-1].argmax(-1)
        dl = engine_logits(drf, test)[:, :-1].argmax(-1)
        a = float((tl == dl).mean())
        k = 4
        # macro-step economics with the on-chip verify numbers
        # (tools/spec_decode_tpu.py: extend m=5 costs 1.87x one step);
        # memory-bound decode => the draft step cost ratio f is the
        # WEIGHT-BYTE ratio of the two models
        def nbytes(net):
            return sum(int(np.prod(p.shape))
                       for _, l in net.named_layers()
                       for p in l.params.values())
        f = nbytes(drf) / nbytes(tgt)
        exp_len = (1 - a ** (k + 1)) / (1 - a) if a < 1 else k + 1
        speedup = exp_len / ((k + 1) * f + 1.87)
        print(f"draft-target INT8 agreement a={a:.3f} -> expected "
              f"{exp_len:.2f} tokens/macro-step, est. speedup at k={k} "
              f"{speedup:.2f}x (on-chip verify cost 1.87x/step, "
              f"draft f={f:.2f} by weight bytes)", flush=True)
        ids0 = test[:4, :8].astype(np.int32)
        spec = np.asarray(tgt.generate_speculative(drf, ids0, 16, k=k))
        greedy = np.asarray(tgt.generate(ids0, 16))
        print(f"spec == greedy on trained models: "
              f"{(spec == greedy).all()}", flush=True)
    return floor, (t_ppl, t_acc), results


if __name__ == "__main__":
    main()
