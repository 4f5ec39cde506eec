"""GenerationEngine: continuous batching for INT8 autoregressive decoding.

The image ``InferenceEngine`` coalesces independent forwards into one device
batch; decoding needs the slot-based variant (the vLLM-style scheduler, here
TPU-native): a FIXED number of slots share one compiled decode step, each
slot at its own sequence position over its own rows of the shared u8 KV
cache.  Requests stream in and out of slots without ever retracing:

* **One compiled decode step, ever.**  ``TextDecoder._decode_step`` takes
  per-slot position vectors; finished/empty slots keep computing (masked
  out on the host) — static shapes beat dynamic ones on TPU.
* **Chunked scans.**  The host must see each new token to detect
  completion, and on this environment a host sync costs a full tunnel
  round-trip — so the engine scans ``chunk_steps`` decode steps per sync
  (finished slots may overshoot a few steps; their extra tokens are
  dropped host-side).
* **Bucketed prefill.**  Prompts are right-padded to the next power-of-two
  bucket; the causal mask makes padded prefill exact (rows < T0 never see
  pad garbage), so there is one prefill compile per bucket, not per length.
* **Exactness.**  Slots are batch rows — every layer is row-independent —
  and dead cache rows are masked to exactly zero contribution (see
  models/text_decoder.py), so each request's tokens are bit-identical to
  running ``model.generate()`` alone (pinned by tests/test_generation.py).

Chunk economics (measured 2026-08-20, one v5e over the ~20 ms dev
tunnel; gpt2-small-ish, 8 slots, 24-token prompts, 64 new tokens/req,
best-of-3 after warm — tools/genengine_sweep.py):

    chunk_steps   8      16     32     64      (tok/s, overlap=False)
    8 requests    1055   1290   1439   1282
    24 requests   1023   1279   1467   1454
    overlap=True  1067-  1313-  1197-  1173-   (range over loads)
                  1079   1323   1556   1275

``chunk_steps=32`` is the measured default: big enough to amortize the
host-sync round-trip, small enough to bound completion overshoot.  At
24 slots the same chunk gives 1,669-1,693 tok/s (saturated load,
overlap again neutral-to-negative) — +9% over 8 slots.

Multi-chunk syncing (round 4, ``sync_chunks``): when the admission
queue is empty, up to ``sync_chunks`` chunks run as ONE device program
(a lax.while_loop with on-device per-slot remaining-token + EOS
counting that exits as soon as every slot drains), cutting host syncs
by that factor.  Measured (same chip/protocol, chunk=16, 8 slots,
best-of-3, 2026-08-20):

    sync_chunks        1      4      8     (tok/s)
    64 new tok/req     1062   1210   1066
    256 new tok/req    2217   2678   3105

Default 4: helps both loads and bounds admission latency to one
multi-chunk dispatch; raise to 8+ for saturated long-generation
serving (the 2.5k-tok/s engine target falls at 256-token requests).
Re-measured at round-5 HEAD (chunk 32, 16 x 24-token requests, all the
per-slot eos/topk/topp/stop program args in place —
tools/genengine_load_r5.py, 2026-08-21):

    sync_chunks        1      4      8     (tok/s)
    64 new tok/req     1549   1499   1497
    256 new tok/req    3255   3330   3669

— the chunk-32 + round-5 ladder sits ~15% above the round-4 chunk-16
table at every point; the driver bench leg (engine_tokens_per_s)
reproduced 3,508-3,666 the same chip-day.
Request outputs are bit-identical to sync_chunks=1 and to standalone
generate() (the device-side gate only stops slots whose tokens the
host would have dropped; pinned in tests/test_generation.py).
``overlap=True`` (dispatch chunk k+1 before fetching chunk k) helps at
full load (+6% at 24 req) but WASTES device work at light load (-17%
at 8 req): completion detection lags one chunk, so each request
overdecodes ~chunk_steps extra steps — a real cost when chunk_steps is
a large fraction of max_new.  Enable it for saturated serving with
long generations.  Non-tunnel bound for reference: at 0.349 ms/step
pure device time, 8 slots sustain ~22.9k tok/s — the gap here is the
per-chunk and per-prefill host sync over the tunnel.

Greedy decoding by default (argmax on u8 logit codes — bit-identical to
standalone ``generate()``); ``submit(..., temperature=t, seed=s)`` samples
that request's tokens instead (per-slot Gumbel-max on the dequantized
logits, deterministic in (seed, position); the draw stream differs from
standalone ``generate()``'s carried-key stream by construction).  The
greedy-only chunk program carries no sampling cost — a second chunk
variant compiles only when a sampled request is active.
``submit(..., top_p=p)`` nucleus sampling and ``submit(..., top_k=k)``
are both PER-REQUEST: on the u8 logit grid the nucleus set is a
DYNAMIC code threshold (a 256-bin histogram mass reverse-cumsum —
models.text_decoder.nucleus_code_floor — not a vocab sort), and as of
round 5 top_k is the COUNT form of the same trick
(models.text_decoder.topk_code_floor: the k-th-largest threshold is
the largest code whose suffix count reaches k — identical semantics
to the static lax.top_k threshold including kept ties, but k is a
traced per-slot vector).  Both given, the composition is sequential
HF semantics (nucleus mass over the top_k-kept codes).  Filter-free
sampled programs never pay the histograms (separate variants, same
economics as greedy-vs-sampled).  Optional ``eos_id`` stops a slot
early.

**Sharded serving** (round 5 — SURVEY hard-part #5, "continuous
batching over sharded weights"): the engine drives a ``shard()``ed
decoder directly.  Every device program — batched bucketed prefill,
the decode chunk, the multi-chunk while_loop, chunked prefill — runs
under ``shard_map`` on the model's mesh with the transformer-TP
context active: slots split over the DATA axis (each data-shard group
owns ``slots/data_size`` slot rows of cache + per-slot state),
attention heads over the MODEL axis (each device stores 1/model_size
of every slot's u8 KV cache rows — the same head-sharded cache layout
as sharded ``generate()``), row-parallel proj/fc2 psum their s32
partials inside the step.  Admission, host sync, and completion logic
are UNCHANGED — the host sees global arrays.  Design choices:

* **Prefill replicates over data, splits over model.**  Admitted
  prompts are replicated to every data-shard group (TP still divides
  the per-token FLOPs); each group then keeps only the cache rows
  whose global slot index lands in its block (an ownership-masked
  scatter — out-of-block rows drop).  Routing prompt rows to their
  slot's owning shard instead would save the duplicated prefill
  compute but needs a cross-shard permute keyed by slot assignment;
  at serving batch sizes prefill is a small fraction of decode time.
* **Per-data-group early exit.**  Inside shard_map the multi-chunk
  while_loop's drain condition is LOCAL to each data group — legal
  because the decode step's only collectives (psums / lazy gathers)
  pair across the model axis, whose members share the group's slots
  and therefore its trip count; chunk/work stats are psum/pmax'd for
  the host.
* **Exactness.**  Static-INT8 TP math is integer-exact (round-2
  proof), so request tokens are BIT-identical to sharded generate(),
  itself bit-identical to unsharded generate()
  (tests/test_engine_sharded.py: gpt + llama(GQA) at (4,2)/(2,2),
  sampled + top-p, chunked prefill, MQA fallback).
* **Prefix caching composes** (round 5, second pass): registration
  runs the scratch extends data-REPLICATED (the 1-row scratch cache
  channel-shards over the model axis only; every data group computes
  the identical rows — deterministic, so the replication invariant
  holds), and seeding writes the replicated rows into the owning
  group's slot block with the same slice→mask→write-back pattern as
  chunked prefill.
* **Scope.**  weight_only + mesh raises with an actionable message
  (float head-split cache specs are a different sharding story).

**Ring-cache serving** (round 5 — VERDICT #4): a ``ring_cache=True``
model's windowed layers allocate roundup32(2W) slot-cache rows instead
of ``max_len``, closing the O(W)-memory story exactly where many
concurrent slots make cache HBM matter.  Per-slot schedules turn the
generate()-path compaction ``lax.cond`` into a vmapped select (each
slot compacts on its own step; costs ~one extra window-read of HBM
per windowed layer per step — the price of per-slot schedules in one
SPMD program), and bucketed prefill slices each padded prompt's ring
tail PER ROW.  Engine tokens stay bit-identical to ``generate()`` on
the same ring model.  Chunked prefill (``prefill_chunk``) requires
full-length caches and is refused at construction.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..tensor import Tensor

__all__ = ["GenerationEngine", "GenerationStats"]


@dataclasses.dataclass
class GenerationStats:
    requests: int = 0          # completed requests
    tokens: int = 0            # tokens delivered (prefill + decode)
    prefills: int = 0
    chunks: int = 0            # device decode chunks dispatched
    chunk_slots_active: int = 0   # sum of active slots across chunks
    prefix_hits: int = 0       # admissions served from a cached prefix
    latencies_s: list = dataclasses.field(default_factory=list)

    @property
    def mean_slot_fill(self) -> float:
        """Average fraction of slots doing useful work per chunk."""
        return (self.chunk_slots_active / self.chunks if self.chunks
                else 0.0)

    def latency_percentiles(self, ps=(50, 90, 99)) -> dict:
        if not self.latencies_s:
            return {f"p{p}": float("nan") for p in ps}
        arr = np.asarray(self.latencies_s)
        return {f"p{p}": float(np.percentile(arr, p) * 1e3) for p in ps}


class _GenRequest:
    __slots__ = ("prompt", "max_new", "future", "tokens", "t_submit",
                 "temperature", "seed", "top_p", "top_k", "prefix_id",
                 "eos_id", "stream_q", "stop")

    def __init__(self, prompt: np.ndarray, max_new: int,
                 temperature: float = 0.0, seed: int = 0,
                 top_p: float = 1.0, top_k: int = 0,
                 prefix_id: int | None = None,
                 eos_id: int | None = None):
        self.prompt = prompt
        self.max_new = max_new
        self.temperature = float(temperature)
        self.seed = int(seed)
        self.top_p = float(top_p)
        self.top_k = int(top_k)            # 0 = off
        self.prefix_id = prefix_id
        self.eos_id = eos_id               # None = engine default
        self.stream_q = None               # set by submit_stream
        self.stop = ()                     # multi-token stop sequences
        self.future: Future = Future()
        self.tokens: list[int] = []
        self.t_submit = time.perf_counter()


def _bucket(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class GenerationEngine:
    """Continuous-batching greedy decoding over a converted TextDecoder.

    >>> eng = GenerationEngine(model, slots=4)
    >>> fut = eng.submit([5, 17, 99], max_new_tokens=32)
    >>> fut.result()                       # np.ndarray of generated ids
    """

    def __init__(self, model, slots: int = 8, chunk_steps: int = 32,
                 eos_id: int | None = None, overlap: bool = False,
                 sync_chunks: int = 4,
                 prefill_chunk: int | None = None,
                 max_prefixes: int = 32):
        if not model.is_quant:
            raise RuntimeError("GenerationEngine requires a converted model")
        # shard()ed decoders are served natively (round-4 VERDICT #1 /
        # SURVEY hard-part #5): every device program below runs under
        # shard_map on the model's mesh — slots split over the DATA axis
        # (each data-shard group owns slots/data_size slot rows of the
        # u8 KV cache), attention heads over the MODEL axis (each device
        # stores 1/model_size of every slot's cache rows, exactly like
        # sharded generate()), row-parallel proj/fc2 psum inside the
        # decode step.  Request tokens are BIT-identical to sharded
        # generate() (integer TP math is exact; pinned by
        # tests/test_engine_sharded.py).
        self._mesh = getattr(model, "_mesh", None)
        if self._mesh is not None:
            if model.config.weight_only:
                raise NotImplementedError(
                    "sharded serving runs the static-INT8 u8-cache path; "
                    "weight_only + shard() serving is unsupported — use "
                    "the static mode, or an unsharded engine")
            self._pa = model._parallel_axes
            self._tp_specs = model._tp_specs
            if slots % self._pa.data_size:
                raise ValueError(
                    f"slots {slots} must divide over the data axis "
                    f"({self._pa.data_size})")
            roles = (model.tp_roles(self._pa.model_size)
                     if hasattr(model, "tp_roles") else {})
            # head-local TP channel-shards the captured k/v (and so the
            # cache); the MQA fallback keeps qkv replicated -> the cache
            # stays channel-replicated and only MLP/proj are sharded
            self._kv_sharded = roles.get("wk1") == "col_local"
        self.model = model
        self.slots = slots
        self.chunk_steps = chunk_steps
        self.eos_id = eos_id
        # overlap=True double-buffers the chunk pipeline: chunk k+1 is
        # DISPATCHED before chunk k's tokens are fetched, so the ~20 ms
        # host-sync round-trip of this environment's tunnel overlaps the
        # next chunk's device time.  Completion detection lags one chunk:
        # a finished slot decodes (and overshoots) up to one extra chunk
        # whose tokens are dropped host-side — same mechanism as the
        # existing intra-chunk overshoot, one chunk deeper.  Position
        # overshoot past max_len is clamped by dynamic_update_slice to
        # the slot's own last cache row, which the next prefill of that
        # slot overwrites; other slots are untouched (rows are
        # independent).
        self.overlap = overlap
        # sync_chunks > 1: when the admission queue is EMPTY (no slot
        # could be refilled anyway), dispatch up to this many chunks as
        # ONE device program — a lax.while_loop with on-device per-slot
        # remaining-token + EOS counting that exits as soon as every
        # slot drains (round-4 VERDICT #8: the host sync itself was the
        # remaining engine bottleneck).  With queued work the engine
        # still syncs every chunk so finished slots refill promptly.
        self.sync_chunks = max(1, int(sync_chunks))
        # prefill_chunk: prompts LONGER than this prefill through ONE
        # fixed-size compiled extend program (chunks of prefill_chunk
        # tokens over the cached multi-token step `_extend_step`, one
        # request at a time) instead of a per-(bucket, n) prefill
        # compile.  The bucket path compiles a fresh program per power-
        # of-two prompt bucket — at T=2048 that is a 3-5 minute compile
        # (tools/prefill_ttft.py); the chunked path compiles ONCE and
        # serves any length.  Bit-identical to the bucket path:
        # `_extend_step` == m sequential steps == full prefill (the
        # cached-decode invariant chain, tests/test_generation.py).
        self.prefill_chunk = (None if prefill_chunk is None
                              else int(prefill_chunk))
        # ring-cache serving (round 5, VERDICT #4): a ring_cache model's
        # windowed layers allocate roundup32(2W) slot-cache rows instead
        # of max_len — the O(W) memory point of the windowed families,
        # NOW where it matters most (many slots x long max_len).  Each
        # slot compacts on its own schedule (a vmapped select in
        # _decode_step; costs ~one extra window-read of HBM per windowed
        # layer per step).  Bucketed prefill slices each prompt's ring
        # tail PER ROW (models/text_decoder.py _prefill).  Chunked
        # prefill requires full-length caches — mutually exclusive.
        # weight_only + ring: the float serving-prefill path has no
        # per-row ring-tail implementation (text_decoder._prefill is
        # u8-only there), so weight_only engines keep FULL-length
        # caches — the ring flag only changes generate()'s allocation
        # (round-5 review finding: ring-sized float caches crashed the
        # loop on the first long prompt)
        self._ring_serving = (bool(getattr(model, "ring_cache", False))
                              and not model.config.weight_only)
        if self._ring_serving and self.prefill_chunk is not None:
            raise ValueError(
                "prefill_chunk needs full-length slot caches; a "
                "ring_cache model serves through bucketed prefill — "
                "drop prefill_chunk, or build the model with "
                "ring_cache=False")
        self._queue: queue.Queue[_GenRequest | None] = queue.Queue()
        self._params = model._gather_params()
        def _rows(i):
            return (model._cache_rows(i) if self._ring_serving
                    else model.max_len)

        if model.config.weight_only:
            # float caches stay HEAD-SPLIT [slots, Hkv, T_max, D] — the
            # composed decode attention reads that layout directly
            # (kv_heads < heads is GQA: the cache is kv-compact)
            def _shape(i):
                return (slots, model.kv_heads, _rows(i), model.head_dim)
            dt = jnp.float32
        else:
            # u8 caches are T-major flat [slots, T_max, Hkv*D]: per-slot
            # appends are contiguous row writes, and the decode kernel's
            # DMA scales with each slot's live length (ops/attention.py).
            def _shape(i):
                return (slots, _rows(i),
                        model.kv_heads * model.head_dim)
            dt = jnp.uint8
        if self._mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            pa = self._pa
            self._cache_spec = P(pa.data_axis, None,
                                 pa.model_axis if self._kv_sharded
                                 else None)
            self._slot_spec = P(pa.data_axis)
            cache_sh = NamedSharding(self._mesh, self._cache_spec)
            slot_sh = NamedSharding(self._mesh, self._slot_spec)

            def _z(shp, d):
                return jax.device_put(jnp.zeros(shp, d), cache_sh)

            self._caches = {
                i: (_z(_shape(i), dt), _z(_shape(i), dt))
                for i in range(1, model.depth + 1)
            }

            def _zs(shp, d, one=False):
                a = (jnp.ones(shp, d) if one else jnp.zeros(shp, d))
                return jax.device_put(a, slot_sh)

            self._pos = _zs((slots,), jnp.int32)
            self._tok = _zs((slots,), jnp.int32)
            self._temp = _zs((slots,), jnp.float32)
            self._topp = _zs((slots,), jnp.float32, one=True)
            self._topk = _zs((slots,), jnp.int32)
            self._eos = jax.device_put(
                jnp.full((slots,), -1, jnp.int32), slot_sh)
            self._keys = _zs((slots, 2), jnp.uint32)
        else:
            self._caches = {
                i: (jnp.zeros(_shape(i), dt), jnp.zeros(_shape(i), dt))
                for i in range(1, model.depth + 1)
            }
            self._pos = jnp.zeros((slots,), jnp.int32)
            self._tok = jnp.zeros((slots,), jnp.int32)
            self._temp = jnp.zeros((slots,), jnp.float32)   # 0 = greedy
            self._topp = jnp.ones((slots,), jnp.float32)    # 1 = no nucleus
            self._topk = jnp.zeros((slots,), jnp.int32)     # 0 = no top-k
            self._eos = jnp.full((slots,), -1, jnp.int32)   # -1 = none
            self._keys = jnp.zeros((slots, 2), jnp.uint32)  # per-slot PRNG
        self._active = [None] * slots      # slot -> _GenRequest | None
        self.stats = GenerationStats()
        self._prefill_fns: dict[int, object] = {}
        # prefix table: registered rows live on DEVICE until
        # unregistered, so the table is bounded (round-4 advisor
        # finding: unbounded growth + un-locked pid allocation).
        self.max_prefixes = int(max_prefixes)
        self._prefix_lock = threading.Lock()
        self._next_pid = 1
        self._prefixes: dict[int, tuple] = {}   # id -> (tokens, kv rows)
        self._seed_fns: dict[int, object] = {}  # prefix len -> jitted seed
        self._SEED_FN_CAP = 8                   # mirrors _spec_cache
        self._chunk_fns: dict[bool, object] = {}
        self._multi_fns: dict[bool, object] = {}
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- public API -----------------------------------------------------------
    def register_prefix(self, tokens) -> int:
        """Precompute a shared prompt prefix's KV rows ONCE; submissions
        passing ``prefix_id=`` skip recomputing them (system-prompt /
        few-shot-context caching).

        TPU-native exactness story: on the static INT8 path cached k/v
        are u8 codes at FIXED calibrated (scale, zp), and position t's
        codes depend only on tokens <= t — so a prefix's rows are
        context-independent and integer-exact regardless of which
        program computed them.  Registration therefore rides the SAME
        fixed-shape chunked-extend program as long-prompt prefill
        (``prefill_chunk`` must be set; jit re-specializes it once for
        the 1-row scratch cache), and a prefixed request's tokens are
        BIT-IDENTICAL to submitting the full prompt cold
        (tests/test_prefix_cache.py).  weight_only serving also works
        but is float: rows computed chunked may differ in ulps from a
        bucket prefill's (program-variant tiling), so bit-identity is
        not guaranteed there — same caveat as the chunked path itself.

        Thread-safe: registration computes into a private scratch cache
        and only then publishes to the prefix table."""
        if self.prefill_chunk is None:
            raise ValueError(
                "prefix caching rides the chunked-prefill program; "
                "construct GenerationEngine(..., prefill_chunk=P)")
        tokens = np.asarray(tokens, np.int32).reshape(-1)
        t0 = len(tokens)
        m = self.model
        if t0 == 0:
            raise ValueError("empty prefix")
        if t0 >= m.max_len:
            raise ValueError(
                f"prefix {t0} leaves no room under max_len {m.max_len}")
        P = self.prefill_chunk
        if m.config.weight_only:
            shape = (1, m.kv_heads, m.max_len, m.head_dim)
            dt = jnp.float32
        else:
            shape = (1, m.max_len, m.kv_heads * m.head_dim)
            dt = jnp.uint8
        caches = {i: (jnp.zeros(shape, dt), jnp.zeros(shape, dt))
                  for i in range(1, m.depth + 1)}
        fn = (self._prefix_extend_fn() if self._mesh is not None
              else self._extend_fn())
        starts = list(range(0, t0, P))
        if starts[-1] + P > m.max_len:
            starts[-1] = m.max_len - P     # same slide-back as admit
        pad = np.zeros((m.max_len,), np.int32)
        pad[:t0] = tokens
        for c0 in starts:
            caches, _ = fn(self._params, caches, jnp.int32(0),
                           jnp.asarray(pad[c0:c0 + P]), jnp.int32(c0))
        if m.config.weight_only:
            rows = {i: (k[0, :, :t0], v[0, :, :t0])
                    for i, (k, v) in caches.items()}
        else:
            rows = {i: (k[0, :t0], v[0, :t0])
                    for i, (k, v) in caches.items()}
        with self._prefix_lock:
            if len(self._prefixes) >= self.max_prefixes:
                raise RuntimeError(
                    f"prefix table full ({self.max_prefixes} registered "
                    f"prefixes, each holding KV rows on device); "
                    f"unregister_prefix() one first or raise "
                    f"max_prefixes")
            pid = self._next_pid
            self._next_pid += 1
            self._prefixes[pid] = (tokens, rows)
        return pid

    def unregister_prefix(self, prefix_id: int) -> None:
        """Drop a registered prefix (frees its device KV rows via GC).
        In-flight requests that named it will fail loudly at admission;
        drain or complete them first."""
        with self._prefix_lock:
            if prefix_id not in self._prefixes:
                raise ValueError(f"unknown prefix_id {prefix_id}")
            del self._prefixes[prefix_id]

    def _build_request(self, prompt, max_new_tokens: int,
                       temperature: float = 0.0, seed: int = 0,
                       top_p: float = 1.0, top_k: int | None = None,
                       prefix_id: int | None = None,
                       eos_id: int | None = None,
                       stop=None) -> _GenRequest:
        if not self._running:
            raise RuntimeError("engine is shut down")
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        if len(prompt) == 0:
            raise ValueError("empty prompt")
        if prefix_id is not None:
            if prefix_id not in self._prefixes:
                raise ValueError(f"unknown prefix_id {prefix_id}")
            pre = self._prefixes[prefix_id][0]
            if len(prompt) <= len(pre):
                raise ValueError(
                    f"prompt ({len(prompt)} tokens) must EXTEND the "
                    f"{len(pre)}-token prefix by at least one token")
            if not np.array_equal(prompt[:len(pre)], pre):
                raise ValueError(
                    f"prompt does not start with prefix {prefix_id}'s "
                    "tokens")
        if temperature < 0:
            raise ValueError(f"temperature must be >= 0, got {temperature}")
        if not 0.0 < top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        if top_k is not None and top_k < 1:
            raise ValueError(f"top_k must be >= 1, got {top_k}")
        if len(prompt) + max_new_tokens > self.model.max_len:
            raise ValueError(
                f"prompt {len(prompt)} + max_new {max_new_tokens} exceeds "
                f"max_len {self.model.max_len}")
        req = _GenRequest(
            prompt, max_new_tokens, temperature, seed,
            top_p, 0 if top_k is None else int(top_k), prefix_id,
            self.eos_id if eos_id is None else int(eos_id))
        if stop:
            # multi-token stop SEQUENCES (host-side: the device can
            # only gate on single tokens — per-slot eos — so sequence
            # matches are detected at chunk-fetch time like max_new;
            # the slot overshoots within its chunk, extra tokens drop).
            # A match truncates the output AFTER the stop sequence
            # (the stop tokens are included, like eos_id's token).
            seqs = []
            for sq in stop:
                sq = [int(t) for t in np.asarray(sq).reshape(-1)]
                if not sq:
                    raise ValueError("empty stop sequence")
                seqs.append(tuple(sq))
            req.stop = tuple(seqs)
        return req

    def submit(self, prompt, max_new_tokens: int, **kw) -> Future:
        """Queue a request; the Future resolves to the generated ids.

        Per-request knobs (each rides the ONE compiled chunk program as
        a traced per-slot value): ``temperature``/``seed`` sampling,
        ``top_p`` nucleus, ``top_k`` (dynamic count threshold),
        ``eos_id`` stop token (overrides the engine default; the
        device-side early stop gates on a per-slot vector),
        ``stop=[[...], ...]`` multi-token stop sequences (host-side
        suffix match at chunk granularity; the matched sequence is
        included in the output), and ``prefix_id`` (registered
        shared-prefix KV reuse)."""
        req = self._build_request(prompt, max_new_tokens, **kw)
        self._queue.put(req)
        return req.future

    def submit_stream(self, prompt, max_new_tokens: int, **kw):
        """Like :meth:`submit`, but returns an ITERATOR that yields
        each generated token id as the engine produces it (granularity:
        one decode chunk — tokens arrive in bursts of up to
        ``chunk_steps``).  The iterator raises at the point of failure
        if the request errors, and ends after the last token."""
        req = self._build_request(prompt, max_new_tokens, **kw)
        req.stream_q = queue.Queue()
        self._queue.put(req)

        def _iter():
            while True:
                t = req.stream_q.get()
                if t is None:
                    break
                yield t
            req.future.result()      # surface failures / cancellation

        return _iter()

    def generate(self, prompt, max_new_tokens: int) -> np.ndarray:
        return self.submit(prompt, max_new_tokens).result()

    def shutdown(self, wait: bool = True) -> None:
        self._running = False
        self._queue.put(None)
        if wait:
            self._thread.join()

    # -- jitted device programs ------------------------------------------------
    def _shard_wrap(self, run, in_specs, out_specs):
        """Wrap a device program in shard_map over the model's mesh with
        the transformer-TP context active inside (mirrors
        TextDecoder._sharded_generate_fn).  ``in_specs``/``out_specs``
        are pytrees of PartitionSpecs matching run's args/results."""
        from ..parallel.context import axes as axes_ctx

        mesh, pa = self._mesh, self._pa

        def wrapped(*args):
            def local(*largs):
                with axes_ctx(pa):
                    return run(*largs)

            return jax.shard_map(
                local, mesh=mesh, in_specs=in_specs,
                out_specs=out_specs, check_vma=False)(*args)

        return wrapped

    def _specs(self):
        """(cache_specs_pytree, per_slot_spec, replicated_spec)."""
        from jax.sharding import PartitionSpec as P
        cs = self._cache_spec
        cache_specs = {i: (cs, cs)
                       for i in range(1, self.model.depth + 1)}
        return cache_specs, self._slot_spec, P()

    def _pick(self, codes, temps, keys, pos, topps=None, topks=None):
        """Per-slot next-token choice: argmax for temp == 0, Gumbel-max
        sampling of logits/temp otherwise.  ``keys`` are per-slot raw
        PRNG keys; the draw is keyed by fold_in(key, pos) so it is
        deterministic in (seed, position) with no carried key state.

        ``topps`` (per-slot nucleus top_p, 1.0 = off) is a TRACED
        vector: the u8 nucleus is a dynamic code threshold
        (models.text_decoder.nucleus_code_floor — a 256-bin histogram
        cumsum, no vocab sort), so unlike a static ``top_k`` it can
        differ per slot inside one compiled chunk program.  The
        argument is None in the no-top_p program variants so purely
        temperature-sampled serving never pays the histogram."""
        greedy = jnp.argmax(codes, -1).astype(jnp.int32)
        is_u8 = codes.dtype == jnp.uint8
        if is_u8:
            scale, zp = self.model._head_scale_zp()
            logits = (codes.astype(jnp.float32) - jnp.float32(zp)) \
                * jnp.float32(scale)
        else:                               # weight_only: float logits
            logits = codes.astype(jnp.float32)
        keepk = None
        hist = fl = None
        if topks is not None:
            # per-slot DYNAMIC top_k (round 5): on the u8 grid the
            # k-th-largest threshold is a histogram COUNT cumsum
            # (topk_code_floor) — identical semantics to the static
            # lax.top_k threshold (ties kept), but k is traced, so it
            # rides the one compiled chunk program like top_p does
            from ..models.text_decoder import (code_histogram,
                                               topk_code_floor)
            if is_u8:
                hist = code_histogram(codes)   # shared with the nucleus
                fl = topk_code_floor(codes, topks, hist=hist)
                keepk = codes >= fl[:, None]
            else:
                srt = -jnp.sort(-logits, -1)
                idx = jnp.clip(topks - 1, 0, logits.shape[-1] - 1)
                kth = jnp.take_along_axis(srt, idx[:, None], 1)
                keepk = logits >= kth
            keepk = keepk | (topks <= 0)[:, None]      # 0 = off
            logits = jnp.where(keepk, logits, -jnp.inf)
        if topps is not None:
            from ..models.text_decoder import (nucleus_code_floor,
                                               nucleus_float_cutoff)
            t_safe = jnp.maximum(temps, 1e-6)
            if is_u8:
                # sequential HF semantics when composed with top_k:
                # the nucleus mass is measured over the kept codes.
                # The top_k mask is a CODE threshold, so it applies to
                # the shared count histogram at class level — ONE
                # O(B*V) scatter serves both filters (round-5 review)
                hm = None
                if hist is not None:
                    vcls = jnp.arange(256, dtype=jnp.uint8)
                    hm = jnp.where(
                        (topks > 0)[:, None],
                        hist * (vcls[None, :] >= fl[:, None]), hist)
                floor = nucleus_code_floor(codes, scale / t_safe, topps,
                                           hist=hm)
                keep = codes >= floor[:, None]
                if keepk is not None:
                    keep = keep & keepk
            else:
                lt = logits / t_safe[:, None]
                keep = lt >= nucleus_float_cutoff(lt, topps)
            # topps == 1.0 keeps every occupied class; the explicit
            # gate also spares greedy slots the filter entirely
            keep = keep | (topps >= 1.0)[:, None]
            logits = jnp.where(keep, logits, -jnp.inf)

        def draw(key, lg, t, p):
            u = jax.random.uniform(jax.random.fold_in(key, p),
                                   lg.shape, minval=1e-7, maxval=1.0)
            return jnp.argmax(lg / jnp.maximum(t, 1e-6)
                              - jnp.log(-jnp.log(u)), -1)

        sampled = jax.vmap(draw)(keys, logits, temps,
                                 pos).astype(jnp.int32)
        return jnp.where(temps > 0, sampled, greedy)

    def _prefill_fn(self, bucket: int, n: int, use_topp: bool = False,
                    use_topk: bool = False):
        """Batched prefill: ``n`` same-bucket prompts in ONE forward,
        their caches scattered to their slots in one call.  One compile
        per (bucket, n) pair — admits are grouped to power-of-two ``n``
        so the variant count stays tiny while a burst of arrivals costs
        one device round-trip instead of one per request."""
        fn = self._prefill_fns.get((bucket, n, use_topp, use_topk))
        if fn is None:
            m = self.model
            sharded = self._mesh is not None
            if sharded:
                pa, ls = self._pa, self.slots // self._pa.data_size

            def run(params, caches, slots, prompts_pad, t0s, temps,
                    keys, topps, topks):
                m._bind(params)
                try:
                    codes, cache1 = m._prefill(
                        Tensor(prompts_pad.astype(jnp.float32)), last=t0s,
                        full_cache=not self._ring_serving)
                finally:
                    m._bind(None)
                if sharded:
                    # prompts are replicated over the data axis (every
                    # shard prefills all n — TP still splits the heads);
                    # each data-shard group then keeps only the rows
                    # whose GLOBAL slot index falls in its block:
                    # out-of-block rows scatter to index ls -> dropped
                    d0 = lax.axis_index(pa.data_axis) * ls
                    li = slots - d0
                    li = jnp.where((li >= 0) & (li < ls), li, ls)
                else:
                    li = slots
                out = {}
                for i, (k1, v1) in cache1.items():   # [n, T_max, C]
                    gk, gv = caches[i]
                    out[i] = (gk.at[li].set(k1, mode="drop"),
                              gv.at[li].set(v1, mode="drop"))
                toks = self._pick(codes, temps, keys, t0s - 1,
                                  topps if use_topp else None,
                                  topks if use_topk else None)   # [n]
                return out, toks

            # donate the cache: it is dead after the call (rebound to
            # the result) and copying the whole multi-layer KV cache per
            # prefill would be pure HBM overhead
            if sharded:
                cache_specs, _, rp = self._specs()
                run = self._shard_wrap(
                    run,
                    (self._tp_specs, cache_specs, rp, rp, rp, rp, rp,
                     rp, rp),
                    (cache_specs, rp))
            fn = jax.jit(run, donate_argnums=(1,))
            self._prefill_fns[(bucket, n, use_topp, use_topk)] = fn
        return fn

    def _chunk(self, sampled: bool, use_topp: bool = False,
               use_topk: bool = False):
        """The decode-chunk program; the ``sampled`` variant adds the
        per-slot Gumbel draw and compiles only once a sampled request is
        actually admitted — pure-greedy serving never pays for it (and
        the ``use_topp`` variant likewise gates the nucleus histogram
        on a top_p request being active)."""
        fn = self._chunk_fns.get((sampled, use_topp, use_topk))
        if fn is None:
            m, steps = self.model, self.chunk_steps

            def run(params, caches, pos, tok, active, temps, keys,
                    topps, topks, eosv):
                m._bind(params)
                try:
                    def body(carry, _):
                        caches, pos, tok, act = carry
                        codes, caches = m._decode_step(caches, pos, tok)
                        if sampled:
                            nxt = self._pick(
                                codes, temps, keys, pos,
                                topps if use_topp else None,
                                topks if use_topk else None)
                        else:
                            nxt = jnp.argmax(codes, -1).astype(jnp.int32)
                        nxt = jnp.where(act, nxt, tok)
                        # per-slot stop tokens: -1 never matches
                        act = act & (nxt != eosv)
                        pos = jnp.where(act, pos + 1, pos)
                        return (caches, pos, nxt, act), nxt

                    (caches, pos, tok, act), toks = lax.scan(
                        body, (caches, pos, tok, active), None,
                        length=steps)
                    return caches, pos, tok, act, jnp.swapaxes(toks, 0, 1)
                finally:
                    m._bind(None)

            if self._mesh is not None:
                cache_specs, ps, _ = self._specs()
                run = self._shard_wrap(
                    run,
                    (self._tp_specs, cache_specs, ps, ps, ps, ps, ps,
                     ps, ps, ps),
                    (cache_specs, ps, ps, ps, ps))
            fn = jax.jit(run, donate_argnums=(1, 2, 3))
            self._chunk_fns[(sampled, use_topp, use_topk)] = fn
        return fn

    def _multichunk(self, sampled: bool, use_topp: bool = False,
                    use_topk: bool = False):
        """Up to ``sync_chunks`` chunks as ONE device program: a
        lax.while_loop whose condition counts per-slot remaining tokens
        and EOS on DEVICE, so a saturated engine syncs to the host once
        per ``sync_chunks * chunk_steps`` steps (or earlier, the moment
        every slot drains).  Per-step token semantics are identical to
        the single-chunk program — the extra ``remaining`` gate only
        STOPS a slot where the host's counting would have dropped its
        tokens anyway, so request outputs stay bit-identical to
        standalone generate()."""
        fn = self._multi_fns.get((sampled, use_topp, use_topk))
        if fn is None:
            m, steps = self.model, self.chunk_steps
            kmax, slots = self.sync_chunks, self.slots
            sharded = self._mesh is not None
            if sharded:
                # inside shard_map every array is a LOCAL block; each
                # data-shard group runs its own while_loop and may exit
                # early (its slots drained) — legal because the decode
                # step's only collectives (row-parallel psums, lazy
                # gathers) pair across the MODEL axis, whose members
                # share the group's slots and therefore its trip count
                pa = self._pa
                slots = slots // pa.data_size

            def run(params, caches, pos, tok, active, remaining,
                    temps, keys, topps, topks, eosv):
                m._bind(params)
                try:
                    def step(carry, _):
                        caches, pos, tok, act, rem = carry
                        codes, caches = m._decode_step(caches, pos, tok)
                        if sampled:
                            nxt = self._pick(
                                codes, temps, keys, pos,
                                topps if use_topp else None,
                                topks if use_topk else None)
                        else:
                            nxt = jnp.argmax(codes, -1).astype(jnp.int32)
                        nxt = jnp.where(act, nxt, tok)
                        rem = jnp.where(act, rem - 1, rem)
                        act = act & (rem > 0)
                        act = act & (nxt != eosv)      # -1 never fires
                        pos = jnp.where(act, pos + 1, pos)
                        return (caches, pos, nxt, act, rem), nxt

                    def chunk(state):
                        caches, pos, tok, act, rem, out, c, work = state
                        work = work + jnp.sum(act.astype(jnp.int32))
                        (caches, pos, tok, act, rem), toks = lax.scan(
                            step, (caches, pos, tok, act, rem), None,
                            length=steps)
                        out = lax.dynamic_update_slice(
                            out, jnp.swapaxes(toks, 0, 1),
                            (jnp.int32(0), c * steps))
                        return (caches, pos, tok, act, rem, out, c + 1,
                                work)

                    def cond(state):
                        return (state[6] < kmax) & jnp.any(state[3])

                    out0 = jnp.zeros((slots, kmax * steps), jnp.int32)
                    (caches, pos, tok, act, rem, out, c,
                     work) = lax.while_loop(
                        cond, chunk,
                        (caches, pos, tok, active, remaining, out0,
                         jnp.int32(0), jnp.int32(0)))
                    if sharded:
                        # per-group chunk counts may differ (early
                        # exit); report fleet totals to the host stats
                        work = lax.psum(work, pa.data_axis)
                        c = lax.pmax(c, pa.data_axis)
                    return caches, pos, tok, act, rem, out, c, work
                finally:
                    m._bind(None)

            if sharded:
                cache_specs, ps, rp = self._specs()
                run = self._shard_wrap(
                    run,
                    (self._tp_specs, cache_specs, ps, ps, ps, ps, ps,
                     ps, ps, ps, ps),
                    (cache_specs, ps, ps, ps, ps, ps, rp, rp))
            fn = jax.jit(run, donate_argnums=(1, 2, 3))
            self._multi_fns[(sampled, use_topp, use_topk)] = fn
        return fn

    def _extend_fn(self):
        """One-slot chunked-prefill program: slice the slot's cache
        rows, run `_extend_step` on the [1, prefill_chunk] token chunk,
        write the rows back.  Compiled ONCE (shapes are fixed by
        prefill_chunk), reused for every chunk of every long prompt."""
        fn = getattr(self, "_extend_jit", None)
        if fn is None:
            m = self.model
            sharded = self._mesh is not None
            if not sharded:
                run = self._plain_extend_run()
            else:
                pa, ls = self._pa, self.slots // self._pa.data_size

                def run(params, caches, slot, chunk, base):
                    m._bind(params)
                    try:
                        # every data-shard group runs the extend on its
                        # clipped local row (static shapes; non-owners
                        # compute on a garbage row), but only the OWNER
                        # group's result is written back / reported
                        d0 = lax.axis_index(pa.data_axis) * ls
                        owned = (slot >= d0) & (slot < d0 + ls)
                        li = jnp.clip(slot - d0, 0, ls - 1)
                        sub0 = {
                            i: (lax.dynamic_slice_in_dim(k, li, 1, 0),
                                lax.dynamic_slice_in_dim(v, li, 1, 0))
                            for i, (k, v) in caches.items()}
                        codes, sub = m._extend_step(
                            sub0, jnp.full((1,), base, jnp.int32),
                            chunk[None])
                        sub = {i: (jnp.where(owned, sub[i][0],
                                             sub0[i][0]),
                                   jnp.where(owned, sub[i][1],
                                             sub0[i][1]))
                               for i in sub}
                        # owner's logit codes, replicated to every shard
                        codes = lax.psum(
                            jnp.where(owned, codes.astype(jnp.int32), 0),
                            pa.data_axis).astype(codes.dtype)
                        out = {
                            i: (lax.dynamic_update_slice_in_dim(
                                    caches[i][0], sub[i][0], li, 0),
                                lax.dynamic_update_slice_in_dim(
                                    caches[i][1], sub[i][1], li, 0))
                            for i in caches}
                        return out, codes[0]
                    finally:
                        m._bind(None)

                cache_specs, _, rp = self._specs()
                run = self._shard_wrap(
                    run, (self._tp_specs, cache_specs, rp, rp, rp),
                    (cache_specs, rp))
            fn = jax.jit(run, donate_argnums=(1,))
            self._extend_jit = fn
        return fn

    def _plain_extend_run(self):
        """The unmasked single-slot extend body (slice -> _extend_step
        -> write-back), shared by the unsharded _extend_fn and the
        data-replicated _prefix_extend_fn so the slide-back/clamp
        semantics live in ONE place (round-5 review finding)."""
        m = self.model

        def run(params, caches, slot, chunk, base):
            m._bind(params)
            try:
                sub = {
                    i: (lax.dynamic_slice_in_dim(k, slot, 1, 0),
                        lax.dynamic_slice_in_dim(v, slot, 1, 0))
                    for i, (k, v) in caches.items()}
                codes, sub = m._extend_step(
                    sub, jnp.full((1,), base, jnp.int32),
                    chunk[None])
                out = {
                    i: (lax.dynamic_update_slice_in_dim(
                            caches[i][0], sub[i][0], slot, 0),
                        lax.dynamic_update_slice_in_dim(
                            caches[i][1], sub[i][1], slot, 0))
                    for i in caches}
                return out, codes[0]
            finally:
                m._bind(None)

        return run

    def _prefix_extend_fn(self):
        """Sharded prefix registration's scratch extend: the 1-row
        scratch cache cannot split over the data axis, so it stays
        data-REPLICATED (channel-sharded over the model axis when the
        cache is) and every data-shard group computes the identical
        extend — deterministic, so the replication invariant holds
        without any ownership masking."""
        fn = getattr(self, "_prefix_extend_jit", None)
        if fn is None:
            m = self.model
            run = self._plain_extend_run()
            from jax.sharding import PartitionSpec as P
            cs = P(None, None,
                   self._pa.model_axis if self._kv_sharded else None)
            cache_specs = {i: (cs, cs)
                           for i in range(1, m.depth + 1)}
            run = self._shard_wrap(
                run, (self._tp_specs, cache_specs, P(), P(), P()),
                (cache_specs, P()))
            fn = jax.jit(run, donate_argnums=(1,))
            self._prefix_extend_jit = fn
        return fn

    def _seed_fn(self, base: int):
        """Jitted whole-cache prefix seeding: write all layers' prefix
        rows into one slot in a single donated device program.  One
        compile per distinct prefix LENGTH (shapes fix everything
        else)."""
        fn = self._seed_fns.get(base)
        if fn is None:
            wo = self.model.config.weight_only
            sharded = self._mesh is not None
            if sharded:
                pa, ls = self._pa, self.slots // self._pa.data_size

            def run(caches, rows, slot):
                if sharded:
                    # rows are data-replicated; only the slot's owning
                    # group writes (slice -> mask -> write-back, the
                    # chunked-prefill pattern)
                    d0 = lax.axis_index(pa.data_axis) * ls
                    owned = (slot >= d0) & (slot < d0 + ls)
                    li = jnp.clip(slot - d0, 0, ls - 1)
                else:
                    owned, li = True, slot
                out = {}
                for i, (k, v) in caches.items():
                    pk, pv = rows[i]
                    if wo:      # head-split float [slots, Hkv, T, D]
                        sk = lax.dynamic_slice_in_dim(k, li, 1, 0)
                        sv = lax.dynamic_slice_in_dim(v, li, 1, 0)
                        nk = lax.dynamic_update_slice(
                            sk, pk[None], (0, 0, 0, 0))
                        nv = lax.dynamic_update_slice(
                            sv, pv[None], (0, 0, 0, 0))
                    else:       # T-major flat u8 [slots, T, C]
                        sk = lax.dynamic_slice_in_dim(k, li, 1, 0)
                        sv = lax.dynamic_slice_in_dim(v, li, 1, 0)
                        nk = lax.dynamic_update_slice(sk, pk[None],
                                                      (0, 0, 0))
                        nv = lax.dynamic_update_slice(sv, pv[None],
                                                      (0, 0, 0))
                    if sharded:
                        nk = jnp.where(owned, nk, sk)
                        nv = jnp.where(owned, nv, sv)
                    out[i] = (
                        lax.dynamic_update_slice_in_dim(k, nk, li, 0),
                        lax.dynamic_update_slice_in_dim(v, nv, li, 0))
                return out

            if sharded:
                from jax.sharding import PartitionSpec as P
                cache_specs, _, _ = self._specs()
                rs = P(None, self._pa.model_axis if self._kv_sharded
                       else None)
                row_specs = {i: (rs, rs)
                             for i in range(1, self.model.depth + 1)}
                run = self._shard_wrap(
                    run, (cache_specs, row_specs, P()), cache_specs)
            fn = jax.jit(run, donate_argnums=(0,))
            if len(self._seed_fns) >= self._SEED_FN_CAP:
                # FIFO-evict: one compile per distinct prefix LENGTH, so
                # the cap only costs a recompile on pathological length
                # churn
                self._seed_fns.pop(next(iter(self._seed_fns)))
            self._seed_fns[base] = fn
        return fn

    def _admit_chunked(self, slot: int, req: _GenRequest) -> None:
        """Prefill one long prompt through fixed-size extend chunks;
        with ``req.prefix_id``, seed the registered prefix's KV rows
        into the slot first and chunk only the suffix."""
        P = self.prefill_chunk
        t0 = len(req.prompt)
        max_len = self.model.max_len
        # register FIRST: any failure below (stale prefix, device error
        # in the seed program) must fail THIS request's future via the
        # crash handler rather than orphan it (round-5 review finding:
        # the stale-prefix raise used to fire before registration, so
        # the caller hung forever AND the raise killed the loop)
        self._active[slot] = req
        base = 0
        if req.prefix_id is not None:
            entry = self._prefixes.get(req.prefix_id)
            if entry is None:
                # fail just this request — a stale prefix_id is a
                # caller mistake, not an engine-fatal condition
                self._active[slot] = None
                req.future.set_exception(ValueError(
                    f"prefix {req.prefix_id} was unregistered while "
                    "the request was queued"))
                self._stream_close(req)
                return
            pre_tokens, rows = entry
            base = len(pre_tokens)
            # ONE jitted, cache-donating program writes every layer's
            # prefix rows — per-layer .at[].set dispatches cost a full
            # cache copy + a tunnel dispatch EACH (measured 2026-08-21:
            # 24 dispatches made the prefixed TTFT 83 ms vs 42 cold)
            self._caches = self._seed_fn(base)(
                self._caches, rows, jnp.int32(slot))
            self.stats.prefix_hits += 1
        starts = list(range(base, t0, P))
        if starts[-1] + P > max_len:
            # the rounded-up final chunk must not write cache rows past
            # max_len (dynamic_update_slice would CLAMP the start and
            # silently overwrite earlier real rows — round-4 review
            # finding).  Slide it back to end exactly at max_len: the
            # overlapped rows rewrite with identical tokens at
            # identical positions -> identical k/v codes, bit-exact.
            starts[-1] = max_len - P
        pad = np.zeros((max_len,), np.int32)
        pad[:t0] = req.prompt
        fn = self._extend_fn()
        slot_j = jnp.int32(slot)
        codes = None
        for c0 in starts:
            self._caches, codes = fn(
                self._params, self._caches, slot_j,
                jnp.asarray(pad[c0:c0 + P]), jnp.int32(c0))
        last = (t0 - 1) - starts[-1]
        row = codes[last]                   # u8 logit codes [vocab]
        if req.temperature > 0:
            key = jnp.asarray(jax.random.PRNGKey(req.seed), jnp.uint32)
            self._keys = self._keys.at[slot].set(key)
            self._temp = self._temp.at[slot].set(
                jnp.float32(req.temperature))
            self._topp = self._topp.at[slot].set(jnp.float32(req.top_p))
            self._topk = self._topk.at[slot].set(jnp.int32(req.top_k))
            tok0 = int(self._pick(
                row[None], jnp.full((1,), req.temperature, jnp.float32),
                key[None], jnp.full((1,), t0 - 1, jnp.int32),
                (jnp.full((1,), req.top_p, jnp.float32)
                 if req.top_p < 1.0 else None),
                (jnp.full((1,), req.top_k, jnp.int32)
                 if req.top_k > 0 else None))[0])
        else:
            tok0 = int(jnp.argmax(row))
        # eos applies to greedy AND sampled requests
        self._eos = self._eos.at[slot].set(jnp.int32(
            -1 if req.eos_id is None else req.eos_id))
        self.stats.prefills += 1
        self._tok = self._tok.at[slot].set(tok0)
        self._pos = self._pos.at[slot].set(t0)
        req.tokens.append(tok0)
        self._stream_push(req, tok0)
        if self._done(req, tok0):
            self._finish(slot)

    # -- scheduler loop ----------------------------------------------------------
    def _admit_batch(self, pairs) -> None:
        """Prefill a burst of admissions in as few device calls as
        possible: group by prompt bucket, split groups to power-of-two
        sizes, one batched prefill (+ ONE host sync) per sub-group.
        With ``prefill_chunk`` set, prompts longer than it take the
        chunked single-slot path instead (one compile total)."""
        if self.prefill_chunk is not None:
            rest = []
            for slot, req in pairs:
                if (req.prefix_id is not None
                        or len(req.prompt) > self.prefill_chunk):
                    self._admit_chunked(slot, req)
                else:
                    rest.append((slot, req))
            pairs = rest
        by_bucket: dict[int, list] = {}
        for slot, req in pairs:
            # power-of-two bucket, capped at max_len (t0 <= max_len is
            # guaranteed by submit(), but the next power of two may not be)
            bucket = min(_bucket(len(req.prompt)), self.model.max_len)
            by_bucket.setdefault(bucket, []).append((slot, req))
        for bucket, group in sorted(by_bucket.items()):
            while group:
                n = 1 << (len(group).bit_length() - 1)  # pow2 <= len
                part, group = group[:n], group[n:]
                self._admit_group(bucket, part)

    def _admit_group(self, bucket: int, part) -> None:
        n = len(part)
        pad = np.zeros((n, bucket), np.int32)
        t0s = np.zeros((n,), np.int32)
        slots = np.zeros((n,), np.int32)
        for j, (slot, req) in enumerate(part):
            t0s[j] = len(req.prompt)
            pad[j, :t0s[j]] = req.prompt
            slots[j] = slot
            # register BEFORE the device call: if prefill raises, the
            # crash handler must fail THESE requests' futures too
            self._active[slot] = req
        temps = np.asarray([req.temperature for _, req in part],
                           np.float32)
        topps = np.asarray([req.top_p for _, req in part], np.float32)
        topks = np.asarray([req.top_k for _, req in part], np.int32)
        keys = np.stack([
            np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
            for _, req in part])
        slots_j = jnp.asarray(slots)
        self._temp = self._temp.at[slots_j].set(jnp.asarray(temps))
        self._topp = self._topp.at[slots_j].set(jnp.asarray(topps))
        self._topk = self._topk.at[slots_j].set(jnp.asarray(topks))
        self._eos = self._eos.at[slots_j].set(jnp.asarray(
            [-1 if req.eos_id is None else req.eos_id
             for _, req in part], np.int32))
        self._keys = self._keys.at[slots_j].set(jnp.asarray(keys))
        use_topp = bool((topps < 1.0).any())
        use_topk = bool((topks > 0).any())
        self._caches, toks = self._prefill_fn(bucket, n, use_topp,
                                              use_topk)(
            self._params, self._caches, slots_j,
            jnp.asarray(pad), jnp.asarray(t0s), jnp.asarray(temps),
            jnp.asarray(keys), jnp.asarray(topps), jnp.asarray(topks))
        toks = np.asarray(toks)
        self.stats.prefills += n
        self._tok = self._tok.at[slots_j].set(jnp.asarray(toks))
        self._pos = self._pos.at[slots_j].set(jnp.asarray(t0s))
        for j, (slot, req) in enumerate(part):
            tok0 = int(toks[j])
            req.tokens.append(tok0)
            self._stream_push(req, tok0)
            if self._done(req, tok0):
                self._finish(slot)

    @staticmethod
    def _stream_push(req: _GenRequest, tok: int) -> None:
        if req.stream_q is not None and len(req.tokens) <= req.max_new:
            req.stream_q.put(tok)

    @staticmethod
    def _stream_close(req: _GenRequest) -> None:
        if req.stream_q is not None:
            req.stream_q.put(None)

    def _done(self, req: _GenRequest, tok: int) -> bool:
        if (len(req.tokens) >= req.max_new
                or (req.eos_id is not None and tok == req.eos_id)):
            return True
        if req.stop:
            t = req.tokens
            for sq in req.stop:
                n = len(sq)
                if len(t) >= n and tuple(t[-n:]) == sq:
                    return True
        return False

    def _finish(self, slot: int) -> None:
        req = self._active[slot]
        self._active[slot] = None
        if req.temperature > 0:       # freed slot reverts to greedy
            self._temp = self._temp.at[slot].set(0.0)
        if req.top_p < 1.0:
            self._topp = self._topp.at[slot].set(1.0)
        if req.top_k > 0:
            self._topk = self._topk.at[slot].set(0)
        if req.eos_id is not None:
            self._eos = self._eos.at[slot].set(-1)
        self.stats.requests += 1
        self.stats.tokens += min(len(req.tokens), req.max_new)
        if len(self.stats.latencies_s) < 10_000:
            self.stats.latencies_s.append(
                time.perf_counter() - req.t_submit)
        req.future.set_result(np.asarray(req.tokens[:req.max_new],
                                         np.int32))
        self._stream_close(req)

    def _loop(self) -> None:
        try:
            self._loop_inner()
        except BaseException as e:          # fail pending futures, loudly
            # the engine is dead: later submit()s must raise instead of
            # enqueueing futures nothing will ever resolve
            self._running = False
            for s, req in enumerate(self._active):
                if req is not None and not req.future.done():
                    req.future.set_exception(e)
                if req is not None:
                    self._stream_close(req)
                self._active[s] = None
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                if req is not None and not req.future.done():
                    req.future.set_exception(e)
                    self._stream_close(req)
            raise

    def _loop_inner(self) -> None:
        try:
            self._drain_loop()
        finally:
            # shutdown: fail anything still queued — a request that will
            # never run must not leave its future pending forever
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                if req is not None and not req.future.done():
                    req.future.set_exception(
                        RuntimeError("engine shut down before this "
                                     "request was scheduled"))
                    self._stream_close(req)

    def _drain_loop(self) -> None:
        # overlap=True: ``pending`` holds the dispatched-but-unfetched
        # chunk — (device toks, the [(slot, req)] snapshot it decoded
        # for).  The snapshot matters: by fetch time a slot may already
        # hold a DIFFERENT request, whose tokens these are not.
        pending = None
        while (self._running or pending is not None
               or any(r is not None for r in self._active)):
            # admit as many queued requests as there are free slots —
            # collected first, then prefilled in batched groups
            admits, taken = [], set()
            while self._running:
                slot = next((s for s, r in enumerate(self._active)
                             if r is None and s not in taken), None)
                if slot is None:
                    break
                idle = (not admits and pending is None
                        and all(r is None for r in self._active))
                try:
                    req = (self._queue.get(timeout=0.1) if idle
                           else self._queue.get_nowait())
                except queue.Empty:
                    break
                if req is None:          # shutdown: drain active slots
                    self._running = False
                    break
                admits.append((slot, req))
                taken.add(slot)
            if admits:
                self._admit_batch(admits)
            if any(r is not None for r in self._active):
                # dispatch decode steps for every active slot (async —
                # jax returns device futures immediately)
                snapshot = list(self._active)
                active = jnp.asarray(
                    [r is not None for r in snapshot], bool)
                n_act = int(sum(r is not None for r in snapshot))
                sampled = any(r is not None and r.temperature > 0
                              for r in snapshot)
                use_topp = any(r is not None and r.top_p < 1.0
                               for r in snapshot)
                use_topk = any(r is not None and r.top_k > 0
                               for r in snapshot)
                # with nothing queued, no slot refill is possible — run
                # up to sync_chunks chunks device-side before syncing
                # (newly submitted requests then wait at most one
                # multi-chunk dispatch for admission)
                if (self.sync_chunks > 1 and pending is None
                        and self._queue.empty()):
                    rem = np.zeros((self.slots,), np.int32)
                    for s, r in enumerate(snapshot):
                        if r is not None:
                            rem[s] = max(1, r.max_new - len(r.tokens))
                    (self._caches, self._pos, self._tok, _, _rem,
                     toks, nchunks, work) = \
                        self._multichunk(sampled, use_topp, use_topk)(
                            self._params, self._caches, self._pos,
                            self._tok, active, jnp.asarray(rem),
                            self._temp, self._keys, self._topp,
                            self._topk, self._eos)
                    self.stats.chunks += int(nchunks)
                    # on-device per-chunk live-slot counts: slots drain
                    # mid-program, so n_act * nchunks would overstate
                    # fill (round-4 review finding)
                    self.stats.chunk_slots_active += int(work)
                    fetch = (toks, snapshot)
                else:
                    self.stats.chunks += 1
                    self.stats.chunk_slots_active += n_act
                    self._caches, self._pos, self._tok, _, toks = \
                        self._chunk(sampled, use_topp, use_topk)(
                            self._params, self._caches, self._pos,
                            self._tok, active, self._temp, self._keys,
                            self._topp, self._topk, self._eos)
                    if self.overlap:
                        pending, fetch = (toks, snapshot), pending
                    else:
                        fetch = (toks, snapshot)
            else:
                fetch, pending = pending, None
            if fetch is None:
                continue
            toks, snapshot = fetch
            toks = np.asarray(toks)            # [slots, chunk_steps]
            for s, req in enumerate(snapshot):
                # process only requests still in their slot: _finish may
                # have freed it since this chunk was dispatched
                if req is None or self._active[s] is not req:
                    continue
                for t in toks[s]:
                    req.tokens.append(int(t))
                    self._stream_push(req, int(t))
                    if self._done(req, int(t)):
                        self._finish(s)
                        break
